"""Worker process for the 2-process DCN test (SURVEY §5.8).

Launched by ``test_dist.test_multihost_two_process`` with argv
``(process_id, num_processes, coordinator_port, n_spp)`` and a CPU env
carrying ``--xla_force_host_platform_device_count=2`` (2 local devices per
process). Joins the distributed job, renders one frame sharded over the
process-spanning hybrid mesh (tile over DCN, spp over ICI), gathers the
frame on-host, and asserts it matches this process's own single-device
render (counter RNG ⇒ deterministic up to fp-add reordering). Exit code 0
is the test pass signal.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    pid, nproc, port, n_spp = (int(sys.argv[1]), int(sys.argv[2]),
                               sys.argv[3], int(sys.argv[4]))
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import tpu_pt
    from tpu_pt import dist
    from tpu_pt.render import CameraArrays, render_frame, init_accum

    dist.init_multihost(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2

    mesh = dist.multihost_mesh(n_spp=n_spp)
    assert mesh.shape["spp"] == n_spp
    assert mesh.shape["tile"] * n_spp == nproc * 2

    scene = tpu_pt.load_scene(
        os.path.join(REPO, "assets", "cornell_box.obj"))
    cam = CameraArrays.from_camera(tpu_pt.cornell_default_camera())
    cfg = tpu_pt.RenderConfig(width=16, height=16, spp=4, max_depth=3,
                              use_direct_lighting=True,
                              use_importance_sampling=True)

    step = dist.make_sharded_renderer(scene, cfg, mesh)
    accum_s = dist.init_accum_sharded(cfg, mesh)
    out_accum, out_img, out_stats = step(cam, 0, accum_s)

    full = dist.gather_frame(out_accum)
    assert full.shape == (cfg.height, cfg.width, 3)

    ref_accum, _, ref_stats = render_frame(scene, cam, cfg, 0,
                                           init_accum(cfg))
    np.testing.assert_allclose(np.asarray(full), np.asarray(ref_accum),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(ref_stats.rays_traced),
                               float(out_stats.rays_traced))
    np.testing.assert_allclose(np.asarray(ref_stats.done_histogram),
                               np.asarray(out_stats.done_histogram))
    print(f"proc {pid}: multihost frame matches single-device", flush=True)

    # Whitted pipeline over the same process-spanning mesh (the
    # renderer dispatch is pipeline-agnostic, WorkDistribution.h parity).
    gltf = os.path.join(REPO, "assets", "pbr_test.gltf")
    if os.path.exists(gltf):
        from tpu_pt.camera import Camera
        from tpu_pt.scene.gltf import load_gltf
        from tpu_pt.whitted import render_whitted_frame
        ws = load_gltf(gltf)
        wcam = CameraArrays.from_camera(Camera(
            eye=np.array([6.0, 4.5, 7.0], np.float32),
            lookat=np.array([0.0, 0.8, 0.0], np.float32), fov_y=40.0))
        wcfg = tpu_pt.RenderConfig(width=16, height=16, spp=4, max_depth=3,
                                   intersector="bruteforce")
        wstep = dist.make_sharded_renderer(ws, wcfg, mesh)
        w_accum, _, w_stats = wstep(wcam, 0,
                                    dist.init_accum_sharded(wcfg, mesh))
        w_full = dist.gather_frame(w_accum)
        wref, _, wref_stats = render_whitted_frame(ws, wcam, wcfg, 0,
                                                   init_accum(wcfg))
        np.testing.assert_allclose(np.asarray(w_full), np.asarray(wref),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(float(wref_stats.rays_traced),
                                   float(w_stats.rays_traced))
        print(f"proc {pid}: multihost whitted frame matches single-device",
              flush=True)


if __name__ == "__main__":
    main()
