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


if __name__ == "__main__":
    main()
