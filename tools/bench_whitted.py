#!/usr/bin/env python3
"""Whitted-pipeline benchmark (the round-1 VERDICT's missing perf story).

Renders pbr_test.glb on the default backend and prints one JSON line
with Mrays/s from the renderer's own telemetry (alive radiance rays +
shadow rays — honest about the early-exit depth loop).

Knobs: BENCH_W_SIZE (512), BENCH_W_SPP (8), BENCH_W_DEPTH (8),
BENCH_W_FRAMES (4), BENCH_W_SCENE, BENCH_W_INST (auto|flatten|
instanced — the glTF geometry contract; "instanced" benches the
pallas_inst two-level sweep and records under a ``_inst`` PERF key).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import numpy as np
    import tpu_pt
    from tpu_pt.scene.gltf import load_gltf
    from tpu_pt.whitted import render_whitted_frame
    from tpu_pt.render import CameraArrays, init_accum
    from tpu_pt.camera import Camera

    on_tpu = jax.default_backend() == "tpu"
    scene_path = os.environ.get(
        "BENCH_W_SCENE", os.path.join(REPO, "assets", "pbr_test.glb"))
    if not os.path.exists(scene_path):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "make_gltf_assets.py")],
                       check=True)
    inst_mode = os.environ.get("BENCH_W_INST", "auto")
    ws = load_gltf(scene_path, instancing=inst_mode)

    size = int(os.environ.get("BENCH_W_SIZE", 512 if on_tpu else 128))
    spp = int(os.environ.get("BENCH_W_SPP", 8 if on_tpu else 2))
    depth = int(os.environ.get("BENCH_W_DEPTH", 8))
    frames = int(os.environ.get("BENCH_W_FRAMES", 4 if on_tpu else 2))
    sched = os.environ.get("BENCH_W_SCHED", "pixelq")
    cfg = tpu_pt.RenderConfig(width=size, height=size, spp=spp,
                              max_depth=depth, scheduler=sched,
                              background=(0.1, 0.15, 0.25))
    camera = Camera(eye=np.array([6.0, 4.5, 7.0], np.float32),
                    lookat=np.array([0.0, 0.8, 0.0], np.float32),
                    fov_y=40.0, aspect=1.0)
    cam = CameraArrays.from_camera(camera)

    from tpu_pt.profiling import device_barrier, barrier_rtt
    accum = init_accum(cfg)
    accum, img, stats = render_whitted_frame(ws, cam, cfg, 0, accum)
    device_barrier(img)      # block_until_ready can lie over the tunnel
    rtt = barrier_rtt(img)

    frame_stats = []
    t0 = time.perf_counter()
    for f in range(1, frames + 1):
        accum, img, stats = render_whitted_frame(ws, cam, cfg, f, accum)
        frame_stats.append(stats)
    device_barrier(img)
    dt = time.perf_counter() - t0 - rtt

    total_rays = sum(float(s.rays_traced) + float(s.shadow_rays)
                     for s in frame_stats)
    mrays = total_rays / dt / 1e6
    scene_name = os.path.splitext(os.path.basename(scene_path))[0]
    instanced = ws.inst is not None
    payload = {
        "metric": f"whitted Mrays/s/chip, {size}x{size} {scene_name}"
                  f"{' (instanced)' if instanced else ''}, "
                  f"depth {depth}, {spp} spp",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "backend": jax.default_backend(),
        "ms_per_frame": round(dt / frames * 1e3, 2),
        "rays_per_frame": int(total_rays / frames),
        "iters_per_frame": round(float(
            frame_stats[-1].wavefront_iterations), 1),
        "scheduler": sched,
    }
    print(json.dumps(payload))
    import perflib
    key = ("whitted_pbr" if scene_name in ("pbr_test",)
           else f"whitted_{scene_name}")
    # Canonical-config runs only (same hazard as bench.py's headline:
    # a BENCH_W_SIZE smoke run must not replace the 512^2 manifest
    # entry under the same key).
    if size == 512 and spp == 8 and depth == 8 and sched == "pixelq":
        perflib.record(key + ("_inst" if instanced else ""), payload)


if __name__ == "__main__":
    main()
