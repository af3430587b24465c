#!/usr/bin/env python3
"""Headline benchmark: Mrays/s on the Cornell box (BASELINE.json metric).

Renders the mixed-BSDF Cornell scene at 1024x1024, 8-bounce max depth,
importance sampling + NEE on (BASELINE.json config 2/4 geometry), on the
default JAX backend (the real TPU chip under the driver; auto-shrinks on
CPU so the script stays runnable anywhere). Ray counts come from the
renderer's own telemetry: radiance rays actually alive per bounce plus NEE
shadow rays — masked-out lanes are NOT counted, so the number is honest
about wavefront occupancy.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
``vs_baseline`` is value / 100 Mrays/s — the north-star target; the
reference publishes no numbers of its own (BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

NORTH_STAR_MRAYS = 100.0


def main():
    import jax

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    import tpu_pt
    from tpu_pt.render import CameraArrays, render_frame, init_accum

    obj = os.environ.get(
        "BENCH_SCENE", os.path.join(REPO, "assets", "cornell_box_mixed.obj"))
    if not os.path.exists(obj):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "make_assets.py")],
                       check=True)
    scene = tpu_pt.load_scene(obj)
    scene_name = ("Cornell (mixed BSDF)"
                  if obj.endswith("cornell_box_mixed.obj")
                  else os.path.basename(obj))

    size = int(os.environ.get("BENCH_SIZE", 1024 if on_tpu else 256))
    spp = int(os.environ.get("BENCH_SPP", 16 if on_tpu else 4))
    frames = int(os.environ.get("BENCH_FRAMES", 4 if on_tpu else 2))
    depth = int(os.environ.get("BENCH_DEPTH", 8))
    sched = os.environ.get("BENCH_SCHED", "pixelq")
    cfg = tpu_pt.RenderConfig(width=size, height=size, spp=spp,
                              max_depth=depth, scheduler=sched,
                              use_direct_lighting=True,
                              use_importance_sampling=True)
    cam = CameraArrays.from_camera(tpu_pt.cornell_default_camera())

    # Warmup / compile. device_barrier, not block_until_ready: the tunnel
    # backend's first post-compile block can return while the device is
    # still computing (measured 0.1 ms); a scalar readback cannot.
    from tpu_pt.profiling import device_barrier, barrier_rtt
    accum = init_accum(cfg)
    accum, img, stats = render_frame(scene, cam, cfg, 0, accum)
    device_barrier(img)
    rtt = barrier_rtt(img)

    # Time frames 1..N; sum THEIR ray counts (RNG is frame-keyed, so RR
    # termination — and the honest ray count — varies per frame). Stats
    # stay on-device until after the clock stops; the closing barrier's
    # round-trip is subtracted.
    frame_stats = []
    t0 = time.perf_counter()
    for f in range(1, frames + 1):
        accum, img, stats = render_frame(scene, cam, cfg, f, accum)
        frame_stats.append(stats)
    device_barrier(img)
    dt = time.perf_counter() - t0 - rtt

    total_rays = sum(float(s.rays_traced) + float(s.shadow_rays)
                     for s in frame_stats)
    rays_per_frame = total_rays / frames
    mrays = total_rays / dt / 1e6
    ms_per_frame = dt / frames * 1e3

    payload = {
        "metric": f"Mrays/s/chip, {size}x{size} {scene_name}, "
                  f"{depth} bounces, {spp} spp, IS+NEE on",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
        "backend": backend,
        "ms_per_frame": round(ms_per_frame, 2),
        "rays_per_frame": int(rays_per_frame),
    }
    print(json.dumps(payload))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import perflib
    # Only the CANONICAL workload updates the manifest: a BENCH_* -
    # customized run (smoke sizes, spp sweeps, alternate scenes) is a
    # probe — recording it would replace the 1024^2 headline with e.g.
    # a 256^2 smoke number under the same key (which once happened).
    canonical = (size == 1024 and spp == 16 and depth == 8
                 and sched == "pixelq"
                 and obj.endswith("cornell_box_mixed.obj"))
    if canonical:
        perflib.record("headline_cornell", payload)


if __name__ == "__main__":
    main()
