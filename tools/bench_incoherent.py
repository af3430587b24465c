#!/usr/bin/env python3
"""Incoherent-wavefront intersection microbench (big scene).

The renderer's own wavefronts are camera-coherent after the ray sort;
externally-supplied batches (e.g. a user tracing arbitrary rays through
``intersect_closest``) are not. This bench builds the worst case —
surface-point origins with uniform-sphere directions — and times the
closest-hit and occlusion paths on it, so scheduler knobs (TPT_GUARD,
TPT_BINNED, TPT_CBIN, TPT_STREAM) can be compared on the workload they
exist for.

Knobs: INC_RAYS (262144), INC_SCENE (assets/big_mesh.obj), INC_REPS (3),
INC_UV (1; 0 = lean carry, required for TPT_CBIN).
Prints one JSON line per path.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    import tpu_pt
    from tpu_pt.vec3 import V3
    from tpu_pt.intersect import pallas_bf as bf

    obj = os.environ.get("INC_SCENE",
                         os.path.join(REPO, "assets", "big_mesh.obj"))
    scene = tpu_pt.load_scene(obj)
    n = int(os.environ.get("INC_RAYS", 262144))
    reps = int(os.environ.get("INC_REPS", 3))

    # Surface-ish origins: random points inside the scene AABB, uniform
    # sphere directions — no tile shares a direction cone.
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    # Scene AABB from the triangle VERTICES (pack_tris columns 0:3 are
    # the plane normals — using those confined all origins to a ~unit
    # cube at the corner, a far more origin-coherent workload than the
    # worst case this bench claims to measure).
    valid = scene.tri_valid > 0
    corners = jnp.concatenate(
        [scene.tri_v0, scene.tri_v0 + scene.tri_e1,
         scene.tri_v0 + scene.tri_e2], axis=0)
    vmask = jnp.concatenate([valid, valid, valid])[:, None]
    lo = jnp.min(jnp.where(vmask, corners, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(vmask, corners, -jnp.inf), axis=0)
    p = jax.random.uniform(k1, (n, 3)) * (hi - lo) + lo
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    origins = V3(p[:, 0], p[:, 1], p[:, 2])
    dirs = V3(d[:, 0], d[:, 1], d[:, 2])
    tmax = jnp.full((n,), 1e4, jnp.float32)

    # INC_UV=0 takes the lean (t, id) carry — the OBJ path tracer's hot
    # configuration and the only one the cluster-binned (TPT_CBIN)
    # scheduler engages on.
    want_uv = os.environ.get("INC_UV", "1") == "1"
    closest = jax.jit(lambda o, dd: bf.intersect_closest(
        scene, o, dd, want_uv=want_uv))
    occluded = jax.jit(lambda o, dd, t: bf.intersect_occluded(scene, o,
                                                              dd, t))

    for name, fn, arg in (("closest", closest, (origins, dirs)),
                          ("occluded", occluded, (origins, dirs, tmax))):
        from tpu_pt.profiling import device_barrier, barrier_rtt
        out = fn(*arg)
        leaf = jax.tree.leaves(out)[0]
        device_barrier(leaf)  # block_until_ready can lie over the tunnel
        rtt = barrier_rtt(leaf)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*arg)
        device_barrier(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0 - rtt) / reps
        payload = {
            "metric": f"incoherent {name}, {n} rays, "
                      f"{scene.num_tris_padded} padded tris",
            "value": round(n / dt / 1e6, 3),
            "unit": "Mrays/s",
            "ms": round(dt * 1e3, 2),
            "backend": jax.default_backend(),
            # The kernel default when TPT_GUARD is unset is "none"
            # (pallas_bf._guard_mode), not "both".
            "guard": os.environ.get("TPT_GUARD", "") or "none",
            "binned": os.environ.get("TPT_BINNED", "0"),
            "cbin": os.environ.get("TPT_CBIN", "0"),
            "stream": os.environ.get("TPT_STREAM", "0"),
            "want_uv": want_uv,
        }
        print(json.dumps(payload))
        import perflib
        perflib.record(f"incoherent_{name}_100k", payload)


if __name__ == "__main__":
    main()
