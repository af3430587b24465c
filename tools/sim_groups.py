#!/usr/bin/env python3
"""Sweep-work estimate for finer candidate-list granularity.

Question behind the transposed-group kernel idea: how much dense sweep
work disappears if candidate lists are built per g sorted rays instead
of per 256-ray tile?  Reuses sim_frame.py's cached frame-realistic
wavefront (camera + cosine bounce generations on the big scene) and
counts exact chained-slab candidate entries (production
``super_candidates_exact`` + per-ray priors) at several granularities.
Sweep elements = entries x g x CLUSTER — the quantity a full-lane
kernel pays regardless of layout.  Run tools/sim_frame.py once first
(it writes the cache).
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import tpu_pt
    from tpu_pt.intersect import pallas_bf as bf

    obj = os.environ.get("SIM_SCENE",
                         os.path.join(REPO, "assets", "big_mesh.obj"))
    res = int(os.environ.get("SIM_RES", 128))
    gens = int(os.environ.get("SIM_GENS", 3))
    scene = tpu_pt.load_scene(obj)
    packed, boxes, sboxes = bf.pack_tris_clustered(scene)
    rows = packed.shape[0]
    slab_rows = bf._clustered_slab_rows(rows)
    starts = list(range(0, rows, slab_rows))
    scs = bf.CLUSTER * bf.SUPER
    cache = "/tmp/sim_frame_v1_%s_%d_%d_%d.npz" % (
        os.path.basename(obj), res, gens, slab_rows)
    if not os.path.exists(cache):
        raise SystemExit(f"run tools/sim_frame.py first (missing {cache})")
    z = np.load(cache)
    o_all = np.concatenate([z["o%d" % g] for g in range(gens)])
    d_all = np.concatenate([z["d%d" % g] for g in range(gens)])
    best_all = np.concatenate([z["b%d" % g] for g in range(gens)])

    from tpu_pt.vec3 import V3
    n = o_all.shape[0]
    n_pad = bf._pad_to(n, 256)
    rays = bf.pack_rays(V3(*[jnp.asarray(o_all[:, a]) for a in range(3)]),
                        V3(*[jnp.asarray(d_all[:, a]) for a in range(3)]),
                        None, n_pad)
    best_pad = np.concatenate(
        [best_all, np.full((n_pad - n, len(starts)), 1e16, np.float32)])
    os.environ["TPT_SORT_KEY"] = "dir12"
    key = bf._coherence_key(rays, boxes, sboxes)
    order = jnp.argsort(key)
    sr = rays[:, order]
    bt = best_pad[np.asarray(order)]

    tmin = 0.01
    base = None
    groups = [int(x) for x in os.environ.get(
        "SIM_GROUPS", "256,128,32,8,1").split(",")]
    # g=1 is the per-RAY exact list — the denominator of the round-4
    # roofline section's redundancy factor (swept elements at the
    # production g=256 tile unions / elements a per-ray-exact sweep
    # would touch).
    for g in groups:
        prior = np.full((n_pad,), 1e16, np.float32)
        entries = 0
        for si, s in enumerate(starts):
            sb = sboxes[s // scs: -(-(s + min(slab_rows, rows - s))
                                    // scs)]
            tab = np.asarray(bf.super_candidates_exact(
                sr, sb, g, tmin, jnp.asarray(prior)))
            r = bf._pad_to(1 + sb.shape[0], 8)
            entries += int(tab.reshape(-1, r)[:, 0].sum())
            prior = np.minimum(prior, bt[:, si])
        elems = entries * g * bf.CLUSTER
        if base is None:
            base = elems
        print(json.dumps({"group": g, "entries": entries,
                          "sweep_elems": elems,
                          "vs_256": round(elems / base, 4)}), flush=True)


if __name__ == "__main__":
    main()
