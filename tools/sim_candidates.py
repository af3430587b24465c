#!/usr/bin/env python3
"""Candidate-work simulator for the clustered big-scene scheduler.

Counts the EXACT work the chained clustered kernels would sweep under a
given per-round ray ordering: for each chained slab (in kd order, with
the per-ray prior t from the slabs before it — the production contract,
pallas_bf._intersect_closest_tiled), build the per-tile supercluster
work lists with the production ``super_candidates_exact`` and sum the
candidate counts. One (tile, supercluster) entry costs the kernel a
fixed RT_C x (CLUSTER*SUPER) triangle sweep, so total entries is
proportional to sweep time — the quantity the sort key exists to
minimize (the "union factor": incoherent tiles OR near-disjoint
per-ray candidate sets).

Runs entirely on CPU (forces jax_platforms=cpu) so it never contends
with the TPU; the per-slab true hit t that drives the prior is computed
from the same packed plane+edge form the kernels test.

Modes swept (SIM_KEYS): the production TPT_SORT_KEY values, plus
  hitslab  ORACLE — group rays by the slab that contains their true
           closest hit (unknowable before tracing; upper bound for
           slab-composition keys like 'near'),
  perfect  dir12 tiles but a zero-work prior (prior = the true global
           closest t from slab 0 on) — isolates prior timing from tile
           composition.

Knobs: SIM_SCENE (assets/big_mesh.obj), SIM_RAYS (65536),
SIM_KEYS (dir12,oct,near,hitslab,perfect). Prints one JSON line per
mode: entries, tri-tests, and the ratio vs the dir12 baseline.
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
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import tpu_pt
    from tpu_pt.vec3 import V3
    from tpu_pt.intersect import pallas_bf as bf
    from tpu_pt.intersect.lbvh import morton3d

    obj = os.environ.get("SIM_SCENE",
                         os.path.join(REPO, "assets", "big_mesh.obj"))
    if not os.path.exists(obj):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "make_assets.py"),
                        "--big"], check=True)
    scene = tpu_pt.load_scene(obj)
    n = int(os.environ.get("SIM_RAYS", 65536))
    modes = os.environ.get("SIM_KEYS",
                           "dir12,oct,near,hitslab,perfect").split(",")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import simlib
    rt = bf.RAY_TILE_C
    tmin = simlib.TMIN

    # bench_incoherent's worst case: origins spread over the scene
    # AABB (from the triangle VERTICES — pack_tris cols 0:3 are plane
    # normals), uniform sphere dirs.
    key0 = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key0)
    lo, hi = simlib.scene_bounds(scene)
    lo, hi = jnp.asarray(lo), jnp.asarray(hi)
    p = jax.random.uniform(k1, (n, 3)) * (hi - lo) + lo
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    origins = V3(p[:, 0], p[:, 1], p[:, 2])
    dirs = V3(d[:, 0], d[:, 1], d[:, 2])

    packed, boxes, sboxes = bf.pack_tris_clustered(scene)
    rows = packed.shape[0]
    slab_rows = bf._clustered_slab_rows(rows)
    starts = list(range(0, rows, slab_rows))
    scs = bf.CLUSTER * bf.SUPER
    n_pad = bf._pad_to(n, rt)
    rays = bf.pack_rays(origins, dirs, None, n_pad)

    o_np = np.stack([np.asarray(origins.x), np.asarray(origins.y),
                     np.asarray(origins.z)], axis=1)
    d_np = np.stack([np.asarray(dirs.x), np.asarray(dirs.y),
                     np.asarray(dirs.z)], axis=1)
    cache = "/tmp/sim_best_v3_%s_%d_%d_%d.npz" % (
        os.path.basename(obj), n, rows, slab_rows)
    if os.path.exists(cache):
        z = np.load(cache)
        best, best_row = z["t"], z["row"]
    else:
        t0 = time.time()
        b, br = simlib.trace_slabs(packed, starts, slab_rows, o_np, d_np)
        # Pad rows (rays) to n_pad; padded lanes never hit.
        best = np.concatenate(
            [b, np.full((n_pad - n, len(starts)), 1e16, np.float32)])
        best_row = np.concatenate(
            [br.astype(np.int32),
             np.zeros((n_pad - n, len(starts)), np.int32)])
        sys.stderr.write("true-t pass: %.1fs\n" % (time.time() - t0))
        np.savez(cache, t=best, row=best_row)

    # Per-ray slab entry intervals [n, S] from the slab AABBs (the same
    # aggregation the production 'near' key performs on sboxes).
    s_count = len(starts)
    sc_per = slab_rows // scs
    need = s_count * sc_per
    sb_all = np.asarray(sboxes)
    if sb_all.shape[0] != need:
        pad = np.full((need - sb_all.shape[0], sb_all.shape[1]), 3e37,
                      sb_all.dtype)
        sb_all = np.concatenate([sb_all, pad], axis=0)
    slab_lo = sb_all[:, 0:3].reshape(s_count, sc_per, 3).min(axis=1)
    slab_hi = sb_all[:, 3:6].reshape(s_count, sc_per, 3).max(axis=1)
    inv = 1.0 / np.where(np.abs(d_np) > 1e-12, d_np,
                         np.where(d_np >= 0, 1e-12, -1e-12))
    tn_s = np.full((n, s_count), -3e38, np.float32)
    tf_s = np.full((n, s_count), 3e38, np.float32)
    for a in range(3):
        t0a = (slab_lo[None, :, a] - o_np[:, a:a + 1]) * inv[:, a:a + 1]
        t1a = (slab_hi[None, :, a] - o_np[:, a:a + 1]) * inv[:, a:a + 1]
        tn_s = np.maximum(tn_s, np.minimum(t0a, t1a))
        tf_s = np.minimum(tf_s, np.maximum(t0a, t1a))
    ok_s = (tn_s <= tf_s) & (tf_s > tmin)
    keyt_s = np.where(ok_s, tn_s, np.float32(3e38))

    def compose(hi_bits, hi_width, mid=None, mid_width=0):
        """hi | [mid] | dir-morton | origin-morton, padded keys last."""
        d01 = jnp.clip(0.5 * (jnp.asarray(d_np) + 1.0), 0.0, 1.0)
        dbits = min(12, 32 - hi_width - mid_width - 12)  # match production
        dm = np.asarray(morton3d(d01)) >> (30 - dbits)
        om_bits = 32 - hi_width - mid_width - dbits
        p01 = jnp.clip((jnp.asarray(o_np) - np.asarray(lo)) /
                       jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
        om = np.asarray(morton3d(p01)) >> (30 - om_bits)
        k = hi_bits.astype(np.uint64) << (32 - hi_width)
        if mid is not None:
            k |= mid.astype(np.uint64) << (32 - hi_width - mid_width)
        k = (k | (dm.astype(np.uint64) << om_bits) | om).astype(np.uint32)
        kj = jnp.asarray(k)
        return jnp.pad(kj, (0, n_pad - n),
                       constant_values=np.uint32(0xFFFFFFFF))

    sbits = int(s_count).bit_length()
    diag = float(np.linalg.norm(np.asarray(hi - lo)))
    pk_np = np.asarray(packed)
    g_t = best.min(axis=1)                            # [n_pad]
    g_row = np.take_along_axis(best_row, best.argmin(axis=1)[:, None],
                               axis=1)[:, 0]          # [n_pad]

    def tri_test_rows(o, dd, rows_idx):
        """Exact packed-form test of ray i vs triangle rows_idx[i]."""
        tr = pk_np[rows_idx]
        nd = (dd * tr[:, 0:3]).sum(1)
        t = ((tr[:, 3] - (o * tr[:, 0:3]).sum(1))
             / np.where(np.abs(nd) > 1e-20, nd, 1e-20))
        pxyz = o + dd * t[:, None]
        u = (pxyz * tr[:, 4:7]).sum(1) + tr[:, 7]
        v = (pxyz * tr[:, 8:11]).sum(1) + tr[:, 11]
        ok = ((tr[:, 12] > 0.5) & (t > tmin) & (u >= 0.0) & (v >= 0.0)
              & (u + v <= 1.0))
        return np.where(ok, t, 1e16).astype(np.float32)

    def seed_prior(order):
        """Verified neighbor-hit seed: each ray exactly tests the hit
        triangle of the ray BEFORE it in sorted order (the sim's proxy
        for a converged (cell, cone) -> last-hit hash); a hit is a
        sound upper bound, a miss seeds nothing. Correctness-free by
        construction — the candidate tests only ever see true bounds."""
        ordn = np.asarray(order)
        pred = np.roll(g_row[ordn], 1)
        valid = np.roll(g_t[ordn], 1) < 1e15
        valid[0] = False
        o_s = np.stack([np.asarray(rays[a, :])[ordn] for a in range(3)],
                       axis=1)
        d_s = np.stack([np.asarray(rays[a, :])[ordn] for a in (3, 4, 5)],
                       axis=1)
        t_seed = tri_test_rows(o_s, d_s, pred)
        return np.where(valid, t_seed, 1e16).astype(np.float32)

    def experimental_key(mode):
        slab0 = np.where(ok_s.any(axis=1), keyt_s.argmin(axis=1),
                         s_count).astype(np.uint32)
        if mode.startswith("predslab"):
            # History-table landing-slab prediction: majority TRUE hit
            # slab per (first-pierced slab, 9-bit dir morton) cell —
            # the sim's converged stand-in for a per-round temporal
            # table. Ordering-only; wrong predictions cost nothing.
            NB = 512
            d01 = jnp.clip(0.5 * (jnp.asarray(d_np) + 1.0), 0.0, 1.0)
            dbin = (np.asarray(morton3d(d01)) >> 21).astype(np.int64)
            hit_s = best[:n].argmin(axis=1)
            has = best[:n].min(axis=1) < 1e15
            hs = np.where(has, hit_s, s_count)
            cell = slab0.astype(np.int64) * NB + dbin
            hist = np.zeros((int(cell.max()) + 1, s_count + 1),
                            np.int32)
            np.add.at(hist, (cell, hs), 1)
            filled = hist.sum(axis=1) > 0
            table = np.where(filled, hist.argmax(axis=1), 0)
            pred = np.where(filled[cell], table[cell],
                            slab0).astype(np.uint32)
            return compose(pred, sbits)
        if mode == "hitslab":
            hit_any = best[:n].min(axis=1) < 1e15
            hs = np.where(hit_any, best[:n].argmin(axis=1),
                          s_count).astype(np.uint32)
            return compose(hs, sbits)
        if mode.startswith("near_d"):
            # near with an explicit direction-bit budget (production
            # caps at 9 to keep >=12 origin bits).
            db = int(mode[6:])
            d01 = jnp.clip(0.5 * (jnp.asarray(d_np) + 1.0), 0.0, 1.0)
            dm = np.asarray(morton3d(d01)) >> (30 - db)
            om_bits = 32 - sbits - db
            p01 = jnp.clip((jnp.asarray(o_np) - np.asarray(lo)) /
                           jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
            om = np.asarray(morton3d(p01)) >> (30 - om_bits)
            kk = ((slab0.astype(np.uint64) << (32 - sbits))
                  | (dm.astype(np.uint64) << om_bits)
                  | om.astype(np.uint64)).astype(np.uint32)
            return jnp.pad(jnp.asarray(kk), (0, n_pad - n),
                           constant_values=np.uint32(0xFFFFFFFF))
        if mode == "near_sid":
            # slab0, then the first pierced supercluster WITHIN it,
            # then direction morton.
            srt = np.asarray(rays[:, :n])
            o = srt[0:3, :].T
            dd = srt[3:6, :].T
            iv = 1.0 / np.where(np.abs(dd) > 1e-12, dd,
                                np.where(dd >= 0, 1e-12, -1e-12))
            sbn = np.asarray(sboxes)
            tn = np.full((n, sbn.shape[0]), -3e38, np.float32)
            tf = np.full((n, sbn.shape[0]), 3e38, np.float32)
            for a in range(3):
                t0a = (sbn[None, :, a] - o[:, a:a + 1]) * iv[:, a:a + 1]
                t1a = (sbn[None, :, a + 3] - o[:, a:a + 1]) * iv[:, a:a + 1]
                tn = np.maximum(tn, np.minimum(t0a, t1a))
                tf = np.minimum(tf, np.maximum(t0a, t1a))
            okc = (tn <= tf) & (tf > tmin)
            keytc = np.where(okc, tn, np.float32(3e38))
            # first pierced supercluster inside the ray's first slab
            g = keytc.reshape(n, s_count, sc_per)
            sel = np.take_along_axis(
                g, (slab0[:, None, None] % s_count).astype(np.int64),
                axis=1)[:, 0, :]                      # [n, sc_per]
            sid_local = np.where((sel < 3e37).any(axis=1),
                                 sel.argmin(axis=1), sc_per)
            sid_bits = int(sc_per).bit_length()
            return compose(slab0, sbits, sid_local.astype(np.uint32),
                           sid_bits)
        if mode == "near_tn":
            tn0 = np.take_along_axis(keyt_s, slab0[:, None]
                                     % s_count, axis=1)[:, 0]
            q = np.clip(np.maximum(tn0, 0.0) / diag * 64, 0,
                        63).astype(np.uint32)
            return compose(slab0, sbits, q, 6)
        if mode == "sig2":
            k2 = np.where(ok_s, keyt_s, np.float32(3e38)).copy()
            np.put_along_axis(k2, (slab0[:, None] % s_count),
                              np.float32(3e38), axis=1)
            slab1 = np.where((k2 < 3e37).any(axis=1), k2.argmin(axis=1),
                             s_count).astype(np.uint32)
            return compose(slab0, sbits, slab1, sbits)
        if mode == "near_o":
            # slab0 then origin-major (dir demoted to the low bits).
            d01 = jnp.clip(0.5 * (jnp.asarray(d_np) + 1.0), 0.0, 1.0)
            dm = np.asarray(morton3d(d01))
            p01 = jnp.clip((jnp.asarray(o_np) - np.asarray(lo)) /
                           jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
            om = np.asarray(morton3d(p01)) >> (30 - 16)
            kk = ((slab0.astype(np.uint64) << (32 - sbits))
                  | (om.astype(np.uint64) << (32 - sbits - 16))
                  | (dm >> (30 - (32 - sbits - 16))).astype(np.uint64))
            kj = jnp.asarray(kk.astype(np.uint32))
            return jnp.pad(kj, (0, n_pad - n),
                           constant_values=np.uint32(0xFFFFFFFF))
        raise ValueError(mode)

    def per_ray_sets(sr_np, sb, prior):
        """Per-ray exact candidate counts [n_pad] for one slab (numpy
        mirror of super_candidates_exact's ok matrix)."""
        o = sr_np[0:3, :].T
        dd = sr_np[3:6, :].T
        iv = 1.0 / np.where(np.abs(dd) > 1e-12, dd,
                            np.where(dd >= 0, 1e-12, -1e-12))
        tn = np.full((o.shape[0], sb.shape[0]), -3e38, np.float32)
        tf = np.full((o.shape[0], sb.shape[0]), 3e38, np.float32)
        sbn = np.asarray(sb)
        for a in range(3):
            t0a = (sbn[None, :, a] - o[:, a:a + 1]) * iv[:, a:a + 1]
            t1a = (sbn[None, :, a + 3] - o[:, a:a + 1]) * iv[:, a:a + 1]
            tn = np.maximum(tn, np.minimum(t0a, t1a))
            tf = np.minimum(tf, np.maximum(t0a, t1a))
        ok = (tn <= tf) & (tf > tmin) & (tn < prior[:, None])
        return ok.sum(axis=1)

    def lower_bound():
        """Under the 'near' ordering: sum over (tile, slab) of the max
        per-ray candidate count — no ordering with these tiles' ray
        MEMBERSHIP can OR below its largest member. Also the global
        floor sum(|C_r|)/rt (perfect-overlap tiles)."""
        os.environ["TPT_SORT_KEY"] = "near"
        key = bf._coherence_key(rays, boxes, sboxes)
        order = jnp.argsort(key)
        sr_np = np.asarray(rays[:, order])
        bt = best[np.asarray(order)]
        prior = np.full((n_pad,), 1e16, np.float32)
        tile_max = 0
        ray_sum = 0
        for si, s in enumerate(starts):
            sb = sboxes[s // scs: -(-(s + min(slab_rows, rows - s))
                                    // scs)]
            cnt = per_ray_sets(sr_np, sb, prior)
            tile_max += int(cnt.reshape(-1, rt).max(axis=1).sum())
            ray_sum += int(cnt.sum())
            prior = np.minimum(prior, bt[:, si])
        print(json.dumps({
            "mode": "lbound(near tiles)", "entries": tile_max,
            "global_floor_entries": round(ray_sum / rt, 1),
            "rays": n, "slabs": len(starts), "rt": rt}), flush=True)

    def simulate(mode):
        if mode == "lbound":
            lower_bound()
            return None
        seed = mode in ("seedprior", "predslab_seed")
        if (mode in ("hitslab", "near_tn", "sig2", "near_o", "near_sid")
                or mode.startswith("near_d")
                or mode.startswith("predslab")):
            key = experimental_key(mode)
        elif mode == "seedprior":
            os.environ["TPT_SORT_KEY"] = "dir12"
            key = bf._coherence_key(rays, boxes, sboxes)
        elif mode == "perfect":
            os.environ["TPT_SORT_KEY"] = "dir12"
            key = bf._coherence_key(rays, boxes, sboxes)
        elif mode == "near_perfect":
            os.environ["TPT_SORT_KEY"] = "near"
            key = bf._coherence_key(rays, boxes, sboxes)
        else:
            os.environ["TPT_SORT_KEY"] = mode
            key = bf._coherence_key(rays, boxes, sboxes)
        order = jnp.argsort(key)
        sr = rays[:, order]
        bt = best[np.asarray(order)]                      # [n_pad, S]
        prior = np.full((n_pad,), 1e16, np.float32)
        if mode in ("perfect", "near_perfect"):
            prior = bt.min(axis=1)                        # oracle prior
        elif seed:
            prior = seed_prior(order)
        entries = 0
        for si, s in enumerate(starts):
            sb = sboxes[s // scs: -(-(s + min(slab_rows, rows - s))
                                    // scs)]
            tab = np.asarray(bf.super_candidates_exact(
                sr, sb, rt, tmin, jnp.asarray(prior)))
            r = bf._pad_to(1 + sb.shape[0], 8)
            entries += int(tab.reshape(-1, r)[:, 0].sum())
            if mode not in ("perfect", "near_perfect"):
                prior = np.minimum(prior, bt[:, si])
        return entries

    base = None
    for mode in modes:
        e = simulate(mode)
        if e is None:
            continue
        if base is None:
            base = e
        print(json.dumps({
            "mode": mode, "entries": e,
            "tri_tests": e * rt * scs,
            "vs_first": round(e / base, 4),
            "rays": n, "slabs": len(starts), "rt": rt,
        }), flush=True)


if __name__ == "__main__":
    main()
