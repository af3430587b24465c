#!/usr/bin/env python3
"""Frame-realistic candidate-work simulator (companion to
sim_candidates.py, which stresses the fully-incoherent worst case).

Builds the ray population a mid-frame pixelq round actually sweeps on
the big scene: one camera ray per pixel (production camera + jitter
RNG), then cosine-sampled bounce generations spawned at the true hit
points, mixed together. Counts exact chained-slab candidate entries
(production ``super_candidates_exact`` + per-ray priors) under:

  dir12     the production default ordering,
  gen_dir12 dir12 with the bounce GENERATION in the top bits (the
            pixelq wavefront implicitly mixes generations; this asks
            whether un-mixing them is worth scheduling work),
  predhist  history-predicted LANDING slab major: camera rays use the
            same pixel's previous-sample hit slab, bounce rays their
            parent's hit slab (both available for free in the real
            renderer), then dir12 bits — ordering-only, wrong
            predictions cost nothing,
  hitslab   ORACLE landing-slab grouping (upper bound),
  perfect   oracle prior (upper bound for any prior-seeding scheme).

Also prints per-generation entry counts under dir12 so the expensive
part of the mix is visible.

Knobs: SIM_SCENE (assets/big_mesh.obj), SIM_RES (128 -> 16384 pixels),
SIM_GENS (3), SIM_KEYS (dir12,gen_dir12,predhist,hitslab,perfect).
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
    from tpu_pt import rng
    from tpu_pt.render import CameraArrays, camera_rays
    from tpu_pt.intersect import pallas_bf as bf
    from tpu_pt.intersect.lbvh import morton3d

    obj = os.environ.get("SIM_SCENE",
                         os.path.join(REPO, "assets", "big_mesh.obj"))
    if not os.path.exists(obj):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "make_assets.py"),
                        "--big"], check=True)
    scene = tpu_pt.load_scene(obj)
    res = int(os.environ.get("SIM_RES", 128))
    gens = int(os.environ.get("SIM_GENS", 3))
    modes = os.environ.get(
        "SIM_KEYS", "dir12,gen_dir12,predhist,hitslab,perfect").split(",")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import simlib
    rt = bf.RAY_TILE_C
    tmin = simlib.TMIN
    n_pix = res * res

    packed, boxes, sboxes = bf.pack_tris_clustered(scene)
    pk = np.asarray(packed)
    rows = packed.shape[0]
    slab_rows = bf._clustered_slab_rows(rows)
    starts = list(range(0, rows, slab_rows))
    s_count = len(starts)
    scs = bf.CLUSTER * bf.SUPER

    def trace(o_np, d_np):
        """True hits of rays vs the whole scene: per-slab [N, S] min-t
        (drives priors) + global (t, packed row)."""
        best, brow = simlib.trace_slabs(packed, starts, slab_rows,
                                        o_np, d_np)
        g_t = best.min(axis=1)
        g_s = best.argmin(axis=1)
        g_row = np.take_along_axis(brow, g_s[:, None], axis=1)[:, 0]
        return best, g_t, np.where(g_t < 1e15, g_s, s_count), g_row

    def cam_batch(sample):
        pix = jnp.arange(n_pix, dtype=jnp.uint32)
        jx, jy = rng.uniform2(pix, sample, 0, 0)
        cam = CameraArrays.from_camera(tpu_pt.cornell_default_camera())
        o, d = camera_rays(cam, pix, res, res, jx, jy)
        return (np.stack([np.asarray(o.x), np.asarray(o.y),
                          np.asarray(o.z)], 1),
                np.stack([np.asarray(d.x), np.asarray(d.y),
                          np.asarray(d.z)], 1))

    def cosine_bounce(o_np, d_np, g_t, g_row, rng_np):
        """Spawn cosine bounces at the hits (diffuse transport)."""
        hit = g_t < 1e15
        nrm = pk[g_row][:, 0:3]
        nrm = np.where((np.sum(nrm * d_np, axis=1) > 0)[:, None],
                       -nrm, nrm)                       # faceforward
        p = o_np + d_np * g_t[:, None] + nrm * 1e-3
        r1 = rng_np.random(o_np.shape[0]).astype(np.float32)
        r2 = rng_np.random(o_np.shape[0]).astype(np.float32)
        st = np.sqrt(r1)
        phi = 2 * np.pi * r2
        lx, ly = st * np.cos(phi), st * np.sin(phi)
        lz = np.sqrt(np.maximum(0.0, 1.0 - r1))
        up = np.where((np.abs(nrm[:, 2:3]) < 0.9),
                      np.array([[0.0, 0.0, 1.0]], np.float32),
                      np.array([[1.0, 0.0, 0.0]], np.float32))
        tx = np.cross(up, nrm)
        tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-12)
        ty = np.cross(nrm, tx)
        nd = (tx * lx[:, None] + ty * ly[:, None] + nrm * lz[:, None])
        return p[hit], nd[hit].astype(np.float32), hit

    t0 = time.time()
    rng_np = np.random.default_rng(7)

    cache = "/tmp/sim_frame_v1_%s_%d_%d_%d.npz" % (
        os.path.basename(obj), res, gens, slab_rows)
    if os.path.exists(cache):
        z = np.load(cache)
        gen_o = [z["o%d" % g] for g in range(gens)]
        gen_d = [z["d%d" % g] for g in range(gens)]
        gen_pred = [z["p%d" % g] for g in range(gens)]
        gen_best = [z["b%d" % g] for g in range(gens)]
        gen_gt = [z["t%d" % g] for g in range(gens)]
        gen_hs = [z["h%d" % g] for g in range(gens)]
    else:
        # Previous sample (history source) and current sample camera rays.
        o_prev, d_prev = cam_batch(0)
        _, _, hs_prev, _ = trace(o_prev, d_prev)        # per-pixel history
        o0, d0_ = cam_batch(1)

        gen_o, gen_d, gen_pred = [o0], [d0_], [hs_prev]
        gen_best, gen_gt, gen_hs = [], [], []
        for g in range(gens):
            best, g_t, g_hs, g_row = trace(gen_o[g], gen_d[g])
            gen_best.append(best)
            gen_gt.append(g_t)
            gen_hs.append(g_hs)
            if g + 1 < gens:
                o_b, d_b, hit = cosine_bounce(gen_o[g], gen_d[g], g_t,
                                              g_row, rng_np)
                gen_o.append(o_b)
                gen_d.append(d_b)
                gen_pred.append(g_hs[hit])   # parent's landing slab
        sys.stderr.write("trace passes: %.1fs\n" % (time.time() - t0))
        np.savez(cache, **{"%s%d" % (k, g): v
                           for k, arrs in (("o", gen_o), ("d", gen_d),
                                           ("p", gen_pred), ("b", gen_best),
                                           ("t", gen_gt), ("h", gen_hs))
                           for g, v in enumerate(arrs)})

    o_all = np.concatenate(gen_o)
    d_all = np.concatenate(gen_d)
    pred_all = np.concatenate(gen_pred).astype(np.uint32)
    hs_all = np.concatenate(gen_hs).astype(np.uint32)
    best_all = np.concatenate(gen_best)
    gen_id = np.concatenate([np.full(len(o), g, np.uint32)
                             for g, o in enumerate(gen_o)])
    n = o_all.shape[0]
    n_pad = bf._pad_to(n, rt)
    from tpu_pt.vec3 import V3
    rays = bf.pack_rays(V3(*[jnp.asarray(o_all[:, a]) for a in range(3)]),
                        V3(*[jnp.asarray(d_all[:, a]) for a in range(3)]),
                        None, n_pad)
    best_pad = np.concatenate(
        [best_all, np.full((n_pad - n, s_count), 1e16, np.float32)])

    sbits = int(s_count).bit_length()

    def compose(hi_bits, hi_width):
        d01 = jnp.clip(0.5 * (jnp.asarray(d_all) + 1.0), 0.0, 1.0)
        dbits = min(12, 32 - hi_width - 12)
        dm = np.asarray(morton3d(d01)) >> (30 - dbits)
        lo, hi = simlib.scene_bounds(scene)
        om_bits = 32 - hi_width - dbits
        p01 = jnp.clip((jnp.asarray(o_all) - lo) /
                       np.maximum(hi - lo, 1e-12), 0.0, 1.0)
        om = np.asarray(morton3d(p01)) >> (30 - om_bits)
        k = ((hi_bits.astype(np.uint64) << (32 - hi_width))
             | (dm.astype(np.uint64) << om_bits)
             | om.astype(np.uint64)).astype(np.uint32)
        return jnp.pad(jnp.asarray(k), (0, n_pad - n),
                       constant_values=np.uint32(0xFFFFFFFF))

    def entries_for(key, prior0=None, split_gen=False):
        order = jnp.argsort(key)
        sr = rays[:, order]
        ordn = np.asarray(order)
        bt = best_pad[ordn]
        prior = (np.full((n_pad,), 1e16, np.float32)
                 if prior0 is None else prior0[ordn])
        total = 0
        per_gen = np.zeros(gens, np.int64)
        gid = np.concatenate([gen_id, np.full(n_pad - n, 0,
                                              np.uint32)])[ordn]
        for si, s in enumerate(starts):
            sb = sboxes[s // scs: -(-(s + min(slab_rows, rows - s))
                                    // scs)]
            tab = np.asarray(bf.super_candidates_exact(
                sr, sb, rt, tmin, jnp.asarray(prior)))
            r = bf._pad_to(1 + sb.shape[0], 8)
            cnt = tab.reshape(-1, r)[:, 0]
            total += int(cnt.sum())
            if split_gen:
                # attribute each tile's entries to its majority gen
                gt_tile = gid.reshape(-1, rt)
                for g in range(gens):
                    frac = (gt_tile == g).mean(axis=1)
                    per_gen[g] += int((cnt * frac).sum())
            if prior0 is None:
                prior = np.minimum(prior, bt[:, si])
        return total, per_gen

    base = None
    for mode in modes:
        prior0 = None
        split = False
        if mode == "dir12":
            os.environ["TPT_SORT_KEY"] = "dir12"
            key = bf._coherence_key(rays, boxes, sboxes)
            split = True
        elif mode == "gen_dir12":
            # 32-bit compose: generation in the TOP bits, dir12 key
            # shifted down to make room (uint64 keys silently truncate
            # to uint32 under jnp's default x64-disabled config).
            os.environ["TPT_SORT_KEY"] = "dir12"
            k0 = np.asarray(bf._coherence_key(rays, boxes, sboxes))
            gb = max(1, int(gens).bit_length())
            gid_pad = np.concatenate(
                [gen_id, np.full(n_pad - n, (1 << gb) - 1, np.uint32)])
            key = jnp.asarray(((gid_pad.astype(np.uint32) << (32 - gb))
                               | (k0 >> np.uint32(gb))))
        elif mode == "predhist":
            key = compose(pred_all, sbits)
        elif mode == "hitslab":
            key = compose(hs_all, sbits)
        elif mode == "perfect":
            os.environ["TPT_SORT_KEY"] = "dir12"
            key = bf._coherence_key(rays, boxes, sboxes)
            prior0 = np.concatenate(
                [np.concatenate(gen_gt),
                 np.full(n_pad - n, 1e16, np.float32)])
        else:
            raise ValueError(mode)
        e, per_gen = entries_for(key, prior0, split)
        if base is None:
            base = e
        out = {"mode": mode, "entries": e,
               "vs_first": round(e / base, 4),
               "rays": n, "slabs": s_count, "rt": rt}
        if split:
            out["per_gen_entries"] = per_gen.tolist()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
