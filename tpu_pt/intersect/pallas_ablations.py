"""Retired big-scene kernel families (measured dead ends, kept runnable).

Every scheduler in this module was built for the big-scene cliff, measured
on hardware, and lost to the live clustered-lean + chained-slab + pixelq
path that remains in ``pallas_bf`` — the numbers and post-mortems live in
ARCHITECTURE.md's performance ladder. They stay runnable (env knobs
unchanged, tests in tests/test_pallas_bf.py) because each wins on SOME
workload the renderer does not have (externally-supplied incoherent
wavefronts) and because the measurements are part of the record:

- ROTATED chain (``TPT_SEED``): per-tile slab visit order, predicted
  landing slab first, via scalar-prefetch block index maps.
- STREAMED path (``TPT_STREAM``): scene stays in HBM; per-tile candidate
  DMA ring; one launch per round. Also serves as the cbin completion pass.
- CLUSTER-BINNED (``TPT_CBIN``): exact per-ray-group (ray, cluster) work
  lists compacted cluster-major, 256-pair jobs, static-cap overflow
  finished by the streamed pass.
- PAIR-BINNED (``TPT_BINNED``): every (ray, pierced supercluster) pair is
  one unit of work, sorted supercluster-major.

Shared helpers/constants are read through ``pallas_bf`` (imported as
``bf``) at call time, so tests that monkeypatch ``pallas_bf.CLUSTER`` etc.
affect these paths exactly as before the split.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.arrays import SceneArrays, BSDF_REFRACTION
from ..vec3 import V3, as_v3
from .moller import Hit, T_FAR, DET_EPS
from . import pallas_bf as bf

def rotated_candidates(rays: jnp.ndarray, sboxes_all: jnp.ndarray,
                       sid: jnp.ndarray, rt: int, tmin: float,
                       sc: int, tmax) -> jnp.ndarray:
    """Per-tile work lists for the rotated chained launches: tile i's
    candidates are tested against ITS OWN j-th-visit slab's superclusters
    (``sboxes_all`` reshaped [S, sc, 8], gathered by ``sid``), exact
    per-ray tests OR-reduced per tile like ``bf.super_candidates_exact``.
    Ids in the table are LOCAL to the slab (0..sc-1), matching the
    rotated kernel's per-slab box blocks. ``tmax`` is a scalar (first
    launch) or the per-ray prior t [n_pad] (later launches)."""
    n_pad = rays.shape[1]
    n_tiles = n_pad // rt
    big = jnp.float32(3e38)
    sb = sboxes_all.reshape(-1, sc, 8)[sid]                   # [T, sc, 8]
    o = rays[0:3, :].reshape(3, n_tiles, rt)
    d = rays[3:6, :].reshape(3, n_tiles, rt)
    eps = 1e-12
    inv = 1.0 / jnp.where(jnp.abs(d) > eps, d,
                          jnp.where(d >= 0, eps, -eps))
    tn = jnp.full((n_tiles, rt, sc), -big)
    tf = jnp.full((n_tiles, rt, sc), big)
    for a in range(3):
        t0 = (sb[:, None, :, a] - o[a][:, :, None]) * inv[a][:, :, None]
        t1 = (sb[:, None, :, a + 3] - o[a][:, :, None]) * inv[a][:, :, None]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    if jnp.ndim(tmax) == 0:
        tmax_r = jnp.full((n_tiles, rt, 1), tmax)
    else:
        tmax_r = jnp.reshape(tmax, (n_tiles, rt, 1))
    ok = (tn <= tf) & (tf > tmin) & (tn < tmax_r)
    any_ = jnp.any(ok, axis=1)                                # [T, sc]
    tkey = jnp.min(jnp.where(ok, tn, jnp.float32(T_FAR)), axis=1)
    key = jnp.where(any_, tkey, jnp.float32(T_FAR))
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    cnt = jnp.sum(any_, axis=1, dtype=jnp.int32)[:, None]
    tab = jnp.concatenate([cnt, order], axis=1)
    rows = bf._pad_to(1 + sc, 8)
    if rows != 1 + sc:
        tab = jnp.pad(tab, ((0, 0), (0, rows - 1 - sc)))
    return tab.reshape(-1, 1)


def _closest_kernel_rotated_lean(sid_ref, rays_ref, tris_ref, boxes_ref,
                                 sboxes_ref, cand_ref, corder_ref,
                                 out_ref, i_ref, *, slab_rows, tmin, tmax,
                                 ns1, guard="none"):
    """Rotated chained launch (first step, no prior): each ray tile
    sweeps its OWN j-th-visit chained slab — scalar-prefetched per-tile
    slab ids drive the triangle/box block index maps, so the tile
    predicted to land in slab k sweeps k FIRST and the rest of its chain
    culls against a near-oracle per-ray prior (t, global id)."""
    rt = rays_ref.shape[1]
    base = sid_ref[pl.program_id(0)] * slab_rows
    for si, (lo, hi) in enumerate(bf._sub_slices(rt)):
        # Load the subtile's ray rows straight from the ref: slicing an
        # already-loaded [1, RT] register at a lane offset leaves a
        # layout Mosaic cannot re-broadcast ("Invalid input layout").
        ray = tuple(rays_ref[k:k + 1, lo:hi] for k in range(6))
        best_t, best_i = bf._closest_sweep(
            ray, tris_ref, hi - lo, slab_rows // bf.CLUSTER, tmin, tmax,
            tb=bf.CLUSTER, boxes_ref=boxes_ref, sboxes_ref=sboxes_ref,
            cand_ref=cand_ref, corder_ref=corder_ref, guard=guard,
            lean=True, lean_base=base, cand_base=si * ns1)
        out_ref[0:1, lo:hi] = best_t
        i_ref[0:1, lo:hi] = jnp.where(best_t < T_FAR,
                                      best_i.astype(jnp.int32), 0)


def _closest_kernel_rotated_chained_lean(sid_ref, rays_ref, tris_ref,
                                         boxes_ref, sboxes_ref, cand_ref,
                                         corder_ref, pout_ref, pidx_ref,
                                         out_ref, i_ref, *, slab_rows,
                                         tmin, tmax, ns1, guard="none"):
    """Rotated chained launch, later steps: like
    ``_closest_kernel_chained_lean`` but the slab swept is the tile's
    own j-th-visit slab (scalar-prefetched block indices + dynamic
    global-id base)."""
    rt = rays_ref.shape[1]
    base = sid_ref[pl.program_id(0)] * slab_rows
    for si, (lo, hi) in enumerate(bf._sub_slices(rt)):
        # Load the subtile's ray rows straight from the ref: slicing an
        # already-loaded [1, RT] register at a lane offset leaves a
        # layout Mosaic cannot re-broadcast ("Invalid input layout").
        ray = tuple(rays_ref[k:k + 1, lo:hi] for k in range(6))
        init = (pout_ref[0:1, lo:hi],
                pidx_ref[0:1, lo:hi].astype(jnp.float32))
        best_t, best_i = bf._closest_sweep(
            ray, tris_ref, hi - lo, slab_rows // bf.CLUSTER, tmin, tmax,
            tb=bf.CLUSTER, boxes_ref=boxes_ref, sboxes_ref=sboxes_ref,
            cand_ref=cand_ref, corder_ref=corder_ref, guard=guard,
            lean=True, lean_base=base, init=init, cand_base=si * ns1)
        out_ref[0:1, lo:hi] = best_t
        i_ref[0:1, lo:hi] = jnp.where(best_t < T_FAR,
                                      best_i.astype(jnp.int32), 0)


# ---------------------------------------------------------------------------
# Streamed clustered kernels: the scene stays in HBM.
#
# The chained-slab machinery above exists for one reason: a slab's whole
# triangle buffer must be VMEM-resident for the sweep ([rows, 16] f32 —
# 6.4 MB at 100k tris, 64 MB at 1M, far over VMEM). Chaining bought prior
# tightening but costs S full launches per round (13 at 100k tris, 32 at
# 1M), S candidate-table builds, and a fixed grid-program cost for every
# (tile, slab) pair — including the mostly-empty ones.
#
# Here the packed triangles are a pallas input in ANY memory space (HBM);
# each ray tile walks its per-tile candidate list (exact per-ray slab
# tests against ALL supercluster AABBs, near-first — ``stream_candidates``)
# and DMAs each candidate's bf.CLUSTER*bf.SUPER rows into a VMEM ring buffer,
# double-buffered STREAM_BUF deep, sweeping slot k while slots k+1.. are
# in flight. One 8 KB cluster DMA is ~10 ns of HBM bandwidth against a
# ~260 ns sweep (128 tris x 256 rays), so the pipeline is compute-bound.
# The chained path's inter-slab prior is replaced by the running best-t:
# candidates arrive near-first, and (guard on) each is re-tested against
# the tile's current best before its sweep — per-CANDIDATE tightening
# instead of per-slab, in one launch, with no slab partitioning at all.
# ---------------------------------------------------------------------------
STREAM_BUF = 4                      # DMA ring slots (power of two)


def _stream_guard() -> bool:
    """Per-candidate running-best re-test (skip a swept cluster no ray
    can improve). Near-first lists make this the chained-prior analog;
    ``TPT_STREAM_GUARD=0`` ablates it to a cond-free pipeline."""
    return os.environ.get("TPT_STREAM_GUARD", "1") == "1"


def _stream_widen(tris: jnp.ndarray) -> jnp.ndarray:
    """Pad the packed [rows, 16] triangles to [rows, 128] for streaming.

    Mosaic DMA slices must be 128-lane-aligned in the minor dim, so the
    HBM-resident copy carries 112 dead lanes. The waste is bandwidth-only
    and hidden: one 64 KB supercluster DMA is ~80 ns of HBM against a
    ~1.4 us VPU sweep, and the ring keeps ``STREAM_BUF`` in flight."""
    return jnp.pad(tris, ((0, 0), (0, 128 - tris.shape[1])))


def _stream_dma(tris_hbm, scratch, sems, cand_ref, k, nbuf):
    """DMA descriptor for candidate ``k``: supercluster rows -> ring slot.

    Rebuilt identically at start() and wait() (the pallas contract); the
    slot is ``k % nbuf`` with ``nbuf`` a power of two."""
    sc_rows = bf.CLUSTER * bf.SUPER
    slot = jax.lax.rem(k, nbuf)
    sid = cand_ref[1 + k, 0]
    return pltpu.make_async_copy(
        tris_hbm.at[pl.ds(sid * sc_rows, sc_rows), :],
        scratch.at[pl.ds(slot * sc_rows, sc_rows), :],
        sems.at[slot])


def _stream_drain(tris_hbm, scratch, sems, cand_ref, k_stop, ncand, nbuf):
    """Wait out the ring's in-flight DMAs after an early break.

    Starts issued: warmup 0..nbuf-2 plus body k+nbuf-1 for k < k_stop —
    i.e. every index in [0, k_stop+nbuf-1) that passed the ``< ncand``
    gate. Waits issued: 0..k_stop-1. Pallas requires every started copy
    to be awaited before the kernel returns."""
    def drain(j, c):
        @pl.when(j < ncand)
        def _():
            _stream_dma(tris_hbm, scratch, sems, cand_ref, j, nbuf).wait()
        return c

    jax.lax.fori_loop(k_stop, k_stop + nbuf - 1, drain, 0)


def _closest_kernel_streamed_lean(rays_ref, cand_ref, keys_ref, sboxes_ref,
                                  tris_hbm, out_ref, i_ref, scratch, sems,
                                  *, n_sc, tmin, nbuf, guard):
    rt = rays_ref.shape[1]
    ray = bf._ray_rows(rays_ref)
    sc_rows = bf.CLUSTER * bf.SUPER
    ncand = jnp.clip(cand_ref[0, 0], 0, n_sc)

    for j in range(nbuf - 1):       # warm the DMA pipeline
        @pl.when(j < ncand)
        def _():
            _stream_dma(tris_hbm, scratch, sems, cand_ref, j, nbuf).start()

    inv = bf._ray_inv(ray)

    # Early break, exact: candidates arrive sorted by tile-min entry
    # distance, so once keys[k] >= max_r best_t[r], EVERY later candidate
    # j has tnear_j(r) >= keys[j] >= keys[k] >= best_t(r) for every ray —
    # the whole tail is skipped at zero cost (no DMA, no branch, no
    # sweep). This is the wavefront analog of BVH traversal termination.
    def cond(state):
        k, best_t, _ = state
        return (k < ncand) & (keys_ref[1 + k, 0] < jnp.max(best_t))

    def body(state):
        k, best_t, bi = state
        @pl.when(k + nbuf - 1 < ncand)
        def _():
            _stream_dma(tris_hbm, scratch, sems, cand_ref,
                        k + nbuf - 1, nbuf).start()
        _stream_dma(tris_hbm, scratch, sems, cand_ref, k, nbuf).wait()
        slot = jax.lax.rem(k, nbuf)
        sid = cand_ref[1 + k, 0]

        def sweep(c):
            best_t, bi = c
            t, _, _, _ = bf._pe_block(ray, scratch, slot * sc_rows, sc_rows,
                                   tmin)
            blk_t = jnp.min(t, axis=0, keepdims=True)             # [1, RT]
            sub = jax.lax.broadcasted_iota(jnp.int32, (sc_rows, rt), 0)
            cnd = jnp.where(t == blk_t, sub, bf._BIG_IDX)
            blk_sub = jnp.min(cnd, axis=0, keepdims=True)
            blk_i = (blk_sub + sid * sc_rows).astype(jnp.float32)
            better = blk_t < best_t
            return (jnp.where(better, blk_t, best_t),
                    jnp.where(better, blk_i, bi))

        if guard:
            tnear, tfar = bf._box_near_far(ray, inv, sboxes_ref, sid)
            useful = (tnear <= tfar) & (tfar > tmin) & (tnear < best_t)
            best_t, bi = jax.lax.cond(jnp.any(useful), sweep, lambda c: c,
                                      (best_t, bi))
        else:
            best_t, bi = sweep((best_t, bi))
        return k + 1, best_t, bi

    init = (jnp.int32(0),
            jnp.full((1, rt), T_FAR, jnp.float32),
            jnp.zeros((1, rt), jnp.float32))
    k_stop, best_t, best_i = jax.lax.while_loop(cond, body, init)
    _stream_drain(tris_hbm, scratch, sems, cand_ref, k_stop, ncand, nbuf)
    out_ref[:, :] = best_t
    i_ref[:, :] = jnp.where(best_t < T_FAR, best_i.astype(jnp.int32), 0)


def _occluded_kernel_streamed(rays_ref, cand_ref, keys_ref, sboxes_ref,
                              tris_hbm, occ_ref, scratch, sems, *, n_sc,
                              tmin, nbuf, guard):
    rt = rays_ref.shape[1]
    ray = bf._ray_rows(rays_ref)
    tmax = rays_ref[6:7, :]
    sc_rows = bf.CLUSTER * bf.SUPER
    ncand = jnp.clip(cand_ref[0, 0], 0, n_sc)

    for j in range(nbuf - 1):
        @pl.when(j < ncand)
        def _():
            _stream_dma(tris_hbm, scratch, sems, cand_ref, j, nbuf).start()

    inv = bf._ray_inv(ray)

    # Break when every ray is either already blocked or the remaining
    # (near-sorted) candidates start beyond its light distance: the
    # running max of tmax over unblocked rays bounds every useful key.
    def cond(state):
        k, occ = state
        open_max = jnp.max(jnp.where(occ < 0.5, tmax, jnp.float32(-1.0)))
        return (k < ncand) & (keys_ref[1 + k, 0] < open_max)

    def body(state):
        k, occ = state
        @pl.when(k + nbuf - 1 < ncand)
        def _():
            _stream_dma(tris_hbm, scratch, sems, cand_ref,
                        k + nbuf - 1, nbuf).start()
        _stream_dma(tris_hbm, scratch, sems, cand_ref, k, nbuf).wait()
        slot = jax.lax.rem(k, nbuf)
        sid = cand_ref[1 + k, 0]

        def sweep(c):
            t, refr, _, _ = bf._pe_block(ray, scratch, slot * sc_rows,
                                      sc_rows, tmin)
            blocking = (t < tmax) & (refr < 0.5)
            hit_any = jnp.max(jnp.where(blocking, 1.0, 0.0), axis=0,
                              keepdims=True)
            return jnp.maximum(c, hit_any)

        if guard:
            tnear, tfar = bf._box_near_far(ray, inv, sboxes_ref, sid)
            useful = ((tnear <= tfar) & (tfar > tmin) & (tnear < tmax)
                      & (occ < 0.5))
            occ = jax.lax.cond(jnp.any(useful), sweep, lambda c: c, occ)
        else:
            occ = sweep(occ)
        return k + 1, occ

    init = (jnp.int32(0), jnp.zeros((1, rt), jnp.float32))
    k_stop, occ = jax.lax.while_loop(cond, body, init)
    _stream_drain(tris_hbm, scratch, sems, cand_ref, k_stop, ncand, nbuf)
    occ_ref[:, :] = occ.astype(jnp.int32)


@functools.partial(jax.named_call, name="pallas_closest_rot")
def _closest_call_rotated(tile_slab, rays, tris_pad, boxes_pad,
                          sboxes_pad, cand, corder_pad, slab_rows: int,
                          tmin: float, prior=None):
    """One rotated chained launch: every ray tile sweeps its OWN
    j-th-visit chained slab, selected per grid program via
    scalar-prefetch block index maps. Inputs are padded to S whole
    slabs. Consecutive tiles share predictions under pred-major
    ordering, so the dynamic triangle block re-fetches only at group
    boundaries (plus once at the rotation wrap)."""
    n_pad = rays.shape[1]
    grid = (n_pad // bf.RAY_TILE_C,)
    bc = slab_rows // bf.CLUSTER
    sc = slab_rows // (bf.CLUSTER * bf.SUPER)
    ns1 = bf._pad_to(1 + sc, 8)
    sub_per = bf.RAY_TILE_C // min(bf.SUBTILE_C, bf.RAY_TILE_C)
    if prior is None:
        kernel = functools.partial(_closest_kernel_rotated_lean,
                                   slab_rows=slab_rows, tmin=tmin,
                                   tmax=T_FAR, ns1=ns1,
                                   guard=bf._guard_mode())
        extra_in, extra_specs = (), ()
    else:
        kernel = functools.partial(_closest_kernel_rotated_chained_lean,
                                   slab_rows=slab_rows, tmin=tmin,
                                   tmax=T_FAR, ns1=ns1,
                                   guard=bf._guard_mode())
        extra_in = prior
        extra_specs = (
            pl.BlockSpec((1, bf.RAY_TILE_C), lambda i, sid: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf.RAY_TILE_C), lambda i, sid: (0, i),
                         memory_space=pltpu.VMEM),
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, bf.RAY_TILE_C), lambda i, sid: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slab_rows, 16), lambda i, sid: (sid[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 8), lambda i, sid: (sid[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sc, 8), lambda i, sid: (sid[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub_per * ns1, 1), lambda i, sid: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * bc, 1), lambda i, sid: (sid[i], 0),
                         memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, bf.RAY_TILE_C), lambda i, sid: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf.RAY_TILE_C), lambda i, sid: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * n_pad * slab_rows, bytes_accessed=n_pad * 48,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=bf.VMEM_LIMIT),
        interpret=bf._interpret(),
    )(tile_slab, rays, tris_pad, boxes_pad, sboxes_pad, cand, corder_pad,
      *extra_in)


def stream_candidates(rays: jnp.ndarray, sboxes: jnp.ndarray, rt: int,
                      tmin: float, tmax) -> jnp.ndarray:
    """Whole-scene per-tile work lists for the streamed kernels.

    Same contract as ``bf.super_candidates_exact`` but over ALL supercluster
    AABBs at once (the streamed path has no slabs), computed in column
    chunks so the dense per-ray test's temporaries stay [N, <=1024]
    instead of [N, NS] (2 GB at 1M tris x 65k rays). One argsort over the
    assembled [tiles, NS] near-keys yields the global near-first order.
    """
    ns = sboxes.shape[0]
    n_pad = rays.shape[1]
    n_tiles = n_pad // rt
    big = jnp.float32(3e38)
    o = rays[0:3, :]
    d = rays[3:6, :]
    eps = 1e-12
    inv = 1.0 / jnp.where(jnp.abs(d) > eps, d,
                          jnp.where(d >= 0, eps, -eps))
    if jnp.ndim(tmax) == 0:
        tmax_r = jnp.full((n_pad, 1), tmax)
    else:
        tmax_r = jnp.reshape(tmax, (n_pad, 1))
    chunk = 1024
    any_parts, key_parts = [], []
    for c0 in range(0, ns, chunk):
        sb = sboxes[c0:c0 + chunk]
        nc = sb.shape[0]
        tn = jnp.full((n_pad, nc), -big)
        tf = jnp.full((n_pad, nc), big)
        for a in range(3):
            t0 = (sb[None, :, a] - o[a][:, None]) * inv[a][:, None]
            t1 = (sb[None, :, a + 3] - o[a][:, None]) * inv[a][:, None]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        ok = (tn <= tf) & (tf > tmin) & (tn < tmax_r)         # [N, nc]
        okt = ok.reshape(n_tiles, rt, nc)
        any_parts.append(jnp.any(okt, axis=1))
        key_parts.append(jnp.min(
            jnp.where(okt, tn.reshape(n_tiles, rt, nc),
                      jnp.float32(T_FAR)), axis=1))
    any_ = jnp.concatenate(any_parts, axis=1)                 # [tiles, NS]
    key = jnp.where(any_, jnp.concatenate(key_parts, axis=1),
                    jnp.float32(T_FAR))
    iota = jnp.broadcast_to(jnp.arange(ns, dtype=jnp.int32)[None, :],
                            key.shape)
    skey, order = jax.lax.sort((key, iota), dimension=1, num_keys=1)
    cnt = jnp.sum(any_, axis=1, dtype=jnp.int32)[:, None]
    tab = jnp.concatenate([cnt, order], axis=1)
    # Keys share the table's row convention (row 1+k = candidate k); the
    # kernels' early break compares them against the running best.
    keys = jnp.concatenate([jnp.full((n_tiles, 1), T_FAR, jnp.float32),
                            skey], axis=1)
    rows = bf._pad_to(1 + ns, 8)
    if rows != 1 + ns:
        tab = jnp.pad(tab, ((0, 0), (0, rows - 1 - ns)))
        keys = jnp.pad(keys, ((0, 0), (0, rows - 1 - ns)),
                       constant_values=T_FAR)
    return tab.reshape(-1, 1), keys.reshape(-1, 1)


def _stream_specs(n_sc: int, nbuf: int):
    ns1 = bf._pad_to(1 + n_sc, 8)
    in_specs = [
        pl.BlockSpec((8, bf.RAY_TILE_C), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ns1, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ns1, 1), lambda i: (i, 0),     # near keys
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_sc, 8), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),         # tris stay in HBM
    ]
    scratch = [
        pltpu.VMEM((nbuf * bf.CLUSTER * bf.SUPER, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((nbuf,)),
    ]
    return in_specs, scratch


@functools.partial(jax.named_call, name="pallas_closest_stream")
def _closest_call_streamed(rays, tris, sboxes, cand, keys,
                           tmin: float):
    """One launch per round: lean (t, global packed id) streamed closest.

    ``rays`` [8, N] (key-sorted), ``tris`` the full clustered packing
    (left in HBM, 128-widened), ``cand`` from ``stream_candidates``."""
    tris = _stream_widen(tris)
    n_pad = rays.shape[1]
    grid = (n_pad // bf.RAY_TILE_C,)
    n_sc = sboxes.shape[0]
    kernel = functools.partial(_closest_kernel_streamed_lean, n_sc=n_sc,
                               tmin=tmin, nbuf=STREAM_BUF,
                               guard=_stream_guard())
    in_specs, scratch = _stream_specs(n_sc, STREAM_BUF)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bf.RAY_TILE_C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf.RAY_TILE_C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=40 * n_pad * tris.shape[0], bytes_accessed=n_pad * 48,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=bf.VMEM_LIMIT),
        interpret=bf._interpret(),
    )(rays, cand, keys, sboxes, tris)


@functools.partial(jax.named_call, name="pallas_occluded_stream")
def _occluded_call_streamed(rays, tris, sboxes, cand, keys,
                            tmin: float):
    tris = _stream_widen(tris)
    n_pad = rays.shape[1]
    grid = (n_pad // bf.RAY_TILE_C,)
    n_sc = sboxes.shape[0]
    kernel = functools.partial(_occluded_kernel_streamed, n_sc=n_sc,
                               tmin=tmin, nbuf=STREAM_BUF,
                               guard=_stream_guard())
    in_specs, scratch = _stream_specs(n_sc, STREAM_BUF)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bf.RAY_TILE_C), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=34 * n_pad * tris.shape[0], bytes_accessed=n_pad * 48,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=bf.VMEM_LIMIT),
        interpret=bf._interpret(),
    )(rays, cand, keys, sboxes, tris)


# ---------------------------------------------------------------------------
# Cluster-binned closest hit: per-ray-GROUP work lists, grouped BY cluster.
#
# The tile-union schedulers above degrade catastrophically on incoherent
# bounce rays: a 256-ray tile of isotropic directions pierces ~60% of all
# supercluster AABBs (measured 450/784 on the 100k-tri scene), so the
# union list sweeps ~60x more cluster rows than the rays individually
# need (mean 7.4 boxes per ray). Binning inverts the schedule: the exact
# per-ray box tests are compacted into cluster-major (ray, cluster)
# pairs — each cluster gets the (padded-to-256) batch of rays that
# pierce it — and the kernel sweeps each 256-pair job against its single
# cluster. Total tri tests collapse from O(tiles x union) to O(sum of
# per-ray pierce counts), independent of ray coherence.
#
# The schedule build itself must be cheap: it reruns EVERY wavefront
# round (a lane's ray changes each bounce). The original build — a
# jnp.nonzero over the dense [NS, N] pierce mask plus P_cap-sized
# scatters — cost 225 ms/round on the 100k-tri frame (TPU scatter is
# ~6 ns/update), 87% of the frame. This build keeps every step
# gather/sort-shaped and shrinks the dense mask by binning CBIN_GROUP
# adjacent lanes (tile-sorted, so coherent) into one work list:
#   1. conservative interval slab test of each GROUP vs every cluster
#      AABB (endpoint products of the member-ray origin/reciprocal
#      intervals bound the true per-ray slab t range; parked lanes are
#      masked out of the intervals) -> okt [N/G, NS];
#   2. per-group compact cluster lists by a rank-vs-k compare-reduce
#      (no top_k: measured 3x slower; no giant scatter);
#   3. ONE [N/G*K] key/value sort brings the (group, k) pairs into
#      cluster-major order (stable, so group-ascending within cluster);
#   4. job-granular slice gathers + reshapes expand sorted group-pairs
#      to padded 256-lane jobs — nothing slot-sized is ever gathered
#      per-element or scattered.
# Groups whose lists overflow a static cap (pair budget, per-group K)
# are finished exactly by the tile-union streamed pass with everyone
# else parked. Measured (100k tris, 512^2 x 4 spp wavefront): 225 ->
# ~2 ms/round at G=8, with the exact-list sweep unchanged.
# ---------------------------------------------------------------------------
CBIN_PAIR_MULT = int(os.environ.get("TPT_CBIN_PAIRS", 12))   # P_cap = mult*N
CBIN_K_OUT = int(os.environ.get("TPT_CBIN_K", 32))           # per-group cap
CBIN_GROUP = int(os.environ.get("TPT_CBIN_GROUP", 1))        # lanes/work list
CBIN_FAN = int(os.environ.get("TPT_CBIN_FAN", 8))            # parents: children
CBIN_K1 = int(os.environ.get("TPT_CBIN_K1", 16))             # parent-list cap
CBIN_LVL = int(os.environ.get("TPT_CBIN_LVL", 0))            # 0 auto, 1, 2
CBIN_LVL2_MIN = int(os.environ.get("TPT_CBIN_LVL2_MIN", 192))


def _cbin_ray_bounds(rays: jnp.ndarray, tmax, g: int):
    """Per-group interval bounds for the conservative slab tests.

    Returns ``(o_lo, o_hi, i_lo, i_hi [3, ng], any_live [ng],
    tmax_g [ng, 1])``. PARKED lanes (render.PARK_COORD origins) are
    masked out of the intervals so a retired lane cannot blow up its
    group's bounds; all-parked groups report any_live False."""
    n = rays.shape[1]
    ng = n // g
    o = rays[0:3, :].reshape(3, ng, g)
    d = rays[3:6, :].reshape(3, ng, g)
    parked = o[0] >= 1.0e7                                  # [ng, g]
    any_live = ~jnp.all(parked, axis=1)                     # [ng]
    eps = 1e-12
    inv = 1.0 / jnp.where(jnp.abs(d) > eps, d,
                          jnp.where(d >= 0, eps, -eps))
    big = jnp.float32(3e38)

    def lo(x):
        return jnp.min(jnp.where(parked[None], big, x), axis=2)

    def hi(x):
        return jnp.max(jnp.where(parked[None], -big, x), axis=2)

    o_lo, o_hi = lo(o), hi(o)                               # [3, ng]
    i_lo, i_hi = lo(inv), hi(inv)
    if jnp.ndim(tmax) == 0:
        tmax_g = jnp.full((ng, 1), tmax)
    else:
        tmax_g = jnp.max(
            jnp.where(parked, -big,
                      jnp.reshape(tmax, (ng, g))), axis=1, keepdims=True)
    return o_lo, o_hi, i_lo, i_hi, any_live, tmax_g


def _interval_slab(bounds, box_lo, box_hi, tmin: float) -> jnp.ndarray:
    """Conservative slab test of group intervals vs per-group boxes.

    ``box_lo/box_hi`` are [ng, m, 3] (or broadcastable); returns
    [ng, m] bool. Interval arithmetic: per axis, the 8 endpoint
    products of (box_face - o) x inv(d) bound min(t0,t1) from below and
    max(t0,t1) from above for every member ray, so (tn_lo <= tf_hi) &
    (tf_hi > tmin) & (tn_lo < tmax) is a superset of each member's
    exact slab test — false positives only cost sweep work; false
    negatives are impossible, and the test is monotone in box size (a
    parent AABB passes whenever any child does). At g=1 the intervals
    are points and this reproduces the exact per-ray test bitwise."""
    o_lo, o_hi, i_lo, i_hi, any_live, tmax_g = bounds
    tn = None
    tf = None
    for a in range(3):
        f_lo0 = box_lo[..., a] - o_hi[a][:, None]           # [ng, m]
        f_hi0 = box_lo[..., a] - o_lo[a][:, None]
        f_lo1 = box_hi[..., a] - o_hi[a][:, None]
        f_hi1 = box_hi[..., a] - o_lo[a][:, None]
        il = i_lo[a][:, None]
        ih = i_hi[a][:, None]
        pmin = None
        pmax = None
        for p in (f_lo0 * il, f_lo0 * ih, f_hi0 * il, f_hi0 * ih,
                  f_lo1 * il, f_lo1 * ih, f_hi1 * il, f_hi1 * ih):
            pmin = p if pmin is None else jnp.minimum(pmin, p)
            pmax = p if pmax is None else jnp.maximum(pmax, p)
        tn = pmin if tn is None else jnp.maximum(tn, pmin)
        tf = pmax if tf is None else jnp.minimum(tf, pmax)
    return (tn <= tf) & (tf > tmin) & (tn < tmax_g) & any_live[:, None]


def _cbin_group_test(rays: jnp.ndarray, sboxes: jnp.ndarray, tmin: float,
                     tmax, g: int) -> jnp.ndarray:
    """Dense slab test of every group vs every cluster AABB
    ([N//g, NS] bool), chunked so temporaries stay bounded.

    Default for g > 1 is the EXACT union (``TPT_CBIN_EXACT=0`` restores
    round 2's conservative interval arithmetic): OR of the g member
    rays' exact per-ray tests. The interval union was the measured flaw
    of the grouped schedule — adjacent sorted bounce rays' direction
    spread made each group's interval test pass ~10x the clusters its
    rays actually pierce (ARCHITECTURE cbin row), sending half the
    frame through the K-cap completion pass; the exact union costs the
    dense [N, NS] term instead of [N/g, NS] (XLA fuses it into ~1 ms at
    32k x 782) and the frame-realistic sim (tools/sim_groups.py) puts
    exact per-8 unions at only ~1.45x per-ray-exact sweep work."""
    ns = sboxes.shape[0]
    if g > 1 and os.environ.get("TPT_CBIN_EXACT", "1") == "1":
        n_pad = rays.shape[1]
        ng = n_pad // g
        o = rays[0:3, :]
        d = rays[3:6, :]
        eps = 1e-12
        inv = 1.0 / jnp.where(jnp.abs(d) > eps, d,
                              jnp.where(d >= 0, eps, -eps))
        if jnp.ndim(tmax) == 0:
            tmax_r = jnp.full((n_pad, 1), tmax)
        else:
            tmax_r = jnp.reshape(tmax, (n_pad, 1))
        big = jnp.float32(3e38)
        parts = []
        for c0 in range(0, ns, 512):
            sb = sboxes[c0:c0 + 512]
            m = sb.shape[0]
            tn = jnp.full((n_pad, m), -big)
            tf = jnp.full((n_pad, m), big)
            for a in range(3):
                t0 = (sb[None, :, a] - o[a][:, None]) * inv[a][:, None]
                t1 = (sb[None, :, a + 3] - o[a][:, None]) * inv[a][:, None]
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            ok = (tn <= tf) & (tf > tmin) & (tn < tmax_r)
            parts.append(jnp.any(ok.reshape(ng, g, m), axis=1))
        return jnp.concatenate(parts, axis=1)               # [ng, ns]
    bounds = _cbin_ray_bounds(rays, tmax, g)
    parts = []
    for c0 in range(0, ns, 1024):
        sb = sboxes[c0:c0 + 1024]
        parts.append(_interval_slab(bounds, sb[None, :, 0:3],
                                    sb[None, :, 3:6], tmin))
    return jnp.concatenate(parts, axis=1)                   # [ng, ns]


def _extract_lists(okt: jnp.ndarray, ids, k: int):
    """Compact per-group id lists from a pierce mask.

    ``okt`` [ng, m] bool, ``ids`` [m] i32 ascending; returns
    (c_list [ng, k] i32 with -1 padding, valid [ng, k], cnt [ng]).
    One fused compare-reduce over [ng, m, k]; beats lax.top_k 3x here
    (k is tiny, m is padded)."""
    mi = okt.astype(jnp.int32)
    rank = jnp.cumsum(mi, axis=1) - mi
    cnt = jnp.sum(mi, axis=1)
    r_k = jnp.where(okt, rank, k).astype(jnp.int32)
    sel = r_k[:, :, None] == jnp.arange(k, dtype=jnp.int32)[None, None, :]
    c_list = jnp.max(jnp.where(sel, ids[None, :, None], -1), axis=1)
    return c_list, c_list >= 0, cnt


def _cbin_lists(rays: jnp.ndarray, sboxes: jnp.ndarray, tmin: float,
                tmax, g: int, k: int):
    """Per-group compact cluster work lists (ascending cluster ids).

    Returns ``(c_list [ng, k], valid [ng, k], inc [ng])`` where ``inc``
    marks groups whose list was truncated by a static cap (they must be
    finished by the fallback pass).

    Two modes: a flat dense test over all NS cluster AABBs, or — above
    CBIN_LVL2_MIN clusters — a two-level pass that tests CBIN_FAN-wide
    parent AABBs densely, then expands only the pierced parents' child
    boxes (a [ng, k1]-row gather): the dense term shrinks from
    O(ng * NS) to O(ng * (NS/fan + k1 * fan)), which is what keeps the
    schedule build flat-cost as scenes grow. Parent unions pad with
    EMPTY boxes (lo > hi), so padded children self-reject."""
    ns = sboxes.shape[0]
    ng = rays.shape[1] // g
    fan = CBIN_FAN
    lvl = CBIN_LVL
    # Exact grouped tests are flat by construction (the dense per-ray
    # pass IS the schedule); only an explicit TPT_CBIN_LVL=2 keeps the
    # parent/child hierarchy then.
    exact_g = g > 1 and os.environ.get("TPT_CBIN_EXACT", "1") == "1"
    two = (lvl == 2) or (lvl == 0 and not exact_g
                         and ns >= CBIN_LVL2_MIN)
    if not two:
        okt = _cbin_group_test(rays, sboxes, tmin, tmax, g)
        c_list, valid, cnt = _extract_lists(
            okt, jnp.arange(ns, dtype=jnp.int32), k)
        return c_list, valid, cnt > k
    k1 = min(CBIN_K1, max(1, (ns + fan - 1) // fan))
    ns1 = (ns + fan - 1) // fan
    big = jnp.float32(3e38)
    pad = ns1 * fan - ns
    lo_c = jnp.concatenate([sboxes[:, 0:3],
                            jnp.full((pad, 3), big)]) if pad else \
        sboxes[:, 0:3]
    hi_c = jnp.concatenate([sboxes[:, 3:6],
                            jnp.full((pad, 3), -big)]) if pad else \
        sboxes[:, 3:6]
    lo8 = lo_c.reshape(ns1, fan, 3)
    hi8 = hi_c.reshape(ns1, fan, 3)
    sb1 = jnp.concatenate([jnp.min(lo8, axis=1), jnp.max(hi8, axis=1)],
                          axis=1)                           # [ns1, 6]
    bounds = _cbin_ray_bounds(rays, tmax, g)
    parts = []
    for c0 in range(0, ns1, 1024):
        s = sb1[c0:c0 + 1024]
        parts.append(_interval_slab(bounds, s[None, :, 0:3],
                                    s[None, :, 3:6], tmin))
    okt1 = jnp.concatenate(parts, axis=1)                   # [ng, ns1]
    c1, valid1, cnt1 = _extract_lists(
        okt1, jnp.arange(ns1, dtype=jnp.int32), k1)
    c1c = jnp.maximum(c1, 0)
    # Child expansion: [ng, k1, fan] boxes via one row-gather per level.
    ch_lo = lo8[c1c].reshape(ng, k1 * fan, 3)
    ch_hi = hi8[c1c].reshape(ng, k1 * fan, 3)
    ok2 = (_interval_slab(bounds, ch_lo, ch_hi, tmin)
           & jnp.repeat(valid1, fan, axis=1))               # [ng, k1*fan]
    ids2 = (c1c[:, :, None] * fan
            + jnp.arange(fan, dtype=jnp.int32)[None, None, :]
            ).reshape(ng, k1 * fan)
    # _extract_lists wants shared ascending ids; here ids vary per group
    # but stay ascending along the axis (c1 lists ascend), so the same
    # rank trick works with a per-group gather of ids at the selected
    # ranks.
    mi = ok2.astype(jnp.int32)
    rank = jnp.cumsum(mi, axis=1) - mi
    cnt2 = jnp.sum(mi, axis=1)
    r_k = jnp.where(ok2, rank, k).astype(jnp.int32)
    sel = r_k[:, :, None] == jnp.arange(k, dtype=jnp.int32)[None, None, :]
    c_list = jnp.max(jnp.where(sel, ids2[:, :, None], -1), axis=1)
    inc = (cnt1 > k1) | (cnt2 > k)
    return c_list, c_list >= 0, inc


def cbin_pairs(rays: jnp.ndarray, sboxes: jnp.ndarray, tmin: float,
               tmax):
    """Cluster-major padded work lists for the cbin sweep.

    Returns ``(pair_rays [8, P_cap], job_cluster [J_cap, 1] i32 (-1 =
    empty job), row_tgt [P_cap // g] i32, incomplete [N] bool, (ng, g,
    k))``. Job ``j`` covers pair lanes [256j, 256j+256) — ``256 // g``
    groups of ``g`` adjacent lanes sharing one work list — and sweeps
    exactly one supercluster. ``row_tgt`` maps each g-lane result row to
    its (group * k + rank) reduce cell (``ng * k`` = dropped padding).
    ``incomplete`` marks lanes whose group overflowed a static cap; the
    caller must finish them via the tile-union path."""
    ns = sboxes.shape[0]
    n = rays.shape[1]
    rt = bf.RAY_TILE_C
    g = max(1, min(CBIN_GROUP, rt))
    while n % g or rt % g:
        g //= 2
    ng = n // g
    k = CBIN_K_OUT
    qpj = rt // g                                    # group-pairs per job
    p_cap = CBIN_PAIR_MULT * n
    j_cap = p_cap // rt

    c_list, valid, inc_lists = _cbin_lists(rays, sboxes, tmin, tmax, g, k)

    # Cluster-major order: ONE stable key/value sort of the (group, k)
    # pair ids. Stability keeps groups ascending within a cluster.
    skey = jnp.where(valid, c_list, ns).reshape(-1)
    pid = jnp.arange(ng * k, dtype=jnp.int32)
    skey_s, sval = jax.lax.sort((skey, pid), num_keys=1)

    # Per-cluster pair counts straight off the sorted keys (the k cap is
    # already applied by the list extraction, so no dense recount):
    # start_cl[c] = first sorted position of cluster c.
    bounds = jnp.searchsorted(skey_s, jnp.arange(ns + 1, dtype=jnp.int32))
    start_cl = bounds[:ns].astype(jnp.int32)
    cnt_cl = (bounds[1:] - bounds[:ns]).astype(jnp.int32)   # [ns]
    jobs = (cnt_cl + qpj - 1) // qpj
    base_job = jnp.cumsum(jobs) - jobs                      # exclusive
    total_jobs = jnp.sum(jobs)
    jtab = jnp.full((j_cap + 1,), -1, jnp.int32).at[
        jnp.where(jobs > 0, jnp.minimum(base_job, j_cap), j_cap)].set(
        jnp.arange(ns, dtype=jnp.int32), mode="drop")[:j_cap]
    jtab = jax.lax.cummax(jtab)                             # forward fill
    jtab = jnp.where(jnp.arange(j_cap) < jnp.minimum(total_jobs, j_cap),
                     jtab, -1)

    # Expand sorted group-pairs to padded job slots with job-granular
    # slice gathers (j_cap-sized) — no slot-sized gather or scatter.
    j_iota = jnp.arange(j_cap, dtype=jnp.int32)
    cjs = jnp.maximum(jtab, 0)
    q0 = (j_iota - base_job[cjs]) * qpj              # job's first pair rank
    qi = jnp.arange(qpj, dtype=jnp.int32)[None, :]
    pos = jnp.minimum(start_cl[cjs][:, None] + q0[:, None] + qi,
                      ng * k - 1)
    okq = (jtab[:, None] >= 0) & ((q0[:, None] + qi) < cnt_cl[cjs][:, None])
    pidq = sval[pos]                                        # [j_cap, qpj]
    gg = pidq // k
    kk = pidq - gg * k
    gg = jnp.where(okq, gg, ng)                             # pad sentinel
    row_tgt = jnp.where(okq, gg * k + kk, ng * k).reshape(-1)

    # Pair-ray rows: one row-gather of [g*8]-float group rows at
    # group-pair granularity; the sentinel row is PARKED rays (zeros
    # would pass every slab/plane guard — see bf.pack_rays).
    park_row = jnp.tile(jnp.asarray(
        [3.0e7, 3.0e7, 3.0e7, 0.5773503, 0.5773503, 0.5773503, 0.0, 0.0],
        rays.dtype), (g,))
    grp = jnp.concatenate([rays.T.reshape(ng, g * 8), park_row[None, :]])
    pair_rays = grp[jnp.minimum(gg, ng)].reshape(p_cap, 8).T

    # Lanes whose group overflowed the per-group k cap, or whose
    # cluster's padded segment spilled past the pair budget (this also
    # covers job-table overflow: j_cap = p_cap / 256), stay incomplete.
    bad_c = (base_job + jobs) * rt > p_cap
    inc_g = inc_lists | jnp.any(
        valid & bad_c[jnp.minimum(c_list, ns - 1)], axis=1)
    incomplete = jnp.repeat(inc_g, g)
    return pair_rays, jtab[:, None], row_tgt, incomplete, (ng, g, k)


def _bin_dma_tris(jobs_ref, tris_hbm, trisb, sems, j):
    sc_rows = bf.CLUSTER * bf.SUPER
    slot = jax.lax.rem(j, 2)
    c = jobs_ref[j, 0]
    return pltpu.make_async_copy(
        tris_hbm.at[pl.ds(c * sc_rows, sc_rows), :],
        trisb.at[pl.ds(slot * sc_rows, sc_rows), :], sems.at[slot])


def _closest_kernel_cbin(jobs_ref, rays_ref, tris_hbm, out_t, out_i,
                           trisb, sems, *, j_cap, tmin):
    """Grid = jobs. Pair-ray columns and outputs ride the automatic
    block pipeline; only the job's cluster rows are DMAed manually, one
    job ahead (scratch persists across grid steps)."""
    j = pl.program_id(0)
    sc_rows = bf.CLUSTER * bf.SUPER
    rt = rays_ref.shape[1]

    def start(jj):
        @pl.when(jobs_ref[jj, 0] >= 0)
        def _():
            _bin_dma_tris(jobs_ref, tris_hbm, trisb, sems, jj).start()

    @pl.when(j == 0)
    def _():
        start(j)
    @pl.when(j + 1 < j_cap)
    def _():
        start(j + 1)

    c = jobs_ref[j, 0]

    @pl.when(c >= 0)
    def _():
        _bin_dma_tris(jobs_ref, tris_hbm, trisb, sems, j).wait()
        slot = jax.lax.rem(j, 2)
        ray = bf._ray_rows(rays_ref)
        t, _, _, _ = bf._pe_block(ray, trisb, slot * sc_rows, sc_rows, tmin)
        blk_t = jnp.min(t, axis=0, keepdims=True)             # [1, RT]
        sub = jax.lax.broadcasted_iota(jnp.int32, (sc_rows, rt), 0)
        cnd = jnp.where(t == blk_t, sub, bf._BIG_IDX)
        blk_sub = jnp.min(cnd, axis=0, keepdims=True)
        out_t[:, :] = blk_t
        out_i[:, :] = blk_sub + c * sc_rows

    @pl.when(c < 0)
    def _():
        out_t[:, :] = jnp.full((1, rt), T_FAR, jnp.float32)
        out_i[:, :] = jnp.zeros((1, rt), jnp.int32)


@functools.partial(jax.named_call, name="pallas_closest_cbin")
def _closest_call_cbin(pair_rays, tris, jobs, tmin: float):
    """Sweep every (cluster, 256-ray batch) job; returns per-pair
    (t [1, P_cap], packed row id [1, P_cap])."""
    tris = _stream_widen(tris)
    p_cap = pair_rays.shape[1]
    j_cap = jobs.shape[0]
    sc_rows = bf.CLUSTER * bf.SUPER
    kernel = functools.partial(_closest_kernel_cbin, j_cap=j_cap,
                               tmin=tmin)
    return pl.pallas_call(
        kernel,
        grid=(j_cap,),
        in_specs=[
            pl.BlockSpec((j_cap, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bf.RAY_TILE_C), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # tris (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, bf.RAY_TILE_C), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf.RAY_TILE_C), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, p_cap), jnp.float32),
                   jax.ShapeDtypeStruct((1, p_cap), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((2 * sc_rows, 128), jnp.float32),      # tri slots
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * p_cap * sc_rows, bytes_accessed=p_cap * 48,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=bf.VMEM_LIMIT),
        interpret=bf._interpret(),
    )(jobs, pair_rays, tris)


def _cbin_reduce(res_t, res_i, row_tgt, n: int, ng: int, g: int, k: int):
    """Per-ray lexicographic (t, id) min over the per-pair results.

    A group-pair's g lanes are adjacent in the slot layout, so the
    per-pair results scatter as [g]-wide ROWS into the (group * k +
    rank) cell of a [ng*k, g] buffer — unique row targets (each (group,
    rank) pair occupies exactly one job slot range), so the reduction is
    order-independent, deterministic, and the scatter is ~P_cap/g row
    updates instead of P_cap element updates. Folding the k axis then
    gives each lane's best (t, id). Ties on t pick the smallest packed
    row id (within a cluster the kernels already do; across clusters
    near-first visit order is replaced by the id order, which only
    differs on exact shared-edge t ties between clusters)."""
    rr_t = res_t.reshape(-1, g)
    rr_i = res_i.reshape(-1, g)
    tt = jnp.full((ng * k + 1, g), T_FAR, jnp.float32).at[
        row_tgt].set(rr_t, mode="drop")[:ng * k].reshape(ng, k, g)
    ii = jnp.full((ng * k + 1, g), bf._BIG_IDX, jnp.int32).at[
        row_tgt].set(rr_i, mode="drop")[:ng * k].reshape(ng, k, g)
    bt = jnp.min(tt, axis=1)                                # [ng, g]
    bi = jnp.min(jnp.where(tt == bt[:, None, :], ii, bf._BIG_IDX), axis=1)
    bt = bt.reshape(n)
    bi = bi.reshape(n)
    return bt[None, :], jnp.where(bt < T_FAR, bi, 0)[None, :]


def _occluded_kernel_cbin(jobs_ref, rays_ref, tris_hbm, out_o,
                          trisb, sems, *, j_cap, tmin):
    """Any-hit twin of ``_closest_kernel_cbin``: each job ORs "blocking
    hit in (tmin, tmax)" over its single supercluster for 256 pair
    lanes; per-lane tmax rides ray row 6, refractive hits pass light."""
    j = pl.program_id(0)
    sc_rows = bf.CLUSTER * bf.SUPER
    rt = rays_ref.shape[1]

    def start(jj):
        @pl.when(jobs_ref[jj, 0] >= 0)
        def _():
            _bin_dma_tris(jobs_ref, tris_hbm, trisb, sems, jj).start()

    @pl.when(j == 0)
    def _():
        start(j)
    @pl.when(j + 1 < j_cap)
    def _():
        start(j + 1)

    c = jobs_ref[j, 0]

    @pl.when(c >= 0)
    def _():
        _bin_dma_tris(jobs_ref, tris_hbm, trisb, sems, j).wait()
        slot = jax.lax.rem(j, 2)
        ray = bf._ray_rows(rays_ref)
        t, refr, _, _ = bf._pe_block(ray, trisb, slot * sc_rows, sc_rows,
                                  tmin)
        blocking = (t < rays_ref[6:7, :]) & (refr < 0.5)
        out_o[:, :] = jnp.max(jnp.where(blocking, 1, 0), axis=0,
                              keepdims=True)

    @pl.when(c < 0)
    def _():
        out_o[:, :] = jnp.zeros((1, rt), jnp.int32)


@functools.partial(jax.named_call, name="pallas_occluded_cbin")
def _occluded_call_cbin(pair_rays, tris, jobs, tmin: float):
    """Sweep every (cluster, 256-ray batch) occlusion job; returns
    per-pair blocked flags [1, P_cap] i32."""
    tris = _stream_widen(tris)
    p_cap = pair_rays.shape[1]
    j_cap = jobs.shape[0]
    sc_rows = bf.CLUSTER * bf.SUPER
    kernel = functools.partial(_occluded_kernel_cbin, j_cap=j_cap,
                               tmin=tmin)
    return pl.pallas_call(
        kernel,
        grid=(j_cap,),
        in_specs=[
            pl.BlockSpec((j_cap, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bf.RAY_TILE_C), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # tris (HBM)
        ],
        out_specs=pl.BlockSpec((1, bf.RAY_TILE_C), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, p_cap), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2 * sc_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=34 * p_cap * sc_rows, bytes_accessed=p_cap * 48,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=bf.VMEM_LIMIT),
        interpret=bf._interpret(),
    )(jobs, pair_rays, tris)


def _cbin_reduce_occ(res_o, row_tgt, n: int, ng: int, g: int, k: int):
    """Per-lane OR over the per-pair blocked flags (row-scatter like
    ``_cbin_reduce``, max-folded over the k axis)."""
    rr = res_o.reshape(-1, g)
    oo = jnp.zeros((ng * k + 1, g), jnp.int32).at[
        row_tgt].set(rr, mode="drop")[:ng * k].reshape(ng, k, g)
    return jnp.max(oo, axis=1).reshape(n) > 0


def _park_rays(rays: jnp.ndarray, park: jnp.ndarray) -> jnp.ndarray:
    """Replace rays where ``park`` [N] with the PARKED constants (same
    values ``bf.pack_rays`` pads with): every box/triangle test fails, so
    parked lanes contribute empty work lists."""
    fill = jnp.concatenate([jnp.full((3, 1), 3.0e7, jnp.float32),
                            jnp.full((3, 1), 0.5773503, jnp.float32),
                            jnp.zeros((rays.shape[0] - 6, 1),
                                      jnp.float32)], axis=0)
    return jnp.where(park[None, :], fill, rays)


# ---------------------------------------------------------------------------
# Pair-binned big-scene path.
#
# The clustered path above is tile-synchronized: a 512-ray tile sweeps the
# UNION of its rays' candidate superclusters. Measured on the 100k-tri
# scene, bounce-ray tiles sweep ~158 of 200 superclusters while each ray
# pierces only ~8 — no sort key closes that gap (dir12 158, candidate-pair
# key 149), because 512 bounce rays' candidate sets are genuinely
# disjoint. This path decouples scheduling from ray order entirely: every
# (ray, pierced-supercluster) PAIR becomes one unit of work. Pairs are
# sorted by supercluster, each supercluster's run padded to whole
# PAIR_TILE tiles, so a kernel tile is 512 pairs sharing ONE supercluster
# — fetched by scalar-prefetch block indexing — and sweeps exactly its
# 512 triangles. Work scales with Σ per-ray pierced counts, not with
# per-tile unions; all data movement is multi-operand ``lax.sort``s
# (~21 ms per 3.25M-row 8-operand sort on-chip; arbitrary gathers of
# the same data run at ~0.4 GB/s and are avoided everywhere).
#
# Measured (v5p chip, 100k-tri scene, 262k rays): binned closest 122 ms
# vs tiled 440 ms on surface-origin random-direction wavefronts, binned
# occlusion 121 ms vs tiled 235 ms on shadow rays (58% of which pierce
# more than PAIR_K superclusters — the any-hit short-circuit keeps the
# completion pass off the ones already occluded). But the real
# renderer's regenerated wavefronts are camera-coherent, where the
# tiled path drops well under the binned path's ~100 ms fixed
# schedule+reduce cost (whole-frame A/B: tiled 1.64 vs binned 0.63
# Mrays/s). Hence OPT-IN via TPT_BINNED; it is the right path for
# externally-supplied incoherent ray batches, not for camera rendering.
# ---------------------------------------------------------------------------
PAIR_TILE = 512
PAIR_K = int(os.environ.get("TPT_PAIR_K", 12))


def _sb_rows() -> int:
    """Triangles per supercluster/kernel tile. Read at call time so it
    tracks bf.CLUSTER/bf.SUPER overrides (tests shrink them)."""
    return bf.CLUSTER * bf.SUPER


def _pack_tris_binned(scene: SceneArrays):
    """Cluster-ordered rows + a trailing all-zero sentinel supercluster
    (invalid-pair tiles and list padding point at it; zero rows never
    hit). Returns (tris_b [(NS+1)*sb_rows, 16], sboxes [NS, 8])."""
    tris, _, sboxes = bf.pack_tris_clustered(scene)
    return jnp.pad(tris, ((0, _sb_rows()), (0, 0))), sboxes


def _pair_schedule(rays, sboxes, k: int, tmin: float, tmax):
    """Build the padded, supercluster-major pair schedule — sorts only.

    For each ray, the k nearest (by slab-entry tnear) pierced
    superclusters become pairs; rays piercing more than k report
    overflow (the caller must complete them another way — nearest-k is
    not sufficient for a correct closest hit). Pairs end up sorted by
    supercluster id with each id's run padded to PAIR_TILE multiples,
    so every kernel tile serves a single supercluster; invalid pairs
    and surplus padding sink to a dead tail the kernel skips.

    EVERY data movement here is a ``lax.sort`` with payload rows:
    measured on-chip, arbitrary-index gathers/scatters of pair-sized
    arrays run at ~0.4 GB/s effective (30+ ms each at 3M pairs) while
    multi-operand sorts of the same data take ~0.15 ms. The padding is
    therefore built by merging filler entries and double-sorting:

      1. entries = real pairs (sid, filler=0) ++ PAIR_TILE fillers per
         supercluster (sid, filler=1); sort by (sid, filler, order).
      2. In sorted order, per-run prefix ops (segmented cummax) find
         each run's real-pair count -> kept fillers = just enough to
         round the run up to PAIR_TILE; sort again by
         (kept ? sid * 2^22 + rank : DROP).

    Returns (pair_rays [8, E_buf], idx_buf [E_buf] i32 — original pair
    index, E_buf sentinel on fillers, tile_sid [n_tiles] i32 — block
    row of each tile's supercluster, NS = dead tile, next_tn [N] — the
    smallest slab-entry t among UNVISITED pierced superclusters (+big
    if none; a hit at t <= next_tn is provably the global closest),
    overflow [N]).
    """
    ns = sboxes.shape[0]
    n_pad = rays.shape[1]
    big = jnp.float32(3e38)
    o = rays[0:3, :]
    d = rays[3:6, :]
    eps = 1e-12
    inv = 1.0 / jnp.where(jnp.abs(d) > eps, d,
                          jnp.where(d >= 0, eps, -eps))
    tn = jnp.full((n_pad, ns), -big)
    tf = jnp.full((n_pad, ns), big)
    for a in range(3):
        t0 = (sboxes[None, :, a] - o[a][:, None]) * inv[a][:, None]
        t1 = (sboxes[None, :, a + 3] - o[a][:, None]) * inv[a][:, None]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    if jnp.ndim(tmax) == 0:
        tmax_r = jnp.full((n_pad, 1), tmax)
    else:
        tmax_r = jnp.reshape(tmax, (n_pad, 1))
    ok = (tn <= tf) & (tf > tmin) & (tn < tmax_r)             # [N, NS]
    keyt = jnp.where(ok, tn, big)
    # Sort keys AND ids together (payload sort): argsort + take_along_axis
    # would gather [N, k] elements at ~0.4 GB/s (30+ ms); this is ~0.1 ms.
    iota_ns = jnp.broadcast_to(
        jnp.arange(ns, dtype=jnp.int32)[None, :], keyt.shape)
    keys_sorted, sids_all = jax.lax.sort(
        (keyt, iota_ns), num_keys=1, dimension=1)
    sids = sids_all[:, :k]                                    # near-first
    valid = keys_sorted[:, :k] < big
    next_tn = keys_sorted[:, k] if k < ns else jnp.full((n_pad,), big)
    overflow = jnp.sum(ok, axis=1, dtype=jnp.int32) > k

    e = n_pad * k
    fillers = ns * PAIR_TILE
    e_buf = e + fillers
    assert e_buf < (1 << 22), "pair buffer exceeds the packed-key range"
    drop = jnp.int32(ns)                   # sort-1 key for invalid pairs

    sid_r = jnp.where(valid, sids, drop).reshape(e)
    sid_f = (jnp.arange(fillers, dtype=jnp.int32) // PAIR_TILE)
    # One packed key: (sid, is_filler) in the high bits, position as the
    # tiebreak below — a second key operand would grow the payload sort,
    # which dominates the schedule's cost.
    key1 = (jnp.concatenate([2 * sid_r, 2 * sid_f + 1]) << 22) | \
        jnp.arange(e_buf, dtype=jnp.int32)
    import numpy as _np
    park = _np.zeros((8, 1), _np.float32)
    park[0:3, 0] = 3.0e7
    park[3:6, 0] = 0.5773503
    nrows = 7 if jnp.ndim(tmax) else 6     # occlusion also carries tmax
    rows = [jnp.concatenate(
        [jnp.broadcast_to(rays[r][:, None], (n_pad, k)).reshape(e),
         jnp.full((fillers,), float(park[r, 0]))]) for r in range(nrows)]
    idx = jnp.concatenate(
        [jnp.arange(e, dtype=jnp.int32),
         jnp.full((fillers,), e_buf, jnp.int32)])

    k1, idx1, *rows1 = jax.lax.sort((key1, idx) + tuple(rows), num_keys=1)

    # Per-run prefix machinery (all dense VPU ops).
    sid1 = (k1 >> 22) // 2
    isf1 = ((k1 >> 22) & 1) == 1
    pos = jnp.arange(e_buf, dtype=jnp.int32)
    new = jnp.concatenate(
        [jnp.ones((1,), bool), sid1[1:] != sid1[:-1]])
    rstart = jax.lax.cummax(jnp.where(new, pos, -1))
    rank = pos - rstart
    # First filler of a run sits at rank == (number of real pairs).
    first_f = isf1 & (new | ~jnp.concatenate(
        [jnp.zeros((1,), bool), isf1[:-1]]))
    seg = jnp.int32(1) << 22               # rank < 2^22 at <=4M pairs
    cnt_prop = jax.lax.cummax(
        sid1 * seg + jnp.where(first_f, rank + 1, 0))
    count = cnt_prop - sid1 * seg - 1      # valid at filler positions
    pcount = -(-count // PAIR_TILE) * PAIR_TILE
    keep = jnp.where(isf1, rank < pcount, sid1 < ns)
    key2 = jnp.where(keep, sid1 * seg + rank, jnp.int32(2) << 29)

    k2, idx_buf, *rows2 = jax.lax.sort(
        (key2, idx1) + tuple(rows1), num_keys=1)
    pair_rays = jnp.stack(rows2, axis=0)
    tile_sid = jnp.minimum(k2[::PAIR_TILE] >> 22, ns)
    return pair_rays, tile_sid, idx_buf, next_tn, overflow


def _binned_closest_kernel(sid_ref, rays_ref, tris_ref, out_ref, i_ref, *,
                           ns, sb, tmin, want_uv):
    rt = rays_ref.shape[1]
    live = sid_ref[pl.program_id(0)] < ns

    @pl.when(live)
    def _():
        best = bf._closest_sweep(bf._ray_rows(rays_ref), tris_ref, rt, 1, tmin,
                              T_FAR, tb=sb, want_uv=want_uv,
                              orig_id=True)
        bf._write_closest(out_ref, i_ref, best, rt)

    @pl.when(jnp.logical_not(live))
    def _():
        # Dead tail (dropped pairs / surplus fillers): miss defaults so
        # the unsort can consume every column deterministically.
        out_ref[0:1, :] = jnp.full((1, rt), T_FAR, jnp.float32)
        out_ref[1:8, :] = jnp.zeros((7, rt), jnp.float32)
        i_ref[:, :] = jnp.zeros((1, rt), jnp.int32)


@functools.partial(jax.named_call, name="pallas_closest_binned")
def _closest_call_binned(pair_rays, tile_sid, tris_b, tmin: float,
                         want_uv: bool):
    e_pad = pair_rays.shape[1]
    grid = (e_pad // PAIR_TILE,)
    sb = _sb_rows()
    ns = tris_b.shape[0] // sb - 1
    kernel = functools.partial(_binned_closest_kernel, ns=ns, sb=sb,
                               tmin=tmin, want_uv=want_uv)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, PAIR_TILE), lambda i, sid: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb, 16), lambda i, sid: (sid[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, PAIR_TILE), lambda i, sid: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PAIR_TILE), lambda i, sid: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, e_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, e_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=bf.VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=34 * e_pad * sb, bytes_accessed=e_pad * 48,
            transcendentals=0),
        interpret=bf._interpret(),
    )(tile_sid, pair_rays, tris_b)


def _reduce_pairs(out, idx, idx_buf, n_pad: int, k: int,
                  want_uv: bool = True):
    """Per-pair kernel outputs -> per-ray best rows.

    One payload sort by original pair index restores pair order (filler
    columns carry the E_buf sentinel and sink past the first N*k
    entries); the [N, k] min-reduce then selects per-ray bests with
    dense masked sums — no gathers anywhere (see ``_pair_schedule``).
    Carries only the consumed rows (t, normal, mat [, uv]) — the sort is
    the reduce's whole cost, so every skipped operand is ~9% off it."""
    e = n_pad * k
    nrows = 7 if want_uv else 5            # t,nx,ny,nz,mat[,u,v]
    _, t_s, tri_s, *aux = jax.lax.sort(
        (idx_buf, out[0], idx[0]) + tuple(out[r] for r in range(1, nrows)),
        num_keys=1)
    t = t_s[:e].reshape(n_pad, k)
    best_t = jnp.min(t, axis=1, keepdims=True)                # [N, 1]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (n_pad, k), 1)
    kbest = jnp.min(jnp.where(t == best_t, iota_k, k), axis=1,
                    keepdims=True)
    sel = (iota_k == kbest).astype(jnp.float32)

    def pick(a):
        return jnp.sum(a[:e].reshape(n_pad, k) * sel, axis=1)

    rows = [best_t[:, 0]] + [pick(a) for a in aux]
    if not want_uv:
        rows += [jnp.zeros((n_pad,)), jnp.zeros((n_pad,))]
    return rows, pick(tri_s.astype(jnp.float32)).astype(jnp.int32)


def _binned_occluded_kernel(sid_ref, rays_ref, tris_ref, occ_ref, *, ns,
                            sb, tmin):
    rt = rays_ref.shape[1]
    live = sid_ref[pl.program_id(0)] < ns

    @pl.when(live)
    def _():
        tmax_r = rays_ref[6:7, :]
        occ = bf._occlusion_sweep(bf._ray_rows(rays_ref), tris_ref, tmax_r, rt,
                               1, tmin, tb=sb)
        occ_ref[:, :] = (occ > 0.0).astype(jnp.int32)

    @pl.when(jnp.logical_not(live))
    def _():
        occ_ref[:, :] = jnp.zeros((1, rt), jnp.int32)


@functools.partial(jax.named_call, name="pallas_occluded_binned")
def _occluded_call_binned(pair_rays, tile_sid, tris_b, tmin: float):
    e_pad = pair_rays.shape[1]
    grid = (e_pad // PAIR_TILE,)
    sb = _sb_rows()
    ns = tris_b.shape[0] // sb - 1
    kernel = functools.partial(_binned_occluded_kernel, ns=ns, sb=sb,
                               tmin=tmin)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, PAIR_TILE), lambda i, sid: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb, 16), lambda i, sid: (sid[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PAIR_TILE), lambda i, sid: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, e_pad), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=bf.VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=34 * e_pad * sb, bytes_accessed=e_pad * 48,
            transcendentals=0),
        interpret=bf._interpret(),
    )(tile_sid, pair_rays, tris_b)


def intersect_occluded_binned(scene: SceneArrays, origins: V3, dirs: V3,
                              tmax: jnp.ndarray, tmin: float = 0.01,
                              k: int = None) -> jnp.ndarray:
    """Pair-binned any-hit occlusion (see the section comment above)."""
    origins = as_v3(origins)
    dirs = as_v3(dirs)
    if k is None:
        k = PAIR_K
    n = origins.x.shape[0]
    n_pad = bf._pad_to(n, bf.RAY_TILE)
    rays = bf.pack_rays(origins, dirs, tmax, n_pad)
    tris_b, sboxes = _pack_tris_binned(scene)
    k = min(k, sboxes.shape[0])
    pair_rays, tile_sid, idx_buf, _, overflow = _pair_schedule(
        rays, sboxes, k, tmin, rays[6])
    occ = _occluded_call_binned(pair_rays, tile_sid, tris_b, tmin)
    e = n_pad * k
    _, occ_s = jax.lax.sort((idx_buf, occ[0]), num_keys=1)
    occ_r = jnp.any(occ_s[:e].reshape(n_pad, k) > 0, axis=1)[:n]

    # Any-hit short-circuit: an overflow ray already occluded by one of
    # its nearest-k superclusters needs no completion pass.
    ovf = overflow[:n] & ~occ_r
    park_o = V3(jnp.where(ovf, origins.x, 3.0e7),
                jnp.where(ovf, origins.y, 3.0e7),
                jnp.where(ovf, origins.z, 3.0e7))
    park_d = V3(jnp.where(ovf, dirs.x, 0.5773503),
                jnp.where(ovf, dirs.y, 0.5773503),
                jnp.where(ovf, dirs.z, 0.5773503))
    fb = bf._intersect_occluded_tiled(scene, park_o, park_d,
                                   jnp.where(ovf, tmax, 0.0), tmin)
    return jnp.where(ovf, fb, occ_r)


def intersect_closest_binned(scene: SceneArrays, origins: V3, dirs: V3,
                             tmin: float = 0.01, tmax: float = T_FAR,
                             want_uv: bool = True, k: int = None) -> Hit:
    """Pair-binned closest hit (see the section comment above).

    Rays whose pierced-supercluster count exceeds k are completed by the
    clustered path (others parked), keeping nearest-k truncation exact."""
    origins = as_v3(origins)
    dirs = as_v3(dirs)
    if k is None:
        k = PAIR_K
    n = origins.x.shape[0]
    n_pad = bf._pad_to(n, bf.RAY_TILE)
    rays = bf.pack_rays(origins, dirs, None, n_pad)
    tris_b, sboxes = _pack_tris_binned(scene)
    k = min(k, sboxes.shape[0])
    pair_rays, tile_sid, idx_buf, next_tn, overflow = _pair_schedule(
        rays, sboxes, k, tmin, tmax)
    out, idx = _closest_call_binned(pair_rays, tile_sid, tris_b, tmin,
                                    want_uv)
    rows, tri = _reduce_pairs(out, idx, idx_buf, n_pad, k, want_uv)
    if jnp.ndim(tmax) == 0 and tmax < T_FAR:
        rows[0] = jnp.where(rows[0] < tmax, rows[0], jnp.float32(T_FAR))

    # Overflow completion: the same wavefront through the clustered
    # path, exact lanes parked (their tiles' candidate lists are
    # empty, so the pass costs ~nothing when no ray overflows).
    # Near-first early exit: superclusters were taken in tnear order,
    # so a best hit at t <= next_tn (the nearest UNVISITED entry t)
    # cannot be beaten by any unvisited supercluster — only overflow
    # rays failing that test need the pass (~0 for primary/bounce hits).
    ovf = overflow[:n] & (rows[0][:n] > next_tn[:n])
    park_o = V3(jnp.where(ovf, origins.x, 3.0e7),
                jnp.where(ovf, origins.y, 3.0e7),
                jnp.where(ovf, origins.z, 3.0e7))
    park_d = V3(jnp.where(ovf, dirs.x, 0.5773503),
                jnp.where(ovf, dirs.y, 0.5773503),
                jnp.where(ovf, dirs.z, 0.5773503))
    fb = bf._intersect_closest_tiled(scene, park_o, park_d, tmin, tmax,
                                  want_uv)

    tv = rows[0][:n]
    bt = jnp.where(ovf, fb.t, tv)
    sel = lambda a, b: jnp.where(ovf, a, b)     # noqa: E731
    return Hit(
        t=bt,
        tri=sel(fb.tri, tri[:n]),
        hit=bt < T_FAR,
        normal=V3(sel(fb.normal.x, rows[1][:n]),
                  sel(fb.normal.y, rows[2][:n]),
                  sel(fb.normal.z, rows[3][:n])),
        mat=sel(fb.mat, rows[4][:n].astype(jnp.int32)),
        u=sel(fb.u, rows[5][:n]),
        v=sel(fb.v, rows[6][:n]),
    )




# ---------------------------------------------------------------------------
# (moved from pallas_bf in round 4 — retired family, see the ladder rows)
# ---------------------------------------------------------------------------
# Transposed-group ("grp") clustered kernels: 8 rays per candidate list.
#
# The tiled kernels above sweep the UNION of a 256-ray tile's candidate
# superclusters; the frame-realistic sim (tools/sim_groups.py, dir12 sort
# + chained priors, 100k-tri scene) measures the dense sweep ELEMENTS
# that granularity costs:
#     list per 256 rays   1.00      list per  32 rays   0.21
#     list per 128 rays   0.59      list per   8 rays   0.086
# — a 256-ray tile of sorted bounce rays needs ~12x the sweep work its
# individual 8-ray rows do, and the frame is ~71% dense sweeps
# (profile_frame). The catch at 8-ray granularity is layout: rays live
# in LANES, so a per-8-ray sweep would use 8/256 of each vector op.
# These kernels TRANSPOSE both sides: rays arrive [N, 8] (8 rays per
# SUBLANE row, components in lanes... no — components as columns), and
# triangles arrive "grouped" [NC * 16, bf.CLUSTER] (one attribute row per
# sublane, the cluster's triangles in lanes). A candidate step is then
# [8 rays x bf.CLUSTER tris] of full-lane VPU work: ray components slice as
# [8, 1] columns, tri attributes as [1, bf.CLUSTER] rows, and the same
# plane+edge algebra broadcasts to [8, bf.CLUSTER] — the exact transpose of
# ``_pe_block``. Each 8-ray group walks ONLY ITS OWN near-first
# candidate list (``super_candidates`` at rt=8), carrying the lean
# (t, global packed id) pair as [8, 1] registers.
#
# MEASURED DEAD END (kept as ablation, default off): 1.43 vs 5.05
# Mrays/s on the 100k-tri frame despite the 8.6% element count. Each
# candidate step is a ~40-op chain of single-native-tile [8, 128] ops
# with a loop-carried dependency — latency-bound, no pipelining — while
# the big tiled ops already run the VPU at ~f32 peak. Fine-grained
# lists only pay inside dense pipelined sweep shapes (cbin pair jobs);
# see the ARCHITECTURE.md ladder row.
# ---------------------------------------------------------------------------
GRP_RT = int(os.environ.get("TPT_GRP_RT", 256))   # rays per grid program


def pack_tris_grouped(tris: jnp.ndarray) -> jnp.ndarray:
    """[R, 16] packed tris -> [R // bf.CLUSTER * 16, bf.CLUSTER] transposed
    per-cluster blocks: row ``c * 16 + a`` holds attribute ``a`` of
    cluster ``c``'s triangles across lanes."""
    nc = tris.shape[0] // bf.CLUSTER
    return tris.reshape(nc, bf.CLUSTER, 16).transpose(0, 2, 1).reshape(
        nc * 16, bf.CLUSTER)


def _grp_rows(blk):
    """Attribute rows of one [16, bf.CLUSTER] transposed cluster block."""
    return tuple(blk[a:a + 1, :] for a in range(14))


def _grp_t(ray, blk, tmin):
    """Plane + edge test, transposed: ray comps [8, 1], tri attrs
    [1, bf.CLUSTER] -> (t [8, bf.CLUSTER] with bf.T_FAR on miss, refr [1, bf.CLUSTER]).
    Same guard-free algebra as ``_pe_block`` (degenerates self-reject
    through the exploding reciprocal)."""
    ox, oy, oz, dx, dy, dz = ray
    (nx, ny, nz, d0, wux, wuy, wuz, cu,
     wvx, wvy, wvz, cv, _, refr) = _grp_rows(blk)
    ndotd = nx * dx + ny * dy + nz * dz
    if bf._interpret():
        rcp = 1.0 / ndotd
    else:
        rcp = pl.reciprocal(ndotd, approx=True)
        rcp = rcp * (2.0 - ndotd * rcp)
    t = (d0 - (nx * ox + ny * oy + nz * oz)) * rcp
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    u = wux * px + wuy * py + wuz * pz + cu
    v = wvx * px + wvy * py + wvz * pz + cv
    hit = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > tmin)
    return jnp.where(hit, t, jnp.float32(bf.T_FAR)), refr


def _grp_closest(ray, tris_g_ref, cand_ref, cbase, n_sc, tmin, init,
                 lean_base):
    """One 8-ray group's lean closest sweep over its own candidate
    list (near-first; ids stay global via ``lean_base``)."""
    ncand = jnp.clip(cand_ref[cbase, 0], 0, n_sc)

    def step(k, carry):
        best_t, best_i = carry
        sb = cand_ref[cbase + 1 + k, 0]
        for j in range(bf.SUPER):
            c = sb * bf.SUPER + j
            blk = tris_g_ref[pl.ds(c * 16, 16), :]
            t, _ = _grp_t(ray, blk, tmin)
            blk_t = jnp.min(t, axis=1, keepdims=True)          # [8, 1]
            lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            cnd = jnp.where(t == blk_t, lane, bf._BIG_IDX)
            blk_l = jnp.min(cnd, axis=1, keepdims=True)
            blk_i = (blk_l + (c * bf.CLUSTER + lean_base)).astype(
                jnp.float32)
            better = blk_t < best_t
            best_t = jnp.where(better, blk_t, best_t)
            best_i = jnp.where(better, blk_i, best_i)
        return best_t, best_i

    return jax.lax.fori_loop(0, ncand, step, init)


def _grp_occluded(ray, tmax, tris_g_ref, cand_ref, cbase, n_sc, tmin):
    """One 8-ray group's any-hit sweep (refractive tris pass light)."""
    ncand = jnp.clip(cand_ref[cbase, 0], 0, n_sc)

    def step(k, occ):
        sb = cand_ref[cbase + 1 + k, 0]
        for j in range(bf.SUPER):
            c = sb * bf.SUPER + j
            blk = tris_g_ref[pl.ds(c * 16, 16), :]
            t, refr = _grp_t(ray, blk, tmin)
            blocking = (t < tmax) & (refr < 0.5)
            occ = jnp.maximum(occ, jnp.max(
                jnp.where(blocking, 1.0, 0.0), axis=1, keepdims=True))
        return occ

    return jax.lax.fori_loop(0, ncand, step,
                             jnp.zeros((tmax.shape[0], 1), jnp.float32))


# Bundled-lockstep variant (TPT_GRP=2): the serial grp kernel walks one
# group's candidate fori_loop to completion before the next — a ~40-op
# dependency chain of single-tile [8, 128] ops with a DYNAMIC trip
# count, which Mosaic can neither unroll nor overlap (the measured 13x
# per-element cost of the 1.43 Mrays/s dead end). Here GRP_BUNDLE
# groups advance their lists in LOCKSTEP inside ONE fori_loop running
# to the bundle's max list length: each iteration issues GRP_BUNDLE
# independent intersection DAGs (groups only meet at their own [8, 1]
# min-carries), so the VPU has bundle-many chains to interleave.
# Price (tools/sim_groups cache, dir12 order, 100k frame): lockstep
# runs 8-group bundles 2.95x the exact g=8 entries — still 0.25x the
# 256-tile union elements the production path sweeps.
GRP_BUNDLE = 8


def _grp_bundle_closest(rays_t_ref, tris_g_ref, cand_ref, out_ref, i_ref,
                        b0, nb, ns1, n_sc, tmin, base, prior=None):
    """One bundle (groups b0..b0+nb-1) in candidate lockstep."""
    rows = []
    for g in range(b0, b0 + nb):
        lo = g * 8
        ray = tuple(rays_t_ref[lo:lo + 8, k:k + 1] for k in range(6))
        if prior is None:
            init = (jnp.full((8, 1), bf.T_FAR, jnp.float32),
                    jnp.zeros((8, 1), jnp.float32))
        else:
            pout_ref, pidx_ref = prior
            init = (pout_ref[lo:lo + 8, 0:1],
                    pidx_ref[lo:lo + 8, 0:1].astype(jnp.float32))
        nc = jnp.clip(cand_ref[g * ns1, 0], 0, n_sc)
        rows.append((ray, g * ns1, nc, init))
    kmax = rows[0][2]
    for _, _, nc, _ in rows[1:]:
        kmax = jnp.maximum(kmax, nc)

    def step(k, carry):
        out = []
        for (ray, cbase, nc, _), (best_t, best_i) in zip(rows, carry):
            live = k < nc
            sb = cand_ref[cbase + 1 + k, 0]
            for j in range(bf.SUPER):
                c = sb * bf.SUPER + j
                blk = tris_g_ref[pl.ds(c * 16, 16), :]
                t, _ = _grp_t(ray, blk, tmin)
                blk_t = jnp.min(t, axis=1, keepdims=True)      # [8, 1]
                lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
                cnd = jnp.where(t == blk_t, lane, bf._BIG_IDX)
                blk_l = jnp.min(cnd, axis=1, keepdims=True)
                blk_i = (blk_l + (c * bf.CLUSTER + base)).astype(jnp.float32)
                better = live & (blk_t < best_t)
                best_t = jnp.where(better, blk_t, best_t)
                best_i = jnp.where(better, blk_i, best_i)
            out.append((best_t, best_i))
        return tuple(out)

    carry = jax.lax.fori_loop(0, kmax, step,
                              tuple(init for _, _, _, init in rows))
    for (g, (best_t, best_i)) in zip(range(b0, b0 + nb), carry):
        lo = g * 8
        out_ref[lo:lo + 8, 0:1] = best_t
        i_ref[lo:lo + 8, 0:1] = jnp.where(
            best_t < bf.T_FAR, best_i.astype(jnp.int32), 0)


def _closest_kernel_grp_bundled(rays_t_ref, tris_g_ref, cand_ref, out_ref,
                                i_ref, *, n_tri, tmin, ns1, base=0):
    n_sc = n_tri // (bf.CLUSTER * bf.SUPER)
    n_grp = rays_t_ref.shape[0] // 8
    for b0 in range(0, n_grp, GRP_BUNDLE):
        _grp_bundle_closest(rays_t_ref, tris_g_ref, cand_ref, out_ref,
                            i_ref, b0, min(GRP_BUNDLE, n_grp - b0), ns1,
                            n_sc, tmin, base)


def _closest_kernel_grp_bundled_chained(rays_t_ref, tris_g_ref, cand_ref,
                                        pout_ref, pidx_ref, out_ref,
                                        i_ref, *, n_tri, tmin, ns1,
                                        base=0):
    n_sc = n_tri // (bf.CLUSTER * bf.SUPER)
    n_grp = rays_t_ref.shape[0] // 8
    for b0 in range(0, n_grp, GRP_BUNDLE):
        _grp_bundle_closest(rays_t_ref, tris_g_ref, cand_ref, out_ref,
                            i_ref, b0, min(GRP_BUNDLE, n_grp - b0), ns1,
                            n_sc, tmin, base, prior=(pout_ref, pidx_ref))


def _occluded_kernel_grp_bundled(rays_t_ref, tris_g_ref, cand_ref,
                                 occ_ref, *, n_tri, tmin, ns1):
    n_sc = n_tri // (bf.CLUSTER * bf.SUPER)
    n_grp = rays_t_ref.shape[0] // 8
    for b0 in range(0, n_grp, GRP_BUNDLE):
        nb = min(GRP_BUNDLE, n_grp - b0)
        rows = []
        for g in range(b0, b0 + nb):
            lo = g * 8
            ray = tuple(rays_t_ref[lo:lo + 8, k:k + 1] for k in range(6))
            tmax = rays_t_ref[lo:lo + 8, 6:7]
            nc = jnp.clip(cand_ref[g * ns1, 0], 0, n_sc)
            rows.append((ray, tmax, g * ns1, nc))
        kmax = rows[0][3]
        for _, _, _, nc in rows[1:]:
            kmax = jnp.maximum(kmax, nc)

        def step(k, carry):
            out = []
            for (ray, tmax, cbase, nc), occ in zip(rows, carry):
                live = k < nc
                sb = cand_ref[cbase + 1 + k, 0]
                for j in range(bf.SUPER):
                    c = sb * bf.SUPER + j
                    blk = tris_g_ref[pl.ds(c * 16, 16), :]
                    t, refr = _grp_t(ray, blk, tmin)
                    blocking = (t < tmax) & (refr < 0.5)
                    hit = jnp.max(jnp.where(blocking, 1.0, 0.0), axis=1,
                                  keepdims=True)
                    occ = jnp.where(live, jnp.maximum(occ, hit), occ)
                out.append(occ)
            return tuple(out)

        carry = jax.lax.fori_loop(
            0, kmax, step,
            tuple(jnp.zeros((8, 1), jnp.float32) for _ in rows))
        for g, occ in zip(range(b0, b0 + nb), carry):
            lo = g * 8
            occ_ref[lo:lo + 8, 0:1] = (occ > 0.0).astype(jnp.int32)


def _grp_bundled() -> bool:
    return os.environ.get("TPT_GRP", "0") == "2"


def _closest_kernel_grp(rays_t_ref, tris_g_ref, cand_ref, out_ref, i_ref,
                        *, n_tri, tmin, ns1, base=0):
    n_sc = n_tri // (bf.CLUSTER * bf.SUPER)
    for g in range(rays_t_ref.shape[0] // 8):
        lo = g * 8
        ray = tuple(rays_t_ref[lo:lo + 8, k:k + 1] for k in range(6))
        init = (jnp.full((8, 1), bf.T_FAR, jnp.float32),
                jnp.zeros((8, 1), jnp.float32))
        best_t, best_i = _grp_closest(ray, tris_g_ref, cand_ref, g * ns1,
                                      n_sc, tmin, init, base)
        out_ref[lo:lo + 8, 0:1] = best_t
        i_ref[lo:lo + 8, 0:1] = jnp.where(
            best_t < bf.T_FAR, best_i.astype(jnp.int32), 0)


def _closest_kernel_grp_chained(rays_t_ref, tris_g_ref, cand_ref,
                                pout_ref, pidx_ref, out_ref, i_ref, *,
                                n_tri, tmin, ns1, base=0):
    n_sc = n_tri // (bf.CLUSTER * bf.SUPER)
    for g in range(rays_t_ref.shape[0] // 8):
        lo = g * 8
        ray = tuple(rays_t_ref[lo:lo + 8, k:k + 1] for k in range(6))
        init = (pout_ref[lo:lo + 8, 0:1],
                pidx_ref[lo:lo + 8, 0:1].astype(jnp.float32))
        best_t, best_i = _grp_closest(ray, tris_g_ref, cand_ref, g * ns1,
                                      n_sc, tmin, init, base)
        out_ref[lo:lo + 8, 0:1] = best_t
        i_ref[lo:lo + 8, 0:1] = jnp.where(
            best_t < bf.T_FAR, best_i.astype(jnp.int32), 0)


def _occluded_kernel_grp(rays_t_ref, tris_g_ref, cand_ref, occ_ref, *,
                         n_tri, tmin, ns1):
    n_sc = n_tri // (bf.CLUSTER * bf.SUPER)
    for g in range(rays_t_ref.shape[0] // 8):
        lo = g * 8
        ray = tuple(rays_t_ref[lo:lo + 8, k:k + 1] for k in range(6))
        tmax = rays_t_ref[lo:lo + 8, 6:7]
        occ = _grp_occluded(ray, tmax, tris_g_ref, cand_ref, g * ns1,
                            n_sc, tmin)
        occ_ref[lo:lo + 8, 0:1] = (occ > 0.0).astype(jnp.int32)


@functools.partial(jax.named_call, name="pallas_closest_grp")
def _closest_call_grp(rays_t, tris_g, cand, n_tri: int, tmin: float,
                      prior=None, base: int = 0):
    """One chained-slab launch of the transposed-group closest kernel.

    ``rays_t`` [n_pad, 8] (rays in sublanes), ``tris_g`` the slab's
    ``pack_tris_grouped`` table, ``cand`` the rt=8 ``super_candidates``
    table, ``prior`` the previous slabs' ((t, id) [n_pad, 1]) columns."""
    n_pad = rays_t.shape[0]
    grid = (n_pad // GRP_RT,)
    ns1 = bf._pad_to(1 + n_tri // (bf.CLUSTER * bf.SUPER), 8)
    gpp = GRP_RT // 8          # groups (lists) per program
    if prior is None:
        kernel = functools.partial(
            _closest_kernel_grp_bundled if _grp_bundled()
            else _closest_kernel_grp,
            n_tri=n_tri, tmin=tmin, ns1=ns1, base=base)
        extra_in, extra_specs = (), ()
    else:
        kernel = functools.partial(
            _closest_kernel_grp_bundled_chained if _grp_bundled()
            else _closest_kernel_grp_chained,
            n_tri=n_tri, tmin=tmin, ns1=ns1,
            base=base)
        extra_in = prior
        extra_specs = (
            pl.BlockSpec((GRP_RT, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GRP_RT, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((GRP_RT, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tris_g.shape[0], tris_g.shape[1]),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpp * ns1, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec((GRP_RT, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GRP_RT, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * n_pad * n_tri // 8, bytes_accessed=n_pad * 48,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=bf.VMEM_LIMIT),
        interpret=bf._interpret(),
    )(rays_t, tris_g, cand, *extra_in)


@functools.partial(jax.named_call, name="pallas_occluded_grp")
def _occluded_call_grp(rays_t, tris_g, cand, n_tri: int, tmin: float):
    n_pad = rays_t.shape[0]
    grid = (n_pad // GRP_RT,)
    ns1 = bf._pad_to(1 + n_tri // (bf.CLUSTER * bf.SUPER), 8)
    gpp = GRP_RT // 8
    kernel = functools.partial(
        _occluded_kernel_grp_bundled if _grp_bundled()
        else _occluded_kernel_grp,
        n_tri=n_tri, tmin=tmin, ns1=ns1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((GRP_RT, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tris_g.shape[0], tris_g.shape[1]),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpp * ns1, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GRP_RT, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=40 * n_pad * n_tri // 8, bytes_accessed=n_pad * 48,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=bf.VMEM_LIMIT),
        interpret=bf._interpret(),
    )(rays_t, tris_g, cand)
