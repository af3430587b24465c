"""Fused Pallas TPU kernels for dense ray-triangle intersection.

The tuned version of ``tpu_pt.intersect.moller``: one ``pallas_call`` per
trace replaces the chunked jnp scan with a hardware-pipelined grid over ray
tiles, all triangles resident in VMEM, and the Möller-Trumbore test +
min/argmin reduction fused so the [tris x rays] candidate matrix never
touches HBM.

Layout choices (the whole point of this file):
- Rays arrive as [8, N] (rows: ox oy oz dx dy dz + two per-kernel extras,
  see ``pack_rays``) — built with a
  single cheap ``stack`` from the V3 wavefront (profiling showed the
  previous [N, 8] column-write packing cost more than the kernel itself).
  A ray tile loads as [8, RT]; each component row-slices to [1, RT] —
  lane-oriented, no in-kernel transpose.
- Triangles are packed as [T, 16] (columns: plane normal xyz + offset,
  u edge-plane xyz + offset, v edge-plane xyz + offset, valid, refractive,
  mat id) so a component block slices to [TB, 1] — sublane-oriented, again
  transpose-free. All [TB, RT] intermediates are rank-2 broadcasts of these.
- Outputs are [8, N] / [1, N] so per-ray [1, RT] results store directly.
- argmin is computed as min-of-masked-iota; the winning triangle's normal
  and material are selected with a masked sublane reduction (no gathers).
- The per-pair test is a precomputed plane + edge-function evaluation
  (Baldwin-Weber style: t from the triangle plane, barycentrics as affine
  functions of the hit point), ~25% fewer VPU ops than Möller-Trumbore —
  the cross products move into a once-per-scene precompute (``pack_tris``).

Parity: same semantics as ``moller.intersect_closest`` /
``moller.intersect_occluded`` (two-sided triangles, refractive surfaces do
not occlude — ``pathTracerPrograms.cu:672-681``). The jnp backend keeps
the independent Möller-Trumbore formula, so agreement between the two
(tests/test_pallas_bf.py) cross-checks both derivations; t values match to
plane-distance cancellation noise (~1e-4 absolute at Cornell's ~550-unit
coordinates), not bitwise.
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

RAY_TILE = int(os.environ.get("TPT_RAY_TILE", 2048))
                      # rays per grid program (dense small-scene kernels)
if RAY_TILE <= 0 or RAY_TILE % 128:
    raise ValueError(
        f"TPT_RAY_TILE={RAY_TILE}: single-slab kernels tile rays as"
        " [8, RAY_TILE] with 128-lane alignment — use a positive"
        " multiple of 128")
RAY_TILE_C = int(os.environ.get("TPT_RT_C", 256))
SUBTILE_C = int(os.environ.get("TPT_SUBTILE", RAY_TILE_C))
                      # candidate-list granularity inside a clustered
                      # kernel tile: lists per SUBTILE_C sorted rays; the
                      # kernel loops its tile's lane slices, each
                      # sweeping only ITS OWN list. On INCOHERENT rays
                      # finer lists cut the union hard (measured mean
                      # tile-union 63/112/195/320 clusters at
                      # 64/128/256/512 rays — 0.57x sweep work for
                      # 128-sublists in a 256 tile), but on the
                      # renderer's real sort-coherent wavefronts the
                      # union gain shrinks while [TB, 128] half-width
                      # ops + doubled per-candidate loop overhead stay:
                      # whole-frame 3.22 (RT 256/sub 128), 3.22
                      # (512/128), 3.57 (512/512), 3.84 (256/256), and
                      # even end-to-end incoherent batches lose (10.1 vs
                      # 11.8 Mrays/s closest) — the narrower ops cost
                      # more than the union saves on BOTH workloads.
                      # Default = no subtiling; knob kept as the record
                      # of the measurement.
                      # rays per grid program, clustered kernels — smaller
                      # tiles are more coherent, so their candidate work
                      # lists are shorter. Swept on the 100k-tri frame
                      # under kd order + guard "none" (Mrays/s): 128 =
                      # 2.48, 256 = 2.75, 512 = 2.52, 1024 = 2.01; the
                      # old 512 default dates from the guarded kernels,
                      # whose per-step conds amortized better over wide
                      # tiles (env knob for tuning)
FUSED_RAY_TILE = 2048  # fused closest+NEE kernel ray tile (it halves the
                       # tri block instead to fit both sweeps' [TB, RT]
                       # intermediates in the 16 MB scoped-VMEM budget)
TRI_BLOCK = 512       # triangles per inner step
_BIG_IDX = 2 ** 30
VMEM_LIMIT = 40 * 1024 * 1024  # clustered kernels sit at the 16 MB scoped-vmem cliff
NEE_EPS = 0.01        # shadow-ray range shrink (cu:1017 "Ldist - 0.01")


def _interpret() -> bool:
    """Run the kernels in interpreter mode off-TPU (CPU tests)."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def _pad_to(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


def pack_tris(scene: SceneArrays) -> jnp.ndarray:
    """Scene triangles -> [T_pad, 16] kernel layout (see module docstring).

    Precomputes the plane + edge-function form: for P = v0 + u*e1 + v*e2,
    ``u = wu . P + cu`` with ``wu = (e2 x n) / ((e2 x n) . e1)`` (and the
    symmetric ``wv``), and ``t = (d0 - n . o) / (n . d)`` with the
    normalized geometric normal n, ``d0 = n . v0``. Scene-constant, so XLA
    hoists it out of the render loop. Rows are zero-padded up to a
    TRI_BLOCK multiple (valid=0 never hits).

    Columns: n xyz, d0, wu xyz, cu, wv xyz, cv, valid, refractive, mat, pad.
    """
    refr = (scene.mat_bsdf[scene.mat_id] == BSDF_REFRACTION)
    t = scene.tri_v0.shape[0]
    n = scene.tri_normal                                        # [T, 3]
    v0, e1, e2 = scene.tri_v0, scene.tri_e1, scene.tri_e2

    def guarded_div(num, den):
        ok = jnp.abs(den) > 1e-20
        return num / jnp.where(ok, den, 1.0)[:, None]

    cu_dir = jnp.cross(e2, n)
    wu = guarded_div(cu_dir, jnp.sum(cu_dir * e1, axis=1))
    cv_dir = jnp.cross(e1, n)
    wv = guarded_div(cv_dir, jnp.sum(cv_dir * e2, axis=1))
    d0 = jnp.sum(n * v0, axis=1)
    cu = -jnp.sum(wu * v0, axis=1)
    cv = -jnp.sum(wv * v0, axis=1)

    cols = [
        n[:, 0], n[:, 1], n[:, 2], d0,
        wu[:, 0], wu[:, 1], wu[:, 2], cu,
        wv[:, 0], wv[:, 1], wv[:, 2], cv,
        scene.tri_valid.astype(jnp.float32),
        refr.astype(jnp.float32),
        scene.mat_id.astype(jnp.float32),
        jnp.arange(t, dtype=jnp.float32),   # original tri id (exact < 2^24)
    ]
    packed = jnp.stack(cols, axis=1)
    t_pad = _pad_to(t, TRI_BLOCK)
    if t_pad != t:
        packed = jnp.pad(packed, ((0, t_pad - t), (0, 0)))
    return packed


# Cluster size for the culled big-scene path: one tri block per cluster,
# so the in-kernel AABB test guards exactly one sweep step. SUPER clusters
# form a supercluster with its own AABB — a second hierarchy level whose
# slab test skips SUPER sweep steps (and their per-cluster box tests) at
# once when a ray tile misses the whole region.
CLUSTER = int(os.environ.get("TPT_CLUSTER", 128))
# Clusters per supercluster. 1 = the candidate lists address single
# clusters directly (no second level). Swept under the balanced-kd
# ordering (512^2 x 8-bounce 100k-tri frame, Mrays/s): CLUSTER/SUPER
# 128/4 = 1.97, 128/2 = 2.05, 128/1 = 2.13 (2.47 with the redundant
# inner guard dropped — see ``_guard_mode``), 256/1 = 1.75, 64/2 = 2.08,
# 64/1 = 1.77. kd leaf boxes are tight enough that per-128-tri work
# lists beat the coarser two-level culling the Morton order needed.
SUPER = int(os.environ.get("TPT_SUPER", 1))


def pack_tris_clustered(scene: SceneArrays):
    """Spatially order the packed triangles and compute the 2-level AABBs.

    Returns (tris [T_pad, 16] in cluster order, boxes [C, 8] with rows
    (min xyz, max xyz, pad, pad), sboxes [C // SUPER, 8] supercluster
    AABBs). Spatially sorted clusters give the in-kernel slab tests
    something to cull; all-padding clusters collapse to a far point box
    that fails every slab test. T_pad is a CLUSTER*SUPER multiple so
    every slab divides into whole superclusters.

    The order is the scene's precomputed balanced-kd permutation
    (``scene.cluster_order``, built host-side at load —
    ``scene/arrays.py median_split_order``) when present: kd leaves cut
    the mean pierced superclusters per bounce ray vs Morton runs, which
    overlap badly on curved dense meshes. Scenes without one (hand-built
    arrays, shrunken-CLUSTER tests) fall back to a device-computed
    Morton order. Once per scene; XLA hoists it out of the render loop.
    """
    packed = pack_tris(scene)
    v0, e1, e2 = scene.tri_v0, scene.tri_e1, scene.tri_e2
    valid = scene.tri_valid
    if getattr(scene, "cluster_order", None) is not None:
        order = scene.cluster_order
        if order.shape[0] < packed.shape[0]:
            order = jnp.concatenate([
                order, jnp.arange(order.shape[0], packed.shape[0],
                                  dtype=order.dtype)])
    else:
        from .lbvh import morton3d

        centroid = v0 + (e1 + e2) / 3.0
        lo = jnp.min(jnp.where(valid[:, None], centroid, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(valid[:, None], centroid, -jnp.inf), axis=0)
        p01 = (centroid - lo) / jnp.maximum(hi - lo, 1e-12)
        code = jnp.where(valid, morton3d(jnp.clip(p01, 0.0, 1.0)),
                         jnp.uint32(0xFFFFFFFF))
        if code.shape[0] != packed.shape[0]:
            import numpy as _np
            code = jnp.pad(code, (0, packed.shape[0] - code.shape[0]),
                           constant_values=_np.uint32(0xFFFFFFFF))
        order = jnp.argsort(code)
    packed = packed[order]

    # Pad the sorted triangles to a whole number of superclusters AND to
    # an 8-supercluster multiple: a trailing slab past a CLUSTERED_SLAB
    # boundary must still give Mosaic sublane-aligned (>= 8 row) box and
    # work-list blocks (valid=0 rows: empty boxes, rejected by the plane
    # guard anyway).
    t_pad = _pad_to(packed.shape[0], 8 * CLUSTER * SUPER)
    if t_pad != packed.shape[0]:
        packed = jnp.pad(packed, ((0, t_pad - packed.shape[0]), (0, 0)))

    # Per-cluster AABBs over the sorted triangles' three vertices.
    n_c = t_pad // CLUSTER

    def tri_corners(a):
        pad = order.shape[0] - a.shape[0]
        if pad:
            a = jnp.pad(a, ((0, pad), (0, 0)))
        a = a[order]
        if t_pad != a.shape[0]:
            a = jnp.pad(a, ((0, t_pad - a.shape[0]), (0, 0)))
        return a

    p0 = tri_corners(v0)
    p1 = tri_corners(v0 + e1)
    p2 = tri_corners(v0 + e2)
    vmask = packed[:, 12:13] > 0.5     # valid column survives the reorder
    big = jnp.float32(3e38)
    mins = jnp.minimum(jnp.minimum(
        jnp.where(vmask, p0, big), jnp.where(vmask, p1, big)),
        jnp.where(vmask, p2, big)).reshape(n_c, CLUSTER, 3).min(axis=1)
    maxs = jnp.maximum(jnp.maximum(
        jnp.where(vmask, p0, -big), jnp.where(vmask, p1, -big)),
        jnp.where(vmask, p2, -big)).reshape(n_c, CLUSTER, 3).max(axis=1)
    # All-padding clusters come out INVERTED (min=+big > max=-big), and an
    # inverted box passes every slab/interval test (per-axis intervals
    # span -inf..+inf) — it would be swept by every tile, near-FIRST.
    # Aggregate supercluster boxes from the raw values first (inverted
    # empties are neutral under min/max), then collapse empties at BOTH
    # levels to a far point box: tnear ~ 3e37 exceeds any tmax
    # (T_FAR = 1e16), so every test fails.
    n_s = n_c // SUPER
    smins = mins.reshape(n_s, SUPER, 3).min(axis=1)
    smaxs = maxs.reshape(n_s, SUPER, 3).max(axis=1)

    far = jnp.float32(3e37)

    def collapse(lo, hi):
        empty = jnp.any(lo > hi, axis=1, keepdims=True)
        return jnp.where(empty, far, lo), jnp.where(empty, far, hi)

    mins, maxs = collapse(mins, maxs)
    smins, smaxs = collapse(smins, smaxs)
    boxes = jnp.concatenate(
        [mins, maxs, jnp.zeros((n_c, 2), jnp.float32)], axis=1)
    sboxes = jnp.concatenate(
        [smins, smaxs, jnp.zeros((n_s, 2), jnp.float32)], axis=1)
    return packed, boxes, sboxes


def _octant_signs():
    # numpy constant (NOT a cached jnp array: that would capture one
    # trace's tracer and leak it into the next jit).
    import numpy as _np
    o = _np.arange(8)
    return _np.stack(
        [_np.where(o & 1, 1.0, -1.0), _np.where(o & 2, 1.0, -1.0),
         _np.where(o & 4, 1.0, -1.0)], axis=1).astype(_np.float32)  # [8, 3]


def octant_orders(boxes: jnp.ndarray):
    """Front-to-back in-supercluster visitation table for one slab.

    For rays in direction octant o, visiting boxes in ascending projection
    of their centers onto the octant diagonal is near-to-far for every ray
    origin — so the sweep's running best-t tightens early and the slab
    tests cull the far clusters (the dense analog of ordered BVH
    traversal). Returns corder [8*NC, 1] i32: within supercluster sb, the
    j-th cluster's LOCAL index is row ``o*NC + sb*SUPER + j``. Flat
    [rows, 1] layout keeps the kernel's dynamic indices in the sublane
    dimension (Mosaic rejects dynamic lane indices). Empty boxes sort
    arbitrarily; their tests never pass. (Supercluster visitation order is
    per-tile, computed by ``super_candidates`` — true near-first.)
    """
    signs = jnp.asarray(_octant_signs())                          # [8, 3]
    cc = 0.5 * (boxes[:, 0:3] + boxes[:, 3:6])                    # [NC, 3]
    n_c = boxes.shape[0]
    cproj = (signs @ cc.T).reshape(8, n_c // SUPER, SUPER)
    corder = jnp.argsort(cproj, axis=2).astype(jnp.int32).reshape(8, n_c)
    return corder.reshape(-1, 1)


def super_candidates_exact(rays: jnp.ndarray, sboxes: jnp.ndarray, rt: int,
                           tmin: float, tmax) -> jnp.ndarray:
    """Exact per-ray slab tests, OR-reduced per tile (vs the interval
    variant below, which bounds the tile's rays conservatively).

    Same [n_tiles * R, 1] table contract as ``super_candidates``. Costs a
    dense [N, NS] pass in XLA (axis-incremental so temporaries stay
    [N, NS]); in exchange the tile's candidate set is the TRUE union of
    its rays' pierced boxes — interval unions over a 512-ray tile pass
    boxes no ray actually crosses whenever origins or directions spread.
    Near-first key = tile-min tnear over the rays that pierce."""
    ns = sboxes.shape[0]
    n_pad = rays.shape[1]
    n_tiles = n_pad // rt
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
    okt = ok.reshape(n_tiles, rt, ns)
    any_ = jnp.any(okt, axis=1)                               # [tiles, NS]
    tkey = jnp.min(jnp.where(okt, tn.reshape(n_tiles, rt, ns),
                             jnp.float32(T_FAR)), axis=1)
    key = jnp.where(any_, tkey, jnp.float32(T_FAR))
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    cnt = jnp.sum(any_, axis=1, dtype=jnp.int32)[:, None]
    tab = jnp.concatenate([cnt, order], axis=1)
    rows = _pad_to(1 + ns, 8)
    if rows != 1 + ns:
        tab = jnp.pad(tab, ((0, 0), (0, rows - 1 - ns)))
    return tab.reshape(-1, 1)


def super_candidates(rays: jnp.ndarray, sboxes: jnp.ndarray, rt: int,
                     tmin: float, tmax) -> jnp.ndarray:
    """Per-ray-tile supercluster work lists, computed OUTSIDE the kernel.

    Dispatches to ``super_candidates_exact`` unless ``TPT_CAND=interval``
    (the conservative whole-tile interval-arithmetic variant, kept for
    A/B measurement and as documentation of the cheaper scheme).

    The in-kernel hierarchy's cost was dominated not by triangle sweeps
    but by the sequential skip machinery itself (measured ~2/3 of tile
    time in box tests + ``cond`` branches + dynamic order-table reads).
    Here the same whole-tile "any ray passes the slab test" decision is
    made for every (tile, supercluster) pair as one dense vectorized XLA
    computation, sorted near-first by the tile's minimum entry distance,
    and handed to the kernel as an explicit work list — the kernel then
    loops over exactly the candidates (dynamic trip count), keeping only
    the best-t tightening test per candidate.

    ``tmax`` is a scalar (closest) or a [n_pad] per-ray bound (occlusion).
    Returns [n_tiles * R, 1] i32 with R = 1 + NS padded to a sublane (8)
    multiple: per tile, row 0 is the candidate count, rows 1..NS the
    supercluster ids near-first, then zero padding.

    The test is CONSERVATIVE interval arithmetic per tile (origin AABB x
    direction bounds x box), not a per-ray sweep: a [tiles, NS] problem
    instead of [N, NS] — measured 1.7 ms -> ~0.1 ms per call at 65k rays,
    and the per-(tile, super) slab re-test inside the kernel gates any
    false positives before their clusters are swept. Per axis, with the
    numerator interval [b_lo - o_hi, b_hi - o_lo] and the reciprocal
    direction interval (unbounded when the tile's directions span zero —
    that axis then passes trivially), the product interval bounds every
    ray's [tnear_axis, tfar_axis]; max/min over axes bound tnear/tfar.
    """
    if os.environ.get("TPT_CAND", "exact") != "interval":
        return super_candidates_exact(rays, sboxes, rt, tmin, tmax)
    ns = sboxes.shape[0]
    n_pad = rays.shape[1]
    n_tiles = n_pad // rt
    big = jnp.float32(3e38)
    o = rays[0:3, :].reshape(3, n_tiles, rt)
    d = rays[3:6, :].reshape(3, n_tiles, rt)
    o_lo = jnp.min(o, axis=2)[:, :, None]                     # [3, tiles, 1]
    o_hi = jnp.max(o, axis=2)[:, :, None]
    d_lo = jnp.min(d, axis=2)
    d_hi = jnp.max(d, axis=2)
    definite = (d_lo > 1e-12) | (d_hi < -1e-12)               # [3, tiles]
    i1 = 1.0 / jnp.where(definite, d_lo, 1.0)
    i2 = 1.0 / jnp.where(definite, d_hi, 1.0)
    inv_lo = jnp.minimum(i1, i2)[:, :, None]                  # [3, tiles, 1]
    inv_hi = jnp.maximum(i1, i2)[:, :, None]
    def_ = definite[:, :, None]

    b_lo = sboxes[:, 0:3].T[:, None, :]                       # [3, 1, NS]
    b_hi = sboxes[:, 3:6].T[:, None, :]
    n_lo = b_lo - o_hi                                        # [3, tiles, NS]
    n_hi = b_hi - o_lo
    p = jnp.stack([n_lo * inv_lo, n_lo * inv_hi,
                   n_hi * inv_lo, n_hi * inv_hi])             # [4, 3, T, NS]
    ax_lo = jnp.where(def_, jnp.min(p, axis=0), -big)
    ax_hi = jnp.where(def_, jnp.max(p, axis=0), big)
    tn = jnp.max(ax_lo, axis=0)                               # [tiles, NS]
    tf = jnp.min(ax_hi, axis=0)

    if jnp.ndim(tmax) == 0:
        tmax_t = tmax
    else:   # per-ray bound (occlusion): per-tile upper bound
        tmax_t = jnp.max(jnp.reshape(tmax, (n_tiles, rt)), axis=1)[:, None]
    any_ = (tn <= tf) & (tf > tmin) & (tn < tmax_t)           # [tiles, NS]
    key = jnp.where(any_, tn, jnp.float32(T_FAR))
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    cnt = jnp.sum(any_, axis=1, dtype=jnp.int32)[:, None]     # [tiles, 1]
    tab = jnp.concatenate([cnt, order], axis=1)               # [tiles, 1+NS]
    rows = _pad_to(1 + ns, 8)    # sublane-aligned per-tile blocks
    if rows != 1 + ns:
        tab = jnp.pad(tab, ((0, 0), (0, rows - 1 - ns)))
    return tab.reshape(-1, 1)


def pack_rays(origins: V3, dirs: V3, row6: jnp.ndarray | None,
              n_pad: int, row7: jnp.ndarray | None = None) -> jnp.ndarray:
    """V3 rays -> [8, n_pad] kernel layout.

    Rows 6-7 are per-kernel extras: occlusion tmax, or the NEE light-sample
    uniforms (lz1, lz2) for the fused closest+NEE kernel. Padding columns
    are PARKED rays (far origin, diagonal direction, tmax 0), not zeros: a
    zero direction passes every slab test (tnear = -inf through the
    eps-guarded reciprocal), so zero padding would hand its whole ray tile
    a full candidate list in the clustered path."""
    n = origins.x.shape[0]
    pad = n_pad - n
    z = jnp.zeros((n,), jnp.float32)
    rows = [origins.x, origins.y, origins.z, dirs.x, dirs.y, dirs.z,
            row6 if row6 is not None else z,
            row7 if row7 is not None else z]
    out = jnp.stack(rows, axis=0)
    if pad:
        import numpy as _np
        fill = _np.zeros((8, 1), _np.float32)
        fill[0:3, 0] = 3.0e7            # render.PARK_COORD
        fill[3:6, 0] = 0.5773503        # render.PARK_DIR
        out = jnp.concatenate(
            [out, jnp.broadcast_to(jnp.asarray(fill), (8, pad))], axis=1)
    return out


def ray_rows(origins: V3, dirs: V3, n_pad: int, extras=()):
    """Rays as SEPARATE [1, n_pad] component operands (single-slab kernels).

    The packed [8, N] layout of ``pack_rays`` costs one stacked HBM copy
    per kernel launch; the single-slab kernels don't sort, so they can
    read the wavefront's component rows directly — measured 8 ms/frame
    (two packs x 155 rounds) on the 1024^2 Cornell headline. Padding
    columns are PARKED rays exactly as in ``pack_rays``; ``extras`` rows
    (e.g. occlusion tmax) pad with 0."""
    n = origins.x.shape[0]
    cols = (origins.x, origins.y, origins.z,
            dirs.x, dirs.y, dirs.z) + tuple(extras)
    fills = (3.0e7,) * 3 + (0.5773503,) * 3 + (0.0,) * len(extras)
    out = []
    for col, fill in zip(cols, fills):
        if n_pad != n:
            col = jnp.pad(col, (0, n_pad - n), constant_values=fill)
        out.append(col[None, :])
    return tuple(out)


def _row_specs(k: int, rt: int = RAY_TILE):
    return [pl.BlockSpec((1, rt), lambda i: (0, i),
                         memory_space=pltpu.VMEM) for _ in range(k)]


def _pe_block(ray, tris_ref, s, tb, tmin):
    """Plane + edge-function test for a ray tile vs tri block ``s:s+tb``.

    ``ray`` is an (ox, oy, oz, dx, dy, dz) tuple of [1, RT] values (register
    resident — callers slice them from a rays ref or compute them in-kernel,
    e.g. NEE shadow rays). Returns (t [TB, RT] with +inf on miss/invalid,
    refr [TB, 1], u, v). Ray directions are unit-length (raygen/shade
    normalize), so the parallel-plane guard on ``n . d`` is a cosine
    threshold."""
    ox, oy, oz, dx, dy, dz = ray

    def col(c):
        return tris_ref[pl.ds(s, tb), c:c + 1]                    # [TB, 1]

    nx, ny, nz, d0 = col(0), col(1), col(2), col(3)
    wux, wuy, wuz, cu = col(4), col(5), col(6), col(7)
    wvx, wvy, wvz, cv = col(8), col(9), col(10), col(11)
    refr = col(13)

    # No explicit validity test, and no parallel-plane guard either:
    # padded/degenerate triangles (zero normal) and grazing rays give a
    # tiny/zero ndotd whose approximate reciprocal explodes — the huge
    # or inf/NaN t then fails the edge tests or the T_FAR ordering, so
    # they self-reject without the abs/compare/select the old DET_EPS
    # guard spent per element (NaN compares are false on the VPU).
    ndotd = nx * dx + ny * dy + nz * dz
    # Hardware approximate reciprocal + ONE Newton step instead of a
    # full divide. The v5e approx reciprocal is 16-bit accurate
    # (measured max rel err 1.6e-5 over +-[1e-6, 1e6]); one step
    # squares that to 1.2e-7 = 1 ulp of f32, so a second step cannot
    # improve the result — it was pure cost (~5% of the frame).
    # Interpreter mode (CPU tests) divides exactly: its emulated approx
    # reciprocal is only ~8-bit, and interpret is the correctness path.
    if _interpret():
        rcp = 1.0 / ndotd
    else:
        rcp = pl.reciprocal(ndotd, approx=True)
        rcp = rcp * (2.0 - ndotd * rcp)
    t = (d0 - (nx * ox + ny * oy + nz * oz)) * rcp

    # Hit point, then barycentrics as affine edge functions of it.
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    u = wux * px + wuy * py + wuz * pz + cu
    v = wvx * px + wvy * py + wvz * pz + cv

    hit = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > tmin)
    return jnp.where(hit, t, jnp.float32(T_FAR)), refr, u, v


def _ray_rows(rays_ref):
    return tuple(rays_ref[k:k + 1, :] for k in range(6))


def _ray_inv(ray):
    """Reciprocal direction for slab tests; eps-guarded so axis-aligned
    rays stay finite (boxes only get conservatively larger)."""
    _, _, _, dx, dy, dz = ray

    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) > 1e-12,
                               c, jnp.where(c >= 0, 1e-12, -1e-12))

    return inv(dx), inv(dy), inv(dz)


def _box_near_far(ray, inv, boxes_ref, b):
    """Ray-tile vs cluster-AABB slab test -> (tnear, tfar) [1, RT]."""
    ox, oy, oz = ray[0], ray[1], ray[2]
    ix, iy, iz = inv

    def lohi(o, i, c):
        t0 = (boxes_ref[b, c] - o) * i
        t1 = (boxes_ref[b, c + 3] - o) * i
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    lx, hx = lohi(ox, ix, 0)
    ly, hy = lohi(oy, iy, 1)
    lz, hz = lohi(oz, iz, 2)
    return (jnp.maximum(jnp.maximum(lx, ly), lz),
            jnp.minimum(jnp.minimum(hx, hy), hz))


def _tile_octant(ray, rt):
    """Majority direction octant of a ray tile (rays arrive sorted by an
    octant-major key, so this is exact away from octant boundaries)."""
    half = rt // 2

    def vote(c):
        return (jnp.sum((c > 0).astype(jnp.int32)) > half).astype(jnp.int32)

    return vote(ray[3]) + 2 * vote(ray[4]) + 4 * vote(ray[5])


# In-kernel candidate-list build: the round-3 answer to the big-scene
# schedule-build barrier (the exact-list sweep was proven ~5x cheaper than
# tile-union sweeps, but every XLA-shaped dense schedule build costs
# >= 2 ms/round against a ~0.3 ms budget — ARCHITECTURE.md cbin row).
# ``super_candidates_exact``'s dense [N, NS] slab pass materializes
# multi-MB [N, NS] temporaries in HBM every slab x round x schedule; HERE
# the same per-(tile, supercluster) tests run inside the sweep kernel
# itself, where the [NS, RT] intermediates are VMEM-register-local and
# the per-tile list costs ~nothing next to one candidate's tri sweep.
# Compaction without a sort (Mosaic has no cheap sublane sort and the
# default guard="none" sweep is order-insensitive — it visits every
# listed candidate unconditionally, so only SET membership matters, plus
# equal-t tie-breaking, see _inkb note in intersect_closest):
#   pos  = ltri @ any          (strictly-lower-triangular matmul = the
#                               exclusive prefix count of pierced boxes)
#   sel  = onehot(pos)         ([NS, NSP] lane-iota compare, no transpose)
#   list = sel^T @ ids         (one [NS, NSP] x [NS, 1] contraction)
# Both matmuls are integer-exact: operands are 0/1 flags and box ids
# <= INKB_MAX_SC - 1 = 255, exactly representable even after a bf16
# split. The table layout matches super_candidates row-for-row, so the
# sweep loop is unchanged — it just reads VMEM scratch instead of an
# HBM-built operand.
INKB_MAX_SC = 256     # ids above 255 lose bf16 exactness in the matmuls


def _inkb(n_sc: int) -> bool:
    """In-kernel candidate build applies: guard none, supercluster count
    within the exact-matmul bound, and TPT_INKB=1.

    MEASURED DEAD END on the 100k-tri frame (kept as ablation, default
    off): 4.47 vs 5.05 Mrays/s, compile 135 -> 476 s. The hypothesis was
    that the XLA-side ``super_candidates`` build materializes expensive
    dense passes; in fact the tiled path's per-slab [N, NS_slab] exact
    test is element-count-identical to the per-tile in-kernel test
    ([tiles, RT, NS] covers the same pairs), XLA fuses it into ~1 ms/
    round, and moving it in-kernel only serializes it against each
    tile's sweeps (and bloats Mosaic compile 3.5x). The schedule-build
    cost that matters is the O(N x NS_total) ALL-pairs test itself —
    cutting it needs hierarchy (test parent boxes first), not a change
    of venue. The >= 2 ms/round barrier quoted in round 2 was cbin's
    per-RAY list build, a different (finer) schedule."""
    return (os.environ.get("TPT_INKB", "0") == "1"
            and _guard_mode() == "none" and n_sc <= INKB_MAX_SC)


def _build_cand_table(ray, sboxes_ref, n_sc, tmin, tmax_row, out_ref,
                      base, ns1):
    """Build one subtile's candidate work list in VMEM.

    ``ray``: 6-tuple of [1, R] rows. ``sboxes_ref``: [NS, 8] supercluster
    AABBs. ``tmax_row``: scalar or [1, R] per-ray bound (chained prior t /
    occlusion tmax). Writes ``out_ref[base, 0] = count`` and
    ``out_ref[base + 1 + k, 0]`` = k-th pierced supercluster id (box-index
    order; dead rows 0). Same membership semantics as
    ``super_candidates_exact``: ok = (tn <= tf) & (tf > tmin) &
    (tn < tmax)."""
    ox, oy, oz, dx, dy, dz = ray
    eps = jnp.float32(1e-12)
    big = jnp.float32(3e38)
    nsp = ns1 - 1
    tn = None
    for oa, da, a in ((ox, dx, 0), (oy, dy, 1), (oz, dz, 2)):
        inv = 1.0 / jnp.where(jnp.abs(da) > eps, da,
                              jnp.where(da >= 0, eps, -eps))
        t0 = (sboxes_ref[:, a:a + 1] - oa) * inv          # [NS, R]
        t1 = (sboxes_ref[:, a + 3:a + 4] - oa) * inv
        lo_, hi_ = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
        if tn is None:
            tn, tf = lo_, hi_
        else:
            tn, tf = jnp.maximum(tn, lo_), jnp.minimum(tf, hi_)
    ok = (tn <= tf) & (tf > tmin) & (tn < tmax_row)       # [NS, R]
    anyb = jnp.any(ok, axis=1, keepdims=True)             # [NS, 1]
    any_f = anyb.astype(jnp.float32)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (n_sc, n_sc), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (n_sc, n_sc), 1)
    ltri = (c_i < r_i).astype(jnp.float32)
    pos = jax.lax.dot_general(ltri, any_f, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # Mosaic's tpu.iota is integer-only; compare in i32 (pos is an exact
    # small integer by construction).
    slot = jnp.where(anyb, pos.astype(jnp.int32), jnp.int32(nsp))
    sel = (jax.lax.broadcasted_iota(jnp.int32, (n_sc, nsp), 1)
           == slot).astype(jnp.float32)                   # [NS, NSP]
    ids = jax.lax.broadcasted_iota(
        jnp.int32, (n_sc, 1), 0).astype(jnp.float32)
    ordered = jax.lax.dot_general(sel, ids, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    out_ref[base:base + 1, 0:1] = jnp.sum(
        any_f, dtype=jnp.float32).astype(jnp.int32).reshape(1, 1)
    out_ref[base + 1:base + ns1, 0:1] = ordered.astype(jnp.int32)


def _closest_sweep(ray, tris_ref, rt, nb, tmin, tmax, tb=TRI_BLOCK,
                   boxes_ref=None, sboxes_ref=None, cand_ref=None,
                   corder_ref=None, want_uv=True, init=None,
                   orig_id=None, guard="both", lean=False, lean_base=0,
                   cand_base=0):
    """Min-reduce the plane+edge test over all tri blocks. Returns the
    (t, tri, nx, ny, nz, mat, u, v) tuple of [1, RT] bests; ``tri`` comes
    from the packed original-id column, so it survives cluster reordering.
    With ``lean=True`` the carry (and return) is just (t, packed-row id)
    — attribute recovery happens outside the kernel.

    With ``boxes_ref`` ([NB, 8] cluster AABBs), each block is guarded by a
    whole-tile slab test (tightened by the running best t) and skipped via
    ``lax.cond`` when no ray in the tile can improve — the dense-wavefront
    analog of BVH node culling. With ``cand_ref`` ([1 + NS, 1], this
    tile's precomputed work list from ``super_candidates``), the loop
    visits only the listed superclusters, near-first, re-testing each
    against the running best t.

    ``guard`` picks the in-kernel skip machinery for the candidate-list
    path: "both" re-tests each supercluster AND each cluster against the
    running best (maximal culling, maximal sequential cond/box overhead),
    "super" keeps only the supercluster cond, "none" sweeps every listed
    candidate densely with zero conds. The guards earned their cost under
    the original Morton cluster order (whole-frame 1.64 / 1.52 / 1.49
    Mrays/s both/super/none; incoherent batches 11.0 / 8.8 / 5.2), but
    the balanced-kd order + single-level 128-tri work lists flipped the
    verdict: the lists are now tight enough that the per-step cond
    machinery only serializes the sweep. Measured (v5e, 100k-tri scene,
    RAY_TILE_C 256): whole-frame 2.53 (super) vs 2.75 (none) Mrays/s,
    and incoherent batches are at parity (~11.5-12.3 every mode). "none"
    is the default; ``TPT_GUARD`` stays as the ablation knob."""

    use_orig_id = boxes_ref is not None if orig_id is None else orig_id

    def sweep(b, carry):
        s = b * tb
        t, _, u, v = _pe_block(ray, tris_ref, s, tb, tmin)
        if tmax < T_FAR:    # static; render paths pass tmax = T_FAR
            t = jnp.where(t < tmax, t, jnp.float32(T_FAR))
        blk_t = jnp.min(t, axis=0, keepdims=True)                 # [1, RT]
        sub = jax.lax.broadcasted_iota(jnp.int32, (tb, rt), 0)
        cand = jnp.where(t == blk_t, sub, _BIG_IDX)
        blk_sub = jnp.min(cand, axis=0, keepdims=True)            # [1, RT]
        if lean:
            # (t, packed-row id) carry only; the caller recovers the
            # winner's attributes from the id outside the kernel (see
            # ``_lean_sweep``/``_lean_resolve_packed``) — the sel/pick
            # machinery below is ~25% of the clustered sweep.
            # ``lean_base`` keeps ids global across chained slabs, so a
            # surviving prior is never re-offset.
            best_t, bi = carry
            blk_i = (blk_sub + (s + lean_base)).astype(jnp.float32)
            better = blk_t < best_t
            return (jnp.where(better, blk_t, best_t),
                    jnp.where(better, blk_i, bi))
        best_t, bi, bnx, bny, bnz, bm, bu, bv = carry
        # Select the winning triangle's id/normal/material in-layout: a
        # masked sublane reduction, not a gather.
        sel = (sub == blk_sub).astype(jnp.float32)                # [TB, RT]

        def pick(col_id):
            col = tris_ref[pl.ds(s, tb), col_id:col_id + 1]
            return jnp.sum(sel * col, axis=0, keepdims=True)      # [1, RT]

        # Barycentrics are only consumed by the glTF/whitted pipeline
        # (vertex-attribute interpolation); the OBJ path tracer shades
        # from flat geometric normals, so its kernels skip the two
        # [TB, RT] select-reduces (~5% of the sweep).
        if want_uv:
            # Mask non-hit rows BEFORE the select-reduce: the guard-free
            # plane test leaves u/v of self-rejected rows inf/NaN on TPU
            # (exploding approximate reciprocal), and 0 * NaN = NaN
            # poisons the sum for every block containing a degenerate
            # row. t is already T_FAR-masked, so t < T_FAR is the hit
            # test. (Interpret mode divides exactly and stays finite —
            # the round-2..3 whitted-on-TPU shading-normal bug this
            # masks fixes was invisible to every CPU test; see the
            # verify_tpu lean-uv case.)
            ok = t < T_FAR
            blk_u = jnp.sum(sel * jnp.where(ok, u, 0.0), axis=0,
                            keepdims=True)
            blk_v = jnp.sum(sel * jnp.where(ok, v, 0.0), axis=0,
                            keepdims=True)
        else:
            blk_u, blk_v = bu, bv
        # Triangle id: identity-packed scenes use the block iota directly
        # (cheaper: no extra [TB, RT] product); Morton-reordered scenes
        # read the original id from column 15.
        blk_i = (pick(15) if use_orig_id
                 else (blk_sub + s).astype(jnp.float32))
        better = blk_t < best_t
        return (jnp.where(better, blk_t, best_t),
                jnp.where(better, blk_i, bi),
                jnp.where(better, pick(0), bnx),
                jnp.where(better, pick(1), bny),
                jnp.where(better, pick(2), bnz),
                jnp.where(better, pick(14), bm),
                jnp.where(better, blk_u, bu),
                jnp.where(better, blk_v, bv))

    if boxes_ref is None:
        step = sweep
    else:
        inv = _ray_inv(ray)

        def step(b, carry):
            tnear, tfar = _box_near_far(ray, inv, boxes_ref, b)
            useful = (tnear <= tfar) & (tfar > tmin) & (tnear < carry[0])
            return jax.lax.cond(jnp.any(useful), lambda c: sweep(b, c),
                                lambda c: c, carry)

    if init is None:
        if lean:
            init = (jnp.full((1, rt), T_FAR, jnp.float32),
                    jnp.zeros((1, rt), jnp.float32))
        else:
            init = (jnp.full((1, rt), T_FAR, jnp.float32),
                    jnp.zeros((1, rt), jnp.float32),
                    jnp.zeros((1, rt), jnp.float32),
                    jnp.zeros((1, rt), jnp.float32),
                    jnp.zeros((1, rt), jnp.float32),
                    jnp.zeros((1, rt), jnp.float32),
                    jnp.zeros((1, rt), jnp.float32),
                    jnp.zeros((1, rt), jnp.float32))
    if sboxes_ref is not None:
        # Clamp the work-list length so a corrupt table can never run the
        # dynamic loop past the supercluster count.
        ncand = jnp.clip(cand_ref[cand_base, 0], 0, nb // SUPER)

        if guard == "none":
            def super_step(k, carry):
                sb = cand_ref[cand_base + 1 + k, 0]       # k-th nearest supercluster

                def cluster_step(j, c):
                    return sweep(sb * SUPER + j, c)

                return jax.lax.fori_loop(0, SUPER, cluster_step, carry)

            return jax.lax.fori_loop(0, ncand, super_step, init)

        co_base = _tile_octant(ray, rt) * nb

        def super_step(k, carry):
            sb = cand_ref[cand_base + 1 + k, 0]           # k-th nearest supercluster
            tnear, tfar = _box_near_far(ray, inv, sboxes_ref, sb)
            useful = (tnear <= tfar) & (tfar > tmin) & (tnear < carry[0])

            if guard == "super":
                def cluster_step(j, c):
                    return sweep(sb * SUPER + j, c)
            else:
                def cluster_step(j, c):
                    return step(
                        sb * SUPER
                        + corder_ref[co_base + sb * SUPER + j, 0], c)

            return jax.lax.cond(
                jnp.any(useful),
                lambda c: jax.lax.fori_loop(0, SUPER, cluster_step, c),
                lambda c: c, carry)

        return jax.lax.fori_loop(0, ncand, super_step, init)
    if nb == 1:
        return step(0, init)
    return jax.lax.fori_loop(0, nb, step, init)


def _occlusion_sweep(ray, tris_ref, tmax, rt, nb, tmin, tb=TRI_BLOCK,
                     boxes_ref=None, sboxes_ref=None, cand_ref=None,
                     corder_ref=None, guard="both", cand_base=0):
    """OR-reduce "any non-refractive hit in (tmin, tmax)" over tri blocks.

    ``guard`` as in ``_closest_sweep``; occlusion's guards also carry the
    any-hit early exit (``occ < 0.5``), so "none" trades that for a
    cond-free pipeline."""

    def sweep(b, occ):
        s = b * tb
        t, refr, _, _ = _pe_block(ray, tris_ref, s, tb, tmin)
        blocking = (t < tmax) & (refr < 0.5)
        hit_any = jnp.max(jnp.where(blocking, 1.0, 0.0), axis=0,
                          keepdims=True)
        return jnp.maximum(occ, hit_any)

    if boxes_ref is None:
        step = sweep
    else:
        inv = _ray_inv(ray)

        def step(b, occ):
            tnear, tfar = _box_near_far(ray, inv, boxes_ref, b)
            useful = ((tnear <= tfar) & (tfar > tmin) & (tnear < tmax)
                      & (occ < 0.5))
            return jax.lax.cond(jnp.any(useful), lambda c: sweep(b, c),
                                lambda c: c, occ)

    # i32/f32 carries only: Mosaic's loop lowering rejects bool carries
    # ("failed to legalize scf.for").
    init = jnp.zeros((1, rt), jnp.float32)
    if sboxes_ref is not None:
        ncand = jnp.clip(cand_ref[cand_base, 0], 0, nb // SUPER)

        if guard == "none":
            def super_step(k, occ):
                sb = cand_ref[cand_base + 1 + k, 0]

                def cluster_step(j, c):
                    return sweep(sb * SUPER + j, c)

                return jax.lax.fori_loop(0, SUPER, cluster_step, occ)

            return jax.lax.fori_loop(0, ncand, super_step, init)

        co_base = _tile_octant(ray, rt) * nb

        def super_step(k, occ):
            sb = cand_ref[cand_base + 1 + k, 0]           # near-first: occ sets early
            tnear, tfar = _box_near_far(ray, inv, sboxes_ref, sb)
            useful = ((tnear <= tfar) & (tfar > tmin) & (tnear < tmax)
                      & (occ < 0.5))

            if guard == "super":
                def cluster_step(j, c):
                    return sweep(sb * SUPER + j, c)
            else:
                def cluster_step(j, c):
                    return step(
                        sb * SUPER
                        + corder_ref[co_base + sb * SUPER + j, 0], c)

            return jax.lax.cond(
                jnp.any(useful),
                lambda c: jax.lax.fori_loop(0, SUPER, cluster_step, c),
                lambda c: c, occ)

        return jax.lax.fori_loop(0, ncand, super_step, init)
    if nb == 1:
        return step(0, init)
    return jax.lax.fori_loop(0, nb, step, init)


def _write_closest_lanes(out_ref, i_ref, best, lo, hi):
    """Full 8-row result write into one lane slice of the output tile."""
    best_t, best_i, bnx, bny, bnz, bm, bu, bv = best
    out_ref[0:1, lo:hi] = best_t
    out_ref[1:2, lo:hi] = bnx
    out_ref[2:3, lo:hi] = bny
    out_ref[3:4, lo:hi] = bnz
    out_ref[4:5, lo:hi] = bm
    out_ref[5:6, lo:hi] = bu
    out_ref[6:7, lo:hi] = bv
    out_ref[7:8, lo:hi] = jnp.zeros((1, hi - lo), jnp.float32)
    i_ref[0:1, lo:hi] = jnp.where(best_t < T_FAR,
                                  best_i.astype(jnp.int32), 0)


def _write_closest(out_ref, i_ref, best, rt, occ=None):
    best_t, best_i, bnx, bny, bnz, bm, bu, bv = best
    best_i = best_i.astype(jnp.int32)
    out_ref[0:1, :] = best_t
    out_ref[1:2, :] = bnx
    out_ref[2:3, :] = bny
    out_ref[3:4, :] = bnz
    out_ref[4:5, :] = bm
    out_ref[5:6, :] = bu
    out_ref[6:7, :] = bv
    out_ref[7:8, :] = (jnp.zeros((1, rt), jnp.float32) if occ is None
                       else occ)
    i_ref[:, :] = jnp.where(best_t < T_FAR, best_i, 0)


def _closest_kernel(r0, r1, r2, r3, r4, r5, tris_ref, out_ref, i_ref, *,
                    n_tri, tmin, tmax, tb=TRI_BLOCK, want_uv=True):
    rt = r0.shape[1]
    ray = tuple(r[0:1, :] for r in (r0, r1, r2, r3, r4, r5))
    best = _closest_sweep(ray, tris_ref, rt,
                          n_tri // tb, tmin, tmax, tb=tb, want_uv=want_uv)
    _write_closest(out_ref, i_ref, best, rt)


def _lean_sweep(ray, tris_ref, rt, nb, tmin, tb):
    """(t, tri-id) min-reduce only — no in-sweep normal/material selects.

    The full sweep's winner-attribute machinery (``sel`` compare + four
    masked [TB, RT] select-reduces) is ~16% of the closest kernel; small
    scenes recover (normal, material) OUTSIDE the kernel from the tri id
    with one one-hot matmul against the packed-tri table — the same
    in-layout lookup trick ``_shade_hit`` uses for material properties,
    affordable because the one-hot width is the scene's triangle count."""

    def sweep(b, carry):
        best_t, bi = carry
        s = b * tb
        t, _, _, _ = _pe_block(ray, tris_ref, s, tb, tmin)
        blk_t = jnp.min(t, axis=0, keepdims=True)                 # [1, RT]
        sub = jax.lax.broadcasted_iota(jnp.int32, (tb, rt), 0)
        cand = jnp.where(t == blk_t, sub, _BIG_IDX)
        blk_sub = jnp.min(cand, axis=0, keepdims=True)            # [1, RT]
        better = blk_t < best_t
        return (jnp.where(better, blk_t, best_t),
                jnp.where(better, (blk_sub + s).astype(jnp.float32), bi))

    init = (jnp.full((1, rt), T_FAR, jnp.float32),
            jnp.zeros((1, rt), jnp.float32))
    if nb == 1:
        return sweep(0, init)
    return jax.lax.fori_loop(0, nb, sweep, init)


def _closest_kernel_lean(r0, r1, r2, r3, r4, r5, tris_ref, out_ref, i_ref,
                         *, n_tri, tmin, tb=TRI_BLOCK):
    rt = r0.shape[1]
    ray = tuple(r[0:1, :] for r in (r0, r1, r2, r3, r4, r5))
    best_t, best_i = _lean_sweep(ray, tris_ref, rt,
                                 n_tri // tb, tmin, tb)
    out_ref[:, :] = best_t
    i_ref[:, :] = jnp.where(best_t < T_FAR, best_i.astype(jnp.int32), 0)


def _sub_slices(rt):
    """Lane slices of a clustered kernel tile, one per candidate list
    (SUBTILE_C sorted rays each — see the SUBTILE_C comment)."""
    w = min(SUBTILE_C, rt)
    return [(i * w, (i + 1) * w) for i in range(rt // w)]


def _closest_kernel_clustered(rays_ref, tris_ref, boxes_ref, sboxes_ref,
                              cand_ref, corder_ref, out_ref, i_ref, *,
                              n_tri, tmin, tmax, ns1, want_uv=True,
                              guard="both"):
    rt = rays_ref.shape[1]
    for si, (lo, hi) in enumerate(_sub_slices(rt)):
        # Load the subtile's ray rows straight from the ref: slicing an
        # already-loaded [1, RT] register at a lane offset leaves a
        # layout Mosaic cannot re-broadcast ("Invalid input layout").
        ray = tuple(rays_ref[k:k + 1, lo:hi] for k in range(6))
        best = _closest_sweep(ray, tris_ref, hi - lo,
                              n_tri // CLUSTER, tmin, tmax, tb=CLUSTER,
                              boxes_ref=boxes_ref, sboxes_ref=sboxes_ref,
                              cand_ref=cand_ref, corder_ref=corder_ref,
                              want_uv=want_uv, guard=guard,
                              cand_base=si * ns1)
        _write_closest_lanes(out_ref, i_ref, best, lo, hi)


def _closest_kernel_chained(rays_ref, tris_ref, boxes_ref, sboxes_ref,
                            cand_ref, corder_ref, pout_ref, pidx_ref,
                            out_ref, i_ref, *, n_tri, tmin, tmax, ns1,
                            want_uv=True, guard="both"):
    """Clustered closest-hit seeded with a previous slab's best hit.

    The running best-t then culls this slab's clusters from step one
    (and the caller's candidate lists were already narrowed by the
    per-ray prior t) — multi-slab scenes traverse later slabs nearly
    for free wherever an earlier slab already found a close hit."""
    rt = rays_ref.shape[1]
    for si, (lo, hi) in enumerate(_sub_slices(rt)):
        # Load the subtile's ray rows straight from the ref: slicing an
        # already-loaded [1, RT] register at a lane offset leaves a
        # layout Mosaic cannot re-broadcast ("Invalid input layout").
        ray = tuple(rays_ref[k:k + 1, lo:hi] for k in range(6))
        init = (pout_ref[0:1, lo:hi],
                pidx_ref[0:1, lo:hi].astype(jnp.float32),
                pout_ref[1:2, lo:hi], pout_ref[2:3, lo:hi],
                pout_ref[3:4, lo:hi], pout_ref[4:5, lo:hi],
                pout_ref[5:6, lo:hi], pout_ref[6:7, lo:hi])
        best = _closest_sweep(ray, tris_ref, hi - lo,
                              n_tri // CLUSTER, tmin, tmax, tb=CLUSTER,
                              boxes_ref=boxes_ref, sboxes_ref=sboxes_ref,
                              cand_ref=cand_ref, corder_ref=corder_ref,
                              want_uv=want_uv, init=init, guard=guard,
                              cand_base=si * ns1)
        _write_closest_lanes(out_ref, i_ref, best, lo, hi)


def _closest_kernel_clustered_lean(rays_ref, tris_ref, boxes_ref,
                                   sboxes_ref, cand_ref, corder_ref,
                                   out_ref, i_ref, *, n_tri, tmin, tmax,
                                   ns1, base=0, guard="both"):
    rt = rays_ref.shape[1]
    for si, (lo, hi) in enumerate(_sub_slices(rt)):
        # Load the subtile's ray rows straight from the ref: slicing an
        # already-loaded [1, RT] register at a lane offset leaves a
        # layout Mosaic cannot re-broadcast ("Invalid input layout").
        ray = tuple(rays_ref[k:k + 1, lo:hi] for k in range(6))
        best_t, best_i = _closest_sweep(
            ray, tris_ref, hi - lo, n_tri // CLUSTER, tmin, tmax,
            tb=CLUSTER, boxes_ref=boxes_ref, sboxes_ref=sboxes_ref,
            cand_ref=cand_ref, corder_ref=corder_ref, guard=guard,
            lean=True, lean_base=base, cand_base=si * ns1)
        out_ref[0:1, lo:hi] = best_t
        i_ref[0:1, lo:hi] = jnp.where(best_t < T_FAR,
                                      best_i.astype(jnp.int32), 0)


def _closest_kernel_chained_lean(rays_ref, tris_ref, boxes_ref, sboxes_ref,
                                 cand_ref, corder_ref, pout_ref, pidx_ref,
                                 out_ref, i_ref, *, n_tri, tmin, tmax,
                                 ns1, base=0, guard="both"):
    """Lean chained variant: the prior (t, GLOBAL packed id) seeds the
    2-register carry, and this slab's winners carry ``base`` (the slab's
    first packed row) in-kernel, so ids stay comparable across slabs and
    a surviving prior is never re-offset."""
    rt = rays_ref.shape[1]
    for si, (lo, hi) in enumerate(_sub_slices(rt)):
        # Load the subtile's ray rows straight from the ref: slicing an
        # already-loaded [1, RT] register at a lane offset leaves a
        # layout Mosaic cannot re-broadcast ("Invalid input layout").
        ray = tuple(rays_ref[k:k + 1, lo:hi] for k in range(6))
        init = (pout_ref[0:1, lo:hi],
                pidx_ref[0:1, lo:hi].astype(jnp.float32))
        best_t, best_i = _closest_sweep(
            ray, tris_ref, hi - lo, n_tri // CLUSTER, tmin, tmax,
            tb=CLUSTER, boxes_ref=boxes_ref, sboxes_ref=sboxes_ref,
            cand_ref=cand_ref, corder_ref=corder_ref, guard=guard,
            lean=True, lean_base=base, init=init, cand_base=si * ns1)
        out_ref[0:1, lo:hi] = best_t
        i_ref[0:1, lo:hi] = jnp.where(best_t < T_FAR,
                                      best_i.astype(jnp.int32), 0)


def _closest_kernel_clustered_b(rays_ref, tris_ref, boxes_ref, sboxes_ref,
                                out_ref, i_ref, cand_ref, *, n_tri, tmin,
                                tmax, ns1, want_uv=True):
    """Clustered closest-hit, candidate lists built IN-KERNEL (guard
    "none"; ``cand_ref`` is VMEM scratch, see ``_build_cand_table``)."""
    rt = rays_ref.shape[1]
    n_sc = n_tri // (CLUSTER * SUPER)
    for si, (lo, hi) in enumerate(_sub_slices(rt)):
        ray = tuple(rays_ref[k:k + 1, lo:hi] for k in range(6))
        _build_cand_table(ray, sboxes_ref, n_sc, tmin, tmax, cand_ref,
                          si * ns1, ns1)
        best = _closest_sweep(ray, tris_ref, hi - lo,
                              n_tri // CLUSTER, tmin, tmax, tb=CLUSTER,
                              boxes_ref=boxes_ref, sboxes_ref=sboxes_ref,
                              cand_ref=cand_ref, corder_ref=None,
                              want_uv=want_uv, guard="none",
                              cand_base=si * ns1)
        _write_closest_lanes(out_ref, i_ref, best, lo, hi)


def _closest_kernel_chained_b(rays_ref, tris_ref, boxes_ref, sboxes_ref,
                              pout_ref, pidx_ref, out_ref, i_ref,
                              cand_ref, *, n_tri, tmin, tmax, ns1,
                              want_uv=True):
    """Chained clustered closest-hit with in-kernel candidate build: the
    per-ray prior t (previous slabs' running best) narrows this slab's
    list right in the kernel — the schedule sees exactly the bound the
    sweep will use, with no XLA-side rebuild."""
    rt = rays_ref.shape[1]
    n_sc = n_tri // (CLUSTER * SUPER)
    for si, (lo, hi) in enumerate(_sub_slices(rt)):
        ray = tuple(rays_ref[k:k + 1, lo:hi] for k in range(6))
        prior_t = pout_ref[0:1, lo:hi]
        _build_cand_table(ray, sboxes_ref, n_sc, tmin, prior_t, cand_ref,
                          si * ns1, ns1)
        init = (prior_t,
                pidx_ref[0:1, lo:hi].astype(jnp.float32),
                pout_ref[1:2, lo:hi], pout_ref[2:3, lo:hi],
                pout_ref[3:4, lo:hi], pout_ref[4:5, lo:hi],
                pout_ref[5:6, lo:hi], pout_ref[6:7, lo:hi])
        best = _closest_sweep(ray, tris_ref, hi - lo,
                              n_tri // CLUSTER, tmin, tmax, tb=CLUSTER,
                              boxes_ref=boxes_ref, sboxes_ref=sboxes_ref,
                              cand_ref=cand_ref, corder_ref=None,
                              want_uv=want_uv, init=init, guard="none",
                              cand_base=si * ns1)
        _write_closest_lanes(out_ref, i_ref, best, lo, hi)


def _closest_kernel_clustered_lean_b(rays_ref, tris_ref, boxes_ref,
                                     sboxes_ref, out_ref, i_ref, cand_ref,
                                     *, n_tri, tmin, tmax, ns1, base=0):
    """Lean clustered closest-hit with in-kernel candidate build."""
    rt = rays_ref.shape[1]
    n_sc = n_tri // (CLUSTER * SUPER)
    for si, (lo, hi) in enumerate(_sub_slices(rt)):
        ray = tuple(rays_ref[k:k + 1, lo:hi] for k in range(6))
        _build_cand_table(ray, sboxes_ref, n_sc, tmin, tmax, cand_ref,
                          si * ns1, ns1)
        best_t, best_i = _closest_sweep(
            ray, tris_ref, hi - lo, n_tri // CLUSTER, tmin, tmax,
            tb=CLUSTER, boxes_ref=boxes_ref, sboxes_ref=sboxes_ref,
            cand_ref=cand_ref, corder_ref=None, guard="none",
            lean=True, lean_base=base, cand_base=si * ns1)
        out_ref[0:1, lo:hi] = best_t
        i_ref[0:1, lo:hi] = jnp.where(best_t < T_FAR,
                                      best_i.astype(jnp.int32), 0)


def _closest_kernel_chained_lean_b(rays_ref, tris_ref, boxes_ref,
                                   sboxes_ref, pout_ref, pidx_ref,
                                   out_ref, i_ref, cand_ref, *, n_tri,
                                   tmin, tmax, ns1, base=0):
    """Lean chained clustered closest-hit with in-kernel candidate
    build (prior (t, global id) seeds both the list bound and the
    sweep carry)."""
    rt = rays_ref.shape[1]
    n_sc = n_tri // (CLUSTER * SUPER)
    for si, (lo, hi) in enumerate(_sub_slices(rt)):
        ray = tuple(rays_ref[k:k + 1, lo:hi] for k in range(6))
        prior_t = pout_ref[0:1, lo:hi]
        _build_cand_table(ray, sboxes_ref, n_sc, tmin, prior_t, cand_ref,
                          si * ns1, ns1)
        init = (prior_t, pidx_ref[0:1, lo:hi].astype(jnp.float32))
        best_t, best_i = _closest_sweep(
            ray, tris_ref, hi - lo, n_tri // CLUSTER, tmin, tmax,
            tb=CLUSTER, boxes_ref=boxes_ref, sboxes_ref=sboxes_ref,
            cand_ref=cand_ref, corder_ref=None, guard="none",
            lean=True, lean_base=base, init=init, cand_base=si * ns1)
        out_ref[0:1, lo:hi] = best_t
        i_ref[0:1, lo:hi] = jnp.where(best_t < T_FAR,
                                      best_i.astype(jnp.int32), 0)


def _occluded_kernel_clustered_b(rays_ref, tris_ref, boxes_ref,
                                 sboxes_ref, occ_ref, cand_ref, *,
                                 n_tri, tmin, ns1):
    """Clustered any-hit occlusion with in-kernel candidate build: the
    per-ray tmax row (0 for already-occluded / parked rays) bounds the
    list exactly as the XLA-side build did."""
    rt = rays_ref.shape[1]
    n_sc = n_tri // (CLUSTER * SUPER)
    for si, (lo, hi) in enumerate(_sub_slices(rt)):
        ray = tuple(rays_ref[k:k + 1, lo:hi] for k in range(6))
        tmax = rays_ref[6:7, lo:hi]
        _build_cand_table(ray, sboxes_ref, n_sc, tmin, tmax, cand_ref,
                          si * ns1, ns1)
        occ = _occlusion_sweep(ray, tris_ref, tmax, hi - lo,
                               n_tri // CLUSTER, tmin, tb=CLUSTER,
                               boxes_ref=boxes_ref, sboxes_ref=sboxes_ref,
                               cand_ref=cand_ref, corder_ref=None,
                               guard="none", cand_base=si * ns1)
        occ_ref[0:1, lo:hi] = (occ > 0.0).astype(jnp.int32)



def _occluded_kernel_clustered(rays_ref, tris_ref, boxes_ref, sboxes_ref,
                               cand_ref, corder_ref, occ_ref, *, n_tri,
                               tmin, ns1, guard="both"):
    rt = rays_ref.shape[1]
    for si, (lo, hi) in enumerate(_sub_slices(rt)):
        # Load the subtile's ray rows straight from the ref: slicing an
        # already-loaded [1, RT] register at a lane offset leaves a
        # layout Mosaic cannot re-broadcast ("Invalid input layout").
        ray = tuple(rays_ref[k:k + 1, lo:hi] for k in range(6))
        tmax_r = rays_ref[6:7, lo:hi]
        occ = _occlusion_sweep(ray, tris_ref, tmax_r, hi - lo,
                               n_tri // CLUSTER, tmin, tb=CLUSTER,
                               boxes_ref=boxes_ref, sboxes_ref=sboxes_ref,
                               cand_ref=cand_ref, corder_ref=corder_ref,
                               guard=guard, cand_base=si * ns1)
        occ_ref[0:1, lo:hi] = (occ > 0.0).astype(jnp.int32)


def _closest_nee_kernel(rays_ref, tris_ref, light_ref, out_ref, i_ref, *,
                        n_tri, tmin, tmax, tb=TRI_BLOCK // 2):
    """Closest hit + NEE shadow ray in one pass over the resident triangles
    (the reference's radiance-trace + ``traceOcclusion`` pair,
    ``pathTracerPrograms.cu:750-757,1015-1017``, as a single kernel).

    Rays carry the light-sample uniforms in rows 6-7; ``light_ref`` holds
    the area-light corner/v1/v2. The shadow ray (hit point -> sampled light
    point) lives entirely in registers — it is traced unconditionally and
    the caller masks ineligible lanes (miss/refractive/backfacing), exactly
    as the unfused path zeroes their directions."""
    rt = rays_ref.shape[1]
    nb = n_tri // tb       # halved blocks: live [TB, RT] stay in scoped VMEM
    ray = _ray_rows(rays_ref)
    # want_uv=False: only the OBJ path tracer fuses NEE, and it shades
    # flat geometric normals.
    best = _closest_sweep(ray, tris_ref, rt, nb, tmin, tmax, tb=tb,
                          want_uv=False)
    best_t = best[0]

    lz1 = rays_ref[6:7, :]
    lz2 = rays_ref[7:8, :]

    def lc(k):
        return light_ref[0:1, k:k + 1]                            # [1, 1]

    ox, oy, oz, dx, dy, dz = ray
    px = ox + best_t * dx
    py = oy + best_t * dy
    pz = oz + best_t * dz
    tlx = lc(0) + lc(3) * lz1 + lc(6) * lz2 - px
    tly = lc(1) + lc(4) * lz1 + lc(7) * lz2 - py
    tlz = lc(2) + lc(5) * lz1 + lc(8) * lz2 - pz
    dist2 = tlx * tlx + tly * tly + tlz * tlz
    inv = jax.lax.rsqrt(jnp.maximum(dist2, jnp.float32(1e-12)))
    shadow = (px, py, pz, tlx * inv, tly * inv, tlz * inv)
    tmax_s = dist2 * inv - NEE_EPS                 # |to_light| - eps (cu:1017)
    occ = _occlusion_sweep(shadow, tris_ref, tmax_s, rt, nb, tmin, tb=tb)
    _write_closest(out_ref, i_ref, best, rt, occ=occ)


def _closest_nee_kernel_lean(rays_ref, tris_ref, occ_tris_ref, light_ref,
                             t_ref, i_ref, occ_ref, *, n_tri, n_occ,
                             tmin, tmax, tb=TRI_BLOCK, tb_occ=TRI_BLOCK):
    """Lean fused closest + NEE: (t, id) carry for the radiance sweep
    (attributes resolved outside, as in ``_lean_sweep``) and the shadow
    sweep over the precomputed OCCLUDER SUBSET rows (``_occ_subset``) —
    the original fused kernel predated both and had to halve its tri
    blocks to fit the 8-register carry's intermediates in scoped VMEM."""
    rt = rays_ref.shape[1]
    ray = _ray_rows(rays_ref)
    best_t, best_i = _lean_sweep(ray, tris_ref, rt, n_tri // tb, tmin, tb)

    lz1 = rays_ref[6:7, :]
    lz2 = rays_ref[7:8, :]

    def lc(k):
        return light_ref[0:1, k:k + 1]                            # [1, 1]

    ox, oy, oz, dx, dy, dz = ray
    px = ox + best_t * dx
    py = oy + best_t * dy
    pz = oz + best_t * dz
    tlx = lc(0) + lc(3) * lz1 + lc(6) * lz2 - px
    tly = lc(1) + lc(4) * lz1 + lc(7) * lz2 - py
    tlz = lc(2) + lc(5) * lz1 + lc(8) * lz2 - pz
    dist2 = tlx * tlx + tly * tly + tlz * tlz
    inv = jax.lax.rsqrt(jnp.maximum(dist2, jnp.float32(1e-12)))
    shadow = (px, py, pz, tlx * inv, tly * inv, tlz * inv)
    tmax_s = dist2 * inv - NEE_EPS                 # |to_light| - eps (cu:1017)
    occ = _occlusion_sweep(shadow, occ_tris_ref, tmax_s, rt,
                           n_occ // tb_occ, tmin, tb=tb_occ)
    t_ref[:, :] = best_t
    i_ref[:, :] = jnp.where(best_t < T_FAR, best_i.astype(jnp.int32), 0)
    occ_ref[:, :] = (occ > 0.0).astype(jnp.int32)


def _occluded_kernel(r0, r1, r2, r3, r4, r5, r6, tris_ref, occ_ref, *,
                     n_tri, tmin, tb=TRI_BLOCK):
    rt = r0.shape[1]
    ray = tuple(r[0:1, :] for r in (r0, r1, r2, r3, r4, r5))
    tmax_r = r6[0:1, :]                                           # [1, RT]
    occ = _occlusion_sweep(ray, tris_ref, tmax_r, rt,
                           n_tri // tb, tmin, tb=tb)
    occ_ref[:, :] = (occ > 0.0).astype(jnp.int32)


@functools.partial(jax.named_call, name="pallas_closest")
def _closest_call(rays, tris, n_tri: int, tmin: float, tmax: float,
                  tb: int = TRI_BLOCK, want_uv: bool = True):
    n_pad = rays[0].shape[1]
    grid = (n_pad // RAY_TILE,)
    kernel = functools.partial(_closest_kernel, n_tri=n_tri, tmin=tmin,
                               tmax=tmax, tb=tb, want_uv=want_uv)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_row_specs(6) + [
            pl.BlockSpec((n_tri, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=34 * n_pad * n_tri, bytes_accessed=n_pad * 48,
            transcendentals=0),
        interpret=_interpret(),
    )(*rays, tris)



def _single_slab_params(tb: int):
    """Scoped-VMEM budget for the single-slab kernels: [tb, RAY_TILE]
    intermediates fit the 16 MB default up to ~448 rows; full TRI_BLOCK
    blocks need ~18 MB (the Cornell-monkey OOM), but raising the limit
    unconditionally costs ~3% on scenes that fit (looser limit = less
    aggressive pipelining — measured 199.1 -> 193.7 Mrays/s on the
    headline), so the headroom is granted only when needed."""
    if tb > 448:
        return dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT))
    return {}


@functools.partial(jax.named_call, name="pallas_closest_lean")
def _closest_call_lean(rays, tris, n_tri: int, tmin: float,
                       tb: int = TRI_BLOCK):
    n_pad = rays[0].shape[1]
    grid = (n_pad // RAY_TILE,)
    kernel = functools.partial(_closest_kernel_lean, n_tri=n_tri,
                               tmin=tmin, tb=tb)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_row_specs(6) + [
            pl.BlockSpec((n_tri, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=28 * n_pad * n_tri, bytes_accessed=n_pad * 48,
            transcendentals=0),
        **_single_slab_params(tb),
        interpret=_interpret(),
    )(*rays, tris)


def _lean_resolve(tris, t, tri, n_tri: int, uv_from=None):
    """(normal, material[, u, v]) for winning tri ids via one-hot matmul.

    ``tris`` is the trimmed packed table the kernel swept, so row order
    matches the returned ids. A 0/1 one-hot times an f32 table is exact
    row selection as long as the matmul keeps f32 precision (HIGHEST —
    measured bitwise-equal to the in-kernel selects; a hand-rolled
    3x bf16 table-split variant is also exact but ~3% slower end to
    end, XLA fuses the HIGHEST passes better). Misses (id 0) are zeroed
    to match ``_hit_from_out``.

    ``uv_from`` = (origins V3, dirs V3) additionally recovers the
    winner's barycentrics OUTSIDE the kernel: the resolve also selects
    the row's edge-function form (wu, cu, wv, cv — ``pack_tris`` cols
    4:12) and evaluates ``u = wu . (o + t d) + cu`` exactly as
    ``_pe_block`` does per candidate. This lets want_uv consumers (the
    whitted pipeline) ride the lean (t, id) kernel instead of the
    8-row full-carry kernel, whose in-sweep winner-attribute machinery
    is most of its cost at small scenes."""
    if uv_from is not None:
        tbl = jnp.concatenate([tris[:, 0:3], tris[:, 4:12],
                               tris[:, 14:15]], axis=1)        # [T, 12]
    else:
        tbl = jnp.concatenate([tris[:, 0:3], tris[:, 14:15]],
                              axis=1)                          # [T, 4]
    # Exact selection in ONE default-precision MXU pass: the 0/1 one-hot
    # is bf16-exact, and the f32 table rides as three Dekker-split bf16
    # parts CONCATENATED column-wise ([T, 12]) — one matmul, one fused
    # one-hot generation, then three exact f32 adds recombine the parts.
    # (HIGHEST precision regenerates the fused one-hot once per bf16
    # pass — 6x; three separate split matmuls — 3x; this is 1x.)
    onehot = (tri[:, None] == jnp.arange(n_tri, dtype=jnp.int32)[None, :]
              ).astype(jnp.bfloat16)
    # optimization_barrier on the split parts: --xla_allow_excess_precision
    # (set in this runtime) can elide the f32->bf16->f32 round-trip inside
    # the fused frame graph, silently truncating the select to ONE bf16
    # part — isolated tests stay exact, whole frames diverge. The
    # barriers pin the rounding; measured bitwise-identical to the
    # in-sweep selects at full-frame scale with them, diverging without.
    p0 = tbl.astype(jnp.bfloat16)
    r1 = tbl - jax.lax.optimization_barrier(p0).astype(jnp.float32)
    p1 = r1.astype(jnp.bfloat16)
    p2 = (r1 - jax.lax.optimization_barrier(p1).astype(jnp.float32)
          ).astype(jnp.bfloat16)
    w = tbl.shape[1]
    parts = jnp.concatenate([p0, p1, p2], axis=1)               # [T, 3w]
    sel = jnp.matmul(onehot, parts,
                     preferred_element_type=jnp.float32)        # [N, 3w]
    rows = sel[:, 0:w] + sel[:, w:2 * w] + sel[:, 2 * w:3 * w]
    hit = t < T_FAR
    rows = jnp.where(hit[:, None], rows, 0.0)
    if uv_from is None:
        return Hit(t=t, tri=tri, hit=hit,
                   normal=V3(rows[:, 0], rows[:, 1], rows[:, 2]),
                   mat=jnp.round(rows[:, 3]).astype(jnp.int32),
                   u=jnp.zeros_like(t), v=jnp.zeros_like(t))
    o, d = uv_from
    px = o.x + t * d.x
    py = o.y + t * d.y
    pz = o.z + t * d.z
    u = rows[:, 3] * px + rows[:, 4] * py + rows[:, 5] * pz + rows[:, 6]
    v = rows[:, 7] * px + rows[:, 8] * py + rows[:, 9] * pz + rows[:, 10]
    return Hit(t=t, tri=tri, hit=hit,
               normal=V3(rows[:, 0], rows[:, 1], rows[:, 2]),
               mat=jnp.round(rows[:, 11]).astype(jnp.int32),
               u=jnp.where(hit, u, 0.0), v=jnp.where(hit, v, 0.0))


# One-hot resolve cost scales with the triangle count (construction +
# [N, T] matmul operand traffic); above this the in-sweep selects win.
LEAN_MAX_TRIS = int(os.environ.get("TPT_LEAN_MAX", 2048))


def _lean_resolve_packed(packed, t, row, uv_from=None):
    """(normal, mat, orig-id[, u, v]) for winning PACKED row ids, any
    table size.

    Two-level exact one-hot: split the row id as (hi, lo) over a
    [H, 128, C] reshape of the attribute columns, select the hi-slice
    with a HIGHEST-precision [N, H] x [H, 128C] matmul (exact — one-hot
    times f32), then the lo row with a masked [N, 128, C] reduction
    (sums of one exact product). Direct one-hot would need an [N, T]
    operand; the split costs [N, H] + [N, 128C] instead, which keeps
    the resolve affordable at 100k-row big-scene tables.

    ``uv_from`` = (origins V3, dirs V3) in the SAME lane order as ``t``
    and ``row`` (the call site unsorts t/row to original wavefront
    order first, so it passes the caller's untouched origins/dirs):
    additionally selects the row's edge-function form (``pack_tris``
    cols 4:12) and evaluates the winner's barycentrics outside the
    kernel — the big-scene mirror of ``_lean_resolve``'s lean-uv path,
    letting want_uv consumers (whitted on big glTF scenes) ride the
    lean clustered kernels."""
    if uv_from is not None:
        tbl = jnp.concatenate([packed[:, 0:3], packed[:, 4:12],
                               packed[:, 14:16]], axis=1)        # [T, 13]
    else:
        tbl = jnp.concatenate([packed[:, 0:3], packed[:, 14:16]],
                              axis=1)                            # [T, 5]
    n_t = tbl.shape[0]
    h = (n_t + 127) // 128
    if h * 128 != n_t:
        tbl = jnp.pad(tbl, ((0, h * 128 - n_t), (0, 0)))
    hi = row // 128
    lo = row % 128
    # The hi-select matmul must land on the MXU: an f32 HIGHEST dot here
    # gets fused into a [N, H, 640] broadcast-reduce on the VPU at large
    # N (measured 18 ms/round at 32k lanes vs 0.16 at 8k). A bf16
    # one-hot against a 3-part bf16 table split (Dekker-style, 8+8+8
    # significand bits reconstruct all 24) keeps every pass a default-
    # precision MXU dot and stays bitwise-exact: each product is 0/1
    # times a bf16 part, each row sum has one nonzero term, and the
    # three part-sums are exact f32 adds by construction.
    c = tbl.shape[1]
    oh_hi = (hi[:, None] == jnp.arange(h, dtype=jnp.int32)[None, :]
             ).astype(jnp.bfloat16)
    tblr = tbl.reshape(h, 128 * c)
    # Three accumulated split matmuls; the single-pass concatenated-parts
    # variant that wins in _lean_resolve LOSES here (4.01 vs 4.14
    # Mrays/s) — its [N, 3*128C] intermediate outweighs the saved
    # one-hot regenerations at this output width.
    slab5 = jnp.zeros((row.shape[0], 128 * c), jnp.float32)
    rem = tblr
    for _ in range(3):
        # optimization_barrier: --xla_allow_excess_precision may elide
        # the f32->bf16->f32 round-trip, silently truncating the split
        # to one bf16 part (caught by whole-frame bitwise A/B).
        part = jax.lax.optimization_barrier(rem.astype(jnp.bfloat16))
        rem = rem - part.astype(jnp.float32)
        slab5 = slab5 + jnp.matmul(oh_hi, part,
                                   preferred_element_type=jnp.float32)
    slab5 = slab5.reshape(-1, 128, c)
    oh_lo = (lo[:, None] == jnp.arange(128, dtype=jnp.int32)[None, :]
             ).astype(jnp.float32)
    rows = jnp.sum(slab5 * oh_lo[:, :, None], axis=1)            # [N, C]
    hit = t < T_FAR
    rows = jnp.where(hit[:, None], rows, 0.0)
    if uv_from is None:
        return Hit(t=t, tri=jnp.round(rows[:, 4]).astype(jnp.int32),
                   hit=hit,
                   normal=V3(rows[:, 0], rows[:, 1], rows[:, 2]),
                   mat=jnp.round(rows[:, 3]).astype(jnp.int32),
                   u=jnp.zeros_like(t), v=jnp.zeros_like(t))
    o, d = uv_from
    px = o.x + t * d.x
    py = o.y + t * d.y
    pz = o.z + t * d.z
    u = rows[:, 3] * px + rows[:, 4] * py + rows[:, 5] * pz + rows[:, 6]
    v = rows[:, 7] * px + rows[:, 8] * py + rows[:, 9] * pz + rows[:, 10]
    return Hit(t=t, tri=jnp.round(rows[:, 12]).astype(jnp.int32), hit=hit,
               normal=V3(rows[:, 0], rows[:, 1], rows[:, 2]),
               mat=jnp.round(rows[:, 11]).astype(jnp.int32),
               u=jnp.where(hit, u, 0.0), v=jnp.where(hit, v, 0.0))


@functools.partial(jax.named_call, name="pallas_occluded")
def _occluded_call(rays, tris, n_tri: int, tmin: float,
                   tb: int = TRI_BLOCK):
    n_pad = rays[0].shape[1]
    grid = (n_pad // RAY_TILE,)
    kernel = functools.partial(_occluded_kernel, n_tri=n_tri, tmin=tmin,
                               tb=tb)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_row_specs(7) + [
            pl.BlockSpec((n_tri, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=34 * n_pad * n_tri, bytes_accessed=n_pad * 48,
            transcendentals=0),
        **_single_slab_params(tb),
        interpret=_interpret(),
    )(*rays, tris)


@functools.partial(jax.named_call, name="pallas_closest_nee_lean")
def _closest_nee_call_lean(rays, tris, occ_tris, light, n_tri: int,
                           n_occ: int, tmin: float, tmax: float,
                           tb: int = TRI_BLOCK, tb_occ: int = TRI_BLOCK):
    n_pad = rays.shape[1]
    grid = (n_pad // FUSED_RAY_TILE,)
    kernel = functools.partial(_closest_nee_kernel_lean, n_tri=n_tri,
                               n_occ=n_occ, tmin=tmin, tmax=tmax,
                               tb=tb, tb_occ=tb_occ)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, FUSED_RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tri, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_occ, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, FUSED_RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FUSED_RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FUSED_RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * n_pad * (n_tri + n_occ), bytes_accessed=n_pad * 52,
            transcendentals=0),
        **_single_slab_params(max(tb, tb_occ)),
        interpret=_interpret(),
    )(rays, tris, occ_tris, light)


@functools.partial(jax.named_call, name="pallas_closest_nee")
def _closest_nee_call(rays, tris, light, n_tri: int, tmin: float,
                      tmax: float, tb: int = TRI_BLOCK // 2):
    n_pad = rays.shape[1]
    grid = (n_pad // FUSED_RAY_TILE,)
    kernel = functools.partial(_closest_nee_kernel, n_tri=n_tri, tmin=tmin,
                               tmax=tmax, tb=tb)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, FUSED_RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tri, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, FUSED_RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FUSED_RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=64 * n_pad * n_tri, bytes_accessed=n_pad * 52,
            transcendentals=0),
        interpret=_interpret(),
    )(rays, tris, light)


def _hit_from_out(out, idx, n):
    t = out[0, :n]
    return Hit(t=t, tri=idx[0, :n], hit=t < T_FAR,
               normal=V3(out[1, :n], out[2, :n], out[3, :n]),
               mat=out[4, :n].astype(jnp.int32),
               u=out[5, :n], v=out[6, :n])


def intersect_closest_nee(scene: SceneArrays, origins: V3, dirs: V3,
                          lz1: jnp.ndarray, lz2: jnp.ndarray,
                          tmin: float = 0.01,
                          tmax: float = T_FAR) -> tuple[Hit, jnp.ndarray]:
    """Closest hit plus NEE shadow-ray occlusion in one kernel pass.

    The shadow ray runs from the hit point toward the area-light point
    sampled by (lz1, lz2), range ``|to_light| - 0.01`` (reference
    convention); refractive surfaces do not occlude. Returns
    (Hit, occluded [N] bool); occluded is meaningful only where
    ``hit.hit`` — callers mask eligibility exactly as with
    ``intersect_occluded``."""
    origins = as_v3(origins)
    dirs = as_v3(dirs)
    n = origins.x.shape[0]
    n_pad = _pad_to(n, FUSED_RAY_TILE)
    rays = pack_rays(origins, dirs, lz1, n_pad, row7=lz2)
    packed = pack_tris(scene)
    light = jnp.zeros((1, 128), jnp.float32)
    light = light.at[0, 0:3].set(scene.light.corner)
    light = light.at[0, 3:6].set(scene.light.v1)
    light = light.at[0, 6:9].set(scene.light.v2)
    sub = _occ_subset(scene)
    # Lean kernels carry 2/1 rows, so they take full TRI_BLOCK blocks
    # (measured 188.3 -> 201.5 Mrays/s, see _trim_rows); the full-carry
    # fallback below re-trims at the VMEM-safe 256.
    tris, tb = _trim_single(scene, packed, hb=TRI_BLOCK)
    if (tris.shape[0] <= LEAN_MAX_TRIS
            and os.environ.get("TPT_LEAN_FUSED", "1") == "1"):
        if sub is not None:
            occ_tris, tb_occ = _trim_rows(sub[1], sub[0], hb=TRI_BLOCK)
        else:
            occ_tris, tb_occ = tris, tb
        out_t, idx, occ = _closest_nee_call_lean(
            rays, tris, occ_tris, light, tris.shape[0],
            occ_tris.shape[0], tmin, tmax, tb=tb, tb_occ=tb_occ)
        hit = _lean_resolve(tris, out_t[0, :n], idx[0, :n], tris.shape[0])
        return hit, occ[0, :n] > 0
    tris, tb = _trim_single(scene, packed)
    out, idx = _closest_nee_call(rays, tris, light, tris.shape[0], tmin,
                                 tmax, tb=tb)
    return _hit_from_out(out, idx, n), out[7, :n] > 0.5


# Triangle slab: the kernels hold all their triangles in one VMEM block,
# so scenes are swept in slabs this big and the per-slab results combined
# outside (min for closest, OR for occlusion). 8k rows x 16 f32 = 0.5 MB,
# leaving the scoped-VMEM budget to the [TB, RT] intermediates. Measured
# v5e: this slabbed brute force beats the jnp LBVH traversal (gather-bound,
# ~6 ns/gather) by ~10x even at 100k triangles. Bigger scenes use the
# clustered kernels: triangles Morton-ordered, one AABB per CLUSTER rows
# plus supercluster AABBs per SUPER clusters; per-tile supercluster work
# lists are computed outside the kernel (``super_candidates``) and the
# in-kernel loop visits only those, each cluster guarded by a best-t
# slab test. Culling, not the sweep, bounds the cost — and CHAINING the
# slabs through the running best hit prunes harder than any single
# whole-scene candidate list: each slab's lists are built against the
# per-ray prior t from the slabs before it. Swept on the 100k-tri frame
# (Mrays/s): 1 slab 3.62, 2x65536 3.84, 4x32768 3.99, 7x16384 3.90,
# 13x8192 4.16, 25x4096 4.18, 49x2048 3.86; and on the 1M-tri scene
# 16 slabs 0.89, 32 slabs 0.95, 64 slabs 0.75. The optimum slab COUNT
# grows slowly with scene size — 16 * (T / 100k)^0.3 matches both
# measured optima (16-25 at 100k, 32 at 1M). TPT_CSLABS overrides the
# count, TPT_CSLAB the size outright.
TRI_SLAB = int(os.environ.get("TPT_TRI_SLAB", 8192))
CLUSTERED_SLABS = int(os.environ.get("TPT_CSLABS", 0))  # 0 = derive
CLUSTERED_SLAB = int(os.environ.get("TPT_CSLAB", 0))    # 0 = derive


def _clustered_slab_rows(n_rows: int) -> int:
    """Slab size for the chained clustered launches, rounded to the
    8-supercluster (1024-row) alignment the box blocks need."""
    if CLUSTERED_SLAB:
        return CLUSTERED_SLAB
    count = CLUSTERED_SLABS or max(4, min(64, round(
        16.0 * (n_rows / 1e5) ** 0.3)))
    quantum = 8 * CLUSTER * SUPER
    per_slab = -(-n_rows // count)
    return max(quantum, -(-per_slab // quantum) * quantum)


def _tri_slabs(tris, boxes=None, sboxes=None):
    if boxes is None:
        return [(s, tris[s:s + TRI_SLAB], None, None, None)
                for s in range(0, tris.shape[0], TRI_SLAB)]
    slab = _clustered_slab_rows(tris.shape[0])
    bc = slab // CLUSTER
    sc = slab // (CLUSTER * SUPER)
    out = []
    for s in range(0, tris.shape[0], slab):
        bx = boxes[s // CLUSTER:s // CLUSTER + bc]
        sbx = sboxes[s // (CLUSTER * SUPER):s // (CLUSTER * SUPER) + sc]
        # The in-kernel-build path never reads the octant order table
        # (guard "none"); skip its per-slab argsort in the traced graph.
        # (TPT_GUARD_OCC can re-enable guards for occlusion only, which
        # keeps the table as a kernel operand there.)
        occ_g = os.environ.get("TPT_GUARD_OCC") or _guard_mode()
        corder = (None if (_inkb(sc) and occ_g == "none")
                  else octant_orders(bx))
        out.append((s, tris[s:s + slab], bx, sbx, corder))
    return out


def _candidate_key(rays, sboxes, tmin=0.01):
    """Sort key grouping rays by their two NEAREST pierced superclusters.

    Spatial keys (octant/direction morton) group rays that LOOK alike;
    what the per-tile union actually needs is rays that NEED the same
    clusters. Measured on the 100k-tri scene: bounce-ray tiles under the
    dir12 key swept 158 of 200 superclusters (exact union) while each
    ray pierces only ~8 — direction spread in a tile unions nearly the
    whole scene. Keying by (nearest sid, second sid, origin morton)
    groups rays whose traversal begins identically, and their remaining
    candidate sets correlate, so tile unions collapse toward the per-ray
    count. Costs one dense [N, NS] slab pass (the same math
    ``super_candidates_exact`` runs later per slab).

    Key layout (uint32): sid pair (sid0*(NS+1)+sid1, NS = no-hit
    sentinel) in the high bits, scene-origin morton below."""
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
    ok = (tn <= tf) & (tf > tmin)
    key_t = jnp.where(ok, tn, big)
    sid0 = jnp.argmin(key_t, axis=1)                          # [N]
    t0_ = jnp.min(key_t, axis=1)
    key_t2 = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, key_t.shape, 1)
        == sid0[:, None], big, key_t)
    sid1 = jnp.argmin(key_t2, axis=1)
    t1_ = jnp.min(key_t2, axis=1)
    none0 = t0_ >= big
    none1 = t1_ >= big
    s0 = jnp.where(none0, ns, sid0).astype(jnp.uint32)
    s1 = jnp.where(none1, ns, sid1).astype(jnp.uint32)
    pair = s0 * jnp.uint32(ns + 1) + s1
    from .lbvh import morton3d
    lo = jnp.min(sboxes[:, 0:3], axis=0)
    hi = jnp.max(sboxes[:, 3:6], axis=0)
    p01 = jnp.clip((o.T - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
    pair_bits = max((ns + 1) * (ns + 1) - 1, 1).bit_length()
    shift = max(0, 32 - pair_bits)
    return (pair << shift) | (morton3d(p01) >> jnp.uint32(30 - shift))


def _coherence_key(rays, boxes, sboxes=None, pred=None):
    """Sort key making ray tiles spatially coherent: direction octant in
    the high bits, Morton code of the scene-normalized origin below.

    Mode ``cand`` (env knob) delegates to ``_candidate_key`` (group by
    needed clusters, not by looks) — measured a wash on the tiled path
    (1.58 vs dir12's 1.64 Mrays/s whole-frame) while costing an extra
    [N, NS] slab pass, so dir12 stays the default.

    Cluster culling only pays when the rays of a tile agree on which
    clusters they might touch; bounce rays are direction-random but
    origin-local, so this ordering restores most of the coherence the
    pixel-ordered queue loses after the first bounce.

    The default key is DIRECTION-major: the top 12 bits are an
    interleaved direction morton code (per axis: sign bit, then
    magnitude halves), the rest the origin morton code. A 512-ray tile
    then shares a ~1/16-of-an-octant direction cone, which is what the
    conservative interval tests in ``super_candidates`` need — per-tile
    direction intervals of a full octant span every reciprocal from
    1/eps down, and the candidate unions saturate. Measured on the
    100k-tri scene at 256^2 x 4 bounces: octant-only key 0.99 Mrays/s,
    6 direction bits 1.34, 9 bits 1.36, 12 bits 1.39 (saturating; 20
    origin bits = ~6 bits/axis locality is still plenty). Env knob
    ``TPT_SORT_KEY`` (oct | dir6 | dir9 | dir12) for tuning."""
    from .lbvh import morton3d

    # Scene bounds over REAL cluster boxes only: collapsed all-padding
    # clusters sit at the 3e37 far point (pack_tris_clustered), and
    # including them inflates hi to 3e37 — normalizing by that flushes
    # every origin morton to 0, silently deleting the origin bits from
    # every key mode.
    real = boxes[:, 0] < 1e30
    big = jnp.float32(3e38)
    lo = jnp.min(jnp.where(real[:, None], boxes[:, 0:3], big), axis=0)
    hi = jnp.max(jnp.where(real[:, None], boxes[:, 3:6], -big), axis=0)
    o = rays[0:3, :].T                                       # [N, 3]
    d = rays[3:6, :]
    p01 = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
    if pred is not None and os.environ.get("TPT_SORT_KEY",
                                           "dir12") == "dir12":
        # An EXPLICIT TPT_SORT_KEY ablation wins over prediction
        # ordering (otherwise a sort-key sweep with TPT_PRED left at
        # its default would silently measure the pred key instead).
        # PREDICTED-LANDING-SLAB major (then dir12's direction+origin
        # bits): the scheduler predicts which chained slab each ray's
        # closest hit lies in (bounce rays: the parent ray's landing
        # slab; camera re-samples: the pixel's previous camera landing
        # slab) and groups tiles by it. Ordering-only — a wrong
        # prediction costs candidate-list tightness, never correctness.
        # Frame-workload sim (tools/sim_frame.py, 128^2 x 3 cosine
        # generations on the 100k-tri scene): 0.75x of dir12's
        # candidate entries, vs 0.66x for the landing-slab ORACLE.
        # Unknown predictions (sentinel >= s_count) share the top
        # bucket and fall back to pure direction+origin order there.
        rows = boxes.shape[0] * CLUSTER
        slab_rows = _clustered_slab_rows(rows)
        s_count = -(-rows // slab_rows)
        if s_count > 1:
            sbits = int(s_count).bit_length()
            d01 = jnp.clip(0.5 * (d.T + 1.0), 0.0, 1.0)
            dbits = min(12, 32 - sbits - 12)
            dm = morton3d(d01) >> (30 - dbits)
            om_bits = 32 - sbits - dbits
            ps = jnp.minimum(pred.astype(jnp.uint32), jnp.uint32(s_count))
            return ((ps << (32 - sbits)) | (dm << om_bits)
                    | (morton3d(p01) >> (30 - om_bits)))
    mode = os.environ.get("TPT_SORT_KEY", "dir12")
    if mode == "cand":
        if sboxes is not None:
            return _candidate_key(rays, sboxes)
        mode = "dir12"         # no supercluster boxes at this call site
    if mode == "near":
        # NEAREST-PIERCED-SLAB-major: group rays by which chained slab
        # their traversal enters first, then by direction. Kept as an
        # ablation mode: tools/sim_candidates.py initially credited it
        # with 0.53x of dir12's candidate work, but that run sampled
        # origins from the packed-normals AABB (~unit cube) — on the
        # corrected scene-spread workload it counts 0.98x. For
        # surface-origin rays the first pierced slab is just the
        # origin's slab, which dir12's origin-morton bits already
        # encode. Falls back to dir12 when the scene is a single slab.
        rows = boxes.shape[0] * CLUSTER
        slab_rows = _clustered_slab_rows(rows)
        sb = sboxes if sboxes is not None else boxes
        sc_per = slab_rows // (rows // sb.shape[0])
        s_count = -(-sb.shape[0] // sc_per)       # ceil: trailing slab
        if s_count > 1:
            need = s_count * sc_per
            if sb.shape[0] != need:
                far = jnp.full((need - sb.shape[0], sb.shape[1]),
                               3e37, sb.dtype)
                sb = jnp.concatenate([sb, far], axis=0)
            # Aggregate each slab's AABB over REAL boxes only: far-point
            # pads and collapsed empties (3e37) inside a partial slab
            # would otherwise inflate its max corner to 3e37, making the
            # slab spuriously pierced-first for ~1/3 of rays. An
            # all-padding slab aggregates inverted (+big, -big) and is
            # never pierced.
            realr = (sb[:, 0] < 1e30)[:, None]
            slo = jnp.where(realr, sb[:, 0:3], big).reshape(
                s_count, sc_per, 3).min(axis=1)
            shi = jnp.where(realr, sb[:, 3:6], -big).reshape(
                s_count, sc_per, 3).max(axis=1)
            eps = 1e-12
            inv = 1.0 / jnp.where(jnp.abs(d) > eps, d,
                                  jnp.where(d >= 0, eps, -eps))
            tn = jnp.full((o.shape[0], s_count), -3e38, jnp.float32)
            tf = jnp.full((o.shape[0], s_count), 3e38, jnp.float32)
            for a in range(3):
                t0 = (slo[None, :, a] - o[:, a:a + 1]) * inv[a][:, None]
                t1 = (shi[None, :, a] - o[:, a:a + 1]) * inv[a][:, None]
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            ok = (tn <= tf) & (tf > 0.01)
            keyt = jnp.where(ok, tn, jnp.float32(3e38))
            slab0 = jnp.where(jnp.any(ok, axis=1),
                              jnp.argmin(keyt, axis=1),
                              s_count).astype(jnp.uint32)
            sbits = int(s_count).bit_length()        # slab0 <= s_count
            d01 = jnp.clip(0.5 * (d.T + 1.0), 0.0, 1.0)
            # 12 direction bits, matching dir12; s_count <= 64 leaves
            # >= 13 origin bits.
            dbits = min(12, 32 - sbits - 12)
            dm = morton3d(d01) >> (30 - dbits)
            om_bits = 32 - sbits - dbits
            return ((slab0 << (32 - sbits))
                    | (dm << om_bits)
                    | (morton3d(p01) >> (30 - om_bits)))
        mode = "dir12"
    if mode in ("dir6", "dir9", "dir12"):
        d01 = jnp.clip(0.5 * (d.T + 1.0), 0.0, 1.0)
        dbits = {"dir6": 6, "dir9": 9, "dir12": 12}[mode]
        dm = morton3d(d01) >> (30 - dbits)
        return (dm << (32 - dbits)) | (morton3d(p01) >> (dbits - 2))
    octant = ((d[0] > 0).astype(jnp.uint32)
              + 2 * (d[1] > 0).astype(jnp.uint32)
              + 4 * (d[2] > 0).astype(jnp.uint32))
    return (octant << 27) | (morton3d(p01) >> 3)


def _sorted_rays(rays, key):
    """Sort ray columns by key; returns (sorted rays, permutation,
    sorted key). The sorted key rides along for free and carries the
    per-ray predicted slab in its top bits under prediction ordering
    (consumed by the rotated chain, ``_closest_call_rotated``)."""
    n = rays.shape[1]
    iota = jnp.arange(n, dtype=jnp.int32)
    out = jax.lax.sort((key, iota) + tuple(rays[k] for k in range(8)),
                       num_keys=1)
    return jnp.stack(out[2:], axis=0), out[1], out[0]


def _unsort(perm, rows):
    """Restore original column order: sort the row bundle by ``perm``."""
    out = jax.lax.sort((perm,) + tuple(rows), num_keys=1)
    return out[1:]


def _guard_mode() -> str:
    """In-kernel skip machinery for the clustered path (see
    ``_closest_sweep``). Env knob ``TPT_GUARD`` (both | super | none);
    default "none" — under the kd cluster order the precomputed work
    lists are tight enough that in-kernel conds only serialize the sweep
    (2.53 -> 2.75 Mrays/s on the 100k-tri frame, parity on incoherent
    batches; measurement table in ``_closest_sweep``).

    At SUPER == 1 the per-cluster re-test inside a visited supercluster
    checks the IDENTICAL box the supercluster cond just passed, so
    "both" degrades to "super" (measured 2.13 -> 2.47 Mrays/s on the
    100k-tri frame — the redundant test was ~14% of the kernel)."""
    mode = os.environ.get("TPT_GUARD", "none")
    if mode not in ("both", "super", "none"):
        raise ValueError(f"TPT_GUARD must be both|super|none, got {mode!r}")
    if mode == "both" and SUPER == 1:
        return "super"
    return mode


@functools.partial(jax.named_call, name="pallas_closest_c")
def _closest_call_clustered(rays, tris, boxes, sboxes, cand, corder,
                            n_tri: int, tmin: float, tmax: float,
                            want_uv: bool = True, prior=None,
                            lean: bool = False, base: int = 0,
                            build: bool = False):
    n_pad = rays.shape[1]
    grid = (n_pad // RAY_TILE_C,)
    ns1 = _pad_to(1 + n_tri // (CLUSTER * SUPER), 8)   # work-list rows
    sub_per = RAY_TILE_C // min(SUBTILE_C, RAY_TILE_C)
    guard = _guard_mode()
    out_rows = 1 if lean else 8
    if build:
        # Candidate lists built in-kernel (see _build_cand_table): the
        # cand/corder operands drop; a VMEM scratch holds the table.
        assert cand is None and corder is None
        if prior is None:
            if lean:
                kernel = functools.partial(
                    _closest_kernel_clustered_lean_b, n_tri=n_tri,
                    tmin=tmin, tmax=tmax, ns1=ns1, base=base)
            else:
                kernel = functools.partial(
                    _closest_kernel_clustered_b, n_tri=n_tri, tmin=tmin,
                    tmax=tmax, ns1=ns1, want_uv=want_uv)
            extra_in, extra_specs = (), ()
        else:
            if lean:
                kernel = functools.partial(
                    _closest_kernel_chained_lean_b, n_tri=n_tri,
                    tmin=tmin, tmax=tmax, ns1=ns1, base=base)
            else:
                kernel = functools.partial(
                    _closest_kernel_chained_b, n_tri=n_tri, tmin=tmin,
                    tmax=tmax, ns1=ns1, want_uv=want_uv)
            extra_in = prior
            extra_specs = (
                pl.BlockSpec((out_rows, RAY_TILE_C), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RAY_TILE_C), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, RAY_TILE_C), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_tri, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_tri // CLUSTER, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_tri // (CLUSTER * SUPER), 8),
                             lambda i: (0, 0), memory_space=pltpu.VMEM),
                *extra_specs,
            ],
            out_specs=[
                pl.BlockSpec((out_rows, RAY_TILE_C), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RAY_TILE_C), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((out_rows, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((sub_per * ns1, 1), jnp.int32)],
            cost_estimate=pl.CostEstimate(
                flops=40 * n_pad * n_tri, bytes_accessed=n_pad * 48,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=_interpret(),
        )(rays, tris, boxes, sboxes, *extra_in)
    if prior is None:
        if lean:
            kernel = functools.partial(_closest_kernel_clustered_lean,
                                       n_tri=n_tri, tmin=tmin, tmax=tmax,
                                       ns1=ns1, base=base, guard=guard)
        else:
            kernel = functools.partial(_closest_kernel_clustered,
                                       n_tri=n_tri, tmin=tmin, tmax=tmax,
                                       ns1=ns1, want_uv=want_uv,
                                       guard=guard)
        extra_in, extra_specs = (), ()
    else:
        if lean:
            kernel = functools.partial(_closest_kernel_chained_lean,
                                       n_tri=n_tri, tmin=tmin, tmax=tmax,
                                       ns1=ns1, base=base, guard=guard)
        else:
            kernel = functools.partial(_closest_kernel_chained,
                                       n_tri=n_tri, tmin=tmin, tmax=tmax,
                                       ns1=ns1, want_uv=want_uv,
                                       guard=guard)
        extra_in = prior
        extra_specs = (
            pl.BlockSpec((out_rows, RAY_TILE_C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE_C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_TILE_C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tri, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tri // CLUSTER, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tri // (CLUSTER * SUPER), 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub_per * ns1, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * (n_tri // CLUSTER), 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec((out_rows, RAY_TILE_C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE_C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * n_pad * n_tri, bytes_accessed=n_pad * 48,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(rays, tris, boxes, sboxes, cand, corder, *extra_in)


@functools.partial(jax.named_call, name="pallas_occluded_c")
def _occluded_call_clustered(rays, tris, boxes, sboxes, cand, corder,
                             n_tri: int, tmin: float,
                             build: bool = False):
    n_pad = rays.shape[1]
    grid = (n_pad // RAY_TILE_C,)
    ns1 = _pad_to(1 + n_tri // (CLUSTER * SUPER), 8)
    sub_per = RAY_TILE_C // min(SUBTILE_C, RAY_TILE_C)
    occ_guard = os.environ.get("TPT_GUARD_OCC")
    if occ_guard is not None and occ_guard not in ("both", "super", "none"):
        raise ValueError(f"TPT_GUARD_OCC must be both|super|none, "
                         f"got {occ_guard!r}")
    if occ_guard == "both" and SUPER == 1:
        occ_guard = "super"
    if build:
        assert cand is None and corder is None
        kernel = functools.partial(_occluded_kernel_clustered_b,
                                   n_tri=n_tri, tmin=tmin, ns1=ns1)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, RAY_TILE_C), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_tri, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_tri // CLUSTER, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_tri // (CLUSTER * SUPER), 8),
                             lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, RAY_TILE_C), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            scratch_shapes=[pltpu.VMEM((sub_per * ns1, 1), jnp.int32)],
            cost_estimate=pl.CostEstimate(
                flops=40 * n_pad * n_tri, bytes_accessed=n_pad * 48,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=_interpret(),
        )(rays, tris, boxes, sboxes)
    kernel = functools.partial(_occluded_kernel_clustered, n_tri=n_tri,
                               tmin=tmin, ns1=ns1,
                               guard=occ_guard or _guard_mode())
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_TILE_C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tri, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tri // CLUSTER, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tri // (CLUSTER * SUPER), 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub_per * ns1, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * (n_tri // CLUSTER), 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RAY_TILE_C), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=40 * n_pad * n_tri, bytes_accessed=n_pad * 48,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(rays, tris, boxes, sboxes, cand, corder)


def _trim_rows(t_real: int, packed: jnp.ndarray, hb: int | None = None):
    """Trim a single-slab triangle buffer to the finest 8-aligned padding.

    Scene arrays pad to TRI_PAD (128) rows and ``pack_tris`` to TRI_BLOCK
    multiples, but the kernels only need the row count to split into
    equal 8-aligned blocks — the mixed Cornell box (428 tris) sweeps 432
    rows instead of 512. Returns (trimmed buffer, block size).

    ``hb`` caps the rows per block. The full (8-row-carry) kernels keep
    256 (hb=None): their per-block intermediates sat at ~16.0 MB scoped
    VMEM with 512 blocks and OOM'd in fusion-heavy graphs (whitted). The
    lean and occlusion kernels carry 2/1 rows, so their call sites pass
    hb=TRI_BLOCK (512) — the mixed Cornell then sweeps its 432 rows as
    ONE straight-line block instead of a 2-iteration fori_loop, which
    Mosaic pipelines ~7%% better end to end (measured 188.3 -> 201.5
    Mrays/s on the 1024^2 x 16 spp headline; TPT_FINE_TB ablates the
    lean sites only — full-carry sites ignore it so the knob cannot
    push them past the VMEM-safe 256; 1024-wide ray tiles at this block
    size LOSE: 185.2)."""
    if hb is None:
        hb = TRI_BLOCK // 2
    else:
        env = os.environ.get("TPT_FINE_TB")
        if env:
            hb = int(env)
            if hb <= 0 or hb % 8:
                raise ValueError(
                    f"TPT_FINE_TB={env}: must be a positive multiple of 8")
    if not t_real or t_real >= packed.shape[0]:
        return packed, min(hb, packed.shape[0])
    nb = -(-t_real // hb)                 # blocks needed at <=256 rows
    t_fine = min(-(-t_real // (8 * nb)) * 8 * nb, packed.shape[0])
    return packed[:t_fine], t_fine // nb


def _trim_single(scene: SceneArrays, packed: jnp.ndarray,
                 hb: int | None = None):
    return _trim_rows(scene.num_tris, packed, hb=hb)


def _occ_subset(scene: SceneArrays):
    """Packed rows of the NEE occluder subset, or None.

    Scene build classifies which triangles can possibly occlude a
    surface->area-light shadow segment (``scene/arrays.py
    nee_occluder_index``): refractive triangles (light passes,
    ``pathTracerPrograms.cu:672-681``) and hull-boundary triangles (every
    segment endpoint on one side of their plane) never can. Gathering just
    those rows shrinks the occlusion sweep — in a Cornell box from the
    whole scene to the interior blocks. Padding rows (duplicates of row
    occ_index[0]) get their valid column zeroed so an empty subset stays
    empty. Returns (packed [O_pad, 16], n_occ) or None when the scene
    carries no analysis."""
    if scene.num_occluders < 0 or scene.occ_index is None:
        return None
    sub = pack_tris(scene)[scene.occ_index]
    lane = (jnp.arange(sub.shape[0]) < scene.num_occluders)
    sub = sub * jnp.where(lane, 1.0, 0.0).astype(sub.dtype)[:, None]
    return sub, scene.num_occluders


def intersect_closest(scene: SceneArrays, origins: V3, dirs: V3,
                      tmin: float = 0.01, tmax: float = T_FAR,
                      want_uv: bool = True, pred=None,
                      want_slab: bool = False):
    """Closest-hit over a flat wavefront; drop-in for the jnp backend.

    Small scenes run the dense single-slab sweep; big scenes the
    clustered tile-synchronized path. ``TPT_BINNED=1`` (or ``closest``/
    ``occ`` for one side) opts big scenes into the pair-binned scheduler
    instead — measured 3.2x faster on INCOHERENT wavefronts (surface-
    origin random-direction rays) but slower on the renderer's real
    camera-regenerated wavefronts, whose coherence the tiled path's ray
    sort exploits; see the pair-binned section comment. ``want_uv=False``
    (the OBJ path tracer) skips the barycentric output reduction in the
    kernel; ``Hit.u``/``Hit.v`` read as zeros."""
    if (pack_tris(scene).shape[0] > TRI_SLAB
            and os.environ.get("TPT_BINNED", "0") in ("1", "closest")):
        from . import pallas_ablations as _abl
        hit = _abl.intersect_closest_binned(scene, origins, dirs, tmin=tmin,
                                       tmax=tmax, want_uv=want_uv)
        if want_slab:
            return hit, jnp.full_like(hit.tri, SLAB_UNKNOWN)
        return hit
    return _intersect_closest_tiled(scene, origins, dirs, tmin, tmax,
                                    want_uv, pred=pred,
                                    want_slab=want_slab)


# Landing-slab sentinel for the prediction-ordered scheduler: "no
# prediction" in, "slab not recoverable" out (also any miss). Clipped
# to s_count in the sort key, so all unknowns share one bucket. Far
# above any possible chained-slab count (rows / quantum), so it can
# never collide with a real slab index.
from . import SLAB_UNKNOWN  # noqa: E402  (single source of truth)


def _intersect_closest_tiled(scene: SceneArrays, origins: V3, dirs: V3,
                             tmin: float = 0.01, tmax: float = T_FAR,
                             want_uv: bool = True, pred=None,
                             want_slab: bool = False):
    origins = as_v3(origins)
    dirs = as_v3(dirs)
    n = origins.x.shape[0]
    n_pad = _pad_to(n, RAY_TILE)

    def with_slab(hit, slab=None):
        if not want_slab:
            return hit
        if slab is None:
            slab = jnp.full((n,), SLAB_UNKNOWN, jnp.int32)
        return hit, slab

    single = pack_tris(scene).shape[0] <= TRI_SLAB
    if single:
        # Single-slab kernels take the wavefront's component rows
        # directly (no [8, N] pack copy — see ray_rows).
        rays = ray_rows(origins, dirs, n_pad)
        packed, boxes, sboxes = pack_tris(scene), None, None
        # Lean (t, id) kernels take full TRI_BLOCK blocks (see
        # _trim_rows); the full-carry _closest_call below re-trims at
        # the VMEM-safe 256.
        tris, tb_lean = _trim_single(scene, packed, hb=TRI_BLOCK)
        lean_ok = (not want_uv
                   or os.environ.get("TPT_LEAN_UV", "1") == "1")
        if (lean_ok and tmax >= T_FAR
                and tris.shape[0] <= LEAN_MAX_TRIS):
            # Small scenes: lean (t, id) kernel + one-hot attribute
            # resolve (see _lean_sweep). want_uv consumers (whitted)
            # get barycentrics from the resolved edge-function rows
            # instead of in-kernel winner reduces (TPT_LEAN_UV=0
            # ablates back to the 8-row full-carry kernel).
            out_t, idx = _closest_call_lean(rays, tris, tris.shape[0],
                                            tmin, tb=tb_lean)
            return with_slab(_lean_resolve(
                tris, out_t[0, :n], idx[0, :n], tris.shape[0],
                uv_from=(origins, dirs) if want_uv else None),
                             jnp.zeros((n,), jnp.int32))
        tris, tb_single = _trim_single(scene, packed)
    else:
        rays = pack_rays(origins, dirs, None, n_pad)
        tris, boxes, sboxes = pack_tris_clustered(scene)
        if pred is not None:
            pred = jnp.pad(pred.astype(jnp.int32), (0, n_pad - n),
                           constant_values=SLAB_UNKNOWN)
        key = _coherence_key(rays, boxes, sboxes, pred=pred)
        rays, perm, key_sorted = _sorted_rays(rays, key)
    # Big-scene lean path: (t, id) carry in the clustered kernels,
    # attributes recovered once per call by the two-level one-hot
    # (the in-sweep sel/pick machinery is ~25% of the clustered sweep).
    # want_uv consumers (whitted on big glTF scenes) ride it too since
    # round 4 — barycentrics come from the resolved edge-function rows
    # (TPT_LEAN_UV=0 ablates back to the full-carry clustered kernels).
    lean = (not single
            and (not want_uv
                 or os.environ.get("TPT_LEAN_UV", "1") == "1")
            and os.environ.get("TPT_LEAN_BIG", "1") == "1")
    # Streamed path: scene in HBM, per-tile candidate DMA, ONE launch per
    # round instead of the chained slab relaunches (see the streamed
    # section comment). Lean carry only (the big-scene OBJ hot path).
    stream = (not single and lean and SUBTILE_C >= RAY_TILE_C
              and os.environ.get("TPT_STREAM", "0") == "1")
    best_out = best_idx = None
    # Rotated chain: measured slightly BELOW the fixed chain on the
    # 100k-tri frame (4.65-4.66 vs 4.76 Mrays/s in every variant —
    # separate seed launch, per-tile near-first order, DMA-coherent
    # 2-group order), so it stays an ablation knob, default off. Why the
    # sim's "perfect prior" bound (0.69x entries) is not reachable this
    # way: the predicted slab must be swept FIRST and therefore with no
    # prior — and that is exactly the slab holding most true hits, so
    # its full-list entries are irreducible; only the (already
    # prior-tightened) remainder of the chain shrinks further.
    rot = (not single and lean and pred is not None and not stream
           and os.environ.get("TPT_SEED", "0") == "1"
           and os.environ.get("TPT_SORT_KEY", "dir12") == "dir12")
    if rot:
        slab_rows = _clustered_slab_rows(tris.shape[0])
        s_count = -(-tris.shape[0] // slab_rows)
        rot = s_count > 1
    if rot:
        # ROTATED chain (sim_frame.py's "perfect prior" lever, made
        # real): every launch sweeps, per ray tile, the tile's OWN
        # j-th-visit slab — the predicted landing slab FIRST, then the
        # rest in ascending order — selected by scalar-prefetch block
        # index maps. The tile predicted into slab k culls its whole
        # remaining chain against a near-oracle prior from step one,
        # instead of waiting for the fixed order to reach k. Any
        # per-tile permutation of all S slabs is exact; a wrong
        # prediction costs work, never correctness. The tile's slab id
        # comes off the sorted key's top bits (pred-major ordering makes
        # the tile's median representative).
        from . import pallas_ablations as _abl
        sbits = int(s_count).bit_length()
        rt_sub = min(SUBTILE_C, RAY_TILE_C)
        sub_per = RAY_TILE_C // rt_sub
        tile_pred = (key_sorted.reshape(-1, RAY_TILE_C)
                     [:, RAY_TILE_C // 2]
                     >> jnp.uint32(32 - sbits)).astype(jnp.int32)
        # Pad every per-slab operand to S whole slabs (zero tris
        # self-reject, far-point boxes fail every test).
        rows_pad = s_count * slab_rows
        far = jnp.float32(3e37)
        tris_pad = jnp.pad(tris, ((0, rows_pad - tris.shape[0]), (0, 0)))
        bc = slab_rows // CLUSTER
        sc = slab_rows // (CLUSTER * SUPER)
        boxes_pad = jnp.concatenate(
            [boxes, jnp.full((rows_pad // CLUSTER - boxes.shape[0], 8),
                             far)])
        sboxes_pad = jnp.concatenate(
            [sboxes, jnp.full((rows_pad // (CLUSTER * SUPER)
                               - sboxes.shape[0], 8), far)])
        corder_pad = jnp.concatenate(
            [octant_orders(boxes_pad[si * bc:(si + 1) * bc])
             for si in range(s_count)])
        # Per-tile visit order: the predicted slab FIRST, then the
        # remaining slabs in ascending order (launch j >= 1 sweeps
        # j - 1 where that precedes the tile's prediction, else j).
        # Unknown predictions (>= s_count) degrade to the fixed order.
        # DMA-coherence is the reason this beats a per-tile NEAR-FIRST
        # table (measured 4.65 vs 4.76 Mrays/s on the 100k frame): with
        # arbitrary per-tile orders, launch j's tile groups fragment and
        # the ~0.5 MB triangle block re-fetches at every group change;
        # here tiles are pred-major sorted, so every launch is at most
        # TWO contiguous groups (sid = j for preds <= j - 1, j - 1
        # after) and the chain pays ~3S block fetches total instead of
        # ~S * groups.
        pred_eff = jnp.where(tile_pred >= s_count, 0, tile_pred)
        for j in range(s_count):
            if j == 0:
                sid_j = pred_eff
            else:
                sid_j = jnp.where(jnp.int32(j - 1) < pred_eff,
                                  jnp.int32(j - 1), jnp.int32(j))
            sid_sub_j = jnp.repeat(sid_j, sub_per)
            cur_tmax = tmax if best_out is None else best_out[0]
            cand_j = _abl.rotated_candidates(rays, sboxes_pad, sid_sub_j,
                                        rt_sub, tmin, sc, cur_tmax)
            prior = None if best_out is None else (best_out, best_idx)
            best_out, best_idx = _abl._closest_call_rotated(
                sid_j, rays, tris_pad, boxes_pad, sboxes_pad, cand_j,
                corder_pad, slab_rows, tmin, prior=prior)
    cbin = (not single and lean
            and os.environ.get("TPT_CBIN", "0") == "1")
    if cbin:
        # Cluster-binned sweep (per-RAY work lists; see the cbin
        # section comment), then finish rays that overflowed a static
        # cap through the tile-union streamed pass with everyone else
        # parked (parked lanes produce empty candidate lists).
        from . import pallas_ablations as _abl
        pair_rays, jtab, row_tgt, incomplete, (ng, gsz, kcap) = _abl.cbin_pairs(
            rays, sboxes, tmin, tmax)
        bt, bi = _abl._closest_call_cbin(pair_rays, tris, jtab, tmin)
        best_out, best_idx = _abl._cbin_reduce(bt, bi, row_tgt, rays.shape[1],
                                          ng, gsz, kcap)
        rays_c = _abl._park_rays(rays, ~incomplete)
        cand, keys = _abl.stream_candidates(rays_c, sboxes, RAY_TILE_C, tmin,
                                       tmax)
        ct, ci = _abl._closest_call_streamed(rays_c, tris, sboxes, cand, keys,
                                        tmin)
        use_c = incomplete[None, :]
        best_out = jnp.where(use_c, ct, best_out)
        best_idx = jnp.where(use_c, ci, best_idx)
        if tmax < T_FAR:
            best_out = jnp.where(best_out < tmax, best_out,
                                 jnp.float32(T_FAR))
    elif stream:
        from . import pallas_ablations as _abl
        cand, keys = _abl.stream_candidates(rays, sboxes, RAY_TILE_C, tmin,
                                       tmax)
        best_out, best_idx = _abl._closest_call_streamed(
            rays, tris, sboxes, cand, keys, tmin)
        if tmax < T_FAR:
            best_out = jnp.where(best_out < tmax, best_out,
                                 jnp.float32(T_FAR))
    # Transposed-group chain (TPT_GRP): per-8-ray candidate lists cut
    # dense sweep elements to ~8.6% of the 256-ray tile unions
    # (tools/sim_groups.py) — retired family, kernels live in
    # pallas_ablations (serial=1 and bundled-lockstep=2 ladder rows).
    grp = (not single and lean and not stream and not rot and not cbin
           and os.environ.get("TPT_GRP", "0") in ("1", "2"))
    if grp:
        from . import pallas_ablations as _abl
        rays_t = jnp.transpose(rays, (1, 0))              # [n_pad, 8]
        out_c = idx_c = None
        for s, slab, bx, sbx, corder in _tri_slabs(tris, boxes, sboxes):
            slab_tmax = tmax if out_c is None else out_c[:, 0]
            cand = super_candidates(rays, sbx, 8, tmin, slab_tmax)
            tris_g = _abl.pack_tris_grouped(slab)
            prior = None if out_c is None else (out_c, idx_c)
            out_c, idx_c = _abl._closest_call_grp(rays_t, tris_g, cand,
                                                  slab.shape[0], tmin,
                                                  prior=prior, base=s)
        best_out = jnp.transpose(out_c, (1, 0))
        best_idx = jnp.transpose(idx_c, (1, 0))
    slabs = ([] if (rot or stream or cbin or grp)
             else _tri_slabs(tris, boxes, sboxes))
    for s, slab, bx, sbx, corder in slabs:
        if bx is None:
            out, idx = _closest_call(rays, slab, slab.shape[0], tmin, tmax,
                                     tb=tb_single, want_uv=want_uv)
            if best_out is not None:
                better = out[0:1] < best_out[0:1]
                out = jnp.where(better, out, best_out)
                idx = jnp.where(better, idx, best_idx)
        else:
            # Chain slabs through the running best hit: the per-ray
            # prior t narrows this slab's candidate lists, and the
            # kernel seeds its carry with the prior rows so the best-t
            # cluster tests cull from step one (no outside merge).
            prior = None if best_out is None else (best_out, best_idx)
            if _inkb(sbx.shape[0]):
                # Candidate lists built inside the kernel (VMEM-local;
                # no XLA-side dense pass, argsort, or table traffic).
                out, idx = _closest_call_clustered(
                    rays, slab, bx, sbx, None, None, slab.shape[0],
                    tmin, tmax, want_uv=want_uv, prior=prior, lean=lean,
                    base=s, build=True)
            else:
                slab_tmax = tmax if best_out is None else best_out[0]
                cand = super_candidates(rays, sbx,
                                        min(SUBTILE_C, RAY_TILE_C),
                                        tmin, slab_tmax)
                out, idx = _closest_call_clustered(
                    rays, slab, bx, sbx, cand, corder, slab.shape[0],
                    tmin, tmax, want_uv=want_uv, prior=prior, lean=lean,
                    base=s)
        best_out, best_idx = out, idx
    if not single:
        if lean:
            t_row, i_row = _unsort(perm, (best_out[0], best_idx[0]))
            slab_arr = None
            if want_slab:
                # The lean carry's id IS the global packed row; its
                # chained-slab index is a shift, no gather needed.
                srows = _clustered_slab_rows(tris.shape[0])
                slab_arr = jnp.where(
                    t_row[:n] < T_FAR,
                    (i_row[:n] // srows).astype(jnp.int32),
                    jnp.int32(SLAB_UNKNOWN))
            return with_slab(
                _lean_resolve_packed(
                    tris, t_row[:n], i_row[:n],
                    uv_from=(origins, dirs) if want_uv else None),
                slab_arr)
        rows = _unsort(perm, tuple(best_out[k] for k in range(8))
                       + (best_idx[0],))
        best_out = jnp.stack(rows[:8], axis=0)
        best_idx = rows[8][None, :]
    return with_slab(_hit_from_out(best_out, best_idx, n),
                     jnp.zeros((n,), jnp.int32) if single else None)


def intersect_occluded(scene: SceneArrays, origins: V3, dirs: V3,
                       tmax: jnp.ndarray, tmin: float = 0.01,
                       quirk_first_hit: bool = False) -> jnp.ndarray:
    """Any-hit occlusion with per-ray tmax; refractive surfaces pass light."""
    origins = as_v3(origins)
    dirs = as_v3(dirs)
    if quirk_first_hit:
        # Occlusion consumes only hit/t/mat — skip the barycentric reduces.
        h = intersect_closest(scene, origins, dirs, tmin=tmin, tmax=T_FAR,
                              want_uv=False)
        in_range = h.hit & (h.t < tmax)
        return in_range & (scene.mat_bsdf[h.mat] != BSDF_REFRACTION)
    n = origins.x.shape[0]
    n_pad = _pad_to(n, RAY_TILE)
    sub = _occ_subset(scene)
    # Above TRI_SLAB the subset falls through to the full clustered
    # sweep. A clustered pack of the SUBSET (kd-order + chained slabs,
    # the round-3/4 ask) was sized before building (round 5): the
    # hull-boundary classifier (`arrays.nee_occluder_index`) retains
    # >= 99.99% of closed-surface geometry — measured 99,908/99,916
    # (big_mesh 100k), 1,001,116/1,001,124 (huge_mesh 1M),
    # 99,908/100,354 (pbr_big whitted) — so the clustered subset sweep
    # would sweep the same rows as the full table. The subset path's
    # win domain (mostly-culled scenes, e.g. Cornell 24/428) is
    # entirely covered by this single-slab branch.
    if sub is not None and sub[0].shape[0] <= TRI_SLAB:
        # Sweep only the precomputed occluder subset — one single-slab
        # pass even when the full scene takes the clustered path.
        rays = ray_rows(origins, dirs, n_pad, extras=(tmax,))
        # Occlusion kernels carry 1 row: full TRI_BLOCK blocks (see
        # _trim_rows).
        tris, tb_sub = _trim_rows(sub[1], sub[0], hb=TRI_BLOCK)
        occ = _occluded_call(rays, tris, tris.shape[0], tmin, tb=tb_sub)
        return occ[0, :n] > 0
    if (pack_tris(scene).shape[0] > TRI_SLAB
            and os.environ.get("TPT_BINNED", "0") in ("1", "occ")):
        from . import pallas_ablations as _abl
        return _abl.intersect_occluded_binned(scene, origins, dirs, tmax,
                                         tmin=tmin)
    return _intersect_occluded_tiled(scene, origins, dirs, tmax, tmin)


def _intersect_occluded_tiled(scene: SceneArrays, origins: V3, dirs: V3,
                              tmax: jnp.ndarray,
                              tmin: float = 0.01,
                              allow_cbin: bool = True) -> jnp.ndarray:
    origins = as_v3(origins)
    dirs = as_v3(dirs)
    n = origins.x.shape[0]
    n_pad = _pad_to(n, RAY_TILE)
    single = pack_tris(scene).shape[0] <= TRI_SLAB
    if single:
        rays = ray_rows(origins, dirs, n_pad, extras=(tmax,))
        tris, boxes, sboxes = pack_tris(scene), None, None
        tris, tb_single = _trim_single(scene, tris, hb=TRI_BLOCK)
    else:
        if (allow_cbin and os.environ.get("TPT_CBIN", "0") == "1"
                and os.environ.get("TPT_CBIN_OCC", "1") == "1"):
            # Cluster-binned any-hit: the same exact work lists as the
            # closest-hit cbin path (per-lane tmax bounds the group
            # interval test), with overflowed groups finished by this
            # same function minus the cbin branch. A lane its jobs
            # already blocked needs no completion pass (any-hit
            # short-circuit).
            from . import pallas_ablations as _abl
            rays = pack_rays(origins, dirs, tmax, n_pad)
            tris, boxes, sboxes = pack_tris_clustered(scene)
            pair_rays, jtab, row_tgt, incomplete, (ng, gsz, kcap) = \
                _abl.cbin_pairs(rays, sboxes, tmin, rays[6])
            oc = _abl._occluded_call_cbin(pair_rays, tris, jtab, tmin)
            occ_r = _abl._cbin_reduce_occ(oc, row_tgt, n_pad, ng, gsz, kcap)
            ovf = incomplete[:n] & ~occ_r[:n]
            park_o = V3(jnp.where(ovf, origins.x, 3.0e7),
                        jnp.where(ovf, origins.y, 3.0e7),
                        jnp.where(ovf, origins.z, 3.0e7))
            park_d = V3(jnp.where(ovf, dirs.x, 0.5773503),
                        jnp.where(ovf, dirs.y, 0.5773503),
                        jnp.where(ovf, dirs.z, 0.5773503))
            fb = _intersect_occluded_tiled(
                scene, park_o, park_d, jnp.where(ovf, tmax, 0.0), tmin,
                allow_cbin=False)
            return jnp.where(ovf, fb, occ_r[:n])
        rays = pack_rays(origins, dirs, tmax, n_pad)
        tris, boxes, sboxes = pack_tris_clustered(scene)
        key = _coherence_key(rays, boxes, sboxes)
        rays, perm, _ = _sorted_rays(rays, key)
        if os.environ.get("TPT_STREAM", "0") == "1" \
                and SUBTILE_C >= RAY_TILE_C:
            from . import pallas_ablations as _abl
            cand, keys = _abl.stream_candidates(rays, sboxes, RAY_TILE_C,
                                           tmin, rays[6:7, :])
            occ = _abl._occluded_call_streamed(rays, tris, sboxes, cand,
                                          keys, tmin)
            occ = _unsort(perm, (occ[0],))[0][None, :]
            return occ[0, :n] > 0
    occ = None
    grp_occ = (not single
               and os.environ.get("TPT_GRP", "0") in ("1", "2")
               and os.environ.get("TPT_STREAM", "0") != "1")
    if grp_occ:
        # Transposed-group any-hit chain (retired family, kernels in
        # pallas_ablations).
        from . import pallas_ablations as _abl
        rays_t = jnp.transpose(rays, (1, 0))              # [n_pad, 8]
        for _, slab, bx, sbx, corder in _tri_slabs(tris, boxes, sboxes):
            if occ is not None:
                # Park already-occluded rays (tmax 0 -> empty lists).
                live_tmax = jnp.where(occ > 0, 0.0, rays_t[:, 6:7])
                rays_t = jnp.concatenate(
                    [rays_t[:, 0:6], live_tmax, rays_t[:, 7:8]], axis=1)
            cand = super_candidates(
                jnp.transpose(rays_t, (1, 0)), sbx, 8, tmin,
                rays_t[:, 6])
            tris_g = _abl.pack_tris_grouped(slab)
            o = _abl._occluded_call_grp(rays_t, tris_g, cand,
                                        slab.shape[0], tmin)
            occ = o if occ is None else jnp.maximum(occ, o)
        occ = jnp.transpose(occ, (1, 0))
        occ = _unsort(perm, (occ[0],))[0][None, :]
        return occ[0, :n] > 0
    for _, slab, bx, sbx, corder in _tri_slabs(tris, boxes, sboxes):
        if bx is None:
            o = _occluded_call(rays, slab, slab.shape[0], tmin,
                               tb=tb_single)
        else:
            if occ is not None:
                # Park already-occluded rays for the next slab: tmax=0
                # fails every box/triangle test, so their tiles' work
                # lists shrink (often to nothing).
                rays = jnp.concatenate(
                    [rays[0:6], jnp.where(occ > 0, 0.0, rays[6:7]),
                     rays[7:8]], axis=0)
            occ_g = os.environ.get("TPT_GUARD_OCC") or _guard_mode()
            if (_inkb(sbx.shape[0]) and occ_g == "none"):
                o = _occluded_call_clustered(rays, slab, bx, sbx,
                                             None, None,
                                             slab.shape[0], tmin,
                                             build=True)
            else:
                cand = super_candidates(rays, sbx,
                                        min(SUBTILE_C, RAY_TILE_C), tmin,
                                        rays[6:7, :])
                o = _occluded_call_clustered(rays, slab, bx, sbx,
                                             cand, corder,
                                             slab.shape[0], tmin)
        occ = o if occ is None else jnp.maximum(occ, o)
    if not single:
        occ = _unsort(perm, (occ[0],))[0][None, :]
    return occ[0, :n] > 0
