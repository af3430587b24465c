"""Fused Pallas TPU kernels for dense ray-triangle intersection.

The tuned version of ``tpu_pt.intersect.moller``: one ``pallas_call`` per
trace replaces the chunked jnp scan with a hardware-pipelined grid over ray
tiles, all triangles resident in VMEM, and the Möller-Trumbore test +
min/argmin reduction fused so the [tris x rays] candidate matrix never
touches HBM.

Layout choices (the whole point of this file):
- Rays arrive as [8, N] (rows: ox oy oz dx dy dz tmax pad) — built with a
  single cheap ``stack`` from the V3 wavefront (profiling showed the
  previous [N, 8] column-write packing cost more than the kernel itself).
  A ray tile loads as [8, RT]; each component row-slices to [1, RT] —
  lane-oriented, no in-kernel transpose.
- Triangles are packed as [T, 16] (columns: v0 e1 e2 xyz, valid,
  refractive, normal xyz, mat id) so a component block slices to [TB, 1] —
  sublane-oriented, again transpose-free. All [TB, RT] intermediates are
  rank-2 broadcasts of these.
- Outputs are [8, N] / [1, N] so per-ray [1, RT] results store directly.
- argmin is computed as min-of-masked-iota; the winning triangle's normal
  and material are selected with a masked sublane reduction (no gathers).

Parity: same semantics as ``moller.intersect_closest`` /
``moller.intersect_occluded`` (two-sided triangles, refractive surfaces do
not occlude — ``pathTracerPrograms.cu:672-681``); tests assert equality.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.arrays import SceneArrays, BSDF_REFRACTION
from ..vec3 import V3, as_v3
from .moller import Hit, T_FAR, DET_EPS

RAY_TILE = 2048       # rays per grid program
TRI_BLOCK = 512       # triangles per inner step
_BIG_IDX = 2 ** 30


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

    Rows are zero-padded up to a TRI_BLOCK multiple (valid=0 never hits).
    """
    refr = (scene.mat_bsdf[scene.mat_id] == BSDF_REFRACTION)
    t = scene.tri_v0.shape[0]
    cols = [
        scene.tri_v0[:, 0], scene.tri_v0[:, 1], scene.tri_v0[:, 2],
        scene.tri_e1[:, 0], scene.tri_e1[:, 1], scene.tri_e1[:, 2],
        scene.tri_e2[:, 0], scene.tri_e2[:, 1], scene.tri_e2[:, 2],
        scene.tri_valid.astype(jnp.float32),
        refr.astype(jnp.float32),
        scene.tri_normal[:, 0], scene.tri_normal[:, 1],
        scene.tri_normal[:, 2],
        scene.mat_id.astype(jnp.float32),
        jnp.zeros((t,), jnp.float32),
    ]
    packed = jnp.stack(cols, axis=1)
    t_pad = _pad_to(t, TRI_BLOCK)
    if t_pad != t:
        packed = jnp.pad(packed, ((0, t_pad - t), (0, 0)))
    return packed


def pack_rays(origins: V3, dirs: V3, tmax: jnp.ndarray | None,
              n_pad: int) -> jnp.ndarray:
    """V3 rays -> [8, n_pad] kernel layout (zero columns never hit)."""
    n = origins.x.shape[0]
    pad = n_pad - n
    z = jnp.zeros((n,), jnp.float32)
    rows = [origins.x, origins.y, origins.z, dirs.x, dirs.y, dirs.z,
            tmax if tmax is not None else z, z]
    out = jnp.stack(rows, axis=0)
    if pad:
        out = jnp.pad(out, ((0, 0), (0, pad)))
    return out


def _mt_block(rays_ref, tris_ref, s, tb, tmin):
    """Möller-Trumbore for the program's ray tile vs tri block ``s:s+tb``.

    Returns (t [TB, RT] with +inf on miss/invalid, refr [TB, 1])."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]

    def col(c):
        return tris_ref[pl.ds(s, tb), c:c + 1]                    # [TB, 1]

    v0x, v0y, v0z = col(0), col(1), col(2)
    e1x, e1y, e1z = col(3), col(4), col(5)
    e2x, e2y, e2z = col(6), col(7), col(8)
    valid = col(9)
    refr = col(10)

    # pvec = cross(d, e2)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) > DET_EPS
    inv_det = 1.0 / jnp.where(ok, det, 1.0)

    # tvec = o - v0
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det

    # qvec = cross(tvec, e1)
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

    hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > tmin) & (valid > 0.0))
    return jnp.where(hit, t, jnp.float32(T_FAR)), refr, u, v


def _closest_kernel(rays_ref, tris_ref, out_ref, i_ref, *, n_tri, tmin,
                    tmax):
    rt = rays_ref.shape[1]
    nb = n_tri // TRI_BLOCK

    def step(b, carry):
        best_t, best_i, bnx, bny, bnz, bm, bu, bv = carry
        s = b * TRI_BLOCK
        t, _, u, v = _mt_block(rays_ref, tris_ref, s, TRI_BLOCK, tmin)
        t = jnp.where(t < tmax, t, jnp.float32(T_FAR))
        blk_t = jnp.min(t, axis=0, keepdims=True)                 # [1, RT]
        sub = jax.lax.broadcasted_iota(jnp.int32, (TRI_BLOCK, rt), 0)
        cand = jnp.where(t == blk_t, sub, _BIG_IDX)
        blk_sub = jnp.min(cand, axis=0, keepdims=True)            # [1, RT]
        blk_i = blk_sub + s
        # Select the winning triangle's normal + material in-layout: a
        # masked sublane reduction, not a gather.
        sel = (sub == blk_sub).astype(jnp.float32)                # [TB, RT]

        def pick(col_id):
            col = tris_ref[pl.ds(s, TRI_BLOCK), col_id:col_id + 1]
            return jnp.sum(sel * col, axis=0, keepdims=True)      # [1, RT]

        blk_u = jnp.sum(sel * u, axis=0, keepdims=True)
        blk_v = jnp.sum(sel * v, axis=0, keepdims=True)
        better = blk_t < best_t
        return (jnp.where(better, blk_t, best_t),
                jnp.where(better, blk_i, best_i),
                jnp.where(better, pick(11), bnx),
                jnp.where(better, pick(12), bny),
                jnp.where(better, pick(13), bnz),
                jnp.where(better, pick(14), bm),
                jnp.where(better, blk_u, bu),
                jnp.where(better, blk_v, bv))

    init = (jnp.full((1, rt), T_FAR, jnp.float32),
            jnp.zeros((1, rt), jnp.int32),
            jnp.zeros((1, rt), jnp.float32),
            jnp.zeros((1, rt), jnp.float32),
            jnp.zeros((1, rt), jnp.float32),
            jnp.zeros((1, rt), jnp.float32),
            jnp.zeros((1, rt), jnp.float32),
            jnp.zeros((1, rt), jnp.float32))
    if nb == 1:
        best_t, best_i, bnx, bny, bnz, bm, bu, bv = step(0, init)
    else:
        best_t, best_i, bnx, bny, bnz, bm, bu, bv = jax.lax.fori_loop(
            0, nb, step, init)
    out_ref[0:1, :] = best_t
    out_ref[1:2, :] = bnx
    out_ref[2:3, :] = bny
    out_ref[3:4, :] = bnz
    out_ref[4:5, :] = bm
    out_ref[5:6, :] = bu
    out_ref[6:7, :] = bv
    out_ref[7:8, :] = jnp.zeros((1, rt), jnp.float32)
    i_ref[:, :] = jnp.where(best_t < T_FAR, best_i, 0)


def _occluded_kernel(rays_ref, tris_ref, occ_ref, *, n_tri, tmin):
    rt = rays_ref.shape[1]
    nb = n_tri // TRI_BLOCK
    tmax_r = rays_ref[6:7, :]                                     # [1, RT]

    def step(b, occ):
        s = b * TRI_BLOCK
        t, refr, _, _ = _mt_block(rays_ref, tris_ref, s, TRI_BLOCK, tmin)
        blocking = (t < tmax_r) & (refr < 0.5)
        hit_any = jnp.max(jnp.where(blocking, 1.0, 0.0), axis=0,
                          keepdims=True)
        return jnp.maximum(occ, hit_any)

    # i32/f32 carries only: Mosaic's loop lowering rejects bool carries
    # ("failed to legalize scf.for").
    init = jnp.zeros((1, rt), jnp.float32)
    if nb == 1:
        occ = step(0, init)
    else:
        occ = jax.lax.fori_loop(0, nb, step, init)
    occ_ref[:, :] = (occ > 0.0).astype(jnp.int32)


@functools.partial(jax.named_call, name="pallas_closest")
def _closest_call(rays, tris, n_tri: int, tmin: float, tmax: float):
    n_pad = rays.shape[1]
    grid = (n_pad // RAY_TILE,)
    kernel = functools.partial(_closest_kernel, n_tri=n_tri, tmin=tmin,
                               tmax=tmax)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
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
            flops=45 * n_pad * n_tri, bytes_accessed=n_pad * 48,
            transcendentals=0),
        interpret=_interpret(),
    )(rays, tris)


@functools.partial(jax.named_call, name="pallas_occluded")
def _occluded_call(rays, tris, n_tri: int, tmin: float):
    n_pad = rays.shape[1]
    grid = (n_pad // RAY_TILE,)
    kernel = functools.partial(_occluded_kernel, n_tri=n_tri, tmin=tmin)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tri, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=45 * n_pad * n_tri, bytes_accessed=n_pad * 48,
            transcendentals=0),
        interpret=_interpret(),
    )(rays, tris)


def intersect_closest(scene: SceneArrays, origins: V3, dirs: V3,
                      tmin: float = 0.01, tmax: float = T_FAR) -> Hit:
    """Closest-hit over a flat wavefront; drop-in for the jnp backend."""
    origins = as_v3(origins)
    dirs = as_v3(dirs)
    n = origins.x.shape[0]
    n_pad = _pad_to(n, RAY_TILE)
    rays = pack_rays(origins, dirs, None, n_pad)
    tris = pack_tris(scene)
    out, idx = _closest_call(rays, tris, tris.shape[0], tmin, tmax)
    t = out[0, :n]
    return Hit(t=t, tri=idx[0, :n], hit=t < T_FAR,
               normal=V3(out[1, :n], out[2, :n], out[3, :n]),
               mat=out[4, :n].astype(jnp.int32),
               u=out[5, :n], v=out[6, :n])


def intersect_occluded(scene: SceneArrays, origins: V3, dirs: V3,
                       tmax: jnp.ndarray, tmin: float = 0.01,
                       quirk_first_hit: bool = False) -> jnp.ndarray:
    """Any-hit occlusion with per-ray tmax; refractive surfaces pass light."""
    origins = as_v3(origins)
    dirs = as_v3(dirs)
    if quirk_first_hit:
        h = intersect_closest(scene, origins, dirs, tmin=tmin, tmax=T_FAR)
        in_range = h.hit & (h.t < tmax)
        return in_range & (scene.mat_bsdf[h.mat] != BSDF_REFRACTION)
    n = origins.x.shape[0]
    n_pad = _pad_to(n, RAY_TILE)
    rays = pack_rays(origins, dirs, tmax, n_pad)
    tris = pack_tris(scene)
    occ = _occluded_call(rays, tris, tris.shape[0], tmin)
    return occ[0, :n] > 0
