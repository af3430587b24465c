"""Fused Pallas TPU kernels for dense ray-triangle intersection.

The tuned version of ``tpu_pt.intersect.moller``: one ``pallas_call`` per
trace replaces the chunked jnp scan (128 sequential dispatch steps at 1M
rays) with a hardware-pipelined grid over ray tiles, all triangles resident
in VMEM, and the Möller-Trumbore test + min/argmin reduction fused so the
[rays x tris] candidate matrix never touches HBM.

Layout choices (the whole point of this file):
- Rays are packed host-side as [N, 8] (columns: ox oy oz dx dy dz tmax pad)
  so a ray tile loads as [RT, 8] and each component slices to [RT, 1] —
  sublane-oriented with NO in-kernel transpose.
- Triangles are packed as [16, T] (rows: v0 e1 e2 xyz, valid, refractive)
  so a component block slices to [1, TB] — lane-oriented, again transpose-
  free. All [RT, TB] intermediates are rank-2 broadcasts of these.
- Outputs are [N, 1] so the [RT, 1] per-ray results store directly.
- argmin is computed as min-of-masked-iota to stay in the same layout.

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
from .moller import Hit, T_FAR, DET_EPS

RAY_TILE = 512        # rays per grid program
TRI_BLOCK = 512       # triangles per inner step
_BIG_IDX = 2 ** 30


def _interpret() -> bool:
    """Run the kernels in interpreter mode off-TPU (CPU tests)."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def pack_tris(scene: SceneArrays) -> jnp.ndarray:
    """Scene triangles -> [16, T] kernel layout (see module docstring).

    Columns are zero-padded up to a TRI_BLOCK multiple (valid=0 never hits).
    """
    refr = (scene.mat_bsdf[scene.mat_id] == BSDF_REFRACTION)
    rows = [
        scene.tri_v0[:, 0], scene.tri_v0[:, 1], scene.tri_v0[:, 2],
        scene.tri_e1[:, 0], scene.tri_e1[:, 1], scene.tri_e1[:, 2],
        scene.tri_e2[:, 0], scene.tri_e2[:, 1], scene.tri_e2[:, 2],
        scene.tri_valid.astype(jnp.float32),
        refr.astype(jnp.float32),
    ]
    t = scene.tri_v0.shape[0]
    pad = [jnp.zeros((t,), jnp.float32)] * (16 - len(rows))
    packed = jnp.stack(rows + pad, axis=0)
    t_pad = _pad_to(t, TRI_BLOCK)
    if t_pad != t:
        packed = jnp.pad(packed, ((0, 0), (0, t_pad - t)))
    return packed


def pack_rays(origins: jnp.ndarray, dirs: jnp.ndarray,
              tmax: jnp.ndarray | None, n_pad: int) -> jnp.ndarray:
    """[N,3]+[N,3](+[N]) -> [n_pad, 8] ray SoA (zero rows never hit)."""
    n = origins.shape[0]
    out = jnp.zeros((n_pad, 8), jnp.float32)
    out = out.at[:n, 0:3].set(origins)
    out = out.at[:n, 3:6].set(dirs)
    if tmax is not None:
        out = out.at[:n, 6].set(tmax)
    return out


def _mt_block(rays_ref, tris_ref, s, tb, tmin):
    """Möller-Trumbore for the program's ray tile vs tri block ``s:s+tb``.

    Returns (t [RT, TB] with +inf on miss/invalid, refr [1, TB])."""
    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]

    def row(c):
        return tris_ref[c, pl.ds(s, tb)].reshape(1, tb)

    v0x, v0y, v0z = row(0), row(1), row(2)
    e1x, e1y, e1z = row(3), row(4), row(5)
    e2x, e2y, e2z = row(6), row(7), row(8)
    valid = row(9)
    refr = row(10)

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
    return jnp.where(hit, t, jnp.float32(T_FAR)), refr


def _closest_kernel(rays_ref, tris_ref, t_ref, i_ref, *, n_tri, tmin, tmax):
    rt = rays_ref.shape[0]
    nb = n_tri // TRI_BLOCK

    def step(b, carry):
        best_t, best_i = carry
        s = b * TRI_BLOCK
        t, _ = _mt_block(rays_ref, tris_ref, s, TRI_BLOCK, tmin)
        t = jnp.where(t < tmax, t, jnp.float32(T_FAR))
        blk_t = jnp.min(t, axis=1, keepdims=True)                 # [RT, 1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rt, TRI_BLOCK), 1)
        cand = jnp.where(t == blk_t, lane, _BIG_IDX)
        blk_i = jnp.min(cand, axis=1, keepdims=True) + s          # [RT, 1]
        better = blk_t < best_t
        return (jnp.where(better, blk_t, best_t),
                jnp.where(better, blk_i, best_i))

    init = (jnp.full((rt, 1), T_FAR, jnp.float32),
            jnp.zeros((rt, 1), jnp.int32))
    if nb == 1:
        best_t, best_i = step(0, init)
    else:
        best_t, best_i = jax.lax.fori_loop(0, nb, step, init)
    t_ref[:, :] = best_t
    i_ref[:, :] = jnp.where(best_t < T_FAR, best_i, 0)


def _occluded_kernel(rays_ref, tris_ref, occ_ref, *, n_tri, tmin):
    rt = rays_ref.shape[0]
    nb = n_tri // TRI_BLOCK
    tmax_r = rays_ref[:, 6:7]                                     # [RT, 1]

    def step(b, occ):
        s = b * TRI_BLOCK
        t, refr = _mt_block(rays_ref, tris_ref, s, TRI_BLOCK, tmin)
        blocking = (t < tmax_r) & (refr < 0.5)
        return occ | jnp.any(blocking, axis=1, keepdims=True)

    init = jnp.zeros((rt, 1), bool)
    if nb == 1:
        occ = step(0, init)
    else:
        occ = jax.lax.fori_loop(0, nb, step, init)
    occ_ref[:, :] = occ.astype(jnp.int32)


def _pad_to(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


@functools.partial(jax.named_call, name="pallas_closest")
def _closest_call(rays, tris, n_tri: int, tmin: float, tmax: float):
    n_pad = rays.shape[0]
    grid = (n_pad // RAY_TILE,)
    kernel = functools.partial(_closest_kernel, n_tri=n_tri, tmin=tmin,
                               tmax=tmax)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_TILE, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, n_tri), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=45 * n_pad * n_tri, bytes_accessed=n_pad * 48,
            transcendentals=0),
        interpret=_interpret(),
    )(rays, tris)


@functools.partial(jax.named_call, name="pallas_occluded")
def _occluded_call(rays, tris, n_tri: int, tmin: float):
    n_pad = rays.shape[0]
    grid = (n_pad // RAY_TILE,)
    kernel = functools.partial(_occluded_kernel, n_tri=n_tri, tmin=tmin)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_TILE, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, n_tri), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=45 * n_pad * n_tri, bytes_accessed=n_pad * 48,
            transcendentals=0),
        interpret=_interpret(),
    )(rays, tris)


def intersect_closest(scene: SceneArrays, origins: jnp.ndarray,
                      dirs: jnp.ndarray, tmin: float = 0.01,
                      tmax: float = T_FAR) -> Hit:
    """Closest-hit over a flat wavefront; drop-in for the jnp backend."""
    n = origins.shape[0]
    n_pad = _pad_to(n, RAY_TILE)
    rays = pack_rays(origins, dirs, None, n_pad)
    tris = pack_tris(scene)
    t, idx = _closest_call(rays, tris, tris.shape[1], tmin, tmax)
    t = t[:n, 0]
    idx = idx[:n, 0]
    return Hit(t=t, tri=idx, hit=t < T_FAR)


def intersect_occluded(scene: SceneArrays, origins: jnp.ndarray,
                       dirs: jnp.ndarray, tmax: jnp.ndarray,
                       tmin: float = 0.01,
                       quirk_first_hit: bool = False) -> jnp.ndarray:
    """Any-hit occlusion with per-ray tmax; refractive surfaces pass light."""
    if quirk_first_hit:
        h = intersect_closest(scene, origins, dirs, tmin=tmin, tmax=T_FAR)
        in_range = h.hit & (h.t < tmax)
        refr = scene.mat_bsdf[scene.mat_id] == BSDF_REFRACTION
        return in_range & ~refr[h.tri]
    n = origins.shape[0]
    n_pad = _pad_to(n, RAY_TILE)
    rays = pack_rays(origins, dirs, tmax, n_pad)
    tris = pack_tris(scene)
    occ = _occluded_call(rays, tris, tris.shape[1], tmin)
    return occ[:n, 0] > 0
