"""Batched ray-triangle intersection (Möller-Trumbore) in pure jnp.

TPU-native replacement for the reference's hardware BVH traversal
(``optixTraverse``, ``pathTracerPrograms.cu:600-613``) at small scene sizes:
a dense all-rays × all-triangles test, chunked so intermediates stay
VMEM-sized and XLA can pipeline. The Pallas kernel in
``tpu_pt.intersect.pallas_bf`` is the tuned version of the same algorithm;
``tpu_pt.intersect.lbvh`` scales it to large meshes.

Triangles are two-sided (OptiX default, no backface culling) and the
occlusion variant implements the reference's "refractive surfaces do not
occlude" rule (``pathTracerPrograms.cu:672-681``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..scene.arrays import SceneArrays, BSDF_REFRACTION

DET_EPS = 1e-9
T_FAR = 1e16


@struct.dataclass
class Hit:
    t: jnp.ndarray        # [N] f32, T_FAR on miss
    tri: jnp.ndarray      # [N] i32, 0 on miss
    hit: jnp.ndarray      # [N] bool


def _mt_block(o, d, v0, e1, e2, tmin, tmax):
    """Möller-Trumbore for a [R] ray block against a [B] triangle block.

    o, d: [R, 3]; v0, e1, e2: [B, 3]. Returns (t [R, B], valid [R, B]).
    """
    # [R, 1, 3] x [1, B, 3] broadcasting.
    o = o[:, None, :]
    d = d[:, None, :]
    v0 = v0[None, :, :]
    e1 = e1[None, :, :]
    e2 = e2[None, :, :]

    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    ok = jnp.abs(det) > DET_EPS
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
             & (t > tmin) & (t < tmax))
    return t, valid


def _closest_chunk(o, d, scene: SceneArrays, tmin, tmax, tri_block: int):
    """Closest hit for one ray chunk [R, 3] against the whole scene."""
    n_tri = scene.tri_v0.shape[0]
    n_blocks = n_tri // tri_block
    r = o.shape[0]

    def body(carry, bi):
        best_t, best_i = carry
        s = bi * tri_block
        v0 = jax.lax.dynamic_slice_in_dim(scene.tri_v0, s, tri_block)
        e1 = jax.lax.dynamic_slice_in_dim(scene.tri_e1, s, tri_block)
        e2 = jax.lax.dynamic_slice_in_dim(scene.tri_e2, s, tri_block)
        valid_tri = jax.lax.dynamic_slice_in_dim(scene.tri_valid, s, tri_block)
        t, valid = _mt_block(o, d, v0, e1, e2, tmin, tmax)
        valid = valid & valid_tri[None, :]
        t = jnp.where(valid, t, T_FAR)
        blk_t = jnp.min(t, axis=-1)
        blk_i = jnp.argmin(t, axis=-1).astype(jnp.int32) + s
        better = blk_t < best_t
        best_t = jnp.where(better, blk_t, best_t)
        best_i = jnp.where(better, blk_i, best_i)
        return (best_t, best_i), None

    init = (jnp.full((r,), T_FAR, jnp.float32), jnp.zeros((r,), jnp.int32))
    (best_t, best_i), _ = jax.lax.scan(body, init, jnp.arange(n_blocks))
    return best_t, best_i


def intersect_closest(scene: SceneArrays, origins: jnp.ndarray,
                      dirs: jnp.ndarray, tmin: float = 0.01,
                      tmax: float = T_FAR, ray_chunk: int = 8192,
                      tri_block: int = 512) -> Hit:
    """Closest-hit over a flat ray wavefront. origins/dirs: [N, 3]."""
    n = origins.shape[0]
    n_tri = scene.tri_v0.shape[0]
    tri_block = min(tri_block, n_tri)
    assert n_tri % tri_block == 0, (n_tri, tri_block)

    ray_chunk = min(ray_chunk, n)
    pad = (-n) % ray_chunk
    if pad:
        origins = jnp.concatenate([origins, jnp.zeros((pad, 3), origins.dtype)])
        dirs = jnp.concatenate([dirs, jnp.zeros((pad, 3), dirs.dtype)])
    c = (n + pad) // ray_chunk

    o_c = origins.reshape(c, ray_chunk, 3)
    d_c = dirs.reshape(c, ray_chunk, 3)

    def chunk_fn(args):
        o, d = args
        return _closest_chunk(o, d, scene, tmin, tmax, tri_block)

    if c == 1:
        best_t, best_i = chunk_fn((o_c[0], d_c[0]))
    else:
        best_t, best_i = jax.lax.map(chunk_fn, (o_c, d_c))
        best_t = best_t.reshape(-1)
        best_i = best_i.reshape(-1)
    best_t = best_t[:n]
    best_i = best_i[:n]
    return Hit(t=best_t, tri=best_i, hit=best_t < T_FAR)


def intersect_occluded(scene: SceneArrays, origins: jnp.ndarray,
                       dirs: jnp.ndarray, tmax: jnp.ndarray,
                       tmin: float = 0.01, ray_chunk: int = 8192,
                       tri_block: int = 512,
                       quirk_first_hit: bool = False) -> jnp.ndarray:
    """Shadow-ray occlusion with per-ray tmax. Returns occluded [N] bool.

    Reference semantics (``traceOcclusion``, ``pathTracerPrograms.cu:651-684``):
    refractive surfaces never occlude. Default mode: occluded iff ANY
    non-refractive surface lies in (tmin, tmax) — the physically-intended
    rule. ``quirk_first_hit=True`` reproduces the reference's literal
    behavior (TERMINATE_ON_FIRST_HIT then test that one surface), approximated
    here as "test the closest surface only".
    """
    tri_refr = scene.mat_bsdf[scene.mat_id] == BSDF_REFRACTION  # [T]

    if quirk_first_hit:
        h = intersect_closest(scene, origins, dirs, tmin=tmin, tmax=T_FAR,
                              ray_chunk=ray_chunk, tri_block=tri_block)
        in_range = h.hit & (h.t < tmax)
        return in_range & ~tri_refr[h.tri]

    n = origins.shape[0]
    n_tri = scene.tri_v0.shape[0]
    tri_block = min(tri_block, n_tri)
    ray_chunk = min(ray_chunk, n)
    pad = (-n) % ray_chunk
    if pad:
        origins = jnp.concatenate([origins, jnp.zeros((pad, 3), origins.dtype)])
        dirs = jnp.concatenate([dirs, jnp.zeros((pad, 3), dirs.dtype)])
        tmax = jnp.concatenate([tmax, jnp.zeros((pad,), tmax.dtype)])
    c = (n + pad) // ray_chunk

    def chunk_fn(args):
        o, d, tm = args
        n_blocks = n_tri // tri_block

        def body(occ, bi):
            s = bi * tri_block
            v0 = jax.lax.dynamic_slice_in_dim(scene.tri_v0, s, tri_block)
            e1 = jax.lax.dynamic_slice_in_dim(scene.tri_e1, s, tri_block)
            e2 = jax.lax.dynamic_slice_in_dim(scene.tri_e2, s, tri_block)
            valid_tri = jax.lax.dynamic_slice_in_dim(
                scene.tri_valid, s, tri_block)
            refr = jax.lax.dynamic_slice_in_dim(tri_refr, s, tri_block)
            t, valid = _mt_block(o, d, v0, e1, e2, tmin, T_FAR)
            valid = (valid & valid_tri[None, :] & ~refr[None, :]
                     & (t < tm[:, None]))
            return occ | jnp.any(valid, axis=-1), None

        occ, _ = jax.lax.scan(body, jnp.zeros((o.shape[0],), bool),
                              jnp.arange(n_blocks))
        return occ

    o_c = origins.reshape(c, ray_chunk, 3)
    d_c = dirs.reshape(c, ray_chunk, 3)
    t_c = tmax.reshape(c, ray_chunk)
    if c == 1:
        occ = chunk_fn((o_c[0], d_c[0], t_c[0]))
    else:
        occ = jax.lax.map(chunk_fn, (o_c, d_c, t_c)).reshape(-1)
    return occ[:n]
