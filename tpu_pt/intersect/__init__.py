"""Intersection backends.

``get_intersectors`` picks the backend per config:
- ``bruteforce``: chunked jnp Möller-Trumbore (always available, any device)
- ``pallas``: fused Pallas TPU kernel of the same dense test
- ``bvh``: LBVH build + traversal for large meshes
- ``auto``: pallas on TPU when available, else bruteforce; bvh once the
  triangle count crosses its crossover.
"""

from __future__ import annotations

from functools import partial

# Landing-slab sentinel shared by the prediction-ordered scheduler
# (render.py pred carry) and the pallas intersector ("no prediction"
# in, "slab not recoverable / miss" out). Far above any chained-slab
# count, int32-safe.
SLAB_UNKNOWN = 1 << 30

import jax

from ..config import RenderConfig
from ..scene.arrays import SceneArrays
from .moller import Hit, intersect_closest, intersect_occluded

__all__ = ["Hit", "intersect_closest", "intersect_occluded",
           "get_intersectors"]

# Dense all-pairs testing beats BVH traversal below these triangle counts.
# The jnp traversal is gather-bound (~6 ns/element on TPU), so the slabbed
# Pallas brute force wins by ~10x even at 100k tris on TPU hardware; on CPU
# the chunked jnp sweep loses to the BVH much earlier.
BVH_CROSSOVER_TRIS = 4096            # CPU (bruteforce vs lbvh)
TPU_BVH_CROSSOVER_TRIS = 1 << 20     # TPU (pallas vs lbvh)


def _available(mod: str) -> bool:
    import importlib.util
    return importlib.util.find_spec(f"tpu_pt.intersect.{mod}") is not None


def _resolve(scene: SceneArrays, cfg: RenderConfig) -> str:
    if cfg.intersector != "auto":
        return cfg.intersector
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu and _available("pallas_bf"):
        if (scene.num_tris_padded > TPU_BVH_CROSSOVER_TRIS
                and scene.bvh is not None):
            return "bvh"
        return "pallas"
    if scene.num_tris_padded > BVH_CROSSOVER_TRIS and scene.bvh is not None:
        return "bvh"
    return "bruteforce"


def get_fused_closest_nee(scene: SceneArrays, cfg: RenderConfig):
    """Fused closest-hit + NEE-occlusion kernel, or None.

    Only the Pallas backend implements the fusion (one pass over the
    VMEM-resident triangles serves both the radiance and the shadow ray);
    the quirk occlusion mode keeps the two-kernel path."""
    if (not cfg.fused_nee or _resolve(scene, cfg) != "pallas"
            or scene.light is None or cfg.quirks.occlusion_first_hit_only
            or (scene.prims is not None and scene.prims.count)
            or (scene.curves is not None and scene.curves.count)):
        return None    # the fused kernel knows nothing of analytic prims
    from . import pallas_bf
    if scene.num_tris_padded > pallas_bf.TRI_SLAB:
        return None    # fused kernel holds all tris in one VMEM block
    return partial(pallas_bf.intersect_closest_nee, scene,
                   tmin=cfg.t_min, tmax=cfg.t_max)


def _with_primitives(scene: SceneArrays, cfg: RenderConfig, closest_fn,
                     occluded_fn):
    """Bind analytic primitives into the pipeline (min-t combine).

    The SBT-bound custom-primitive intersection programs of the reference
    (``sutil/Scene.cpp:1368-1450`` + ``cuda/geometry.cu``/``sphere.cu``)
    become a dense post-pass over the few primitives, combined with the
    triangle hit by min-t. Primitive ids are offset past the padded
    triangle range so consumers can tell them apart; when a primitive
    wins, any landing-slab prediction is reset to SLAB_UNKNOWN."""
    from functools import wraps
    from .primitives import (combine_hits, intersect_primitives,
                             occluded_primitives)
    prims = scene.prims
    offset = scene.num_tris_padded

    @wraps(closest_fn)
    def closest2(o, d, pred=None, want_slab=False):
        if want_slab:
            hit, slab = closest_fn(o, d, pred=pred, want_slab=True)
        else:
            hit = (closest_fn(o, d, pred=pred, want_slab=False)
                   if getattr(closest_fn, "supports_pred", False)
                   else closest_fn(o, d))
        ph = intersect_primitives(prims, o, d, tmin=cfg.t_min,
                                  tmax=cfg.t_max, index_offset=offset)
        if want_slab:
            import jax.numpy as jnp
            prim_wins = ph.t < hit.t
            slab = jnp.where(prim_wins, SLAB_UNKNOWN, slab)
            return combine_hits(hit, ph), slab
        return combine_hits(hit, ph)

    closest2.supports_pred = getattr(closest_fn, "supports_pred", False)

    def occluded2(o, d, tmax):
        return (occluded_fn(o, d, tmax)
                | occluded_primitives(prims, o, d, tmax, tmin=cfg.t_min))

    return closest2, occluded2


def _with_curves(scene: SceneArrays, cfg: RenderConfig, closest_fn,
                 occluded_fn):
    """Bind swept-sphere curves into the pipeline (min-t combine).

    The reference carries its four round-curve types as first-class
    geometry (``cuda/GeometryData.h:95-127``) with exact swept-sphere
    surface normals in shading (``cuda/curve.h:312-443``); here the
    tessellated rounded-cone intersector + exact post-hoc normals of
    ``intersect.curves`` join the hit stream exactly like the analytic
    primitives. Curve ids live past the primitive ids."""
    from functools import wraps
    from .curves import intersect_curves, occluded_curves
    from .primitives import combine_hits
    curves = scene.curves
    offset = scene.num_tris_padded + (
        scene.prims.count if scene.prims is not None else 0)

    @wraps(closest_fn)
    def closest2(o, d, pred=None, want_slab=False):
        if want_slab:
            hit, slab = closest_fn(o, d, pred=pred, want_slab=True)
        else:
            hit = (closest_fn(o, d, pred=pred, want_slab=False)
                   if getattr(closest_fn, "supports_pred", False)
                   else closest_fn(o, d))
        ch = intersect_curves(curves, o, d, tmin=cfg.t_min,
                              tmax=cfg.t_max, index_offset=offset)
        if want_slab:
            import jax.numpy as jnp
            curve_wins = ch.t < hit.t
            slab = jnp.where(curve_wins, SLAB_UNKNOWN, slab)
            return combine_hits(hit, ch), slab
        return combine_hits(hit, ch)

    closest2.supports_pred = getattr(closest_fn, "supports_pred", False)

    def occluded2(o, d, tmax):
        return (occluded_fn(o, d, tmax)
                | occluded_curves(curves, o, d, tmax, tmin=cfg.t_min))

    return closest2, occluded2


def get_intersectors(scene: SceneArrays, cfg: RenderConfig,
                     want_uv: bool = True):
    """Returns (closest_fn(o, d) -> Hit, occluded_fn(o, d, tmax) -> bool).

    ``want_uv=False`` lets the Pallas backend skip the barycentric output
    reduction (the OBJ path tracer shades flat normals only; the whitted
    pipeline needs u/v for vertex-attribute interpolation)."""
    if scene.curves is not None and scene.curves.count:
        base = scene.replace(curves=None)
        closest_fn, occluded_fn = get_intersectors(base, cfg,
                                                   want_uv=want_uv)
        return _with_curves(scene, cfg, closest_fn, occluded_fn)
    if scene.prims is not None and scene.prims.count:
        base = scene.replace(prims=None)
        closest_fn, occluded_fn = get_intersectors(base, cfg,
                                                   want_uv=want_uv)
        return _with_primitives(scene, cfg, closest_fn, occluded_fn)
    backend = _resolve(scene, cfg)

    if backend == "pallas":
        import os
        from . import pallas_bf
        closest = partial(pallas_bf.intersect_closest, scene,
                          tmin=cfg.t_min, tmax=cfg.t_max,
                          want_uv=want_uv)

        def closest_fn(o, d, pred=None, want_slab=False):
            return closest(o, d, pred=pred, want_slab=want_slab)

        # Landing-slab prediction pays only where the clustered lean
        # path runs (multi-slab scenes, t/id carry): that path both
        # consumes the prediction (sort key) and produces the next one
        # (winner slab from the packed row id, no gather). TPT_PRED=0
        # to ablate.
        closest_fn.supports_pred = (
            not want_uv
            and pallas_bf._pad_to(scene.tri_v0.shape[0],
                                  pallas_bf.TRI_BLOCK) > pallas_bf.TRI_SLAB
            and os.environ.get("TPT_LEAN_BIG", "1") == "1"
            and os.environ.get("TPT_BINNED", "0") not in ("1", "closest")
            and os.environ.get("TPT_PRED", "1") != "0")
        occluded = partial(pallas_bf.intersect_occluded, scene,
                           tmin=cfg.t_min,
                           quirk_first_hit=cfg.quirks.occlusion_first_hit_only)
        return closest_fn, occluded

    if backend == "bvh":
        from . import lbvh
        closest = partial(lbvh.intersect_closest, scene,
                          tmin=cfg.t_min, tmax=cfg.t_max)
        occluded = partial(lbvh.intersect_occluded, scene,
                           tmin=cfg.t_min,
                           quirk_first_hit=cfg.quirks.occlusion_first_hit_only)
        return closest, occluded

    assert backend == "bruteforce", backend
    closest = partial(intersect_closest, scene, tmin=cfg.t_min,
                      tmax=cfg.t_max, ray_chunk=cfg.ray_chunk,
                      tri_block=cfg.tri_block)

    def occluded(o, d, tmax):
        return intersect_occluded(
            scene, o, d, tmax, tmin=cfg.t_min, ray_chunk=cfg.ray_chunk,
            tri_block=cfg.tri_block,
            quirk_first_hit=cfg.quirks.occlusion_first_hit_only)

    return closest, occluded
