"""Wavefront path-trace core.

This is the TPU-native inversion of the reference's OptiX megakernel
(``__raygen__rg`` / ``__miss__ms`` / ``__closesthit__diffuse__ch``,
``pathTracerPrograms.cu:707-1031``): instead of one divergent thread per
pixel, the whole frame is a fixed-shape ray SoA wavefront; the bounce loop is
a ``lax.scan`` whose carry is the typed path state (the reference's
19-register payload ABI, ``pathTracer.h:38-68``, becomes this pytree); BSDF
dispatch is vectorized selects over a ``mat_id`` gather (the SBT-record-per-
material mechanism, ``PathTracerMain.cpp:544-627``); termination is masked
lanes + Russian roulette; radiance estimates match the reference's
accumulation identities bounce for bounce.

RNG is counter-based (``tpu_pt.rng``), so results are bitwise reproducible
and independent of sharding — the documented divergence from the reference's
payload-threaded LCG.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import bsdf, rng
from . import vmath as vm
from .config import RenderConfig
from .intersect import get_intersectors
from .scene.arrays import (BSDF_DIFFUSE, BSDF_METALLIC, BSDF_REFRACTION,
                           SceneArrays)

# DoneReason parity (``pathTracer.h:11-17``).
MISS = 0
MAX_DEPTH = 1
RUSSIAN_ROULETTE = 2
LIGHT_HIT = 3
NOT_DONE = 4
NUM_DONE_REASONS = 5

_RR_WEIGHTS = (0.30, 0.59, 0.11)  # luminance RR weights, cu:763


@struct.dataclass
class CameraArrays:
    """Device-side camera: eye + (non-orthonormal) UVW frame
    (``PathTraceParams`` camera fields, ``pathTracer.h:96-99``)."""
    eye: jnp.ndarray  # [3]
    u: jnp.ndarray    # [3]
    v: jnp.ndarray    # [3]
    w: jnp.ndarray    # [3]

    @classmethod
    def from_camera(cls, camera) -> "CameraArrays":
        u, v, w = camera.uvw_frame()
        return cls(eye=jnp.asarray(camera.eye, jnp.float32),
                   u=jnp.asarray(u, jnp.float32),
                   v=jnp.asarray(v, jnp.float32),
                   w=jnp.asarray(w, jnp.float32))


@struct.dataclass
class RenderStats:
    """Per-frame telemetry (SURVEY.md §5.5): ray counts for Mrays/s and the
    path-termination histogram (the reference's DoneReason debug channel)."""
    rays_traced: jnp.ndarray       # scalar f32: radiance rays actually alive
    shadow_rays: jnp.ndarray       # scalar f32: NEE occlusion rays
    done_histogram: jnp.ndarray    # [5] f32, indexed by DoneReason


def camera_rays(cam: CameraArrays, pixel_ids: jnp.ndarray, width: int,
                height: int, jx: jnp.ndarray, jy: jnp.ndarray):
    """Primary rays for flat pixel ids (y*width + x), jittered in-pixel.

    Matches ``__raygen__rg`` ray setup (``pathTracerPrograms.cu:730-738``):
    d = 2*(pix + jitter)/extent - 1; dir = normalize(d.x*U + d.y*V + W).
    Row 0 is the image bottom (OptiX/GL convention); PNG writers flip.
    """
    x = (pixel_ids % width).astype(jnp.float32)
    y = (pixel_ids // width).astype(jnp.float32)
    dx = 2.0 * ((x + jx) / width) - 1.0
    dy = 2.0 * ((y + jy) / height) - 1.0
    direction = vm.normalize(dx[..., None] * cam.u + dy[..., None] * cam.v
                             + cam.w)
    origin = jnp.broadcast_to(cam.eye, direction.shape)
    return origin, direction


def _shade_hit(scene: SceneArrays, cfg: RenderConfig, origin, direction,
               hit_t, hit_tri, z):
    """Closest-hit shading for the whole wavefront (vectorized
    ``__closesthit__diffuse__ch``, ``pathTracerPrograms.cu:866-983``).

    ``z`` is a (z1, z2, z3) tuple of uniforms. Returns (new_origin, new_dir,
    atten_mult, n, p, mat fields...) for every lane; callers mask by hit.
    """
    mat = scene.mat_id[hit_tri]
    diffuse = scene.mat_diffuse[mat]
    emission = scene.mat_emission[mat]
    ior = scene.mat_ior[mat]
    bsdf_type = scene.mat_bsdf[mat]
    is_emissive = scene.mat_is_emissive[mat]
    if cfg.quirks.fixed_metal_roughness:
        roughness = jnp.full(mat.shape, 0.2, jnp.float32)
    else:
        roughness = scene.mat_roughness[mat]

    n0 = scene.tri_normal[hit_tri]
    n = vm.faceforward(n0, -direction, n0)
    p = origin + hit_t[..., None] * direction

    z1, z2, z3 = z

    # --- diffuse: hemisphere sample about N in the reference ONB (cu:907-930)
    dir_diffuse = bsdf.sample_hemisphere_world(
        n, z1, z2, cfg.use_importance_sampling)
    org_diffuse = p
    mult_diffuse = diffuse

    # --- metallic: GGX half-vector reflect + conductor Fresnel (cu:931-952)
    h = bsdf.sample_ggx(z1, z2, roughness, n)
    dir_metal = vm.reflect(direction, h)
    org_metal = p + dir_metal * 1e-4
    cos_t = jnp.maximum(vm.dot(h, -direction), 0.0)
    f_cond = bsdf.fresnel_conductor(cos_t, bsdf.METAL_ETA, bsdf.METAL_K)
    mult_metal = f_cond * diffuse

    # --- refraction: dielectric Fresnel choose reflect/refract (cu:954-981)
    cos_i = vm.dot(-vm.normalize(direction), n0)
    fr = bsdf.fr_dielectric(cos_i, 1.0, ior)
    refr_dir, did_refract = vm.refract(vm.normalize(direction), n0, ior)
    refl_dir = vm.reflect(vm.normalize(direction), n0)
    choose_reflect = (z3 < fr) | ~did_refract
    dir_refr = jnp.where(choose_reflect[..., None], refl_dir, refr_dir)
    org_refr = p + dir_refr * 1e-3
    mult_refr = diffuse

    is_metal = (bsdf_type == BSDF_METALLIC)[..., None]
    is_refr = (bsdf_type == BSDF_REFRACTION)[..., None]
    new_dir = jnp.where(is_refr, dir_refr,
                        jnp.where(is_metal, dir_metal, dir_diffuse))
    new_org = jnp.where(is_refr, org_refr,
                        jnp.where(is_metal, org_metal, org_diffuse))
    atten_mult = jnp.where(is_refr, mult_refr,
                           jnp.where(is_metal, mult_metal, mult_diffuse))

    return dict(new_origin=new_org, new_dir=new_dir, atten_mult=atten_mult,
                n=n, p=p, emission=emission, is_emissive=is_emissive,
                bsdf_type=bsdf_type)


def _nee(scene: SceneArrays, cfg: RenderConfig, occluded_fn, shade, hit_mask,
         lz1, lz2):
    """Next-event-estimation direct lighting from the area light
    (``pathTracerPrograms.cu:1003-1026``). Returns (radiance_add [N,3],
    shadow_ray_mask [N])."""
    light = scene.light
    p = shade["p"]
    n = shade["n"]
    light_pos = light.corner + light.v1 * lz1[..., None] \
        + light.v2 * lz2[..., None]
    to_l = light_pos - p
    l_dist = vm.length(to_l)
    l_dir = vm.normalize(to_l)
    n_dl = vm.dot(n, l_dir)
    ln_dl = -vm.dot(light.normal, l_dir)

    eligible = (hit_mask & (shade["bsdf_type"] != BSDF_REFRACTION)
                & (n_dl > 0.0) & (ln_dl > 0.0))

    # Occlusion rays only matter on eligible lanes; zero the rest.
    occ_dir = jnp.where(eligible[..., None], l_dir, 0.0)
    occ_tmax = jnp.where(eligible, l_dist - 0.01, 0.0)
    occluded = occluded_fn(p, occ_dir, occ_tmax)

    area = vm.length(vm.cross(light.v1, light.v2))
    weight = n_dl * ln_dl * area / (jnp.pi * jnp.maximum(l_dist, 1e-6) ** 2)
    contrib = jnp.where((eligible & ~occluded)[..., None],
                        light.emission * weight[..., None], 0.0)
    return contrib, eligible


def render_wavefront(scene: SceneArrays, cam: CameraArrays,
                     cfg: RenderConfig, pixel_ids: jnp.ndarray,
                     frame_idx,
                     sample_offset=0) -> tuple[jnp.ndarray, RenderStats]:
    """Estimate mean radiance over ``cfg.spp`` samples for each pixel id.

    Returns (radiance [N, 3] float32, RenderStats). This is the jittable
    heart of the framework — everything above it (accumulation, tonemap,
    sharding, viewer) composes around this function. ``sample_offset``
    shifts the counter-RNG sample axis so spp-sharded devices draw disjoint
    sample sets (bitwise identical to a single-device render of the union).
    """
    n = pixel_ids.shape[0]
    closest_fn, occluded_fn = get_intersectors(scene, cfg)
    rr_w = jnp.asarray(_RR_WEIGHTS, jnp.float32)
    bg = jnp.asarray(cfg.background, jnp.float32)
    frame_idx = jnp.asarray(frame_idx, jnp.uint32)

    def one_sample(sample_idx):
        jx, jy = rng.uniform2(pixel_ids, sample_idx, frame_idx,
                              rng.STREAM_JITTER)
        origin, direction = camera_rays(cam, pixel_ids, cfg.width,
                                        cfg.height, jx, jy)

        def bounce(carry, depth):
            (origin, direction, atten, alive, result, reason,
             n_rays, n_shadow) = carry

            hit = closest_fn(origin, direction)
            hit_mask = hit.hit

            sa, sb = rng.bounce_streams(depth)
            z1, z2, z3, _ = rng.uniform4(pixel_ids, sample_idx, frame_idx, sa)
            lz1, lz2, z_rr, _ = rng.uniform4(pixel_ids, sample_idx,
                                             frame_idx, sb)

            shade = _shade_hit(scene, cfg, origin, direction, hit.t, hit.tri,
                               (z1, z2, z3))

            # Emission channel: only at depth 0 (cu:898-901); miss writes 0.
            emitted = jnp.where(
                (hit_mask & (depth == 0) & shade["is_emissive"])[..., None],
                shade["emission"], 0.0)

            # Radiance channel: miss -> background (cu:841), light hit ->
            # emission (cu:992-996), else 0; NEE adds direct light.
            light_hit = hit_mask & shade["is_emissive"]
            radiance = jnp.where(~hit_mask[..., None], bg, 0.0)
            radiance = jnp.where(light_hit[..., None], shade["emission"],
                                 radiance)
            shadow_count = jnp.zeros((), jnp.float32)
            if cfg.use_direct_lighting:
                nee_radiance, shadow_mask = _nee(
                    scene, cfg, occluded_fn, shade, hit_mask, lz1, lz2)
                radiance = radiance + nee_radiance
                shadow_count = jnp.sum(
                    jnp.where(alive & shadow_mask, 1.0, 0.0))

            # Attenuation multiplies by the hit BSDF color BEFORE the
            # radiance weight (the reference's CH-then-raygen ordering).
            atten_new = jnp.where(hit_mask[..., None],
                                  atten * shade["atten_mult"], atten)
            contrib = emitted + radiance * atten_new
            result = result + jnp.where(alive[..., None], contrib, 0.0)

            # Russian roulette on perceived brightness (cu:763-773).
            p_rr = vm.dot(atten_new, rr_w)
            rr_kill = z_rr > p_rr
            at_max = depth >= cfg.max_depth
            done_flag = ~hit_mask | light_hit
            done = done_flag | rr_kill | at_max

            # DoneReason precedence parity (cu:768-771): MAX_DEPTH beats RR
            # beats MISS/LIGHT_HIT.
            base_reason = jnp.where(~hit_mask, MISS,
                                    jnp.where(light_hit, LIGHT_HIT, NOT_DONE))
            this_reason = jnp.where(
                at_max, MAX_DEPTH,
                jnp.where(rr_kill, RUSSIAN_ROULETTE, base_reason))
            reason = jnp.where(alive & done, this_reason, reason)

            newly_dead = alive & done
            alive_next = alive & ~done
            # RR compensation only on surviving paths (cu:773 safeDivide).
            atten_next = jnp.where(alive_next[..., None],
                                   vm.safe_divide(atten_new, p_rr[..., None]),
                                   atten_new)
            origin = jnp.where(alive_next[..., None], shade["new_origin"],
                               origin)
            direction = jnp.where(alive_next[..., None], shade["new_dir"],
                                  direction)
            n_rays = n_rays + jnp.sum(jnp.where(alive, 1.0, 0.0))
            n_shadow = n_shadow + shadow_count
            del newly_dead
            return (origin, direction, atten_next, alive_next, result,
                    reason, n_rays, n_shadow), None

        init = (origin, direction,
                jnp.ones((n, 3), jnp.float32),
                jnp.ones((n,), bool),
                jnp.zeros((n, 3), jnp.float32),
                jnp.full((n,), NOT_DONE, jnp.int32),
                jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.float32))
        depths = jnp.arange(cfg.max_depth + 1, dtype=jnp.uint32)
        (_, _, _, _, result, reason, n_rays, n_shadow), _ = jax.lax.scan(
            bounce, init, depths)

        hist = jnp.zeros((NUM_DONE_REASONS,), jnp.float32).at[reason].add(1.0)
        return result, n_rays, n_shadow, hist

    def spp_body(carry, sample_idx):
        acc, n_rays, n_shadow, hist = carry
        r, nr, ns, h = one_sample(sample_idx)
        return (acc + r, n_rays + nr, n_shadow + ns, hist + h), None

    init = (jnp.zeros((n, 3), jnp.float32), jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((NUM_DONE_REASONS,), jnp.float32))
    samples = jnp.arange(cfg.spp, dtype=jnp.uint32) + jnp.asarray(
        sample_offset, jnp.uint32)
    (acc, n_rays, n_shadow, hist), _ = jax.lax.scan(spp_body, init, samples)

    radiance = acc / jnp.float32(cfg.spp)
    stats = RenderStats(rays_traced=n_rays, shadow_rays=n_shadow,
                        done_histogram=hist)
    return radiance, stats


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("accum",))
def render_frame(scene: SceneArrays, cam: CameraArrays, cfg: RenderConfig,
                 frame_idx, accum):
    """Progressive frame step: trace, average, fold into the accumulator.

    Equivalent of one ``optixLaunch`` + device-side accumulation
    (``LaunchCurrentFrame``, ``PathTracerMain.cpp:184-210`` +
    ``pathTracerPrograms.cu:803-815``). ``accum`` is [H, W, 3] float32 and is
    donated. Returns (new_accum, srgb_u8 [H, W, 3], stats).
    """
    from . import film

    n = cfg.width * cfg.height
    pixel_ids = jnp.arange(n, dtype=jnp.uint32)
    radiance, stats = render_wavefront(scene, cam, cfg, pixel_ids, frame_idx)
    frame_img = radiance.reshape(cfg.height, cfg.width, 3)
    new_accum = film.accumulate(accum, frame_img, frame_idx)
    frame_u8 = film.make_color(new_accum)
    return new_accum, frame_u8, stats


def init_accum(cfg: RenderConfig) -> jnp.ndarray:
    """Fresh accumulation buffer (the reference's free+realloc reset,
    ``PathTracerMain.cpp:166-182``)."""
    return jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)


def image_to_host(frame_u8: jnp.ndarray) -> np.ndarray:
    """Device frame -> numpy, flipped to top-down row order for image files."""
    return np.asarray(frame_u8)[::-1]
