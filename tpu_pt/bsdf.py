"""Vectorized BSDF sampling and Fresnel terms (component-SoA V3 layout).

Behavior parity with the reference's device shading math, redesigned as
wavefront-wide vector ops instead of per-thread divergent branches:
- cosine / uniform hemisphere sampling (``pathTracerPrograms.cu:341-380``)
- GGX microfacet sampling (``pathTracerPrograms.cu:455-476``)
- conductor Fresnel (``pathTracerPrograms.cu:494-510``)
- dielectric Fresnel with TIR (``pathTracerPrograms.cu:534-559``)

All functions broadcast over leading ray axes and use the V3 layout
(``tpu_pt.vec3``) so no op reduces over a size-3 minor axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import vec3 as v3
from .vec3 import V3

# The reference hardcodes the metal's complex IOR (eta slightly refracting
# blue, k absorbing red/blue; ``pathTracerPrograms.cu:943-944``).
METAL_ETA = (1.45, 0.7, 1.55)
METAL_K = (3.0, 2.2, 3.5)


def cosine_sample_hemisphere(u1, u2) -> V3:
    """Cosine-weighted local-frame direction (z-up); pdf = cos(theta)/pi.

    Same construction as the reference (theta = acos(sqrt(u1)),
    ``pathTracerPrograms.cu:341-353``) but algebraically simplified:
    cos(theta) = sqrt(u1), sin(theta) = sqrt(1-u1).
    """
    cos_t = jnp.sqrt(u1)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    phi = (2.0 * jnp.pi) * u2
    return V3(sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t)


def uniform_sample_hemisphere(u1, u2) -> V3:
    """Uniform local-frame hemisphere direction; pdf = 1/(2 pi).

    Parity: ``pathTracerPrograms.cu:368-380`` (z = u1, r = sqrt(1-u1^2)).
    """
    sin_t = jnp.sqrt(jnp.maximum(1.0 - u1 * u1, 0.0))
    phi = (2.0 * jnp.pi) * u2
    return V3(jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, u1)


def sample_hemisphere_world(n: V3, u1, u2, importance: bool) -> V3:
    """Sample a direction about world normal ``n`` via the reference ONB."""
    local = (cosine_sample_hemisphere(u1, u2) if importance
             else uniform_sample_hemisphere(u1, u2))
    t, b, nn = v3.onb_from_normal(n)
    return v3.onb_transform(local, t, b, nn)


def sample_ggx(u1, u2, roughness, n: V3) -> V3:
    """Sample a GGX microfacet normal about ``n``.

    Parity: ``sampleGGX`` (``pathTracerPrograms.cu:455-476``) — including its
    tangent frame built from up=(0,0,1) (or (1,0,0) near the pole), which
    differs from the diffuse ONB. Roughness is clamped to [0.001, 1]
    (the reference's clamp at :458 is a no-op bug; we apply it for real —
    see SURVEY.md §7 "known reference bugs", quirk-mode uses 0.2 anyway).
    """
    a = jnp.clip(roughness, 0.001, 1.0)
    phi = (2.0 * jnp.pi) * u1
    cos_t = jnp.sqrt((1.0 - u2) / (1.0 + (a * a - 1.0) * u2))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    hx, hy, hz = sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t

    pole = jnp.abs(n.z) >= 0.999
    ones = jnp.ones_like(n.x)
    zeros = jnp.zeros_like(n.x)
    up = v3.where(pole, V3(ones, zeros, zeros), V3(zeros, zeros, ones))
    tangent = v3.normalize(v3.cross(up, n))
    bitangent = v3.cross(n, tangent)
    h = tangent * hx + bitangent * hy + n * hz
    return v3.normalize(h)


def fresnel_conductor(cos_theta, eta: V3, k: V3) -> V3:
    """Conductor Fresnel reflectance per RGB channel.

    Parity: ``fresnelSchlickConductor`` (``pathTracerPrograms.cu:494-510``).
    """
    c2 = jnp.asarray(cos_theta, jnp.float32) ** 2

    def chan(e, kk):
        e2 = e * e
        k2 = kk * kk
        t1 = e2 - k2 - c2
        a2b2 = jnp.sqrt(jnp.maximum(t1 * t1 + 4.0 * e2 * k2, 0.0))
        t2 = a2b2 + c2
        two_ec = 2.0 * e * jnp.sqrt(c2)
        rs = (t2 - two_ec + c2) / (t2 + two_ec + c2)
        rp = rs * (t2 - two_ec + 1.0) / (t2 + two_ec + 1.0)
        return 0.5 * (rs + rp)

    return V3(chan(eta.x, k.x), chan(eta.y, k.y), chan(eta.z, k.z))


def metal_eta_k(shape) -> tuple[V3, V3]:
    """The reference's hardcoded conductor constants, broadcast to shape."""
    return V3.full(shape, METAL_ETA), V3.full(shape, METAL_K)


def fr_dielectric(cos_theta_i, eta_i, eta_t):
    """Dielectric Fresnel with total internal reflection.

    Parity: ``FrDielectric`` (``pathTracerPrograms.cu:534-559``, PBRT-style):
    a negative cos_theta_i means the ray is inside the medium -> swap etas.
    """
    cos_i = jnp.clip(jnp.asarray(cos_theta_i, jnp.float32), -1.0, 1.0)
    entering = cos_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    cos_i = jnp.abs(cos_i)

    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    # eta_t can be 0 on lanes whose material never refracts (the shade
    # step evaluates every BSDF on every lane and masks after); treat it
    # as sin_t -> huge -> TIR rather than dividing by zero.
    sin_t = ei / jnp.maximum(et, 1e-12) * sin_i
    tir = sin_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))

    # The denominators vanish only at sin_t == 1 exactly — the TIR
    # boundary, where the result is overridden to 1 — so masking them to
    # 1 changes no reachable value but keeps the op NaN-free (checkify
    # validation mode runs clean; see tpu_pt.debug.validate_frame).
    d_parl = (et * cos_i) + (ei * cos_t)
    d_perp = (ei * cos_i) + (et * cos_t)
    r_parl = ((et * cos_i) - (ei * cos_t)) / jnp.where(d_parl > 0, d_parl, 1.0)
    r_perp = ((ei * cos_i) - (et * cos_t)) / jnp.where(d_perp > 0, d_perp, 1.0)
    f = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)
