"""Property tests for BSDF sampling and Fresnel (SURVEY.md §4 test pyramid)."""

import jax.numpy as jnp
import numpy as np

from tpu_pt import bsdf, rng
from tpu_pt import vmath as vm
from tpu_pt import vec3
from tpu_pt.vec3 import V3


def _uniforms(n, seed=0):
    r = np.random.RandomState(seed)
    return (jnp.asarray(r.rand(n).astype(np.float32)),
            jnp.asarray(r.rand(n).astype(np.float32)))


def test_cosine_hemisphere_distribution():
    u1, u2 = _uniforms(200000)
    d = bsdf.cosine_sample_hemisphere(u1, u2).to_array()
    cos_t = np.asarray(d[..., 2])
    assert cos_t.min() >= 0.0
    # E[cos] = 2/3 for pdf = cos/pi.
    assert abs(cos_t.mean() - 2.0 / 3.0) < 0.005
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-4)


def test_uniform_hemisphere_distribution():
    u1, u2 = _uniforms(200000, 1)
    d = bsdf.uniform_sample_hemisphere(u1, u2).to_array()
    cos_t = np.asarray(d[..., 2])
    assert cos_t.min() >= 0.0
    # E[cos] = 1/2 for the uniform hemisphere.
    assert abs(cos_t.mean() - 0.5) < 0.005


def test_cosine_azimuth_uniform():
    u1, u2 = _uniforms(100000, 2)
    d = bsdf.cosine_sample_hemisphere(u1, u2).to_array()
    phi = np.arctan2(np.asarray(d[..., 1]), np.asarray(d[..., 0]))
    hist, _ = np.histogram(phi, bins=16, range=(-np.pi, np.pi))
    expected = len(phi) / 16
    assert np.all(np.abs(hist - expected) < 5 * np.sqrt(expected))


def test_sample_hemisphere_world_in_hemisphere():
    r = np.random.RandomState(3)
    n = vm.normalize(jnp.asarray(r.randn(1000, 3).astype(np.float32)))
    u1 = jnp.asarray(r.rand(1000).astype(np.float32))
    u2 = jnp.asarray(r.rand(1000).astype(np.float32))
    nv = V3.from_array(n)
    for imp in (True, False):
        d = bsdf.sample_hemisphere_world(nv, u1, u2, imp)
        assert np.asarray(vec3.dot(d, nv)).min() >= -1e-4


def test_ggx_roughness_concentration():
    """Smaller roughness concentrates half-vectors around the normal."""
    u1, u2 = _uniforms(50000, 4)
    n = V3.full((50000,), (0.0, 0.0, 1.0))
    h_smooth = bsdf.sample_ggx(u1, u2, 0.05, n)
    h_rough = bsdf.sample_ggx(u1, u2, 0.9, n)
    cs = np.asarray(vec3.dot(h_smooth, n)).mean()
    cr = np.asarray(vec3.dot(h_rough, n)).mean()
    assert cs > 0.99
    assert cr < cs - 0.1


def test_ggx_cos_theta_formula():
    # Closed form: cos_theta = sqrt((1-u2)/(1+(a^2-1) u2)).
    u2 = jnp.asarray([0.25], jnp.float32)
    a = 0.3
    n = V3.full((1,), (0.0, 0.0, 1.0))
    h = bsdf.sample_ggx(jnp.asarray([0.0]), u2, a, n)
    expect = np.sqrt((1 - 0.25) / (1 + (a * a - 1) * 0.25))
    np.testing.assert_allclose(float(h.z[0]), expect, atol=1e-5)


def test_fr_dielectric_normal_incidence():
    # R0 = ((1-1.5)/(1+1.5))^2 = 0.04.
    f = float(bsdf.fr_dielectric(jnp.asarray(1.0), 1.0, 1.5))
    np.testing.assert_allclose(f, 0.04, atol=1e-4)


def test_fr_dielectric_tir():
    ior = 1.5
    crit = np.arcsin(1.0 / ior)
    # Inside the medium (negative cos), beyond critical angle.
    cos_i = -np.cos(crit + 0.05)
    f = float(bsdf.fr_dielectric(jnp.asarray(cos_i, jnp.float32), 1.0, ior))
    np.testing.assert_allclose(f, 1.0)


def test_fr_dielectric_grazing():
    f = float(bsdf.fr_dielectric(jnp.asarray(1e-4), 1.0, 1.5))
    assert f > 0.95


def test_fr_dielectric_energy_range():
    cos = jnp.linspace(-1, 1, 101)
    f = np.asarray(bsdf.fr_dielectric(cos, 1.0, 1.5))
    assert np.all(f >= 0.0) and np.all(f <= 1.0)


def test_fresnel_conductor_range_and_reference_metal():
    cos = jnp.linspace(0.01, 1.0, 64)
    eta, k = bsdf.metal_eta_k(cos.shape)
    f = np.asarray(bsdf.fresnel_conductor(cos, eta, k).to_array())
    assert np.all(f >= 0.0) and np.all(f <= 1.0)
    # Conductors stay highly reflective at normal incidence.
    assert f[-1].mean() > 0.5


def test_render_rng_matches_standalone():
    """The render loop's draw sites must hit the documented streams."""
    pix = jnp.asarray([7], jnp.uint32)
    sa, sb = rng.bounce_streams(2)
    a = rng.uniform4(pix, 1, 0, sa)
    b = rng.uniform4(pix, 1, 0, sa)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = rng.uniform4(pix, 1, 0, sb)
    assert not np.allclose(np.asarray(a), np.asarray(c))
