"""Unit tests for tpu_pt.vmath (reference math parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pt import vmath as vm


def rand_vecs(n, seed=0):
    r = np.random.RandomState(seed)
    return jnp.asarray(r.randn(n, 3).astype(np.float32))


def test_normalize_unit_length():
    v = rand_vecs(100)
    n = vm.normalize(v)
    np.testing.assert_allclose(np.asarray(vm.length(n)), 1.0, atol=1e-5)


def test_normalize_zero_safe():
    z = jnp.zeros((4, 3))
    assert not np.any(np.isnan(np.asarray(vm.normalize(z))))


def test_reflect_mirror():
    i = vm.normalize(jnp.asarray([[1.0, -1.0, 0.0]]))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    r = vm.reflect(i, n)
    np.testing.assert_allclose(np.asarray(r),
                               np.asarray(vm.normalize(
                                   jnp.asarray([[1.0, 1.0, 0.0]]))),
                               atol=1e-6)


def test_reflect_preserves_length_and_angle():
    i = vm.normalize(rand_vecs(50, 1))
    n = vm.normalize(rand_vecs(50, 2))
    r = vm.reflect(i, n)
    np.testing.assert_allclose(np.asarray(vm.length(r)), 1.0, atol=1e-5)
    # angle of incidence == angle of reflection
    np.testing.assert_allclose(np.asarray(vm.dot(i, n)),
                               -np.asarray(vm.dot(r, n)), atol=1e-5)


def test_faceforward():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    i_toward = jnp.asarray([[0.0, 0.0, 1.0]])
    i_away = jnp.asarray([[0.0, 0.0, -1.0]])
    np.testing.assert_allclose(
        np.asarray(vm.faceforward(n, i_toward, n))[0], [0, 0, 1])
    np.testing.assert_allclose(
        np.asarray(vm.faceforward(n, i_away, n))[0], [0, 0, -1])


def test_onb_orthonormal():
    n = vm.normalize(rand_vecs(200, 3))
    t, b, nn = vm.onb_from_normal(n)
    for v in (t, b):
        np.testing.assert_allclose(np.asarray(vm.length(v)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(t, b)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(t, nn)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(b, nn)), 0.0, atol=1e-5)


def test_onb_transform_z_maps_to_normal():
    n = vm.normalize(rand_vecs(50, 4))
    t, b, nn = vm.onb_from_normal(n)
    z = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), n.shape)
    out = vm.onb_transform(z, t, b, nn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(n), atol=1e-5)


@pytest.mark.parametrize("ior", [1.33, 1.5, 2.4])
def test_refract_snell(ior):
    # Entering: check Snell's law sin(theta_t) = sin(theta_i)/ior.
    theta_i = np.deg2rad(30.0)
    i = jnp.asarray([[np.sin(theta_i), 0.0, -np.cos(theta_i)]],
                    dtype=jnp.float32)
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    r, ok = vm.refract(i, n, ior)
    assert bool(ok[0])
    sin_t = float(np.linalg.norm(np.asarray(r)[0, :2]))
    np.testing.assert_allclose(sin_t, np.sin(theta_i) / ior, atol=1e-5)


def test_refract_tir():
    # Exiting a dense medium beyond the critical angle -> TIR.
    ior = 1.5
    crit = np.arcsin(1.0 / ior)
    theta = crit + 0.2
    # Ray going up, inside the medium (dot(i, n) > 0 means exiting).
    i = jnp.asarray([[np.sin(theta), 0.0, np.cos(theta)]], dtype=jnp.float32)
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    _, ok = vm.refract(i, n, ior)
    assert not bool(ok[0])


def test_safe_divide():
    np.testing.assert_allclose(np.asarray(vm.safe_divide(
        jnp.asarray([1.0, 2.0]), jnp.asarray([0.0, 2.0]))), [0.0, 1.0])


def test_luminance_weights():
    np.testing.assert_allclose(
        float(vm.luminance(jnp.asarray([1.0, 1.0, 1.0]))), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        float(vm.luminance(jnp.asarray([1.0, 0.0, 0.0]))), 0.30, atol=1e-6)
