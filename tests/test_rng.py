"""Statistical and determinism tests for the counter-based RNG."""

import jax.numpy as jnp
import numpy as np

from tpu_pt import rng


def test_range_and_determinism():
    pix = jnp.arange(10000, dtype=jnp.uint32)
    a = np.asarray(rng.uniform4(pix, 3, 7, 1))
    b = np.asarray(rng.uniform4(pix, 3, 7, 1))
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0.0 and a.max() < 1.0


def test_uniform_moments():
    pix = jnp.arange(200000, dtype=jnp.uint32)
    x, y, z, w = rng.uniform4(pix, 0, 0, 0)
    for u in (x, y, z, w):
        u = np.asarray(u)
        assert abs(u.mean() - 0.5) < 0.01
        assert abs(u.var() - 1.0 / 12.0) < 0.005


def test_streams_decorrelated():
    pix = jnp.arange(100000, dtype=jnp.uint32)
    a, _ = rng.uniform2(pix, 0, 0, 0)
    b, _ = rng.uniform2(pix, 0, 0, 1)
    corr = np.corrcoef(np.asarray(a), np.asarray(b))[0, 1]
    assert abs(corr) < 0.01


def test_counters_decorrelated():
    """Sequential counters (the common adversarial case for weak hashes)."""
    pix = jnp.arange(100000, dtype=jnp.uint32)
    a, _ = rng.uniform2(pix, 0, 0, 5)
    b, _ = rng.uniform2(pix + 1, 0, 0, 5)
    corr = np.corrcoef(np.asarray(a), np.asarray(b))[0, 1]
    assert abs(corr) < 0.01


def test_frame_advance_changes_samples():
    pix = jnp.arange(1000, dtype=jnp.uint32)
    a, _ = rng.uniform2(pix, 0, 0, 0)
    b, _ = rng.uniform2(pix, 0, 1, 0)
    assert np.mean(np.asarray(a) == np.asarray(b)) < 0.01


def test_bounce_streams_disjoint():
    seen = set()
    for d in range(29):
        sa, sb = rng.bounce_streams(d)
        assert sa not in seen and sb not in seen and sa != sb
        seen.add(sa)
        seen.add(sb)
    assert rng.STREAM_JITTER not in seen
