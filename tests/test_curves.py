"""Swept-sphere curve primitives (reference curve types,
``cuda/GeometryData.h:55-127`` + ``cuda/curve.h:312-443``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pt.intersect import curves as C
from tpu_pt.intersect.moller import T_FAR


def rays_towards(points, origin):
    o = np.broadcast_to(np.asarray(origin, np.float32), points.shape).copy()
    d = points - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_linear_cylinder_analytic():
    """A straight constant-radius linear curve is a capsule: hits and
    normals match the analytic cylinder."""
    cs = C.make_curves([dict(kind=C.CURVE_LINEAR,
                             points=[[0, 0, 0], [4, 0, 0]],
                             radii=[0.5, 0.5], mat=3)])
    n = 16
    xs = np.linspace(0.5, 3.5, n).astype(np.float32)
    o = np.stack([xs, np.full(n, 5.0, np.float32),
                  np.zeros(n, np.float32)], axis=1)
    d = np.broadcast_to(np.asarray([0, -1, 0], np.float32), (n, 3))
    h = C.intersect_curves(cs, jnp.asarray(o), jnp.asarray(d))
    assert bool(h.hit.all())
    np.testing.assert_allclose(np.asarray(h.t), 4.5, atol=1e-3)
    # Cylinder normal points straight back at the ray.
    np.testing.assert_allclose(np.asarray(h.normal.y), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h.normal.x), 0.0, atol=1e-4)
    assert (np.asarray(h.mat) == 3).all()


def test_linear_spherical_caps():
    """Rays aimed past the endpoints hit the spherical caps."""
    cs = C.make_curves([dict(kind=C.CURVE_LINEAR,
                             points=[[0, 0, 0], [4, 0, 0]],
                             radii=[0.5, 0.5])])
    o = jnp.asarray([[-3.0, 0.0, 0.0], [7.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]], jnp.float32)
    h = C.intersect_curves(cs, o, d)
    np.testing.assert_allclose(np.asarray(h.t), [2.5, 2.5], atol=1e-3)


def test_cone_radius_gradient_tilts_normal():
    """With r' != 0 the exact normal tilts along the axis by -r' (the
    (dr * r) * d term of curve.h:376)."""
    cs = C.make_curves([dict(kind=C.CURVE_LINEAR,
                             points=[[0, 0, 0], [4, 0, 0]],
                             radii=[0.2, 1.0])])
    o = jnp.asarray([[2.0, 5.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    h = C.intersect_curves(cs, o, d)
    assert bool(h.hit[0])
    nrm = np.asarray([h.normal.x[0], h.normal.y[0], h.normal.z[0]])
    np.testing.assert_allclose(np.linalg.norm(nrm), 1.0, atol=1e-5)
    assert nrm[1] > 0.8          # mostly radial
    assert nrm[0] < -0.05        # tilted against the radius growth


@pytest.mark.parametrize("kind", [C.CURVE_QUADRATIC_BSPLINE,
                                  C.CURVE_CUBIC_BSPLINE,
                                  C.CURVE_CATMULLROM])
def test_spline_hits_lie_on_offset_surface(kind):
    """Spline hits must sit within the swept-sphere tube: distance from
    the hit point to the densely-sampled curve matches r(u) closely."""
    npts = 3 if kind == C.CURVE_QUADRATIC_BSPLINE else 4
    pts = np.asarray([[0, 0, 0], [2, 2, 0], [4, -1, 1],
                      [6, 1, -1]][:npts], np.float32)
    rad = np.linspace(0.3, 0.6, npts).astype(np.float32)
    cs = C.make_curves([dict(kind=kind, points=pts, radii=rad)])
    # Dense curve samples for ground-truth distances.
    samp = np.asarray(C._eval4(cs, 0, jnp.linspace(0.0, 1.0, 2001)))
    mid = samp[1000]
    # A small bundle aimed at the curve midpoint from above.
    offs = np.linspace(-0.5, 0.5, 9).astype(np.float32)
    o = np.broadcast_to(mid[:3] + np.asarray([0, 5, 0], np.float32),
                        (9, 3)).copy()
    o[:, 0] += offs
    tgt = np.broadcast_to(mid[:3], (9, 3)).copy()
    tgt[:, 0] += offs * 0.5
    dirs = (tgt - o) / np.linalg.norm(tgt - o, axis=-1, keepdims=True)
    h = C.intersect_curves(cs, jnp.asarray(o), jnp.asarray(dirs))
    m = np.asarray(h.hit)
    assert m.any()
    p = o[m] + dirs[m] * np.asarray(h.t)[m][:, None]
    dist = np.linalg.norm(p[:, None, :] - samp[None, :, :3], axis=-1)
    r_at = samp[dist.argmin(axis=1), 3]
    # Piecewise rounded-cone approximation: within ~3% of the true tube.
    np.testing.assert_allclose(dist.min(axis=1), r_at, rtol=0.03, atol=0.01)


def test_combines_with_triangle_hits():
    from tpu_pt.intersect.primitives import combine_hits
    from tpu_pt.intersect import moller
    cs = C.make_curves([dict(kind=C.CURVE_LINEAR,
                             points=[[0, 0, 0], [4, 0, 0]],
                             radii=[0.5, 0.5])])
    o = jnp.asarray([[2.0, 5.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    hc = C.intersect_curves(cs, o, d)
    far = moller.Hit(t=jnp.asarray([9.0]), tri=jnp.asarray([7]),
                     hit=jnp.asarray([True]),
                     normal=hc.normal, mat=jnp.asarray([1]),
                     u=hc.u, v=hc.v)
    merged = combine_hits(far, hc)
    np.testing.assert_allclose(np.asarray(merged.t), np.asarray(hc.t))
