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


@pytest.mark.parametrize("kind", [C.CURVE_CUBIC_BSPLINE,
                                  C.CURVE_CATMULLROM])
def test_tessellation_converges_to_fine_reference(kind, monkeypatch):
    """Error bound for the fixed PIECES=8 tessellation: hit distances on a
    strongly curved segment must converge to a 64-piece reference within
    the rounded-cone sagitta bound (~|c''| (L/P)^2 / 8), and the exact
    post-hoc surface normals must agree to a few degrees — catching both a
    too-coarse PIECES default and a broken normal refinement."""
    pts = np.asarray([[0, 0, 0], [2, 3, 0], [4, -3, 1], [6, 2, -1]],
                     np.float32)
    rad = np.asarray([0.4, 0.5, 0.45, 0.4], np.float32)
    cs = C.make_curves([dict(kind=kind, points=pts, radii=rad)])
    # A fan of rays from above, spread along the curve's x extent (both
    # kinds span roughly x in [2, 4]: the single cubic span between the
    # middle control points).
    xs = np.linspace(2.0, 4.0, 24).astype(np.float32)
    o = np.stack([xs, np.full_like(xs, 6.0), np.zeros_like(xs)], -1)
    d = np.broadcast_to(np.asarray([0, -1, 0], np.float32), (24, 3))

    h8 = C.intersect_curves(cs, jnp.asarray(o), jnp.asarray(d))
    monkeypatch.setattr(C, "PIECES", 64)
    h64 = C.intersect_curves(cs, jnp.asarray(o), jnp.asarray(d))

    m8, m64 = np.asarray(h8.hit), np.asarray(h64.hit)
    # Tessellation may not flip hit/miss except at grazing rays.
    assert (m8 == m64).mean() > 0.9
    m = m8 & m64
    assert m.sum() >= 12
    t8, t64 = np.asarray(h8.t)[m], np.asarray(h64.t)[m]
    # Sagitta bound: curvature |c''| <= ~12 here, piece length L/8 ~ 0.9
    # => max chord error ~ 12 * 0.9^2 / 8 ~ 0.1; measured max ~0.05.
    assert np.abs(t8 - t64).max() < 0.12, np.abs(t8 - t64).max()

    def nrm(h):
        return np.stack([np.asarray(h.normal.x), np.asarray(h.normal.y),
                         np.asarray(h.normal.z)], -1)

    cosang = np.sum(nrm(h8)[m] * nrm(h64)[m], axis=-1)
    # Exact swept-sphere normal refinement: both resolutions project onto
    # the same true surface, so normals agree to a few degrees (the u
    # parameter itself shifts slightly near high-curvature inflections,
    # hence the loose max); a broken refinement is tens of degrees off.
    ang = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
    assert np.median(ang) < 2.0, ang
    assert ang.max() < 15.0, ang
