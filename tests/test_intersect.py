"""Ray-triangle intersection tests (Möller-Trumbore backend)."""

import jax.numpy as jnp
import numpy as np
from tpu_pt.vec3 import V3

from tpu_pt.intersect import intersect_closest, intersect_occluded
from tpu_pt.scene.arrays import (BSDF_DIFFUSE, BSDF_REFRACTION,
                                 build_scene_arrays)


def tiny_scene(refractive_first=False):
    """Two parallel unit triangles at z=1 and z=2, facing -z."""
    verts = np.array([
        [-1, -1, 1], [3, -1, 1], [-1, 3, 1],     # tri 0 at z=1 (big)
        [-1, -1, 2], [3, -1, 2], [-1, 3, 2],     # tri 1 at z=2 (big)
    ], np.float32)
    idx = np.array([[0, 1, 2], [3, 4, 5]])
    mats = [
        dict(diffuse=(1, 0, 0), emission=(0, 0, 0), roughness=0.5,
             metallic=0.0, ior=1.5,
             bsdf=BSDF_REFRACTION if refractive_first else BSDF_DIFFUSE),
        dict(diffuse=(0, 1, 0), emission=(0, 0, 0), roughness=0.5,
             metallic=0.0, ior=1.0, bsdf=BSDF_DIFFUSE),
    ]
    return build_scene_arrays(verts, idx, np.array([0, 1]), mats)


def test_closest_hit_picks_nearest():
    s = tiny_scene()
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    h = intersect_closest(s, o, d)
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 1.0, atol=1e-5)
    assert int(h.tri[0]) == 0


def test_tmin_skips_near_surface():
    s = tiny_scene()
    o = jnp.asarray([[0.0, 0.0, 0.999]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    h = intersect_closest(s, o, d, tmin=0.01)
    # First triangle is 0.001 away -> skipped; second at 1.001.
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 1.001, atol=1e-4)
    assert int(h.tri[0]) == 1


def test_miss():
    s = tiny_scene()
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    h = intersect_closest(s, o, d)
    assert not bool(h.hit[0])


def test_two_sided():
    s = tiny_scene()
    o = jnp.asarray([[0.0, 0.0, 1.5]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])  # hits tri 0 from behind
    h = intersect_closest(s, o, d)
    assert bool(h.hit[0])
    assert int(h.tri[0]) == 0


def test_barycentric_bounds():
    s = tiny_scene()
    # Ray passing outside the triangle extent.
    o = jnp.asarray([[10.0, 10.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    h = intersect_closest(s, o, d)
    assert not bool(h.hit[0])


def test_occlusion_basic():
    s = tiny_scene()
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    occ = intersect_occluded(s, o, d, tmax=jnp.asarray([3.0]))
    assert bool(occ[0])
    # tmax short of the first surface -> no occlusion.
    occ = intersect_occluded(s, o, d, tmax=jnp.asarray([0.5]))
    assert not bool(occ[0])


def test_occlusion_refractive_does_not_occlude():
    # Reference rule (pathTracerPrograms.cu:672-681).
    s = tiny_scene(refractive_first=True)
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    # Fixed semantics: the opaque tri at z=2 still occludes.
    occ = intersect_occluded(s, o, d, tmax=jnp.asarray([3.0]))
    assert bool(occ[0])
    # With tmax between the two surfaces only the refractive one is in
    # range -> not occluded.
    occ = intersect_occluded(s, o, d, tmax=jnp.asarray([1.5]))
    assert not bool(occ[0])
    # Quirk mode: first (closest) hit is refractive -> never occluded.
    occ = intersect_occluded(s, o, d, tmax=jnp.asarray([3.0]),
                             quirk_first_hit=True)
    assert not bool(occ[0])


def test_many_rays_chunking():
    s = tiny_scene()
    n = 10000  # not a multiple of the chunk -> exercises padding
    o = jnp.zeros((n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    h = intersect_closest(s, o, d, ray_chunk=4096)
    assert bool(h.hit.all())
    np.testing.assert_allclose(np.asarray(h.t), 1.0, atol=1e-5)


def test_cornell_center_ray(cornell_scene):
    # A ray above the blocks (y=450) must hit the back wall at z=559.2.
    o = jnp.asarray([[278.0, 450.0, -900.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    h = intersect_closest(cornell_scene, o, d)
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 559.2 + 900.0, rtol=1e-5)

    # Through the center, the tall block (x 265-472, h 330) is in the way.
    o2 = jnp.asarray([[278.0, 273.0, -900.0]])
    h2 = intersect_closest(cornell_scene, o2, d)
    assert bool(h2.hit[0])
    assert float(h2.t[0]) < 1459.0
