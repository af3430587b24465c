"""Native (C++) OBJ parser and LBVH builder vs the Python references."""

import numpy as np
import jax.numpy as jnp
import pytest

import tpu_pt
from tpu_pt import native
from tpu_pt.intersect import lbvh, moller
from tpu_pt.scene.objloader import _load_obj_python, load_obj

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("asset", ["cornell_box.obj", "cornell_box_mixed.obj",
                                   "cornell_box_sphere.obj"])
def test_native_obj_matches_python(assets_dir, asset):
    py = _load_obj_python(str(assets_dir / asset))
    nat = load_obj(str(assets_dir / asset), use_native=True)
    np.testing.assert_allclose(py.vertices, nat.vertices, rtol=1e-6)
    np.testing.assert_array_equal(py.indices, nat.indices)
    np.testing.assert_array_equal(py.mat_indices, nat.mat_indices)
    assert [m.name for m in py.materials] == [m.name for m in nat.materials]
    for a, b in zip(py.materials, nat.materials):
        np.testing.assert_allclose(a.diffuse, b.diffuse, rtol=1e-6)
        np.testing.assert_allclose(a.emission, b.emission, rtol=1e-6)
        assert a.bsdf == b.bsdf
        np.testing.assert_allclose(a.ior, b.ior, rtol=1e-6)


def test_native_obj_quads_negative_indices(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n")
    py = _load_obj_python(str(p))
    nat = load_obj(str(p), use_native=True)
    np.testing.assert_array_equal(py.indices, nat.indices)
    assert nat.indices.shape == (2, 3)


def test_native_obj_missing_file():
    with pytest.raises(FileNotFoundError):
        native.load_obj_native("/nope/missing.obj")


def test_native_lbvh_matches_bruteforce(mixed_scene):
    scene = mixed_scene.replace(bvh=None)
    bvh = lbvh.build_lbvh_host(scene)
    n = scene.num_tris_padded
    tri = np.asarray(bvh.tri)
    # Leaves cover all triangles exactly once.
    np.testing.assert_array_equal(np.sort(tri[tri >= 0]), np.arange(n))
    # Skip-link walk reaches every node.
    left = np.asarray(bvh.left)
    skip = np.asarray(bvh.skip)
    visited = np.zeros(2 * n - 1, bool)
    cur, steps = 0, 0
    while cur != -1 and steps < 8 * n:
        visited[cur] = True
        cur = skip[cur] if tri[cur] >= 0 else left[cur]
        steps += 1
    assert visited.all()

    r = np.random.RandomState(1)
    o = jnp.asarray((r.rand(2048, 3) * 550).astype(np.float32))
    d = jnp.asarray(r.randn(2048, 3).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ref = moller.intersect_closest(scene, o, d)
    out = lbvh.intersect_closest(scene, o, d, bvh=bvh)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    np.testing.assert_allclose(np.asarray(ref.t), np.asarray(out.t),
                               rtol=1e-5)


def test_native_vs_device_bvh_render(cornell_scene):
    """Renders using the native-built and device-built BVHs agree."""
    from tpu_pt.render import CameraArrays, render_wavefront
    cam = CameraArrays.from_camera(tpu_pt.cornell_default_camera())
    cfg = tpu_pt.RenderConfig(width=32, height=32, spp=2, max_depth=3,
                              use_direct_lighting=True,
                              use_importance_sampling=True,
                              intersector="bvh")
    s_nat = lbvh.with_bvh(cornell_scene.replace(bvh=None), builder="native")
    s_dev = lbvh.with_bvh(cornell_scene.replace(bvh=None), builder="device")
    ra, _ = render_wavefront(s_nat, cam, cfg, 0, 32 * 32, 0)
    rb, _ = render_wavefront(s_dev, cam, cfg, 0, 32 * 32, 0)
    # Same samples; tree shapes may break exact-t ties differently.
    diff = np.abs(np.asarray(ra) - np.asarray(rb))
    assert np.mean(diff > 2e-5) < 0.005
