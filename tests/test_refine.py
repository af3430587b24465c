"""Tests for host-side large-triangle refinement (tpu_pt.scene.refine)."""

import numpy as np

from tpu_pt.scene.refine import split_large_tris


def _tri_arrays(verts, idx):
    v0, v1, v2 = verts[idx[:, 0]], verts[idx[:, 1]], verts[idx[:, 2]]
    return v0, v1, v2


def test_split_preserves_area_and_winding():
    verts = np.array([[0, 0, 0], [100, 0, 0], [0, 100, 0],
                      [1, 1, 1], [2, 1, 1], [1, 2, 1]], np.float32)
    idx = np.arange(6).reshape(2, 3)
    mids = np.array([3, 7])
    v, i, m = split_large_tris(verts, idx, mids, max_extent_frac=1 / 8)

    v0, v1, v2 = _tri_arrays(v, i)
    cr = np.cross(v1 - v0, v2 - v0)
    area = 0.5 * np.linalg.norm(cr, axis=1).sum()
    assert abs(area - (0.5 * 100 * 100 + 0.5)) < 1e-2

    # Every piece of the big +z triangle keeps the +z geometric normal.
    assert (cr[m == 3][:, 2] > 0).all()
    # The small triangle is untouched.
    assert (m == 7).sum() == 1

    # All output AABB extents obey the bound (scene extent 100 => 12.5+).
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    scene_ext = (np.max(hi, axis=0) - np.min(lo, axis=0)).max()
    assert ((hi - lo).max(axis=1) <= scene_ext / 8 + 1e-4).all()


def test_split_noop_on_small_scene():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2]])
    mids = np.array([0])
    v, i, m = split_large_tris(verts, idx, mids, max_extent_frac=1.5)
    assert i.shape[0] == 1 and m.tolist() == [0]


def test_split_renders_equal_image():
    """A split scene must path-trace to (nearly) the same image: same
    surfaces, same normals, same materials — only fp association of the
    intersection tests changes."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import tpu_pt
    from tpu_pt.render import CameraArrays
    from tpu_pt.scene.arrays import build_scene_arrays
    from tpu_pt.scene.objloader import load_obj, detect_area_light
    import os

    obj = os.path.join(os.path.dirname(__file__), "..", "assets",
                       "cornell_box.obj")
    mesh = load_obj(obj)
    light = detect_area_light(mesh)
    base = build_scene_arrays(mesh.vertices, mesh.indices, mesh.mat_indices,
                              [m.as_dict() for m in mesh.materials],
                              light=light)
    sv, si, sm = split_large_tris(mesh.vertices, mesh.indices,
                                  mesh.mat_indices, max_extent_frac=0.5)
    assert si.shape[0] > mesh.indices.shape[0]
    split = build_scene_arrays(sv, si, sm,
                               [m.as_dict() for m in mesh.materials],
                               light=light)

    cfg = tpu_pt.RenderConfig(width=24, height=24, spp=2, max_depth=3,
                              use_direct_lighting=True,
                              use_importance_sampling=True)
    cam = CameraArrays.from_camera(
        tpu_pt.cornell_default_camera(aspect=1.0))
    img_a = np.asarray(tpu_pt.render_frame(base, cam, cfg, 0,
                                           tpu_pt.init_accum(cfg))[1],
                       np.float32)
    img_b = np.asarray(tpu_pt.render_frame(split, cam, cfg, 0,
                                           tpu_pt.init_accum(cfg))[1],
                       np.float32)
    # Identical geometry, but fp differences can flip individual RR draws;
    # the images must agree closely in aggregate (u8 scale).
    diff = np.abs(img_a - img_b)
    assert np.mean(diff) < 3.0, np.mean(diff)
