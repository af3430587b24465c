"""Math library (Matrix/Quaternion/Aabb parity) + profiling + PPM reader."""

import math

import numpy as np

from tpu_pt import film, mathlib as ml


def test_mat4_translate_rotate_scale():
    p = np.array([[1.0, 0.0, 0.0]])
    t = ml.mat4_translate([0, 0, 5])
    np.testing.assert_allclose(ml.transform_points(t, p), [[1, 0, 5]],
                               atol=1e-6)
    r = ml.mat4_rotate(math.pi / 2, [0, 0, 1])
    np.testing.assert_allclose(ml.transform_points(r, p), [[0, 1, 0]],
                               atol=1e-6)
    s = ml.mat4_scale([2, 3, 4])
    np.testing.assert_allclose(ml.transform_points(s, p), [[2, 0, 0]],
                               atol=1e-6)
    # Composition: scale then rotate then translate.
    m = t @ r @ s
    np.testing.assert_allclose(ml.transform_points(m, p), [[0, 2, 5]],
                               atol=1e-5)


def test_transform_normals_nonuniform_scale():
    # Normals under non-uniform scale need inverse-transpose.
    s = ml.mat4_scale([2, 1, 1])
    n = np.array([[1.0, 1.0, 0.0]]) / math.sqrt(2)
    out = ml.transform_normals(s, n)
    # Surface y=x stretched in x -> normal rotates toward x<1 component.
    assert abs(np.linalg.norm(out) - 1.0) < 1e-6
    assert out[0, 0] < out[0, 1]


def test_quaternion_rotation_matches_matrix():
    axis = [0.3, -0.5, 0.8]
    ang = 1.1
    q = ml.quat_from_axis_angle(axis, ang)
    m = ml.mat4_rotate(ang, axis)
    v = np.array([0.2, -0.7, 0.4], np.float32)
    np.testing.assert_allclose(ml.quat_rotate(q, v),
                               ml.transform_points(m, v[None])[0], atol=1e-5)
    np.testing.assert_allclose(ml.quat_to_mat4(q), m, atol=1e-5)


def test_quaternion_mul_compose():
    q1 = ml.quat_from_axis_angle([0, 0, 1], math.pi / 2)
    q2 = ml.quat_from_axis_angle([1, 0, 0], math.pi / 2)
    q = ml.quat_mul(q2, q1)  # rotate by q1 then q2
    v = np.array([1.0, 0.0, 0.0])
    expect = ml.quat_rotate(q2, ml.quat_rotate(q1, v))
    np.testing.assert_allclose(ml.quat_rotate(q, v), expect, atol=1e-5)


def test_aabb():
    b = ml.Aabb()
    assert not b.valid()
    b.include([0, 0, 0])
    b.include([2, 4, 6])
    assert b.valid()
    np.testing.assert_allclose(b.center(), [1, 2, 3])
    np.testing.assert_allclose(b.extent(), [2, 4, 6])
    assert b.longest_axis() == 2
    assert b.max_extent() == 6
    assert b.volume() == 48
    assert b.area() == 2 * (8 + 12 + 24)
    assert b.contains([1, 1, 1])
    assert not b.contains([3, 0, 0])
    b2 = ml.Aabb.of_points(np.array([[5, 5, 5], [6, 6, 6]]))
    b.include(b2)
    assert b.contains([5.5, 5.5, 5.5])


def test_ppm_roundtrip(tmp_path):
    img = (np.random.RandomState(0).rand(9, 7, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.ppm")
    film.write_ppm(p, img)
    back = film.read_ppm(p)
    np.testing.assert_array_equal(back, img)


def test_ppm_ascii_and_comments(tmp_path):
    p = tmp_path / "a.ppm"
    p.write_text("P3\n# a comment\n2 1\n255\n255 0 0  0 255 0\n")
    img = film.read_ppm(str(p))
    np.testing.assert_array_equal(img[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(img[0, 1], [0, 255, 0])


def test_profiler_report(cornell_scene):
    import tpu_pt
    from tpu_pt.profiling import RenderProfiler
    from tpu_pt.render import CameraArrays, render_frame, init_accum

    cfg = tpu_pt.RenderConfig(width=32, height=32, spp=2, max_depth=3,
                              use_direct_lighting=True,
                              use_importance_sampling=True)
    cam = CameraArrays.from_camera(tpu_pt.cornell_default_camera())
    prof = RenderProfiler(lanes=min(cfg.lanes, 32 * 32 * cfg.spp))
    accum = init_accum(cfg)
    for f in range(2):
        with prof.frame():
            accum, img, stats = render_frame(cornell_scene, cam, cfg, f,
                                             accum)
            img.block_until_ready()
        prof.record(stats)
    rep = prof.report()
    assert "Mrays/s" in rep and "occupancy" in rep
    assert prof.mrays_per_sec > 0
    assert 0 < prof.occupancy() <= 1.01
    hist = prof.termination_histogram()
    assert hist["NOT_DONE"] == 0
    assert sum(hist.values()) == 2 * 32 * 32 * cfg.spp
