"""Camera + trackball parity tests (sutil::Camera / sutil::Trackball)."""

import math

import numpy as np

from tpu_pt.camera import Camera, Trackball, cornell_default_camera


def test_uvw_frame_geometry():
    cam = cornell_default_camera(aspect=2.0)
    u, v, w = cam.uvw_frame()
    wlen = np.linalg.norm(w)
    vlen = np.linalg.norm(v)
    ulen = np.linalg.norm(u)
    # W is NOT normalized: |W| = focal distance (Camera.cpp:36).
    np.testing.assert_allclose(wlen, 1230.0, rtol=1e-6)
    np.testing.assert_allclose(vlen, wlen * math.tan(math.radians(17.5)),
                               rtol=1e-5)
    np.testing.assert_allclose(ulen, 2.0 * vlen, rtol=1e-5)
    # Orthogonal basis.
    assert abs(np.dot(u, v)) < 1e-2
    assert abs(np.dot(u, w)) < 1e-2
    assert abs(np.dot(v, w)) < 1e-2


def test_uvw_orientation():
    cam = cornell_default_camera()
    u, v, w = cam.uvw_frame()
    # Looking +z with up +y: U = cross(W, up) ~ -x, V ~ +y.
    assert u[0] < 0 and abs(u[1]) < 1e-5
    assert v[1] > 0


def test_set_direction_preserves_distance():
    cam = cornell_default_camera()
    d0 = np.linalg.norm(cam.lookat - cam.eye)
    cam.set_direction(np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.linalg.norm(cam.lookat - cam.eye), d0,
                               rtol=1e-6)


def test_trackball_zoom():
    cam = cornell_default_camera()
    tb = Trackball(cam)
    d0 = np.linalg.norm(cam.lookat - cam.eye)
    tb.zoom(+1)
    d1 = np.linalg.norm(cam.lookat - cam.eye)
    assert d1 < d0
    tb.zoom(-1)
    np.testing.assert_allclose(np.linalg.norm(cam.lookat - cam.eye), d0,
                               rtol=1e-5)


def test_trackball_orbit_keeps_distance():
    cam = cornell_default_camera()
    tb = Trackball(cam)
    d0 = np.linalg.norm(cam.lookat - cam.eye)
    lookat0 = cam.lookat.copy()
    tb.start_tracking(100, 100)
    tb.update_tracking(150, 120)
    np.testing.assert_allclose(np.linalg.norm(cam.lookat - cam.eye), d0,
                               rtol=1e-4)
    np.testing.assert_allclose(cam.lookat, lookat0, atol=1e-4)
    # Camera actually moved.
    assert np.linalg.norm(cam.eye - np.array([278.0, 273.0, -900.0])) > 1.0


def test_trackball_latitude_clamp():
    cam = cornell_default_camera()
    tb = Trackball(cam)
    tb.start_tracking(0, 0)
    tb.update_tracking(0, 100000)  # huge drag
    assert abs(math.degrees(tb._lat)) <= 89.0 + 1e-6


def test_trackball_move_forward():
    cam = cornell_default_camera()
    tb = Trackball(cam)
    eye0 = cam.eye.copy()
    tb.move_forward(10.0)
    assert np.linalg.norm(cam.eye - eye0) > 9.9
