"""Film tests: accumulation identity, tonemap parity, image IO roundtrip."""

import numpy as np
import jax.numpy as jnp

from tpu_pt import film


def test_accumulate_is_running_mean():
    r = np.random.RandomState(0)
    frames = r.rand(5, 4, 4, 3).astype(np.float32)
    accum = jnp.zeros((4, 4, 3))
    for k in range(5):
        accum = film.accumulate(accum, jnp.asarray(frames[k]), k)
    np.testing.assert_allclose(np.asarray(accum), frames.mean(axis=0),
                               rtol=1e-5)


def test_srgb_reference_points():
    # Known sRGB transfer values.
    np.testing.assert_allclose(float(film.to_srgb(jnp.asarray(0.0))), 0.0,
                               atol=1e-6)
    np.testing.assert_allclose(float(film.to_srgb(jnp.asarray(1.0))), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(float(film.to_srgb(jnp.asarray(0.5))),
                               0.7353569, atol=1e-4)
    # Linear segment below the knee.
    np.testing.assert_allclose(float(film.to_srgb(jnp.asarray(0.003))),
                               12.92 * 0.003, atol=1e-6)


def test_quantize_parity():
    # quantizeUnsigned8Bits: min(uint(x*256), 255), cuda/helpers.h:50-55.
    xs = jnp.asarray([0.0, 0.5, 0.999, 1.0, 2.0, -1.0])
    out = np.asarray(film.quantize_u8(xs))
    np.testing.assert_array_equal(out, [0, 128, 255, 255, 255, 0])


def test_make_color_white_black():
    white = np.asarray(film.make_color(jnp.ones((1, 3))))
    black = np.asarray(film.make_color(jnp.zeros((1, 3))))
    np.testing.assert_array_equal(white[0], [255, 255, 255])
    np.testing.assert_array_equal(black[0], [0, 0, 0])


def test_png_roundtrip(tmp_path):
    r = np.random.RandomState(1)
    img = (r.rand(33, 47, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    film.write_png(p, img)
    back = film.read_png(p)
    np.testing.assert_array_equal(back, img)


def test_ppm_write(tmp_path):
    img = np.zeros((2, 3, 3), np.uint8)
    img[0, 0] = [255, 0, 0]
    p = str(tmp_path / "x.ppm")
    film.write_ppm(p, img)
    with open(p, "rb") as f:
        data = f.read()
    assert data.startswith(b"P6\n3 2\n255\n")
    assert data[-18:-15] == bytes([255, 0, 0])


def test_rmse():
    a = np.zeros((4, 4, 3))
    b = np.ones((4, 4, 3)) * 0.5
    np.testing.assert_allclose(film.rmse(a, b), 0.5)
    np.testing.assert_allclose(film.rmse(a, a), 0.0)


def test_exr_roundtrip_float(tmp_path):
    """EXR scanline FLOAT roundtrip is bit-exact, incl. HDR values > 1."""
    rng = np.random.RandomState(7)
    img = (rng.rand(9, 13, 3).astype(np.float32) * 40.0).astype(np.float32)
    p = str(tmp_path / "x.exr")
    film.write_exr(p, img)
    back = film.read_exr(p)
    np.testing.assert_array_equal(back, img)
    with open(p, "rb") as f:
        import struct
        magic, version = struct.unpack("<ii", f.read(8))
    assert magic == 20000630 and version == 2


def test_exr_roundtrip_half(tmp_path):
    img = np.linspace(0.0, 4.0, 5 * 7 * 3, dtype=np.float32).reshape(5, 7, 3)
    p = str(tmp_path / "h.exr")
    film.write_exr(p, img, half=True)
    back = film.read_exr(p)
    np.testing.assert_allclose(back, img, rtol=1e-2, atol=1e-3)
