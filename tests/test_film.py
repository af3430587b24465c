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


def test_exr_roundtrip_zip(tmp_path):
    """ZIP-compressed EXR (16-scanline blocks) is bit-exact and smaller
    on compressible content (tinyexr reads ZIP EXRs; film parity)."""
    rng = np.random.RandomState(3)
    # Smooth gradient + a little noise: compressible but not trivial.
    y, x = np.mgrid[0:37, 0:21].astype(np.float32)
    img = np.stack([y / 37, x / 21, (x + y) / 58], axis=2)
    img += rng.rand(37, 21, 3).astype(np.float32) * 1e-3
    for comp in ("zip", "zips"):
        p = str(tmp_path / f"{comp}.exr")
        film.write_exr(p, img, compression=comp)
        back = film.read_exr(p)
        np.testing.assert_array_equal(back, img)
    import os
    p0 = str(tmp_path / "none.exr")
    film.write_exr(p0, img)
    assert os.path.getsize(str(tmp_path / "zip.exr")) < os.path.getsize(p0)


def test_exr_roundtrip_rle(tmp_path):
    """RLE-compressed EXR (ImfRle.cpp scheme: shared ZIP predictor +
    run-length packing) round-trips bit-exactly, shrinks flat content,
    and survives incompressible blocks (stored raw)."""
    import os
    flat = np.full((19, 23, 3), 0.25, np.float32)
    flat[4:9, 6:12] = 0.75                   # long byte runs
    p = str(tmp_path / "rle.exr")
    film.write_exr(p, flat, compression="rle")
    np.testing.assert_array_equal(film.read_exr(p), flat)
    p0 = str(tmp_path / "flatnone.exr")
    film.write_exr(p0, flat)
    assert os.path.getsize(p) < os.path.getsize(p0)
    rng = np.random.RandomState(13)
    noisy = rng.rand(7, 11, 3).astype(np.float32) * 1e3
    p2 = str(tmp_path / "rlenoise.exr")
    film.write_exr(p2, noisy, compression="rle")
    np.testing.assert_array_equal(film.read_exr(p2), noisy)
    # Half-float channels through the same path.
    p3 = str(tmp_path / "rlehalf.exr")
    film.write_exr(p3, flat, half=True, compression="rle")
    np.testing.assert_allclose(film.read_exr(p3), flat, rtol=1e-3)


def test_exr_rle_stream_decoder():
    """The RLE block decoder accepts any conformant stream shape, not
    just our encoder's output: hand-built runs and literal spans."""
    payload = np.arange(64, dtype=np.uint8).tobytes()
    enc = film._exr_predict(payload)
    # Alternate 1-byte literals and 1-length runs over the predicted
    # bytes — a pathological but valid OpenEXR RLE stream.
    stream = bytearray()
    for b in enc.tobytes():
        if b % 2:
            stream += bytes([0, b])          # run of 1 (count-1 = 0)
        else:
            stream += bytes([255, b])        # literal span of 1
    out = film._exr_rle_decode(bytes(stream), len(payload))
    assert out == payload


def test_exr_zip_incompressible_block(tmp_path):
    """Blocks that deflate larger are stored raw and still read back."""
    rng = np.random.RandomState(11)
    img = rng.rand(4, 5, 3).astype(np.float32) * 1e3
    p = str(tmp_path / "r.exr")
    film.write_exr(p, img, compression="zips")
    np.testing.assert_array_equal(film.read_exr(p), img)


def test_png_unfilter_all_filters():
    """Every PNG filter type decodes identically via the native C path and
    the numpy fallback (cumsum Sub, serial Average/Paeth)."""
    rng = np.random.RandomState(5)
    h, w, ch = 11, 17, 3
    ref = (rng.rand(h, w, ch) * 255).astype(np.uint8)
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    # Encode rows cycling through filters 0..4 (an independent encoder —
    # decoding must invert it, not just round-trip write_png's filter-0).
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for row in range(h):
        filt = row % 5
        line = ref[row].reshape(stride).astype(np.int32)
        enc = np.zeros(stride, np.int32)
        for i in range(stride):
            a = int(line[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: paeth(a, b, c)}[filt]
            enc[i] = (int(line[i]) - pred) & 0xFF
        raw.append(filt)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    from tpu_pt import native
    # Numpy fallback (native disabled via monkeypatching availability).
    orig = native.available
    native.available = lambda: False
    try:
        out = film._unfilter_scanlines(bytes(raw), h, w, stride, ch)
    finally:
        native.available = orig
    np.testing.assert_array_equal(out.reshape(h, w, ch), ref)

    if native.available():
        out_c = native.unfilter_png_native(bytes(raw), h, stride, ch)
        np.testing.assert_array_equal(out_c.reshape(h, w, ch), ref)


def test_exr_rle_encoder_run_shapes():
    """The vectorized RLE encoder round-trips every run-length shape:
    short runs (literals), exact multiples of 128, and 128k+1/+2 tails
    that are too short to re-emit as runs."""
    rng = np.random.RandomState(17)
    pieces = []
    for ln in (1, 2, 3, 127, 128, 129, 130, 255, 256, 257, 300):
        pieces.append(np.full(ln, rng.randint(0, 256), np.uint8))
        pieces.append(rng.randint(0, 256, rng.randint(1, 5)).astype(np.uint8))
    payload = np.concatenate(pieces).tobytes()
    enc = film._exr_rle_encode(payload)
    dec = film._exr_rle_decode(enc, len(payload))
    assert dec == payload


def test_exr_rle_fuzz_roundtrip():
    """Randomized payload shapes (mixtures of runs and noise at odd
    sizes) all round-trip through the RLE codec bit-exactly."""
    rng = np.random.RandomState(23)
    for trial in range(20):
        n = int(rng.randint(1, 2000))
        mode = trial % 3
        if mode == 0:
            payload = rng.randint(0, 256, n).astype(np.uint8)
        elif mode == 1:
            payload = np.full(n, int(rng.randint(0, 256)), np.uint8)
        else:
            payload = np.repeat(
                rng.randint(0, 256, max(1, n // 17)).astype(np.uint8),
                17)[:n]
        enc = film._exr_rle_encode(payload.tobytes())
        # mode 2's repeat-then-slice can produce fewer than n bytes —
        # expect the PAYLOAD size (the decoder now validates it).
        dec = film._exr_rle_decode(enc, payload.size)
        assert dec == payload.tobytes(), (trial, n, mode)
        # A too-large expectation must raise, not silently scramble.
        if payload.size > 1:
            try:
                film._exr_rle_decode(enc, payload.size + 8)
            except ValueError:
                pass
            else:
                raise AssertionError("short RLE decode not detected")


def test_exr_roundtrip_piz(tmp_path):
    """PIZ (wavelet + Huffman, 32 scanlines/block) round-trips float
    and half images bit-exactly, including sizes that leave partial
    final blocks and odd (non-power-of-two) dimensions."""
    rng = np.random.RandomState(11)
    for h, w in ((64, 64), (33, 17), (70, 41), (1, 5)):
        img = (rng.rand(h, w, 3).astype(np.float32) * 4.0)
        img[::3, ::2] = 0.25           # runs for the RLE symbol path
        p = str(tmp_path / f"piz_{h}x{w}.exr")
        film.write_exr(p, img, compression="piz")
        np.testing.assert_array_equal(film.read_exr(p), img)
        p2 = str(tmp_path / f"pizh_{h}x{w}.exr")
        film.write_exr(p2, img, half=True, compression="piz")
        np.testing.assert_array_equal(
            film.read_exr(p2), img.astype(np.float16).astype(np.float32))


def test_exr_piz_huffman_fuzz():
    """The PIZ Huffman coder round-trips adversarial symbol streams:
    uniform-random u16, tiny alphabets, all-zero, and long runs (the
    run-length pseudo-symbol path)."""
    rng = np.random.RandomState(5)
    for trial in range(24):
        n = int(rng.randint(1, 5000))
        mode = trial % 4
        if mode == 0:
            raw = rng.randint(0, 65536, n).astype(np.uint16)
        elif mode == 1:
            raw = rng.randint(0, 7, n).astype(np.uint16)
        elif mode == 2:
            raw = np.zeros(n, np.uint16)
        else:
            raw = np.repeat(rng.randint(0, 300, max(1, n // 50)),
                            50)[:n].astype(np.uint16)
        dec = film._piz_huf_decompress(film._piz_huf_compress(raw),
                                       raw.size)
        np.testing.assert_array_equal(dec, raw)


def test_exr_piz_wavelet_exact_inverse():
    """The 14- and 16-bit 2-D wavelets invert exactly at every shape,
    including single-row/column and odd-remainder geometries."""
    rng = np.random.RandomState(0)
    for _ in range(60):
        ny = int(rng.randint(1, 33))
        nx = int(rng.randint(1, 33))
        mx = int(rng.choice([100, 10000, 20000, 65535]))
        a = rng.randint(0, mx + 1, (ny, nx)).astype(np.uint16)
        b = a.copy()
        film._piz_wav2(b, mx, encode=True)
        film._piz_wav2(b, mx, encode=False)
        np.testing.assert_array_equal(a, b)


def test_exr_piz_malformed_raises():
    """Truncated PIZ Huffman data raises instead of scrambling."""
    import pytest
    raw = np.arange(64, dtype=np.uint16) % 7
    enc = film._piz_huf_compress(raw)
    with pytest.raises(ValueError):
        film._piz_huf_decompress(enc[:-2] + b"\0\0", 4 * raw.size)
