"""Film: progressive accumulation, sRGB tonemapping, image IO, RMSE.

TPU-native equivalent of the reference's accumulation + presentation path:
- progressive exponential-mean accumulation (``pathTracerPrograms.cu:803-811``)
- sRGB tonemap + 8-bit quantization ``make_color``/``toSRGB``
  (``cuda/helpers.h:35-62``)
- image save (``sutil::saveImage``, ``sutil/sutil.cpp:542``) as PNG/PPM,
  implemented dependency-free (zlib PNG encoder).

The accumulation buffer is a device-resident float32 [H, W, 3] array; callers
donate it across frames so progressive rendering never round-trips to host.
"""

from __future__ import annotations

import struct
import zlib

import jax.numpy as jnp
import numpy as np


def accumulate(prev_accum: jnp.ndarray, frame_mean: jnp.ndarray,
               frame_idx) -> jnp.ndarray:
    """Running mean across frames.

    Matches ``pathTracerPrograms.cu:803-811``: frame 0 overwrites; frame k>0
    lerps with a = 1/(k+1), which is exactly the running mean of all frames.
    """
    a = 1.0 / (jnp.asarray(frame_idx, jnp.float32) + 1.0)
    return jnp.where(jnp.asarray(frame_idx) > 0,
                     prev_accum + (frame_mean - prev_accum) * a,
                     frame_mean)


def to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB transfer (``cuda/helpers.h:35-43``)."""
    c = jnp.asarray(c, jnp.float32)
    lo = 12.92 * c
    hi = 1.055 * jnp.power(jnp.maximum(c, 1e-10), 1.0 / 2.4) - 0.055
    return jnp.where(c < 0.0031308, lo, hi)


def quantize_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Clamp to [0,1] then quantize: min(uint(x*256), 255)
    (``cuda/helpers.h:50-55``)."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.minimum((x * 256.0).astype(jnp.uint32), 255).astype(jnp.uint8)


def make_color(c: jnp.ndarray) -> jnp.ndarray:
    """Linear float RGB [..., 3] -> sRGB uint8 [..., 3]
    (``cuda/helpers.h:57-62``)."""
    return quantize_u8(to_srgb(jnp.clip(c, 0.0, 1.0)))


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    """Per-pixel RMSE between two float images (the SURVEY §6 accuracy metric)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))


# ----------------------------------------------------------------------------
# Image IO (dependency-free)
# ----------------------------------------------------------------------------

def write_png(path: str, rgb_u8: np.ndarray) -> None:
    """Write an 8-bit RGB PNG without external imaging libraries."""
    img = np.ascontiguousarray(np.asarray(rgb_u8, np.uint8))
    assert img.ndim == 3 and img.shape[2] == 3, img.shape
    h, w, _ = img.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        data = tag + payload
        return struct.pack(">I", len(payload)) + data + struct.pack(
            ">I", zlib.crc32(data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[row].tobytes() for row in range(h))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def read_png(path: str) -> np.ndarray:
    """Read an 8-bit RGB/RGBA PNG written by :func:`write_png` (or any
    non-interlaced 8-bit truecolor PNG). Returns uint8 [H, W, 3]."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    w = h = None
    channels = 3
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bits, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload)
            assert bits == 8 and interlace == 0, "unsupported PNG"
            channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = w * channels
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    p = 0
    for row in range(h):
        filt = raw[p]
        line = np.frombuffer(raw, np.uint8, stride, p + 1).copy()
        p += 1 + stride
        if filt == 0:
            pass
        elif filt == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (int(line[i]) + int(line[i - channels])) & 0xFF
        elif filt == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif filt == 3:  # Average
            for i in range(stride):
                left = int(line[i - channels]) if i >= channels else 0
                line[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - channels]) if i >= channels else 0
                b = int(prev[i])
                c = int(prev[i - channels]) if i >= channels else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {filt}")
        out[row] = line
        prev = line
    img = out.reshape(h, w, channels)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    return img[:, :, :3]


def read_ppm(path: str) -> np.ndarray:
    """Read a P6 (binary) or P3 (ascii) PPM (``sutil::PPMLoader`` parity).

    Returns uint8 [H, W, 3]."""
    with open(path, "rb") as f:
        data = f.read()
    # Header tokens, skipping comments.
    tokens = []
    pos = 0
    while len(tokens) < 4:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            nl = data.find(b"\n", pos)
            pos = nl + 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        tokens.append(data[start:pos])
    magic, w, h, maxval = (tokens[0], int(tokens[1]), int(tokens[2]),
                           int(tokens[3]))
    pos += 1  # single whitespace after maxval
    if magic == b"P6":
        img = np.frombuffer(data, np.uint8, w * h * 3, pos)
    elif magic == b"P3":
        vals = data[pos:].split()
        img = np.array(vals[: w * h * 3], np.int64).astype(np.uint8)
    else:
        raise ValueError(f"unsupported PPM magic {magic!r}")
    if maxval != 255:
        img = (img.astype(np.float32) * (255.0 / maxval)).astype(np.uint8)
    return img.reshape(h, w, 3).copy()


def write_ppm(path: str, rgb_u8: np.ndarray) -> None:
    """Binary PPM writer (``sutil::saveImage`` PPM parity)."""
    img = np.ascontiguousarray(np.asarray(rgb_u8, np.uint8))
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img.tobytes())
