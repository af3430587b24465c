"""Film: progressive accumulation, sRGB tonemapping, image IO, RMSE.

TPU-native equivalent of the reference's accumulation + presentation path:
- progressive exponential-mean accumulation (``pathTracerPrograms.cu:803-811``)
- sRGB tonemap + 8-bit quantization ``make_color``/``toSRGB``
  (``cuda/helpers.h:35-62``)
- image save (``sutil::saveImage``, ``sutil/sutil.cpp:542``) as PNG/PPM,
  implemented dependency-free (zlib PNG encoder)
- OpenEXR float HDR read/write (the reference vendors tinyexr for this,
  ``support/tinyexr``) — scanline images, NO_COMPRESSION/RLE/ZIPS/ZIP,
  FLOAT/HALF channels. Deliberately a subset of tinyexr: PIZ, tiled
  and multi-part files are NOT read — enough for the renderer's own
  HDR round-trips plus the common third-party scanline files, not for
  arbitrary EXRs.

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
    """Write an 8-bit RGB (or RGBA — alpha textures) PNG without
    external imaging libraries."""
    img = np.ascontiguousarray(np.asarray(rgb_u8, np.uint8))
    assert img.ndim == 3 and img.shape[2] in (3, 4), img.shape
    h, w, c = img.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        data = tag + payload
        return struct.pack(">I", len(payload)) + data + struct.pack(
            ">I", zlib.crc32(data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if c == 3 else 6, 0, 0, 0)
    raw = b"".join(b"\x00" + img[row].tobytes() for row in range(h))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def _read_png_channels(path: str) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG -> uint8 [H, W, C] with its
    native channel count (1 gray / 2 gray+alpha / 3 RGB / 4 RGBA)."""
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
    out = _unfilter_scanlines(raw, h, w, stride, channels)
    return out.reshape(h, w, channels)


def read_png(path: str) -> np.ndarray:
    """Read an 8-bit RGB/RGBA PNG written by :func:`write_png` (or any
    non-interlaced 8-bit truecolor PNG). Returns uint8 [H, W, 3]."""
    img = _read_png_channels(path)
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    elif img.shape[2] == 2:                       # gray + alpha
        img = np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]


def read_png_rgba(path: str) -> np.ndarray:
    """Like :func:`read_png` but preserves the alpha channel (255 when
    the file has none). Returns uint8 [H, W, 4] — the texture path for
    glTF alpha-mask/blend materials (base-color ``.w`` drives the
    reference's anyhit programs, ``cuda/whitted.cu:100-138``)."""
    img = _read_png_channels(path)
    h, w, c = img.shape
    out = np.full((h, w, 4), 255, np.uint8)
    if c == 1:
        out[:, :, :3] = np.repeat(img, 3, axis=2)
    elif c == 2:
        out[:, :, :3] = np.repeat(img[:, :, :1], 3, axis=2)
        out[:, :, 3] = img[:, :, 1]
    else:
        out[:, :, :c] = img
    return out


def _unfilter_scanlines(raw: bytes, h: int, w: int, stride: int,
                        channels: int) -> np.ndarray:
    """Undo per-row PNG filtering -> uint8 [h, stride].

    Native C fast path when available (Average/Paeth are serial scans);
    the numpy fallback vectorizes None/Sub/Up whole-row (Sub is a modular
    cumsum over x per channel lane) and loops only the serial filters."""
    try:
        from . import native
        if native.available():
            return native.unfilter_png_native(raw, h, stride, channels)
    except Exception:
        pass
    rows = np.frombuffer(raw, np.uint8, h * (stride + 1)).reshape(
        h, stride + 1)
    filters = rows[:, 0]
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for row in range(h):
        filt = filters[row]
        line = rows[row, 1:].copy()
        if filt == 0:
            pass
        elif filt == 1:   # Sub: out[i] = line[i] + out[i-ch] == cumsum mod 256
            line = np.cumsum(line.reshape(w, channels), axis=0,
                             dtype=np.uint8).reshape(stride)
        elif filt == 2:   # Up
            line += prev
        elif filt == 3:   # Average: serial left-dependency, per-pixel step
            ln = line.reshape(w, channels).astype(np.int32)
            pv = prev.reshape(w, channels).astype(np.int32)
            left = np.zeros(channels, np.int32)
            for x in range(w):
                left = (ln[x] + ((left + pv[x]) >> 1)) & 0xFF
                ln[x] = left
            line = ln.astype(np.uint8).reshape(stride)
        elif filt == 4:   # Paeth: serial left-dependency, per-pixel step
            ln = line.reshape(w, channels).astype(np.int32)
            pv = prev.reshape(w, channels).astype(np.int32)
            a = np.zeros(channels, np.int32)
            c = np.zeros(channels, np.int32)
            for x in range(w):
                b = pv[x]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a,
                                np.where(pb <= pc, b, c))
                a = (ln[x] + pred) & 0xFF
                ln[x] = a
                c = b
            line = ln.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"bad PNG filter {filt}")
        out[row] = line
        prev = line
    return out


def write_jpeg(path: str, rgb_u8: np.ndarray, quality: int = 90) -> None:
    """Write a baseline JPEG (stb_image_write parity; ``tpu_pt.jpeg``)."""
    from . import jpeg
    with open(path, "wb") as f:
        f.write(jpeg.encode_jpeg(np.asarray(rgb_u8, np.uint8), quality))


def read_jpeg(path: str) -> np.ndarray:
    """Read a baseline JPEG to uint8 [H, W, 3] (stb_image parity)."""
    from . import jpeg
    with open(path, "rb") as f:
        return jpeg.decode_jpeg(f.read())


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


# ----------------------------------------------------------------------------
# OpenEXR (float HDR) IO — the reference vendors tinyexr for this
# (``support/tinyexr``, used by ``sutil::loadImage``); here a dependency-free
# subset: scanline images, NO_COMPRESSION/ZIPS/ZIP, FLOAT or HALF channels.
# ----------------------------------------------------------------------------

_EXR_MAGIC = 20000630
_EXR_PT_UINT, _EXR_PT_HALF, _EXR_PT_FLOAT = 0, 1, 2
_EXR_COMP = {"none": 0, "rle": 1, "zips": 2, "zip": 3}  # lines/blk 1,1,1,16


def _exr_predict(data: bytes) -> np.ndarray:
    """Shared OpenEXR compressor pre-pass: reorder bytes into two
    halves, then delta-encode (+128 bias). ZIP deflates the result; RLE
    run-length-packs it."""
    arr = np.frombuffer(data, np.uint8)
    half = (arr.size + 1) // 2
    reordered = np.empty(arr.size, np.uint8)
    reordered[:half] = arr[0::2]
    reordered[half:] = arr[1::2]
    enc = reordered.copy()
    enc[1:] -= reordered[:-1]
    enc[1:] += 128                                # uint8 wraps mod 256
    return enc


def _exr_unpredict(enc: np.ndarray) -> bytes:
    enc = enc.copy()
    enc[1:] += 128                                # undo the +128 bias: -128
    rec = np.cumsum(enc, dtype=np.uint8)
    half = (rec.size + 1) // 2
    out = np.empty(rec.size, np.uint8)
    out[0::2] = rec[:half]
    out[1::2] = rec[half:]
    return out.tobytes()


def _exr_zip_encode(data: bytes) -> bytes:
    """OpenEXR ZIP pre-pass (reorder halves + byte delta) then deflate."""
    return zlib.compress(_exr_predict(data).tobytes(), 6)


def _exr_zip_decode(data: bytes) -> bytes:
    """Inverse of :func:`_exr_zip_encode`: inflate, undo delta (a modular
    cumsum), interleave the two halves back."""
    return _exr_unpredict(np.frombuffer(zlib.decompress(data), np.uint8))


def _exr_rle_encode(data: bytes) -> bytes:
    """OpenEXR RLE (ImfRle.cpp scheme): the ZIP pre-pass, then runs of
    >= 3 equal bytes stored as (count - 1, byte) with count <= 128 and
    literal spans as (-len, bytes...) with len <= 127.

    Run detection is vectorized (np.diff boundaries); only the emit
    loop walks the (far shorter) span list, so HD-sized writes stay
    milliseconds instead of a per-byte Python walk."""
    src = _exr_predict(data)
    n = src.size
    if n == 0:
        return b""
    # Equal-value span boundaries: starts of maximal runs.
    starts = np.concatenate([[0], np.flatnonzero(np.diff(src)) + 1])
    lens = np.diff(np.concatenate([starts, [n]]))
    srcb = src.tobytes()
    out = bytearray()
    lit_s = -1                                  # open literal span start
    lit_n = 0

    def flush_literals():
        nonlocal lit_s, lit_n
        p = lit_s
        while lit_n > 0:
            take = min(lit_n, 127)
            out.append(256 - take)              # -len, two's complement
            out.extend(srcb[p:p + take])
            p += take
            lit_n -= take
        lit_s = -1

    for s, ln in zip(starts.tolist(), lens.tolist()):
        if ln >= 3:
            flush_literals()
            b = srcb[s:s + 1]
            while ln > 0:
                take = min(ln, 128)
                if take < 3:                    # tail too short for a run
                    if lit_s < 0:
                        lit_s = s
                    lit_n += take
                    break
                out.append(take - 1)
                out.extend(b)
                s += take
                ln -= take
        else:
            if lit_s < 0:
                lit_s = s
            lit_n += ln
    flush_literals()
    return bytes(out)


def _exr_rle_decode(data: bytes, expect: int) -> bytes:
    """Inverse of :func:`_exr_rle_encode` (accepts any conformant
    OpenEXR RLE stream, not just our encoder's)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expect:
        c = data[i]
        i += 1
        if c >= 128:                              # negative: literal span
            ln = 256 - c
            out.extend(data[i:i + ln])
            i += ln
        else:                                     # run of c + 1 bytes
            out.extend(data[i:i + 1] * (c + 1))
            i += 1
    # A malformed third-party block that decodes short (or a final run
    # overshooting ``expect``) would shift _exr_unpredict's two-half
    # split and scramble the whole block — validate instead.
    if len(out) < expect:
        raise ValueError(
            f"EXR RLE block decoded {len(out)} of {expect} bytes")
    return _exr_unpredict(np.frombuffer(bytes(out[:expect]), np.uint8))


def write_exr(path: str, rgb: np.ndarray, half: bool = False,
              compression: str = "none") -> None:
    """Write a linear float RGB image as a scanline EXR.

    ``rgb`` is [H, W, 3] float; ``half`` selects HALF (float16) channels;
    ``compression`` is ``"none"``, ``"rle"``, ``"zips"`` (ZIP, 1
    scanline/block) or ``"zip"`` (ZIP, 16 scanlines/block). Channels are
    stored B, G, R (alphabetical, as EXR requires). Incompressible
    blocks are stored raw, as the OpenEXR format prescribes.
    """
    img = np.asarray(rgb, np.float32)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected [H, W, 3], got {img.shape}")
    comp = _EXR_COMP[compression]
    lines_per_block = 16 if comp == 3 else 1
    h, w, _ = img.shape
    ptype = _EXR_PT_HALF if half else _EXR_PT_FLOAT
    dtype = np.dtype("<f2") if half else np.dtype("<f4")

    def attr(name: bytes, typ: bytes, data: bytes) -> bytes:
        return name + b"\0" + typ + b"\0" + struct.pack("<i", len(data)) + data

    chans = b""
    for ch in (b"B", b"G", b"R"):
        chans += ch + b"\0" + struct.pack("<i", ptype) + b"\0\0\0\0"
        chans += struct.pack("<ii", 1, 1)
    chans += b"\0"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (
        attr(b"channels", b"chlist", chans)
        + attr(b"compression", b"compression", bytes([comp]))
        + attr(b"dataWindow", b"box2i", box)
        + attr(b"displayWindow", b"box2i", box)
        + attr(b"lineOrder", b"lineOrder", b"\0")
        + attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
        + attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0.0, 0.0))
        + attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
        + b"\0"
    )
    preamble = struct.pack("<ii", _EXR_MAGIC, 2) + header
    bgr = img[:, :, ::-1].astype(dtype)           # scanlines store B, G, R
    n_blocks = (h + lines_per_block - 1) // lines_per_block
    payloads = []
    for b in range(n_blocks):
        y = b * lines_per_block
        rows = bgr[y:y + lines_per_block]
        raw = b"".join(row.tobytes(order="F") for row in rows)
        if comp == 1:
            z = _exr_rle_encode(raw)
            payloads.append(z if len(z) < len(raw) else raw)
        elif comp:
            z = _exr_zip_encode(raw)
            payloads.append(z if len(z) < len(raw) else raw)
        else:
            payloads.append(raw)
    data_pos = len(preamble) + 8 * n_blocks
    with open(path, "wb") as f:
        f.write(preamble)
        off = data_pos
        for payload in payloads:
            f.write(struct.pack("<Q", off))
            off += 8 + len(payload)
        for b, payload in enumerate(payloads):
            f.write(struct.pack("<ii", b * lines_per_block, len(payload)))
            f.write(payload)


def read_exr(path: str) -> np.ndarray:
    """Read a scanline EXR written by ``write_exr`` (or any single-part
    FLOAT/HALF RGB file with NO_COMPRESSION, RLE, ZIPS or ZIP
    compression — the tinyexr-parity subset). Returns [H, W, 3]
    float32 (R, G, B)."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != _EXR_MAGIC:
        raise ValueError("not an EXR file")
    if version & 0x200:
        raise ValueError("multi-part EXR not supported")
    pos = 8
    attrs = {}
    while buf[pos] != 0:
        e = buf.index(b"\0", pos)
        name = buf[pos:e].decode()
        pos = e + 1
        e = buf.index(b"\0", pos)
        typ = buf[pos:e].decode()
        pos = e + 1
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        attrs[name] = (typ, buf[pos:pos + size])
        pos += size
    pos += 1

    comp = attrs["compression"][1][0]
    if comp not in (0, 1, 2, 3):
        raise ValueError(f"unsupported EXR compression {comp} "
                         "(NO_COMPRESSION/RLE/ZIPS/ZIP only; PIZ and "
                         "tiled/multi-part files are out of scope — "
                         "module docstring)")
    lines_per_block = 16 if comp == 3 else 1
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1

    chans = []
    cb = attrs["channels"][1]
    cpos = 0
    while cb[cpos] != 0:
        e = cb.index(b"\0", cpos)
        cname = cb[cpos:e].decode()
        (ptype,) = struct.unpack_from("<i", cb, e + 1)
        chans.append((cname, ptype))
        cpos = e + 1 + 16
    dtypes = {_EXR_PT_HALF: np.dtype("<f2"), _EXR_PT_FLOAT: np.dtype("<f4"),
              _EXR_PT_UINT: np.dtype("<u4")}
    line_bytes = sum(w * dtypes[pt].itemsize for _, pt in chans)

    n_blocks = (h + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack_from(f"<{n_blocks}Q", buf, pos)
    out = {}
    for off in offsets:
        y, nbytes = struct.unpack_from("<ii", buf, off)
        lines = min(lines_per_block, h - (y - y0))
        raw_size = lines * line_bytes
        data = buf[off + 8:off + 8 + nbytes]
        if comp and nbytes < raw_size:        # raw-stored blocks pass through
            data = (_exr_rle_decode(data, raw_size) if comp == 1
                    else _exr_zip_decode(data))
        p = 0
        for li in range(lines):
            for cname, ptype in chans:        # stored alphabetically
                dt = dtypes[ptype]
                row = np.frombuffer(data, dt, w, p).astype(np.float32)
                out.setdefault(cname,
                               np.zeros((h, w), np.float32))[y - y0 + li] = row
                p += w * dt.itemsize
    if all(c in out for c in "RGB"):
        return np.stack([out["R"], out["G"], out["B"]], axis=2)
    return np.stack([out[c] for c, _ in chans], axis=2)
