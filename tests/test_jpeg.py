"""JPEG codec + glTF JPEG/sampler integration.

glTF core mandates JPEG (the reference decodes via tinygltf's stb_image,
``sutil/Scene.cpp:267-550``); samplers carry wrap modes the reference
honors per texture (``Scene::addSampler``). These tests cover the
dependency-free codec (``tpu_pt.jpeg``), its film IO wrappers, the
loader path, and wrap-mode sampling.
"""

import base64
import json
import types

import numpy as np
import pytest

from tpu_pt import film
from tpu_pt.jpeg import decode_jpeg, encode_jpeg


def _test_image(h=72, w=104):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([128 + 100 * np.sin(x / 17),
                    128 + 90 * np.cos(y / 11),
                    np.clip(x + y, 0, 255)], axis=2)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_quality():
    img = _test_image()
    for q, tol in [(95, 8.0), (75, 14.0)]:
        got = decode_jpeg(encode_jpeg(img, quality=q))
        assert got.shape == img.shape
        err = np.abs(got.astype(int) - img.astype(int)).mean()
        assert err < tol, (q, err)


def test_jpeg_grayscale():
    img = _test_image()[:, :, 0]
    got = decode_jpeg(encode_jpeg(img, quality=92))
    assert got.shape == (*img.shape, 3)
    np.testing.assert_array_equal(got[:, :, 0], got[:, :, 1])
    assert np.abs(got[:, :, 0].astype(int) - img.astype(int)).mean() < 6.0


def test_jpeg_film_wrappers(tmp_path):
    img = _test_image(40, 56)
    p = str(tmp_path / "x.jpg")
    film.write_jpeg(p, img, quality=95)
    back = film.read_jpeg(p)
    assert back.shape == img.shape
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 8.0


@pytest.mark.parametrize("subsampling", [0, 1, 2])
def test_jpeg_decode_matches_libjpeg(subsampling):
    """Cross-check against an independent encoder (PIL/libjpeg) when
    available: 4:4:4 must match bit-exactly; subsampled modes only
    differ by the chroma upsampling filter (ours nearest, libjpeg
    triangle)."""
    Image = pytest.importorskip("PIL.Image")
    import io
    img = _test_image()
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90,
                              subsampling=subsampling)
    ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    got = decode_jpeg(buf.getvalue())
    diff = np.abs(ref.astype(int) - got.astype(int))
    if subsampling == 0:
        assert diff.max() <= 3          # IDCT rounding only
    else:
        assert diff.mean() < 3.0        # chroma filter difference


def test_jpeg_decode_restart_markers():
    Image = pytest.importorskip("PIL.Image")
    import io
    img = _test_image(64, 96)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=92, subsampling=0,
                              restart_marker_blocks=3)
    data = buf.getvalue()
    assert b"\xff\xdd" in data          # DRI actually present
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    diff = np.abs(decode_jpeg(data).astype(int) - ref.astype(int))
    assert diff.max() <= 3              # IDCT rounding only (float vs int)


def test_jpeg_progressive_pil_roundtrip():
    """Progressive (SOF2) files decode (round-5 upgrade of the old
    rejection test): a PIL-encoded progressive image comes back close
    to the original (lossy + IDCT/upsampling differences only)."""
    Image = pytest.importorskip("PIL.Image")
    import io
    img = _test_image(24, 40)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", progressive=True, quality=92)
    assert b"\xff\xc2" in buf.getvalue()
    out = decode_jpeg(buf.getvalue())
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.mean() < 12.0


# ---------------------------------------------------------------------------
# glTF integration: JPEG-textured GLB + sampler wrap modes
# ---------------------------------------------------------------------------

def _jpeg_gltf(tmp_path, wrap_s=33071, wrap_t=33648):
    """Minimal .gltf: one textured quad, JPEG base color via data URI,
    a non-default sampler."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    blob = b""
    views, accs = [], []

    def acc(arr, target, ctype, atype):
        nonlocal blob
        off = len(blob)
        blob += arr.tobytes()
        while len(blob) % 4:
            blob += b"\0"
        views.append(dict(buffer=0, byteOffset=off, byteLength=arr.nbytes,
                          target=target))
        a = dict(bufferView=len(views) - 1, componentType=ctype,
                 count=arr.shape[0], type=atype)
        if atype == "VEC3":
            a["min"] = [float(v) for v in arr.min(axis=0)]
            a["max"] = [float(v) for v in arr.max(axis=0)]
        accs.append(a)
        return len(accs) - 1

    p_a = acc(pos, 34962, 5126, "VEC3")
    n_a = acc(nrm, 34962, 5126, "VEC3")
    u_a = acc(uv, 34962, 5126, "VEC2")
    i_a = acc(idx.reshape(-1, 1), 34963, 5123, "SCALAR")

    tex = np.zeros((16, 16, 3), np.uint8)
    tex[:8, :8] = [255, 0, 0]
    tex[8:, 8:] = [255, 0, 0]
    jpg = encode_jpeg(tex, quality=100)
    doc = dict(
        asset=dict(version="2.0"),
        scene=0, scenes=[dict(nodes=[0])], nodes=[dict(mesh=0)],
        meshes=[dict(primitives=[dict(
            attributes=dict(POSITION=p_a, NORMAL=n_a, TEXCOORD_0=u_a),
            indices=i_a, material=0)])],
        materials=[dict(pbrMetallicRoughness=dict(
            baseColorTexture=dict(index=0)))],
        textures=[dict(source=0, sampler=0)],
        samplers=[dict(wrapS=wrap_s, wrapT=wrap_t)],
        images=[dict(uri="data:image/jpeg;base64,"
                         + base64.b64encode(jpg).decode())],
        buffers=[dict(byteLength=len(blob),
                      uri="data:application/octet-stream;base64,"
                          + base64.b64encode(blob).decode())],
        bufferViews=views, accessors=accs,
    )
    path = tmp_path / "jpegtex.gltf"
    path.write_text(json.dumps(doc))
    return str(path), tex


def test_gltf_jpeg_texture_and_sampler(tmp_path):
    from tpu_pt.scene.gltf import load_gltf
    path, tex = _jpeg_gltf(tmp_path)
    ws = load_gltf(path)
    assert len(ws.textures) == 1
    assert ws.tex_wrap == ((33071, 33648),)
    got = np.asarray(ws.textures[0])            # [h, w, 4] float
    ref = tex.astype(np.float32) / 255.0
    assert got.shape == (16, 16, 4)
    # High-quality JPEG of a 2-level image: loose tolerance, right pattern.
    assert np.abs(got[..., :3] - ref).mean() < 0.08
    assert got[2, 2, 0] > 0.7 and got[2, 10, 0] < 0.3


def test_sample_textures_wrap_modes():
    """REPEAT / CLAMP_TO_EDGE / MIRRORED_REPEAT on out-of-range UVs."""
    import jax.numpy as jnp
    from tpu_pt.whitted import _sample_textures

    # 1x4 gradient texture: texel x -> value x/3.
    tex = jnp.zeros((1, 4, 4), jnp.float32)
    tex = tex.at[0, :, 0].set(jnp.arange(4.0) / 3.0)
    tex = tex.at[0, :, 3].set(1.0)

    def sample(u, wrap):
        ws = types.SimpleNamespace(textures=(tex,), tex_wrap=((wrap, wrap),))
        tex_id = jnp.zeros(len(u), jnp.int32)
        uu = jnp.asarray(u, jnp.float32)
        vv = jnp.zeros(len(u), jnp.float32)
        rgb, _ = _sample_textures(ws, tex_id, uu, vv, srgb=False)
        return np.asarray(rgb.x)

    # u=1.25: REPEAT -> 0.25 of the span; CLAMP -> right edge (1.0);
    # MIRROR -> 0.75 of the span.
    r = sample([1.25], 10497)
    c = sample([1.25], 33071)
    m = sample([1.25], 33648)
    np.testing.assert_allclose(r, [0.25], atol=1e-6)
    np.testing.assert_allclose(c, [1.0], atol=1e-6)
    np.testing.assert_allclose(m, [0.75], atol=1e-6)
    # Negative u: REPEAT wraps, CLAMP pins to left edge.
    np.testing.assert_allclose(sample([-0.25], 10497), [0.75], atol=1e-6)
    np.testing.assert_allclose(sample([-0.25], 33071), [0.0], atol=1e-6)


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding: spectral selection + successive
# approximation, DC/AC first + refinement scans, EOB runs.

import pathlib

_DATA = pathlib.Path(__file__).parent / "data"


@pytest.mark.parametrize("name", ["prog444_q85", "prog420_q60"])
def test_progressive_fixture_decode(name):
    """Committed libjpeg-encoded progressive files decode exactly to
    the committed expectation (which was validated against libjpeg's
    own decode to within IDCT rounding, maxdiff <= 14, at creation)."""
    blob = (_DATA / f"{name}.jpg").read_bytes()
    assert b"\xff\xc2" in blob                 # really SOF2
    ours = decode_jpeg(blob)
    want = film.read_png(str(_DATA / f"{name}.expected.png"))
    np.testing.assert_array_equal(ours, want)


def test_progressive_matches_baseline_encoding():
    """Our own baseline encoder's image decodes close to the SAME
    image routed through a progressive file (both are the same DCT
    coefficients; only scan order differs), when an independent
    progressive encoder is available."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(4)
    y, x = np.mgrid[0:41:1, 0:67:1].astype(np.float32)
    img = np.clip(np.stack([128 + 90 * np.sin(x / 9),
                            128 + 70 * np.cos(y / 6),
                            128 + 50 * np.sin((x - y) / 8)], axis=2),
                  0, 255).astype(np.uint8)
    import tempfile
    params = [int(cv2.IMWRITE_JPEG_PROGRESSIVE), 1,
              int(cv2.IMWRITE_JPEG_QUALITY), 90]
    if hasattr(cv2, "IMWRITE_JPEG_SAMPLING_FACTOR"):
        # 4:4:4 keeps the comparison free of chroma-upsample-filter
        # differences (libjpeg interpolates, we replicate).
        params += [int(cv2.IMWRITE_JPEG_SAMPLING_FACTOR),
                   int(cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444)]
    with tempfile.NamedTemporaryFile(suffix=".jpg") as f:
        assert cv2.imwrite(f.name, img[..., ::-1], params)
        blob = open(f.name, "rb").read()
    assert b"\xff\xc2" in blob
    ours = decode_jpeg(blob)
    ref = cv2.imdecode(np.frombuffer(blob, np.uint8),
                       cv2.IMREAD_COLOR)[..., ::-1]
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 16 and diff.mean() < 1.5   # IDCT rounding only
