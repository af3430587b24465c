"""Golden-image regression tests.

The reference's de-facto acceptance artifacts are five mode PNGs
(``README.md:24-47``); here they are real regression tests: re-render each
mode at the pinned configuration and compare per-pixel RMSE against the
committed golden (tools/make_goldens.py regenerates). Counter-based RNG
makes same-backend renders deterministic, so thresholds are tight.
"""

import pathlib
import sys

import numpy as np
import pytest

import tpu_pt
from tpu_pt import film
from tpu_pt.render import CameraArrays, render_frame, init_accum

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDENS = REPO / "tests" / "goldens"
sys.path.insert(0, str(REPO / "tools"))

import make_goldens  # noqa: E402


@pytest.fixture(scope="module")
def cam():
    return CameraArrays.from_camera(tpu_pt.cornell_default_camera())


@pytest.mark.parametrize("name,overrides", make_goldens.MODES,
                         ids=[m[0] for m in make_goldens.MODES])
def test_pathtrace_golden(mixed_scene, cam, name, overrides):
    golden = film.read_png(str(GOLDENS / f"{name}.png")).astype(np.float32)
    img = make_goldens.render_mode(mixed_scene, cam, overrides)
    ours = tpu_pt.image_to_host(img).astype(np.float32)
    err = film.rmse(ours / 255.0, golden / 255.0)
    # Same backend + same counters => only fp-scheduling noise; the 1%
    # budget is the SURVEY §6 north-star accuracy bound.
    assert err < 0.01, f"{name}: RMSE {err:.4f}"


def test_mode_relationships(mixed_scene, cam):
    """Physical orderings between the golden modes (A/B semantics)."""
    imgs = {}
    for name in ("no-importance-no-direct", "importance-no-direct",
                 "importance-with-direct", "3-bounce", "16-bounce"):
        imgs[name] = film.read_png(str(GOLDENS / f"{name}.png")).astype(
            np.float64) / 255.0
    # Direct lighting adds energy at equal depth.
    assert imgs["importance-with-direct"].mean() > \
        imgs["importance-no-direct"].mean()
    # More bounces gather more energy.
    assert imgs["16-bounce"].mean() > imgs["3-bounce"].mean() * 0.98
    # The biased uniform mode differs from cosine mode measurably but not
    # wildly (both render the same scene).
    d = film.rmse(imgs["no-importance-no-direct"],
                  imgs["importance-no-direct"])
    assert 0.005 < d < 0.3


def test_whitted_golden(assets_dir):
    from tpu_pt.scene.gltf import load_gltf
    from tpu_pt.whitted import render_whitted_frame
    from tpu_pt.camera import Camera

    golden = film.read_png(str(GOLDENS / "whitted-pbr.png")).astype(
        np.float32)
    ws = load_gltf(str(assets_dir / "pbr_test.gltf"))
    camera = Camera(eye=np.array([6.0, 4.5, 7.0], np.float32),
                    lookat=np.array([0.0, 0.8, 0.0], np.float32),
                    fov_y=40.0)
    cam = CameraArrays.from_camera(camera)
    cfg = tpu_pt.RenderConfig(width=128, height=128, spp=8, max_depth=8,
                              background=(0.1, 0.15, 0.25),
                              intersector="bruteforce")
    accum = init_accum(cfg)
    img = None
    for f in range(2):
        accum, img, _ = render_whitted_frame(ws, cam, cfg, f, accum)
    ours = tpu_pt.image_to_host(img).astype(np.float32)
    err = film.rmse(ours / 255.0, golden / 255.0)
    assert err < 0.01, f"whitted RMSE {err:.4f}"


def test_curves_golden(assets_dir, cam):
    """Scene-JSON swept-sphere curves render end-to-end and match the
    committed golden (all four reference curve bases in the Cornell box;
    cuda/GeometryData.h:95-127 + curve.h:312-443 exact normals)."""
    golden = film.read_png(str(GOLDENS / "curves.png")).astype(np.float32)
    scene = tpu_pt.load_scene(str(assets_dir / "cornell_curves.json"))
    assert scene.curves is not None and scene.curves.count == 8
    img = make_goldens.render_mode(scene, cam,
                                   dict(use_importance_sampling=True,
                                        use_direct_lighting=True))
    ours = tpu_pt.image_to_host(img).astype(np.float32)
    err = film.rmse(ours / 255.0, golden / 255.0)
    assert err < 0.01, f"curves: RMSE {err:.4f}"


def test_primitives_golden(assets_dir, cam):
    """Scene-JSON analytic primitives render end-to-end and match the
    committed golden (glass sphere shell + metal sphere + parallelogram
    in the Cornell box; cuda/geometry.cu + sphere.cu showcase parity)."""
    golden = film.read_png(str(GOLDENS / "primitives.png")).astype(np.float32)
    scene = tpu_pt.load_scene(str(assets_dir / "cornell_prims.json"))
    assert scene.prims is not None and scene.prims.count == 3
    img = make_goldens.render_mode(scene, cam,
                                   dict(use_importance_sampling=True,
                                        use_direct_lighting=True))
    ours = tpu_pt.image_to_host(img).astype(np.float32)
    err = film.rmse(ours / 255.0, golden / 255.0)
    assert err < 0.01, f"primitives: RMSE {err:.4f}"


def test_whitted_alpha_shadow_golden(assets_dir):
    """Fractional alpha shadow occlusion end-to-end vs the committed
    golden (whitted.cu:113-138 parity scene: textured blend, textured
    mask, untextured blend occluders over a ground plane)."""
    if not (assets_dir / "alpha_shadow.gltf").exists():
        import subprocess, sys as _sys
        subprocess.run([_sys.executable,
                        str(REPO / "tools" / "make_gltf_assets.py")],
                       check=True)
    golden = film.read_png(
        str(GOLDENS / "whitted-alpha-shadow.png")).astype(np.float32)
    img = make_goldens.render_whitted_alpha()
    ours = tpu_pt.image_to_host(img).astype(np.float32)
    err = film.rmse(ours / 255.0, golden / 255.0)
    assert err < 0.01, f"alpha shadow RMSE {err:.4f}"
