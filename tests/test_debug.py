"""Tests for the debug tooling: path replay and checkify validation mode."""

import numpy as np
import pytest

import tpu_pt
from tpu_pt.render import CameraArrays
from tpu_pt.debug import trace_pixel, format_trace, validate_frame


@pytest.fixture(scope="module")
def cornell():
    scene = tpu_pt.load_scene("assets/cornell_box_mixed.obj")
    cam = CameraArrays.from_camera(tpu_pt.cornell_default_camera())
    return scene, cam


def test_validate_frame_clean_and_equal(cornell):
    """Validation mode (the OptiX validation-ALL analog) must pass on a
    healthy scene — no NaN/Inf/OOB anywhere in a full frame — and return
    the same image as the normal render path."""
    scene, cam = cornell
    cfg = tpu_pt.RenderConfig(width=16, height=16, spp=2, max_depth=4,
                              use_direct_lighting=True,
                              use_importance_sampling=True)
    accum, img, stats = validate_frame(scene, cam, cfg)
    ref_accum, ref_img, _ = tpu_pt.render_frame(scene, cam, cfg, 0,
                                                tpu_pt.init_accum(cfg))
    np.testing.assert_array_equal(np.asarray(img), np.asarray(ref_img))
    assert float(stats.rays_traced) > 0


def test_trace_pixel_matches_render_structure(cornell):
    scene, cam = cornell
    cfg = tpu_pt.RenderConfig(width=16, height=16, spp=1, max_depth=4,
                              use_direct_lighting=True,
                              use_importance_sampling=True)
    records = trace_pixel(scene, cam, cfg, x=8, y=8)
    assert 1 <= len(records) <= cfg.max_depth + 1
    assert records[-1]["done"]
    assert records[-1]["reason"] != "NOT_DONE"
    text = format_trace(records)
    assert "d0:" in text
