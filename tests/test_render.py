"""End-to-end render tests: determinism, physics sanity, A/B convergence.

These encode the reference's de-facto acceptance process (golden images and
live A/B toggles, SURVEY.md §4) as automated checks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import tpu_pt
from tpu_pt import film
from tpu_pt.render import (CameraArrays, render_frame, render_wavefront,
                           init_accum, MISS, MAX_DEPTH, RUSSIAN_ROULETTE,
                           LIGHT_HIT)


def small_cfg(**kw):
    base = dict(width=64, height=64, spp=4, max_depth=4,
                use_direct_lighting=True, use_importance_sampling=True)
    base.update(kw)
    return tpu_pt.RenderConfig(**base)


@pytest.fixture(scope="module")
def cam():
    return CameraArrays.from_camera(tpu_pt.cornell_default_camera())


def render_mean(scene, cam, cfg, frames=1):
    accum = init_accum(cfg)
    for f in range(frames):
        accum, img, stats = render_frame(scene, cam, cfg, f, accum)
    return np.asarray(accum), np.asarray(img), stats


def test_bitwise_deterministic(cornell_scene, cam):
    cfg = small_cfg()
    a, _, _ = render_mean(cornell_scene, cam, cfg)
    b, _, _ = render_mean(cornell_scene, cam, cfg)
    np.testing.assert_array_equal(a, b)


def test_no_nans_all_modes(mixed_scene, cam):
    for dl in (False, True):
        for imp in (False, True):
            cfg = small_cfg(use_direct_lighting=dl,
                            use_importance_sampling=imp, spp=2)
            accum, img, _ = render_mean(mixed_scene, cam, cfg)
            assert np.isfinite(accum).all(), (dl, imp)


def test_black_without_light(assets_dir, cam):
    # A scene without emissive geometry and NEE off renders black
    # (background is black; nothing emits).
    import tpu_pt.scene as sc
    mesh = sc.load_obj(str(assets_dir / "cornell_box.obj"))
    mats = [m.as_dict() for m in mesh.materials]
    for m in mats:
        m["emission"] = (0.0, 0.0, 0.0)
    scene = sc.build_scene_arrays(mesh.vertices, mesh.indices,
                                  mesh.mat_indices, mats)
    cfg = small_cfg(use_direct_lighting=False, spp=2)
    accum, _, _ = render_mean(scene, cam, cfg)
    np.testing.assert_array_equal(accum, 0.0)


def test_light_visible_directly(cornell_scene, cam):
    """Pixels covering the ceiling light are bright (emission >= 10)."""
    cfg = small_cfg(spp=4)
    accum, img, _ = render_mean(cornell_scene, cam, cfg)
    # The light is in the upper-middle of the image; image row 0 = bottom.
    top = accum[52:62, 24:40]
    assert top.max() > 5.0


def test_energy_nonnegative_and_bounded(cornell_scene, cam):
    cfg = small_cfg(spp=8)
    accum, _, _ = render_mean(cornell_scene, cam, cfg)
    assert accum.min() >= 0.0
    assert accum.max() < 50.0  # light emission 10 x small factors


def test_is_ab_converges_to_same_image(cornell_scene, cam):
    """Importance sampling on/off are both unbiased estimators of the same
    integral — the A/B the reference exposes on key '1'."""
    cfg_on = small_cfg(width=32, height=32, spp=196, max_depth=3,
                       use_importance_sampling=True)
    cfg_off = cfg_on.with_(use_importance_sampling=False)
    a, _, _ = render_mean(cornell_scene, cam, cfg_on)
    b, _, _ = render_mean(cornell_scene, cam, cfg_off)
    # Means agree within Monte Carlo noise.
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-9) < 0.08
    assert film.rmse(a, b) < 0.15


def _floor_light_scene(emission=4.0):
    """A diffuse floor (y=0) under an emissive ceiling quad (y=2)."""
    from tpu_pt.scene import build_scene_arrays
    from tpu_pt.scene.arrays import AreaLight
    s = 20.0
    verts = np.array([
        [-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s],        # floor
        [-1, 2, -1], [1, 2, -1], [1, 2, 1], [-1, 2, 1],         # light
    ], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]])
    # NOTE: the light's own Kd multiplies BSDF-sampled emission hits (the
    # reference's CH runs the diffuse switch before the emissive check,
    # pathTracerPrograms.cu:905-996) — use Kd=1 so the analytic comparison
    # is clean.
    mats = [dict(diffuse=(0.7, 0.7, 0.7), emission=(0, 0, 0), roughness=0.5,
                 metallic=0.0, ior=1.0, bsdf=0),
            dict(diffuse=(1.0, 1.0, 1.0), emission=(emission,) * 3,
                 roughness=0.5, metallic=0.0, ior=1.0, bsdf=0)]
    light = AreaLight(corner=jnp.asarray([-1.0, 2.0, -1.0]),
                      v1=jnp.asarray([2.0, 0.0, 0.0]),
                      v2=jnp.asarray([0.0, 0.0, 2.0]),
                      normal=jnp.asarray([0.0, -1.0, 0.0]),
                      emission=jnp.asarray([emission] * 3))
    return build_scene_arrays(verts, idx, np.array([0, 0, 1, 1]), mats,
                              light=light)


def _analytic_floor_radiance(albedo=0.7, emission=4.0):
    """rho/pi * integral of L cos(theta) over the light's solid angle from
    the origin, by dense numeric quadrature."""
    n = 600
    xs = np.linspace(-1, 1, n)
    zs = np.linspace(-1, 1, n)
    x, z = np.meshgrid(xs, zs)
    y = 2.0
    d2 = x * x + y * y + z * z
    cos_p = y / np.sqrt(d2)       # at the floor point
    cos_l = y / np.sqrt(d2)       # at the light (facing down)
    da = (2.0 / n) ** 2
    integral = np.sum(emission * cos_p * cos_l / d2) * da
    return albedo / np.pi * integral


def test_cosine_sampling_unbiased_vs_analytic():
    """Cosine importance sampling estimates the true rendering integral —
    verified against numeric quadrature of a floor-under-light setup."""
    from tpu_pt.camera import Camera
    scene = _floor_light_scene()
    camera = Camera(eye=np.array([0.0, 1.0, -4.0], np.float32),
                    lookat=np.array([0.0, 0.0, 0.0], np.float32),
                    fov_y=20.0)
    cam = CameraArrays.from_camera(camera)
    cfg = tpu_pt.RenderConfig(width=16, height=16, spp=1024, max_depth=1,
                              use_importance_sampling=True,
                              use_direct_lighting=False)
    rad, _ = render_wavefront(scene, cam, cfg, 0, cfg.width * cfg.height, 0)
    img = np.asarray(rad).reshape(16, 16, 3)
    # Center pixels look at the floor near the origin.
    center = img[7:9, 7:9].mean()
    expect = _analytic_floor_radiance()
    assert abs(center - expect) / expect < 0.06, (center, expect)


def test_uniform_mode_reference_bias():
    """The reference's non-IS mode multiplies by albedo only (no cos/pdf
    weight, ``pathTracerPrograms.cu:920-927``) — a *biased* estimator kept
    for golden parity. Document that it differs from the cosine mode here."""
    from tpu_pt.camera import Camera
    scene = _floor_light_scene()
    camera = Camera(eye=np.array([0.0, 1.0, -4.0], np.float32),
                    lookat=np.array([0.0, 0.0, 0.0], np.float32),
                    fov_y=20.0)
    cam = CameraArrays.from_camera(camera)
    cfg = tpu_pt.RenderConfig(width=8, height=8, spp=1024, max_depth=1,
                              use_importance_sampling=False,
                              use_direct_lighting=False)
    rad, _ = render_wavefront(scene, cam, cfg, 0, cfg.width * cfg.height, 0)
    uniform_val = np.asarray(rad).reshape(8, 8, 3)[3:5, 3:5].mean()
    expect = _analytic_floor_radiance()
    # Uniform mode underweights the overhead light (no 2*cos factor):
    # value ~= expect/2 here; assert it is clearly below the true value.
    assert uniform_val < expect * 0.75, (uniform_val, expect)


def test_direct_lighting_brightens_shadowed_regions(cornell_scene, cam):
    """NEE adds direct light every bounce -> image gets brighter and less
    noisy at low depth (key '0' A/B)."""
    cfg_off = small_cfg(spp=8, max_depth=2, use_direct_lighting=False)
    cfg_on = cfg_off.with_(use_direct_lighting=True)
    a, _, _ = render_mean(cornell_scene, cam, cfg_off)
    b, _, stats = render_mean(cornell_scene, cam, cfg_on)
    assert b.mean() > a.mean()
    assert float(stats.shadow_rays) > 0


def test_max_depth_monotone_energy(cornell_scene, cam):
    """More bounces can only add energy (all terms are nonnegative)."""
    means = []
    for depth in (1, 2, 4, 8):
        cfg = small_cfg(width=32, height=32, spp=64, max_depth=depth,
                        use_direct_lighting=False)
        accum, _, _ = render_mean(cornell_scene, cam, cfg)
        means.append(accum.mean())
    assert means[1] > means[0] * 0.99
    assert means[2] > means[1] * 0.95  # MC noise tolerance


def test_done_histogram_telemetry(cornell_scene, cam):
    cfg = small_cfg(spp=2, max_depth=4)
    _, _, stats = render_mean(cornell_scene, cam, cfg)
    hist = np.asarray(stats.done_histogram)
    n_paths = cfg.width * cfg.height * cfg.spp
    np.testing.assert_allclose(hist.sum(), n_paths)
    # Closed box: almost no rays escape... except through the open front
    # is sealed, so MISS only via numeric leaks; RR dominates.
    assert hist[RUSSIAN_ROULETTE] > 0
    assert hist[MAX_DEPTH] >= 0
    assert hist[LIGHT_HIT] > 0


def test_progressive_accumulation_matches_big_spp(cornell_scene, cam):
    """k frames of n spp == running mean; close to one frame of k*n spp."""
    cfg = small_cfg(width=32, height=32, spp=8, max_depth=2,
                    use_direct_lighting=True)
    accum = init_accum(cfg)
    for f in range(4):
        accum, _, _ = render_frame(cornell_scene, cam, cfg, f, accum)
    multi = np.asarray(accum)

    # Independent estimate with more samples in one frame.
    cfg_big = cfg.with_(spp=32)
    accum2 = init_accum(cfg_big)
    accum2, _, _ = render_frame(cornell_scene, cam, cfg_big, 0, accum2)
    single = np.asarray(accum2)
    # Two independent 32-sample MC estimates: means agree tightly, per-pixel
    # noise is RR-firefly-limited (the exact running-mean identity is tested
    # in test_film.py::test_accumulate_is_running_mean).
    assert abs(multi.mean() - single.mean()) / single.mean() < 0.05
    assert film.rmse(multi, single) < 0.35


def test_pixel_subset_matches_full_render(cornell_scene, cam):
    """Rendering a pixel subset must equal the same slice of the full frame
    (the invariant tile-sharding relies on)."""
    cfg = small_cfg(spp=2)
    n = cfg.width * cfg.height
    full, _ = render_wavefront(cornell_scene, cam, cfg, 0, n, 0)
    # A row in the middle.
    sub, _ = render_wavefront(cornell_scene, cam, cfg, 32 * cfg.width,
                              cfg.width, 0)
    np.testing.assert_array_equal(np.asarray(full)[32 * cfg.width:
                                                   33 * cfg.width],
                                  np.asarray(sub))


def test_refractive_sphere_transmits_light(mixed_scene, cam):
    """The refractive sphere region is not black (light passes through)."""
    cfg = small_cfg(spp=16, max_depth=6)
    accum, _, _ = render_mean(mixed_scene, cam, cfg)
    # Sphere is around image center-left, rows ~28-40.
    patch = accum[26:40, 18:34]
    assert patch.mean() > 0.01


def test_ladder_bitwise_identical(cornell_scene, cam, monkeypatch):
    """The pixelq width ladder (TPT_LADDER) compacts live lanes into
    narrower while_loops as the queue drains. Radiance is item-keyed
    (counter RNG), each item is claimed and drained exactly once at any
    ladder, and the drain sorts by item id — so the image AND the
    path stats must be bitwise identical to the single-stage loop (only
    the round count differs). 256^2 x 1 spp makes 8192 lanes, so the
    8192 -> 4096 boundary is actually crossed."""
    cfg = small_cfg(width=256, height=256, spp=1, max_depth=4,
                    intersector="bruteforce")
    monkeypatch.setenv("TPT_LADDER", "1")
    render_frame.clear_cache()      # TPT_LADDER is read at trace time
    a, _, sa = render_mean(cornell_scene, cam, cfg)
    monkeypatch.setenv("TPT_LADDER", "1,2")
    render_frame.clear_cache()
    b, _, sb = render_mean(cornell_scene, cam, cfg)
    np.testing.assert_array_equal(a, b)
    assert float(sa.rays_traced) == float(sb.rays_traced)
    assert float(sa.shadow_rays) == float(sb.shadow_rays)
    np.testing.assert_array_equal(np.asarray(sa.done_histogram),
                                  np.asarray(sb.done_histogram))
    # The ladder narrows tail rounds, it does not add any: total round
    # count stays within a couple of boundary-claim reshuffles.
    assert abs(float(sb.wavefront_iterations)
               - float(sa.wavefront_iterations)) <= 2
