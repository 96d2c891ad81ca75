# Tests: post-processing ops + Scene post-fx surface.

import numpy as np
import pytest

import jax.numpy as jnp

from forge3d_tpu.ops.post import (bloom, depth_of_field, gaussian_blur,
                                  halton_jitter, rect_area_light, sharpen,
                                  ssao, ssr, taa_resolve, vignette)


def _img(h=32, w=48):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.3 + 0.2 * np.sin(x * 0.4) * np.cos(y * 0.3)
    return np.stack([base, base * 0.9, base * 0.8], -1)


def test_gaussian_blur_preserves_mean():
    img = _img()
    out = np.asarray(gaussian_blur(img, 2.0))
    assert out.shape == img.shape
    assert out.mean() == pytest.approx(img.mean(), rel=2e-2)
    assert out.std() < img.std()  # smoothing


def test_bloom_brightens_highlights_only():
    img = _img()
    img[10:14, 10:14] = 8.0   # hot spot above threshold
    out = np.asarray(bloom(img, threshold=1.0, intensity=0.8))
    # neighborhood of the hot spot gains energy
    assert out[8, 12, 0] > img[8, 12, 0] + 0.01
    # far corner unchanged (below threshold everywhere)
    assert out[30, 45, 0] == pytest.approx(img[30, 45, 0], abs=2e-3)


def test_dof_blurs_out_of_focus():
    img = _img()
    img[:, 24] = 4.0  # sharp vertical line
    depth = np.full(img.shape[:2], 10.0, np.float32)
    sharp = np.asarray(depth_of_field(img, depth, focus_distance=10.0))
    blurred = np.asarray(depth_of_field(img, depth, focus_distance=30.0,
                                        focus_range=2.0))
    line_contrast = lambda im: im[:, 24, 0].mean() - im[:, 20, 0].mean()
    assert line_contrast(blurred) < 0.6 * line_contrast(sharp)
    assert line_contrast(sharp) == pytest.approx(line_contrast(img), rel=0.05)


def test_taa_converges_and_clamps():
    rng = np.random.default_rng(0)
    truth = _img()
    hist = truth + rng.normal(0, 0.2, truth.shape).astype(np.float32)
    for _ in range(40):
        hist = np.asarray(taa_resolve(truth, hist, blend=0.15))
    assert np.abs(hist - truth).max() < 1e-2
    # ghost clamp: history far outside the neighborhood is pulled in
    ghost = truth + 10.0
    out = np.asarray(taa_resolve(truth, ghost, blend=0.1))
    assert np.abs(out - truth).max() < 0.5


def test_halton_jitter():
    j = np.asarray(halton_jitter(16))
    assert j.shape == (16, 2)
    assert np.all(np.abs(j) <= 0.5)
    assert len(np.unique(j[:, 0])) == 16


def test_ssao_darkens_valleys():
    h, w = 48, 48
    depth = np.full((h, w), 10.0, np.float32)
    depth[:, :24] = 9.3           # near wall occludes the boundary strip
    normal = np.zeros((h, w, 3), np.float32)
    normal[..., 2] = 1.0
    ao = np.asarray(ssao(depth, normal, radius=6.0))
    # pixels just beyond the depth edge are occluded by the closer wall
    assert ao[:, 26:30].mean() < ao[:, 40:].mean() - 0.02
    assert np.all(ao >= 0) and np.all(ao <= 1)


def test_ssr_reflects():
    h, w = 32, 32
    color = np.zeros((h, w, 3), np.float32)
    color[4:8, :, 0] = 2.0        # bright red band near the top
    depth = np.full((h, w), 10.0, np.float32)
    depth[4:8] = 4.0              # the red band is the closer surface
    normal = np.zeros((h, w, 3), np.float32)
    normal[16:, 1] = 1.0          # bottom half faces up => reflective
    out = np.asarray(ssr(color, depth, normal, intensity=0.8))
    assert out[24:, :, 0].mean() > color[24:, :, 0].mean()


def test_vignette_and_sharpen():
    img = _img()
    v = np.asarray(vignette(img, strength=0.5))
    assert v[0, 0, 0] < img[0, 0, 0]                     # corner darkened
    assert v[16, 24, 0] == pytest.approx(img[16, 24, 0], abs=1e-4)
    s = np.asarray(sharpen(img, amount=0.5))
    assert s.std() > img.std()                            # contrast boost


def test_rect_area_light_falloff_and_clamp():
    p = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 5.0]], np.float32)
    n = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (2, 1))
    v = n.copy()
    out = np.asarray(rect_area_light(
        p, n, v, light_center=(0, 0, 2.0), light_right=(1, 0, 0),
        light_up=(0, 1, 0), half_extent=(0.5, 0.5), intensity=2.0))
    assert out[0].sum() > 0
    # point behind the light plane gets ~no diffuse (ndl clamps)
    p2 = np.array([[0.0, 0.0, 4.0]], np.float32)
    n2 = np.array([[0.0, 0.0, 1.0]], np.float32)
    out2 = np.asarray(rect_area_light(
        p2, n2, n2, light_center=(0, 0, 2.0), light_right=(1, 0, 0),
        light_up=(0, 1, 0), half_extent=(0.5, 0.5)))
    assert out2.sum() == pytest.approx(0.0, abs=1e-5)


# ---------------------------------------------------------------------------
# Scene surface


def test_scene_post_fx_surface():
    from forge3d_tpu.scene import Scene

    sc = Scene(96, 64, grid=33, colormap="viridis")
    y, x = np.mgrid[0:33, 0:33].astype(np.float32)
    sc.set_height_from_r32f((0.2 * np.sin(x * 0.4) * np.cos(y * 0.4)))
    sc.set_camera_look_at((2.0, 1.5, 2.0), (0, 0, 0), (0, 1, 0), 45, 0.1, 100)
    base = sc.render_rgba()

    sc.set_bloom_enabled(True)
    sc.set_vignette_enabled(True, 0.5)
    sc.set_dof_enabled(True)
    sc.set_dof_parameters(3.0, 1.0)
    out = sc.render_rgba()
    assert out.shape == base.shape
    assert not np.array_equal(out, base)
    # vignette darkens corners relative to base
    assert out[0, 0, :3].astype(int).sum() <= base[0, 0, :3].astype(int).sum()

    with pytest.raises(ValueError):
        sc.set_dof_parameters(-1, 1)
    with pytest.raises(ValueError):
        sc.set_oit_enabled(True, mode="alien")


def test_scene_ground_plane_water():
    from forge3d_tpu.scene import Scene

    sc = Scene(64, 48, grid=17)
    sc.set_height_from_r32f(np.full((17, 17), 0.3, np.float32))
    sc.set_camera_look_at((2.5, 1.2, 2.5), (0, 0.2, 0), (0, 1, 0), 50, 0.1, 100)
    base = sc.render_rgba()
    sc.set_ground_plane(True, height=-0.5)
    with_gp = sc.render_rgba()
    # ground plane fills some previously-background pixels
    bg_mask = np.all(base[..., :3] == base[0, 0, :3], axis=-1)
    changed = (with_gp[..., :3] != base[..., :3]).any(-1)
    assert (changed & bg_mask).sum() > 10

    sc.set_water_surface(True, height=0.36, opacity=0.9)
    with_water = sc.render_rgba()
    assert not np.array_equal(with_water, with_gp)


def test_scene_rect_area_light():
    from forge3d_tpu.scene import Scene

    sc = Scene(64, 48, grid=17)
    sc.set_height_from_r32f(np.zeros((17, 17), np.float32))
    sc.set_camera_look_at((1.5, 1.5, 1.5), (0, 0, 0), (0, 1, 0), 50, 0.1, 100)
    base = sc.render_rgba().astype(int)
    idx = sc.add_rect_area_light(center=(0, 1.0, 0), right=(1, 0, 0),
                                 up=(0, 0, 1), half_extent=(0.5, 0.5),
                                 intensity=4.0)
    assert idx == 0
    lit = sc.render_rgba().astype(int)
    assert lit[..., :3].sum() > base[..., :3].sum()
    sc.clear_rect_area_lights()
    np.testing.assert_array_equal(sc.render_rgba().astype(int), base)
