# Unit tests for the behavior-exact screen-mode replica
# (forge3d_tpu/terrain/screen_golden.py). Each test pins one of the
# reference quirks the terrain golden family bakes in, so refactors can't
# silently drop them (the family parity board only ratchets whole-image
# SSIM).

import numpy as np
import pytest

from forge3d_tpu.terrain import screen_golden as sg


def test_hue_variation_uses_period1_triangle():
    """The reference's HSV x term is c*(1-|fract(h6)*2-1|)
    (terrain_pbr_pom.wgsl:2526), NOT the standard mod(h6,2) ramp: for a
    tan albedo (h6 ~ 0.66 pre-shift) the quirk roughly halves green."""
    tan = np.full((4, 4, 3), 0.0, np.float32)
    tan[:] = [0.72, 0.67, 0.53]
    out = sg._apply_slope_hue_variation(tan, np.float32(1.0),
                                        np.full((4, 4), 0.9, np.float32),
                                        0.08)
    # standard HSV with this hue shift would keep g within ~10% of r;
    # the period-1 quirk drops green well below that
    assert out[0, 0, 1] < 0.93 * out[0, 0, 0]
    # value (max channel) and the gray guard are preserved
    assert np.isclose(out[0, 0].max(), 0.72, atol=1e-5)
    gray = np.full((2, 2, 3), 0.5, np.float32)
    assert np.allclose(sg._apply_slope_hue_variation(
        gray, 1.0, np.full((2, 2), 0.5, np.float32), 0.08), gray)


def test_material_layer_weights_screen_mode_semantics():
    """Screen mode base_normal is (0,0,1): slope=0 => rock weight 0, snow
    slope factor 1, wetness = slope_influence; snow altitude ramps on the
    PLANAR world z."""
    mats = dict(sg.default_material_layers())
    mats.update(snow_enabled=True, snow_altitude_min=0.5,
                snow_altitude_blend=0.5, rock_enabled=True,
                wetness_enabled=True, wetness_slope_influence=0.45)
    alt = np.array([[0.0, 0.5], [0.75, 1.0]], np.float32)
    snow, rock, wet = sg._material_layer_weights(mats, alt)
    assert np.allclose(snow, [[0.0, 0.0], [0.5, 1.0]])
    assert float(rock) == 0.0
    assert float(wet) == pytest.approx(0.45)


def test_material_base_colors_are_srgb_decoded():
    """Missing texture files fall back to solid base-color Rgba8UnormSrgb
    fills (material_set/gpu_helpers.rs:40-60, gpu.rs:193): sampling
    returns srgb_to_linear(round(c*255)/255)."""
    rock = sg._MATERIAL_LINEAR[0]
    u8 = round(0.28 * 255.0) / 255.0
    assert rock[0] == pytest.approx(((u8 + 0.055) / 1.055) ** 2.4, rel=1e-5)
    snow = sg._MATERIAL_LINEAR[3]
    assert snow[2] == pytest.approx(1.0)


def test_pom_march_compares_layer_against_raw_height():
    """The POM loop stops when the accumulated layer exceeds the RAW
    height sample (no depth inversion) and marches along -parallax_dir
    (terrain_pbr_pom.wgsl:2692-2701): a flat h=1 field stops the march
    after one step regardless of direction."""
    hm = np.ones((8, 8), np.float32)
    u = np.full((2, 2), 0.5, np.float32)
    v = np.full((2, 2), 0.5, np.float32)
    n = np.zeros((2, 2, 3), np.float32)
    n[..., 1] = 0.8
    n[..., 0] = 0.6
    view = np.zeros((2, 2, 3), np.float32)
    view[..., 2] = 1.0
    pu, pv, layer, crossed = sg._pom_uv(
        hm, u, v, n, view, scale=0.05, min_steps=4, max_steps=8,
        refine_steps=0)
    # flat h=1: layer (starting at 0) < height until the step budget;
    # marches the full interpolated step count
    assert np.all(np.abs(pu - u) <= 0.05 + 1e-6)
    # step budget exhausted at layer 1.0 >= h=1.0: counts as a crossing
    assert np.all(layer <= 1.0 + 1e-6)
    # zero-height field: first check exits immediately (layer >= height)
    hm0 = np.zeros((8, 8), np.float32)
    pu0, pv0, layer0, crossed0 = sg._pom_uv(
        hm0, u, v, n, view, scale=0.05, min_steps=4, max_steps=8,
        refine_steps=0)
    assert np.allclose(pu0, u) and np.allclose(pv0, v)
    assert np.all(crossed0) and np.allclose(layer0, 0.0)


def test_shadow_pass_heights_are_domain_normalized():
    """terrain_shadow_depth rasterizes NORMALIZED heights * z_scale
    (world_z = h_curved * h_exag), so the depth map is invariant under a
    domain rescale of the DEM."""
    hm = sg.family_heightmap(48)
    ldir = sg.light_direction(135.0, 24.0)
    d1, lvp1, t1 = sg.build_shadow_map(hm, terrain_span=2.8, z_scale=1.45,
                                       sun_dir=-ldir, resolution=256,
                                       grid_res=96)
    d2, lvp2, t2 = sg.build_shadow_map(hm * 250.0 + 1000.0,
                                       terrain_span=2.8, z_scale=1.45,
                                       sun_dir=-ldir, resolution=256,
                                       grid_res=96,
                                       domain=(1000.0, 1250.0))
    assert np.allclose(d1, d2, atol=1e-5)
    assert np.allclose(lvp1, lvp2)


def test_sobel_normals_use_domain_units():
    """The LOD-aware Sobel samples h_disp in DOMAIN units with a fixed
    vertical scale of z_scale/2 (terrain_pbr_pom.wgsl:1742-1775), so a
    domain rescale steepens the shading normals — a reference behavior
    (NOT a normalized-gradient hillshade)."""
    hm = sg.family_heightmap(48)
    lut = sg.build_lut_from_stops(sg.FAMILY_STOPS)
    a = sg.render_screen_scene(hm, lut, size_px=(48, 32))
    b = sg.render_screen_scene(hm * 250.0 + 1000.0, lut, size_px=(48, 32),
                               domain=(1000.0, 1250.0))
    assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() > 4


def test_planar_reflection_camera_quirk():
    """compute_mirrored_view_matrix composes the reflect matrix through
    glam's column-major array storage (uniforms.rs:64-87): at
    plane_height 0 the in-shader camera re-extraction from the mirrored
    view returns the UNCHANGED camera — the reflection texture is a
    re-render of the same scene, and the mirroring happens only in the
    reflection_view_proj uv projection. Pin that quirk."""
    eye = sg.orbit_eye(4.3, 142.0, 42.0)
    view = sg.look_at_rh(eye, (0, 0, 0), (0, 1, 0))
    view_arr = np.asarray(view, np.float32).T
    reflect_arr = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                            [0, 0, -1, 0.0], [0, 0, 0, 1]], np.float32)
    m = view_arr @ reflect_arr
    cam2 = -np.array([
        m[0, 0] * m[3, 0] + m[0, 1] * m[3, 1] + m[0, 2] * m[3, 2],
        m[1, 0] * m[3, 0] + m[1, 1] * m[3, 1] + m[1, 2] * m[3, 2],
        m[2, 0] * m[3, 0] + m[2, 1] * m[3, 1] + m[2, 2] * m[3, 2]])
    assert np.allclose(cam2, eye, atol=1e-4)


def test_render_family_scene_names():
    assert set(sg.FAMILY_SCENES) >= {
        "terrain_pbr", "terrain_water", "terrain_atmosphere",
        "terrain_low_sun_sky", "terrain_pom", "terrain_water_reflection",
        "terrain_tv10_zero_sss", "terrain_tv10_scene_a_sss",
        "terrain_tv10_scene_b_sss"}


def test_blit_resolve_identity_and_bilinear():
    img = np.zeros((4, 4, 4), np.uint8)
    img[..., :3] = 100
    img[..., 3] = 255
    out = sg._blit_resolve(img, 2, 2)
    assert out.shape == (2, 2, 4)
    assert np.all(out[..., :3] == 100)
    # gradient halves correctly
    img2 = np.zeros((2, 2, 4), np.uint8)
    img2[..., :3] = np.array([[0, 200], [0, 200]], np.uint8)[..., None]
    out2 = sg._blit_resolve(img2, 1, 1)
    assert abs(int(out2[0, 0, 0]) - 100) <= 1


def test_tv10_sss_zero_strength_is_noop():
    """zero_sss materials must produce the identical image to the same
    scene with no subsurface strengths (apply_subsurface_layer early-outs
    at strength<=0; evaluate returns 0)."""
    hm = sg.tv10_heightmap(32)
    lut = sg.build_lut_from_stops(sg.TV10_STOPS)
    base = dict(size_px=(48, 32), terrain_span=2.9, albedo_mode="mix",
                colormap_strength=0.25,
                hdr_rgb=sg.decode_test_hdr(blue=180))
    a = sg.render_screen_scene(hm, lut, materials=dict(sg._TV10_COMMON_MATS),
                               **base)
    mats0 = dict(sg._TV10_SSS_MATS)
    mats0.update(snow_subsurface_strength=0.0, rock_subsurface_strength=0.0,
                 wetness_subsurface_strength=0.0)
    b = sg.render_screen_scene(hm, lut, materials=mats0, **base)
    assert np.array_equal(a, b)
