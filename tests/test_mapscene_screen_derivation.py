# Value-level pins for the derived recipe-screen parameter chain
# (forge3d_tpu/mapscene_screen.py; reference map_scene.py:1160-1262,
# 4383-4454).  These are the numbers the recipe goldens bake — any
# drift here silently un-derives the parity board.

import numpy as np
import pytest

from forge3d_tpu import mapscene_screen as mss


REF_META = {"source_id": "recipe-dem", "width": 8, "height": 8,
            "asset_status": "fixture",
            "bounds": (-122.5, 46.6, -121.9, 47.0)}


class _Cam:
    radius = 800.0
    phi_deg = 35.0
    theta_deg = 45.0
    fov_y_deg = 45.0


def _ramp(size=8):
    x = np.linspace(0.0, 1.0, size, dtype=np.float32)
    xx, yy = np.meshgrid(x, x)
    return (0.25 * xx + 0.75 * yy).astype(np.float32)


def test_metadata_resolution_from_bounds():
    # map_scene.py:4448-4453: bounds span / grid size
    rx, ry = mss.metadata_resolution(REF_META)
    assert rx == pytest.approx(0.6 / 8)
    assert ry == pytest.approx(0.4 / 8)


def test_scene_diagonal_uses_bounds_resolution():
    # the fixture diagonal is 0.6 — NOT the 8-texel array size
    d = mss.terrain_scene_diagonal(_ramp(), (1.0, 1.0), REF_META)
    assert d == pytest.approx(0.6)
    # without metadata the array size wins (map_scene.py:550-554)
    assert mss.terrain_scene_diagonal(_ramp(), (1.0, 1.0), None) == 8.0


def test_rainier_preset_resolution_values():
    lit = mss.resolve_recipe_lighting(
        mss.LightingPreset("rainier_showcase", intensity=1.15),
        _ramp(), (1.0, 1.0), REF_META, _Cam())
    assert lit["preset"] == "rainier_showcase"
    # sun from direction (0.64, 0.42, -0.64): az 135, el asin(0.42/|d|)
    assert lit["sun_azimuth_deg"] == pytest.approx(135.0)
    assert lit["sun_elevation_deg"] == pytest.approx(24.8934, abs=1e-3)
    # LightingPreset.intensity wins over the preset sun intensity
    # (map_scene.py:4330-4336)
    assert lit["sun_intensity"] == 1.15
    assert lit["ibl_intensity"] == 0.3
    assert lit["exaggeration"] == 1.35
    assert lit["albedo_mode"] == "mix"
    assert lit["colormap_strength"] == 0.5
    # preset camera: radius_scale 2.4 * diagonal 0.6 = 1.44
    assert lit["cam"]["radius"] == pytest.approx(1.44)
    assert lit["cam"]["phi_deg"] == 135.0
    assert lit["cam"]["theta_deg"] == 45.0
    assert lit["cam"]["fov_y_deg"] == 55.0


def test_falsy_settings_collapse_like_the_reference():
    # map_scene.py:1225-1227 uses `or`: colormap_strength 0.0 -> 0.5
    lit = mss.resolve_recipe_lighting(
        mss.LightingPreset("rainier_showcase", intensity=1.15,
                           settings={"albedo_mode": "material",
                                     "colormap_strength": 0.0,
                                     "exaggeration": 1.35}),
        _ramp(), (1.0, 1.0), REF_META, _Cam())
    assert lit["albedo_mode"] == "material"
    assert lit["colormap_strength"] == 0.5      # 0.0 collapses
    assert lit["exaggeration"] == 1.35


def test_outdoor_sun_falls_back_but_keeps_the_scatter_camera():
    lit = mss.resolve_recipe_lighting(
        mss.LightingPreset("outdoor_sun", intensity=1.1),
        _ramp(), (1.0, 1.0), REF_META, _Cam())
    assert lit["preset"] is None                 # no-preset base path
    assert lit["sun_azimuth_deg"] == 135.0       # default sun
    assert lit["sun_elevation_deg"] == 35.0
    assert lit["sun_intensity"] == 1.1
    assert lit["cam"]["radius"] == pytest.approx(1.44)


def test_derive_screen_params_span_floor_and_encode():
    class Rec:
        class terrain:
            dem = _ramp()
            spacing = (1.0, 1.0)
            metadata = REF_META
        camera = _Cam()
        lighting = mss.LightingPreset("rainier_showcase", intensity=1.15)

        class output:
            size_px = (96, 64)
            samples = 1
    d = mss.derive_screen_params(Rec, _ramp())
    assert d["kw"]["terrain_span"] == 1.0        # max(1.0, 0.6)
    assert d["kw"]["cam_radius"] == pytest.approx(1.44)
    assert d["kw"]["z_scale"] == 1.35
    assert d["kw"]["pom"]["enabled"] and d["kw"]["pom"]["height_scale"] == 0.04
    assert d["kw"]["generation"] == "recipe"


def test_water_mask_derivation_matches_reference_auto_mask():
    dem = np.ones((8, 8), np.float32)
    dem[2:6, 2:6] = 0.0

    class Rec:
        water_mask = None
        water_level = None

        class terrain:
            metadata = {"water": {"enabled": True, "auto_mask": True,
                                  "level": 0.1, "slope_threshold": 1.0}}
        lighting = "default"
    wm = mss.derive_water_mask_for_recipe(Rec, dem)
    # floor cells below level with slope <= 1 (reference gis.py:73-93)
    assert wm is not None
    assert wm[3, 3] == 1.0 and wm[0, 0] == 0.0


def test_cloud_shadow_formula_is_deterministic_and_darkening():
    rgba = np.full((40, 60, 4), 200, np.uint8)

    class Rec:
        clouds = {"enabled": True, "shadows_enabled": True,
                  "coverage": 0.72, "density": 0.48,
                  "shadow_strength": 0.38, "quality": "high"}

        class terrain:
            metadata = {}
    a = mss.apply_cloud_shadow(rgba, Rec)
    b = mss.apply_cloud_shadow(rgba, Rec)
    assert np.array_equal(a, b)
    assert (a[..., :3] <= rgba[..., :3]).all()
    assert a[..., :3].min() < 200
