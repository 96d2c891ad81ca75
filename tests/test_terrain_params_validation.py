# Terrain-params validation matrix (VERDICT r3 item 8): the negative
# paths the reference's params layer rejects, mirrored against our
# settings classes (reference terrain_params.py __post_init__ /
# validate_for_terrain semantics).

import numpy as np
import pytest

from forge3d_tpu.terrain.params import (CloudSettings, PomSettings,
                                        ShadowSettings, SkySettings,
                                        make_terrain_params)


# ---- make_terrain_params core ranges -------------------------------------

@pytest.mark.parametrize("kw,msg", [
    (dict(size_px=(0, 64)), "size_px"),
    (dict(size_px=(64, -1)), "size_px"),
    (dict(render_scale=0.05), "render_scale"),
    (dict(render_scale=8.0), "render_scale"),
    (dict(msaa_samples=3), "msaa"),
    (dict(z_scale=0.0), "z_scale"),
    (dict(z_scale=-2.0), "z_scale"),
    (dict(cam_radius=0.0), "cam_radius"),
    (dict(fov_y_deg=0.0), "fov"),
    (dict(fov_y_deg=180.0), "fov"),
    (dict(clip=(1.0, 0.5)), "clip"),
    (dict(clip=(0.0, 10.0)), "clip"),
    (dict(sampling=dict(aa_samples=0)), "aa_samples"),
    (dict(sampling=dict(aa_samples=512)), "aa_samples"),
])
def test_make_terrain_params_rejects(kw, msg):
    with pytest.raises(ValueError, match=msg):
        make_terrain_params(**kw)


def test_make_terrain_params_accepts_valid_edge_values():
    p = make_terrain_params(size_px=(1, 1), render_scale=0.1,
                            msaa_samples=16, z_scale=1e-3,
                            fov_y_deg=179.0, clip=(1e-4, 1e6),
                            sampling=dict(aa_samples=256))
    assert p.size_px == (1, 1)


# ---- PomSettings (reference terrain_params.py:1760-1773) ------------------

@pytest.mark.parametrize("kw", [
    dict(scale=-0.01),
    dict(steps=0),
    dict(min_steps=-1),
    dict(min_steps=8, max_steps=4),
    dict(refine_steps=-1),
])
def test_pom_settings_rejects(kw):
    with pytest.raises(ValueError):
        PomSettings(enabled=True, **kw)


def test_pom_settings_legacy_steps_drive_min_max():
    cfg = PomSettings(enabled=True, scale=0.04, steps=40).to_screen_cfg()
    assert cfg["max_steps"] == 40 and cfg["min_steps"] == 10


# ---- ShadowSettings --------------------------------------------------------

@pytest.mark.parametrize("kw", [
    dict(technique="volumetric"),
    dict(softness=-0.1),
    dict(samples=0),
    dict(bias=0.0),
])
def test_shadow_settings_rejects(kw):
    with pytest.raises(ValueError):
        ShadowSettings(**kw)


@pytest.mark.parametrize("tech", ["raytrace", "hard", "pcf", "pcss",
                                  "vsm", "evsm", "msm", "csm"])
def test_shadow_settings_accepts_reference_techniques(tech):
    assert ShadowSettings(technique=tech).technique == tech


# ---- SkySettings -----------------------------------------------------------

@pytest.mark.parametrize("kw", [
    dict(model="rayleigh"),
    dict(turbidity=0.5),
    dict(turbidity=11.0),
    dict(ground_albedo=-0.1),
    dict(ground_albedo=1.5),
])
def test_sky_settings_rejects(kw):
    with pytest.raises(ValueError):
        SkySettings(enabled=True, **kw)


def test_sky_settings_reference_models_accepted():
    for model in ("hosek-wilkie", "preetham", "approximate"):
        assert SkySettings(model=model).model == model


# ---- MapScene recipe validation (reference test_mapscene_validation.py) ---

def _recipe(**kw):
    from forge3d_tpu.mapscene import (MapScene, OrbitCamera, OutputSpec,
                                      SceneRecipe, TerrainSource)

    dem = kw.pop("dem", np.linspace(0, 1, 64,
                                    dtype=np.float32).reshape(8, 8))
    rec = SceneRecipe(
        terrain=TerrainSource(dem=dem, spacing=(1.0, 1.0), z_scale=1.0),
        camera=OrbitCamera(),
        output=OutputSpec(size_px=kw.pop("size", (32, 24))),
        camera_mode=kw.pop("camera_mode", "screen"))
    for k, v in kw.items():
        setattr(rec, k, v)
    return MapScene(rec)


def test_validate_flags_missing_terrain():
    from forge3d_tpu.mapscene import MapScene, SceneRecipe

    rep = MapScene(SceneRecipe(terrain=None)).validate()
    assert rep.blocking()


def test_validate_flags_bad_output_size():
    rep = _recipe(size=(0, 10)).validate()
    assert any("output" in d.code for d in rep.diagnostics)


def test_validate_unknown_lighting_preset_is_reported():
    rep = _recipe(lighting="sunset_gold").validate()
    assert any(d.code == "lighting.preset" for d in rep.diagnostics)


def test_validate_reference_presets_pass():
    for name in ("rainier_showcase", "outdoor_sun", "studio_pbr"):
        rep = _recipe(lighting=name).validate()
        assert not any(d.code == "lighting.preset"
                       for d in rep.diagnostics)


def test_validate_unknown_vector_kind_rejected():
    from forge3d_tpu.mapscene import VectorOverlayLayer

    rep = _recipe(layers=[VectorOverlayLayer(
        kind="splines", coordinates=np.zeros((2, 2)))]).validate()
    assert any(d.code == "layer.kind" for d in rep.diagnostics)


def test_nan_dem_is_rejected_at_render():
    dem = np.full((8, 8), np.nan, np.float32)
    scene = _recipe(dem=dem)
    rep = scene.validate()
    assert rep.blocking() or any("terrain" in d.code
                                 for d in rep.diagnostics)
