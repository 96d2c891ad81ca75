# Screen-mode effect paths added for reference-golden parity: cloud
# shadows, SSR water band, base filters, material albedo, placeholders,
# mesh camera mode.

import numpy as np

from forge3d_tpu.mapscene import (MapScene, MapFurniture, OrbitCamera,
                                  OutputSpec, RasterOverlayLayer,
                                  SceneRecipe, TerrainSource,
                                  layer_hash_int, layer_hash_rgb)


def _recipe(**kw):
    dem = kw.pop("dem", None)
    if dem is None:
        x = np.linspace(0, 1, 8, dtype=np.float32)
        xx, yy = np.meshgrid(x, x)
        dem = (0.25 * xx + 0.75 * yy).astype(np.float32)
    rec = SceneRecipe(
        terrain=TerrainSource(dem=dem, spacing=(1.0, 1.0), z_scale=1.0),
        camera=OrbitCamera(phi_deg=35.0, theta_deg=45.0, fov_y_deg=45.0),
        colormap="viridis",
        output=OutputSpec(size_px=kw.pop("size", (64, 48))),
        camera_mode=kw.pop("camera_mode", "screen"),
    )
    for k, v in kw.items():
        setattr(rec, k, v)
    return rec


def test_cloud_shadows_darken_deterministically():
    plain = MapScene(_recipe()).render().rgba
    cl = {"enabled": True, "shadows_enabled": True, "coverage": 0.7,
          "density": 0.5, "shadow_strength": 0.4, "quality": "high"}
    shadowed = MapScene(_recipe(clouds=cl)).render().rgba
    again = MapScene(_recipe(clouds=cl)).render().rgba
    assert np.array_equal(shadowed, again)          # deterministic field
    assert shadowed[..., :3].sum() < plain[..., :3].sum()
    assert (shadowed[..., :3] <= plain[..., :3]).all()  # only darkens


def test_ssr_band_paints_below_waterline():
    dem = np.ones((8, 8), np.float32)
    dem[2:6, 2:6] = 0.0
    base = MapScene(_recipe(dem=dem.copy(), water_level=0.1,
                            albedo_mode="material")).render().rgba
    ssr = MapScene(_recipe(dem=dem.copy(), water_level=0.1,
                           albedo_mode="material",
                           ssr_intensity=0.85)).render().rgba
    diff = np.abs(ssr[..., :3].astype(int) - base[..., :3].astype(int))
    rows_changed = np.nonzero(diff.sum(axis=(1, 2)))[0]
    assert rows_changed.size > 0
    # the flip+fresnel reflection (reference _apply_mapscene_screen_space)
    # only blends where the water mask is set, and the fresnel ramp makes
    # lower rows change more than upper rows
    water_rows = np.nonzero(
        (base[..., 2] > base[..., 0] + 40).any(axis=1))[0]
    assert rows_changed.min() >= water_rows.min()
    per_row = diff.sum(axis=(1, 2)).astype(float)
    lo_half = per_row[water_rows.min():].reshape(-1)
    assert lo_half[-len(lo_half) // 3:].mean() >= lo_half[:len(lo_half) // 3].mean()


def test_material_albedo_mode_changes_base():
    """albedo_mode "material" flows through the preset settings
    (reference lighting_settings["albedo_mode"]; map_scene.py:1225)."""
    from forge3d_tpu.mapscene import LightingPreset

    mix = MapScene(_recipe(
        lighting=LightingPreset("rainier_showcase", intensity=1.15),
    )).render().rgba
    mat = MapScene(_recipe(
        lighting=LightingPreset("rainier_showcase", intensity=1.15,
                                settings={"albedo_mode": "material"}),
    )).render().rgba
    assert not np.array_equal(mix, mat)
    # material albedo drops the colormap's green dominance
    assert mat[..., 1].astype(int).mean() < mix[..., 1].astype(int).mean()


def test_raster_placeholder_matches_reference_hash_semantics():
    layer = RasterOverlayLayer(layer_id="ortho", path="missing/file.tif",
                               crs="EPSG:32610", opacity=0.72,
                               metadata={"source_id": "x"})
    color = layer_hash_rgb(layer.to_dict(), salt="raster")
    phase = layer_hash_int(layer.to_dict(), salt="raster-mask") % 5
    rec = _recipe(size=(40, 30))
    base = MapScene(rec).render().rgba
    rec2 = _recipe(size=(40, 30))
    rec2.layers = [layer]
    out = MapScene(rec2).render().rgba
    yy, xx = np.mgrid[0:30, 0:40]
    mask = ((xx + yy + phase) % 5) < 3
    a = 0.72 * 0.45
    expect = (base[..., :3].astype(np.float32) * (1 - a)
              + np.asarray(color, np.float32) * a).astype(np.uint8)
    assert np.array_equal(out[..., :3][mask], expect[mask])
    assert np.array_equal(out[..., :3][~mask], base[..., :3][~mask])


def test_screen_rect_composites_into_subrect_only():
    tex = np.full((4, 4, 4), 255, np.uint8)
    tex[..., 1] = 0
    rec = _recipe(size=(64, 48))
    base = MapScene(rec).render().rgba
    rec2 = _recipe(size=(64, 48))
    rec2.layers = [RasterOverlayLayer(image=tex,
                                      screen_rect=(0.25, 0.25, 0.75,
                                                   0.75))]
    out = MapScene(rec2).render().rgba
    assert np.array_equal(out[0, 0], base[0, 0])     # outside untouched
    # inside: red texture through the landmark contract's 1.08 -> 0.78
    # vertical shade ramp (center row ~= 0.93)
    assert 200 <= out[24, 32, 0] <= 255 and out[24, 32, 1] == 0


def test_mesh_camera_mode_renders_terrain_against_black_sky():
    rec = _recipe(camera_mode="mesh", size=(64, 48))
    rec.mesh_camera = dict(phi_deg=135.0, theta_deg=70.0, radius=14.0,
                           z_scale=4.0, target=(3.5, 0.0, 3.5),
                           fov_y_deg=45.0)
    rgba = MapScene(rec).render().rgba
    assert rgba.shape == (48, 64, 4)
    lum = rgba[..., :3].sum(-1)
    assert (lum == 0).any()          # sky
    assert (lum > 60).any()          # lit terrain


def test_reference_furniture_layout_composes():
    rec = _recipe(size=(128, 88))
    rec.furniture = MapFurniture(
        title="T",
        legend_cfg={"items": [{"label": "A", "color": "#123456"}]},
        scale_bar_cfg={"units": "km",
                       "bounds": (-122.5, 46.6, -121.9, 47.0)},
        north_arrow_cfg={"size": 24},
        graticule_cfg={"bounds": (-122.5, 46.6, -121.9, 47.0),
                       "interval_deg": 0.2})
    out = MapScene(rec).render().rgba
    plain = MapScene(_recipe(size=(128, 88))).render().rgba
    assert not np.array_equal(out, plain)
    # legend panel blends white bottom-right region
    assert out[70, 100, :3].astype(int).sum() > \
        plain[70, 100, :3].astype(int).sum()
