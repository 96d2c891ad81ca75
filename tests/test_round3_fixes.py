# Regression tests for the round-2 advisor findings (ADVICE.md r2).

import numpy as np

import pytest


def test_vector_oit_and_pick_demo_invokes():
    # ADVICE r2 medium: the demo raised KeyError because it looked up a
    # _TABLE name in _WRAPPERS. Invoke it for real.
    from forge3d_tpu import _reference_api as api

    out = api.resolve("vector_oit_and_pick_demo")(width=48, height=32)
    assert out["rgba"].shape == (32, 48, 4)
    assert out["pick"].shape == (32, 48)


def test_height_tile_loader_retries_failed_tiles():
    # ADVICE r2 medium: failed loads were cached as fill tiles and never
    # retried. A source that fails once must be re-consulted next request.
    from forge3d_tpu.terrain.streaming import HeightTileLoader

    calls = {"n": 0}

    def source(tx, tz, lod):
        calls["n"] += 1
        if calls["n"] == 1:
            raise IOError("transient")
        return np.full((16, 16), 7.0, np.float32)

    loader = HeightTileLoader(tile_source=source, tile_px=16,
                              fill_value=-1.0)
    first = loader.request((0, 0, 0)).result(timeout=10)
    assert float(first.max()) == -1.0  # fill tile on failure
    second = loader.request((0, 0, 0)).result(timeout=10)
    assert float(second.min()) == 7.0  # retried, real data
    assert calls["n"] == 2


def test_raster_overlay_path_normalizes_non_uint8(tmp_path):
    # ADVICE r2 low: DEM-valued GeoTIFF overlays saturated to white.
    from forge3d_tpu.gis.geotiff import write_raster
    from forge3d_tpu.mapscene import (MapScene, OrbitCamera, OutputSpec,
                                      RasterOverlayLayer, SceneRecipe,
                                      TerrainSource)

    dem_path = tmp_path / "heights.tif"
    heights = np.linspace(100.0, 900.0, 64, np.float32).reshape(8, 8)
    write_raster(str(dem_path), heights)
    rec = SceneRecipe(
        terrain=TerrainSource(dem=np.zeros((8, 8), np.float32),
                              spacing=(1.0, 1.0), z_scale=1.0),
        camera=OrbitCamera(phi_deg=35.0, theta_deg=45.0, fov_y_deg=45.0),
        output=OutputSpec(size_px=(48, 32)),
        layers=[RasterOverlayLayer(layer_id="dem", path=str(dem_path),
                                   opacity=1.0)],
        camera_mode="screen",
    )
    frame = MapScene(rec).render()
    gray = frame.rgba[..., :3].astype(np.float32) / 255.0
    # normalized overlay must span tones, not clip to white
    assert gray.max() <= 1.0
    assert gray.min() < 0.65, "overlay saturated (normalization missing)"


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_last_consumed_settings_reports_groups():
    # VERDICT r2 item 7: every render reports which param groups reached
    # the shader; enabled-but-unwired groups are surfaced as ignored.
    from forge3d_tpu.terrain.params import (FogSettings,
                                            SunVisibilitySettings,
                                            make_terrain_params)
    from forge3d_tpu.terrain.renderer import TerrainRenderer

    hm = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
    p = make_terrain_params()
    p.size_px = (32, 24)
    p.fog = FogSettings(enabled=True)
    p.sun_visibility = SunVisibilitySettings(enabled=True)
    r = TerrainRenderer()
    r.render_terrain_pbr_pom(params=p, heightmap=hm)
    assert "fog" in r.last_consumed_settings
    assert "light" in r.last_consumed_settings
    assert "sun_visibility" in r.last_ignored_settings, (
        "enabling an unwired group must be reported, not silently dropped")


def test_bigtiff_reader_roundtrip(tmp_path):
    # BigTIFF (magic 43, 8-byte offsets, 20-byte IFD entries) was
    # fail-closed in round 2; real-world COG DEMs commonly use it.
    import struct

    from forge3d_tpu.gis.geotiff import raster_info, read_raster

    arr = (np.arange(48, dtype=np.float32).reshape(6, 8) * 1.5 + 100)
    data = arr.astype("<f4").tobytes()
    ifd_off = 16 + len(data)
    out = bytearray()
    out += b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd_off)
    out += data
    tags = [(256, 3, 1, 8), (257, 3, 1, 6), (258, 3, 1, 32),
            (259, 3, 1, 1), (262, 3, 1, 1), (273, 16, 1, 16),
            (277, 3, 1, 1), (278, 3, 1, 6), (279, 16, 1, len(data)),
            (339, 3, 1, 3)]
    out += struct.pack("<Q", len(tags))
    for tag, typ, cnt, val in tags:
        out += struct.pack("<HHQQ", tag, typ, cnt, val)
    out += struct.pack("<Q", 0)
    p = tmp_path / "big.tif"
    p.write_bytes(bytes(out))
    info = raster_info(str(p))
    assert (info.width, info.height) == (8, 6)
    got = read_raster(str(p))
    assert np.allclose(got, arr)


def test_colormap_providers():
    # VERDICT r2 missing item: external colormap provider ecosystem.
    from forge3d_tpu import colormaps

    lut = colormaps.get_lut("matplotlib:viridis")
    assert lut.shape == (256, 3) and 0.0 <= lut.min() and lut.max() <= 1.0
    lut2 = colormaps.get_lut("mpl:terrain")
    assert lut2.shape == (256, 3)
    # absent optional packages fail with a clear KeyError, not ImportError
    with pytest.raises(KeyError):
        colormaps.get_lut("cmocean:thermal")
    with pytest.raises(KeyError):
        colormaps.get_lut("nosuchprovider:xyz")
