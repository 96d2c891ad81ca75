# MapScene recipe compiler, diagnostics, furniture.
import numpy as np
import pytest

import forge3d_tpu as f3d
from forge3d_tpu.diagnostics import Severity, ValidationReport
from forge3d_tpu.mapscene import (
    MapFurniture,
    MapScene,
    OrbitCamera,
    OutputSpec,
    RasterOverlayLayer,
    SceneRecipe,
    TerrainSource,
    VectorOverlayLayer,
    lighting_preset,
)


def dem(n=65):
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    return (10 * np.sin(x * 0.12) * np.cos(y * 0.1)).astype(np.float32)


def recipe(**kw):
    kw.setdefault("terrain", TerrainSource(dem=dem(), spacing=(10.0, 10.0)))
    kw.setdefault("output", OutputSpec(size_px=(96, 64)))
    return SceneRecipe(**kw)


class TestDiagnostics:
    def test_severity_and_blocking(self):
        rep = ValidationReport()
        rep.info("a", "info")
        rep.warning("b", "warn")
        assert rep.max_severity == Severity.WARNING
        assert rep.blocking("block_on_error") == []
        assert len(rep.blocking("block_on_warning")) == 1
        rep.error("c", "bad")
        with pytest.raises(f3d.RenderError):
            rep.raise_if_blocking()
        rep.raise_if_blocking("never_block")  # does not raise

    def test_as_dict(self):
        rep = ValidationReport()
        rep.error("x.y", "msg", subject="layers[0]")
        d = rep.as_dict()
        assert d["max_severity"] == "error"
        assert d["diagnostics"][0]["code"] == "x.y"


class TestValidation:
    def test_valid_recipe(self):
        rep = MapScene(recipe()).validate()
        assert rep.max_severity == Severity.INFO

    def test_missing_terrain_fatal(self):
        ms = MapScene(SceneRecipe(terrain=None))
        rep = ms.validate()
        assert rep.max_severity == Severity.FATAL
        with pytest.raises(f3d.RenderError):
            ms.render()

    def test_bad_layer_kind(self):
        r = recipe(layers=[VectorOverlayLayer("squiggles", [(0, 0)])])
        rep = MapScene(r).validate()
        assert any(d.code == "layer.kind" for d in rep)

    def test_bad_lighting_preset(self):
        rep = MapScene(recipe(lighting="disco")).validate()
        assert any(d.code == "lighting.preset" for d in rep)

    def test_dem_and_path_exclusive(self):
        r = SceneRecipe(terrain=TerrainSource(dem=dem(), path="x.tif"))
        rep = MapScene(r).validate()
        assert rep.max_severity == Severity.FATAL

    def test_lighting_presets_exist(self):
        for name in ("noon", "golden_hour", "overcast", "default"):
            assert lighting_preset(name).intensity > 0


class TestRender:
    def test_basic_render_and_png(self, tmp_path):
        p = tmp_path / "map.png"
        frame = MapScene(recipe()).render(p)
        assert frame.rgba.shape == (64, 96, 4)
        assert f3d.png_to_numpy(p).shape == (64, 96, 4)

    def test_geotiff_terrain_source(self, tmp_path):
        from forge3d_tpu import gis

        tif = tmp_path / "dem.tif"
        gis.write_raster(tif, dem(), transform=gis.transform_from_origin(0, 650, 10, 10),
                         crs="EPSG:32610")
        r = SceneRecipe(terrain=TerrainSource(path=str(tif)),
                        output=OutputSpec(size_px=(64, 48)))
        ms = MapScene(r)
        plan = ms.compile_plan()
        assert plan["crs"] == "EPSG:32610"
        assert plan["spacing"] == (10.0, 10.0)
        frame = ms.render()
        assert frame.rgba.shape == (48, 64, 4)

    def test_vector_overlay_changes_pixels(self):
        base = MapScene(recipe()).render()
        r = recipe(layers=[VectorOverlayLayer(
            "lines", [(50.0, 50.0), (600.0, 600.0)], color=(1, 0, 0), width=4.0)])
        with_line = MapScene(r).render()
        assert (base.rgba != with_line.rgba).any()

    def test_raster_overlay(self):
        ov = np.zeros((64, 96, 4), np.float32)
        ov[..., 0] = 1.0
        ov[..., 3] = 0.5
        r = recipe(layers=[RasterOverlayLayer(image=ov)])
        a = MapScene(recipe()).render()
        b = MapScene(r).render()
        assert b.rgba[..., 0].mean() > a.rgba[..., 0].mean()

    def test_furniture_render(self):
        r = recipe(furniture=MapFurniture(legend=True, scale_bar=True,
                                          north_arrow=True, title="T"))
        frame = MapScene(r).render()
        assert frame.rgba.shape == (64, 96, 4)

    def test_render_with_cache(self, tmp_path):
        r = recipe()
        ms = MapScene(r)
        a = ms.render(cache=str(tmp_path / "c"))
        b = MapScene(r).render(cache=str(tmp_path / "c"))
        np.testing.assert_array_equal(a.rgba, b.rgba)

    def test_certificate(self):
        cert = {}
        MapScene(recipe()).render(certificate=cert)
        assert "digest" in cert


class TestProjection:
    def test_projected_point_lands_at_target(self):
        """A point at the camera target projects to the image center."""
        r = recipe(output=OutputSpec(size_px=(100, 100)))
        ms = MapScene(r)
        plan = ms.compile_plan()
        tx, ty, tz = plan["target"]
        px = ms._project(plan, np.array([[tx, tz]]), height_offset=0.0)
        # target height == dem height at center * z_scale, so the projected
        # y may be slightly off center; x must be centered for phi=225
        assert abs(px[0, 0] - 49.5) < 3.0
        assert abs(px[0, 1] - 49.5) < 8.0


class TestFurnitureUnits:
    def test_nice_length(self):
        from forge3d_tpu.furniture import _nice_length

        assert _nice_length(700) == 500
        assert _nice_length(120) == 100
        assert _nice_length(2300) == 2000
        assert _nice_length(99) == 50

    def test_text_mask(self):
        from forge3d_tpu.furniture import _text_mask

        m = _text_mask("A")
        assert m.max() > 0.5 and m.ndim == 2

    def test_legend_draws(self):
        from forge3d_tpu.furniture import LegendSpec, draw_legend

        img = np.zeros((200, 120, 4), np.uint8)
        draw_legend(img, LegendSpec(vmin=0, vmax=100), x=20, y=20)
        assert img[..., :3].max() > 0

    def test_graticule_bounds_validation(self):
        from forge3d_tpu.furniture import GraticuleSpec, draw_graticule

        img = np.zeros((50, 50, 4), np.uint8)
        with pytest.raises(ValueError):
            draw_graticule(img, GraticuleSpec(), (10, 10, 5, 5))
