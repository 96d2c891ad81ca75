# GIS edge-case matrix (VERDICT r3 item 8): boundary behaviors of the
# raster/transform/classify helpers, mirroring the reference's GIS
# edge-case coverage (tests/test_gis*.py families).

import numpy as np
import pytest

from forge3d_tpu import gis


def _tf():
    # 0.5-degree pixels anchored at (-120, 50)
    return gis.transform_from_origin(-120.0, 50.0, 0.5, 0.5)


# ---- transform round-trips at boundaries ----------------------------------

def test_xy_rowcol_round_trip_center():
    tf = _tf()
    x, y = gis.xy(tf, 3, 7)
    r, c = gis.rowcol(tf, x, y)
    assert (r, c) == (3, 7)


def test_xy_corner_offset_differs_from_center():
    tf = _tf()
    cx, cy = gis.xy(tf, 0, 0, offset="center")
    ux, uy = gis.xy(tf, 0, 0, offset="ul")
    assert (ux, uy) == (-120.0, 50.0)
    assert cx == pytest.approx(-119.75) and cy == pytest.approx(49.75)


def test_rowcol_on_exact_pixel_edge_floors_into_the_pixel():
    tf = _tf()
    r, c = gis.rowcol(tf, -120.0 + 0.5, 50.0 - 0.5)
    assert (r, c) == (1, 1)


def test_window_from_bounds_clamps_to_raster():
    tf = _tf()
    win = gis.window_from_bounds(tf, (-125.0, 30.0, -100.0, 60.0), 10, 8)
    col0, row0, w, h = win
    assert col0 >= 0 and row0 >= 0
    assert col0 + w <= 10 and row0 + h <= 8


# ---- normalize / classify / nodata -----------------------------------------

def test_normalize_constant_raster_is_finite():
    out = gis.normalize_raster(np.full((4, 4), 7.0, np.float32))
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_normalize_with_nan_ignores_nan_for_range():
    data = np.array([[0.0, 5.0], [np.nan, 10.0]], np.float32)
    out = gis.normalize_raster(data)
    assert out[1, 1] == pytest.approx(1.0)
    assert out[0, 0] == pytest.approx(0.0)


def test_classify_raster_breaks_are_half_open():
    data = np.array([[0.0, 1.0, 2.0, 3.0]], np.float32)
    classes = gis.classify_raster(data, [1.0, 2.0])
    # values below the first break are class 0, on-break values promote
    assert classes[0, 0] == 0
    assert classes[0, 3] == 2


def test_apply_nodata_masks_exact_matches_only():
    data = np.array([[1.0, -9999.0], [2.0, -9998.9]], np.float32)
    out = gis.apply_nodata(data, -9999.0)
    assert np.isnan(out[0, 1])
    assert out[1, 1] == pytest.approx(-9998.9)


def test_mask_raster_fill_value():
    data = np.ones((2, 2), np.float32)
    mask = np.array([[True, False], [False, True]])
    out = gis.mask_raster(data, mask, fill=0.0)
    assert out[0, 1] == 0.0 and out[0, 0] == 1.0


# ---- resample boundary conditions ------------------------------------------

def test_resample_to_single_pixel():
    data = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = gis.resample_raster(data, (1, 1))
    assert out.shape == (1, 1)
    assert np.isfinite(out).all()


def test_resample_upsample_preserves_range():
    data = np.array([[0.0, 1.0], [2.0, 3.0]], np.float32)
    out = gis.resample_raster(data, (8, 8))
    assert out.shape == (8, 8)
    assert out.min() >= 0.0 - 1e-6 and out.max() <= 3.0 + 1e-6


# ---- rasterize_polygons edge behaviors -------------------------------------

def test_rasterize_degenerate_polygon_is_empty():
    out = gis.rasterize_polygons(
        [np.array([(1.0, 1.0), (1.0, 1.0), (1.0, 1.0)])], (8, 8))
    assert out.sum() == 0


def test_rasterize_out_of_bounds_polygon_is_clipped():
    out = gis.rasterize_polygons(
        [np.array([(100.0, 100.0), (110.0, 100.0), (110.0, 110.0)])],
        (8, 8))
    assert out.shape == (8, 8)
    assert out.sum() == 0


# ---- GeoTIFF round-trip edges ----------------------------------------------

def test_geotiff_roundtrip_preserves_float_dem(tmp_path):
    from forge3d_tpu.gis.geotiff import write_raster

    path = tmp_path / "edge.tif"
    dem = np.linspace(-10.0, 4000.0, 64, dtype=np.float32).reshape(8, 8)
    write_raster(str(path), dem)
    back = np.asarray(gis.read_raster(str(path)), np.float32)
    np.testing.assert_allclose(back, dem, rtol=1e-6)


def test_geotiff_info_reports_shape(tmp_path):
    from forge3d_tpu.gis.geotiff import write_raster

    path = tmp_path / "info.tif"
    write_raster(str(path), np.zeros((5, 9), np.float32))
    info = gis.read_raster_info(str(path))
    assert info["width"] == 9 and info["height"] == 5


def test_missing_raster_raises():
    with pytest.raises(Exception):
        gis.read_raster_info("/nonexistent/file.tif")
