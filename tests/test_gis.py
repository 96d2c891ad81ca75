# GIS layer: GeoTIFF read/write, windowed reads, transforms, raster math.
import numpy as np
import pytest

from forge3d_tpu import gis
from forge3d_tpu.errors import TransformFailed, UploadError


def make_dem(h=37, w=53, dtype=np.float32):
    rng = np.random.default_rng(5)
    return (rng.random((h, w)) * 100).astype(dtype)


class TestGeoTiffRoundtrip:
    @pytest.mark.parametrize("dtype", [np.float32, np.uint8, np.uint16, np.int16, np.float64])
    def test_roundtrip_dtypes(self, dtype, tmp_path):
        a = make_dem(dtype=dtype)
        p = tmp_path / "x.tif"
        gis.write_raster(p, a)
        back = gis.read_raster(p)
        np.testing.assert_array_equal(back, a)

    def test_roundtrip_uncompressed(self, tmp_path):
        a = make_dem()
        p = tmp_path / "u.tif"
        gis.write_raster(p, a, compress="none")
        np.testing.assert_array_equal(gis.read_raster(p), a)

    def test_rgb_roundtrip(self, tmp_path):
        a = np.random.default_rng(0).integers(0, 255, (20, 30, 3), dtype=np.uint8)
        p = tmp_path / "rgb.tif"
        gis.write_raster(p, a)
        np.testing.assert_array_equal(gis.read_raster(p), a)
        assert gis.read_raster(p, band=1).shape == (20, 30)

    def test_geo_tags(self, tmp_path):
        a = make_dem()
        tr = gis.transform_from_origin(-120.0, 48.0, 0.01, 0.01)
        p = tmp_path / "geo.tif"
        gis.write_raster(p, a, transform=tr, crs="EPSG:4326", nodata=-9999.0)
        info = gis.read_raster_info(p)
        assert info["crs"] == "EPSG:4326"
        assert info["nodata"] == -9999.0
        np.testing.assert_allclose(info["transform"], tr)
        minx, miny, maxx, maxy = info["bounds"]
        assert abs(minx - -120.0) < 1e-9 and abs(maxy - 48.0) < 1e-9

    def test_projected_crs(self, tmp_path):
        p = tmp_path / "p.tif"
        gis.write_raster(p, make_dem(), crs="EPSG:32610")
        assert gis.raster_crs(p) == "EPSG:32610"

    def test_windowed_read(self, tmp_path):
        a = make_dem(64, 80)
        p = tmp_path / "w.tif"
        gis.write_raster(p, a)
        win = (13, 7, 21, 40)
        got = gis.read_raster_window(p, win)
        np.testing.assert_array_equal(got, a[7:47, 13:34])

    def test_window_out_of_range(self, tmp_path):
        p = tmp_path / "w.tif"
        gis.write_raster(p, make_dem(10, 10))
        with pytest.raises(UploadError):
            gis.read_raster(p, window=(5, 5, 10, 10))

    def test_mask(self, tmp_path):
        a = make_dem()
        a[3:5, 3:5] = -9999.0
        p = tmp_path / "m.tif"
        gis.write_raster(p, a, nodata=-9999.0)
        mask = gis.read_raster_mask(p)
        assert not mask[3, 3] and mask[0, 0]

    def test_reads_pil_tiff(self, tmp_path):
        PIL = pytest.importorskip("PIL.Image")
        a = np.random.default_rng(1).integers(0, 255, (25, 33), np.uint8)
        p = tmp_path / "pil.tif"
        PIL.fromarray(a).save(p)
        np.testing.assert_array_equal(gis.read_raster(p), a)

    def test_pil_reads_ours(self, tmp_path):
        PIL = pytest.importorskip("PIL.Image")
        a = make_dem(16, 16, np.uint8)
        p = tmp_path / "ours.tif"
        gis.write_raster(p, a)
        got = np.asarray(PIL.open(p))
        np.testing.assert_array_equal(got, a)

    def test_not_a_tiff(self, tmp_path):
        p = tmp_path / "bad.tif"
        p.write_bytes(b"PNG nonsense here")
        with pytest.raises(UploadError):
            gis.read_raster(p)


class TestTransformHelpers:
    def test_xy_rowcol_inverse(self):
        tr = gis.transform_from_origin(100.0, 500.0, 2.0, 3.0)
        x, y = gis.xy(tr, 10, 20)
        r, c = gis.rowcol(tr, x, y)
        assert (int(r), int(c)) == (10, 20)

    def test_window_from_bounds(self):
        tr = gis.transform_from_origin(0.0, 100.0, 1.0, 1.0)
        win = gis.window_from_bounds(tr, (10, 60, 30, 90), 100, 100)
        assert win == (10, 10, 20, 30)

    def test_disjoint_bounds_raise(self):
        tr = gis.transform_from_origin(0.0, 100.0, 1.0, 1.0)
        with pytest.raises(TransformFailed):
            gis.window_from_bounds(tr, (500, 500, 600, 600), 100, 100)


class TestRasterMath:
    def test_normalize(self):
        a = np.array([[0.0, 5.0], [10.0, -9999.0]])
        out = gis.normalize_raster(a, nodata=-9999.0)
        np.testing.assert_allclose(out[0], [0.0, 0.5])
        assert np.isnan(out[1, 1])

    def test_classify(self):
        a = np.array([0.0, 10.0, 20.0, 35.0])
        cls = gis.classify_raster(a, [5.0, 15.0, 30.0])
        assert list(cls) == [0, 1, 2, 3]
        with pytest.raises(ValueError):
            gis.classify_raster(a, [30.0, 5.0])

    def test_resample_bilinear_and_nearest(self):
        a = np.array([[0.0, 1.0], [2.0, 3.0]])
        up = gis.resample_raster(a, (3, 3))
        assert up.shape == (3, 3)
        np.testing.assert_allclose(up[1, 1], 1.5)
        nn = gis.resample_raster(a, (4, 4), method="nearest")
        assert nn[0, 0] == 0.0 and nn[-1, -1] == 3.0

    def test_mask_and_nodata(self):
        a = make_dem(8, 8)
        m = np.zeros((8, 8), bool)
        m[:4] = True
        out = gis.mask_raster(a, m)
        assert np.isnan(out[5, 0]) and not np.isnan(out[0, 0])
        b = gis.apply_nodata(np.array([[1.0, -5.0]]), -5.0)
        assert np.isnan(b[0, 1])

    def test_rasterize_polygons(self):
        sq = [(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0)]
        grid = gis.rasterize_polygons([sq], (10, 10))
        assert grid[5, 5] == 1
        assert grid[0, 0] == 0
        assert grid.sum() == 36  # 6x6 interior pixels

    def test_rasterize_with_transform_and_values(self):
        tr = gis.transform_from_origin(0.0, 10.0, 1.0, 1.0)
        sq = [(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0)]  # world coords
        grid = gis.rasterize_polygons([sq], (10, 10), transform=tr, values=[7])
        assert grid.max() == 7
        assert grid.sum() == 7 * 36
