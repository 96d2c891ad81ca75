# MENSURA CRS engine: projections against published reference values.
import math

import numpy as np
import pytest

from forge3d_tpu import geo
from forge3d_tpu.errors import TransformFailed


class TestWebMercator:
    def test_known_point(self):
        crs = geo.parse_crs("EPSG:3857")
        x, y = crs.fwd(0.0, 0.0)
        assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6
        x, y = crs.fwd(180.0, 0.0)
        np.testing.assert_allclose(float(x), 20037508.342789244, rtol=1e-9)
        lon, lat = crs.inv(x, y)
        np.testing.assert_allclose(float(lon), 180.0, atol=1e-9)

    def test_roundtrip_grid(self):
        crs = geo.parse_crs("EPSG:3857")
        lon = np.linspace(-179, 179, 13)
        lat = np.linspace(-80, 80, 13)
        x, y = crs.fwd(lon, lat)
        lon2, lat2 = crs.inv(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)


class TestUTM:
    def test_scale_factor_vs_geodesic(self):
        """Projected distance / geodesic distance must equal the local TM
        scale factor k = k0 * (1 + λ²cos²φ/2 + ...) — a physically exact
        cross-check between two independent code paths."""
        crs = geo.parse_crs("EPSG:32632")  # lon0 = 9E
        lon, lat = 7.8509, 47.9941
        d = geo.geodesic_direct(lon, lat, 90.0, 1000.0)  # 1 km due east
        x1, y1 = crs.fwd(lon, lat)
        x2, y2 = crs.fwd(d["lon"], d["lat"])
        proj_dist = math.hypot(float(x2 - x1), float(y2 - y1))
        lam = math.radians(lon - 9.0)
        phi = math.radians(lat)
        k = 0.9996 * (1 + 0.5 * (lam * math.cos(phi)) ** 2)
        np.testing.assert_allclose(proj_dist / 1000.0, k, rtol=2e-6)

    def test_central_meridian_scale(self):
        """On the central meridian, easting == 500000 and northing ==
        k0 * meridian arc length."""
        crs = geo.parse_crs("EPSG:32631")  # lon0 = 3E
        x, y = crs.fwd(3.0, 45.0)
        np.testing.assert_allclose(float(x), 500000.0, atol=1e-6)
        np.testing.assert_allclose(float(y), 4982950.4, atol=1.0)

    def test_southern_hemisphere_false_northing(self):
        crs = geo.parse_crs("EPSG:32733")  # UTM 33S
        x, y = crs.fwd(15.0, -30.0)
        assert 6000000 < float(y) < 7000000

    def test_roundtrip(self):
        crs = geo.parse_crs("EPSG:32610")
        lon = np.array([-123.5, -122.0, -121.2])
        lat = np.array([37.0, 45.5, 49.0])
        x, y = crs.fwd(lon, lat)
        lon2, lat2 = crs.inv(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)


class TestOtherProjections:
    def test_conus_albers_roundtrip(self):
        crs = geo.parse_crs("EPSG:5070")
        lon, lat = np.array([-105.0, -80.0]), np.array([40.0, 35.0])
        x, y = crs.fwd(lon, lat)
        lon2, lat2 = crs.inv(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-7)
        np.testing.assert_allclose(lat2, lat, atol=1e-7)

    def test_lambert93_scale_on_standard_parallel(self):
        """On a standard parallel of an LCC the scale factor is exactly 1:
        projected east-west distance == geodesic distance."""
        crs = geo.parse_crs("EPSG:2154")
        lon, lat = 3.0, 49.0  # on the upper standard parallel
        d = geo.geodesic_direct(lon, lat, 90.0, 5000.0)
        x1, y1 = crs.fwd(lon, lat)
        x2, y2 = crs.fwd(d["lon"], d["lat"])
        proj = math.hypot(float(x2 - x1), float(y2 - y1))
        np.testing.assert_allclose(proj, 5000.0, rtol=2e-6)
        # grid origin sanity: (3E, 46.5N) maps to the false origin
        x0, y0 = crs.fwd(3.0, 46.5)
        np.testing.assert_allclose([float(x0), float(y0)],
                                   [700000.0, 6600000.0], atol=1e-3)

    def test_polar_stereo_roundtrip(self):
        for code, lat in (("EPSG:3031", -75.0), ("EPSG:3413", 75.0)):
            crs = geo.parse_crs(code)
            x, y = crs.fwd(45.0, lat)
            lon2, lat2 = crs.inv(x, y)
            np.testing.assert_allclose(float(lon2), 45.0, atol=1e-7)
            np.testing.assert_allclose(float(lat2), lat, atol=1e-7)

    def test_unknown_crs(self):
        with pytest.raises(TransformFailed):
            geo.parse_crs("EPSG:99999")
        with pytest.raises(TransformFailed):
            geo.parse_crs("garbage")


class TestTransformer:
    def test_wgs84_to_utm_and_back(self):
        tr = geo.create_crs_transformer("EPSG:4326", "EPSG:32633")
        x, y = tr.transform(15.0, 60.0)
        lon, lat = tr.transform_inverse(x, y)
        np.testing.assert_allclose([float(lon), float(lat)], [15.0, 60.0], atol=1e-9)

    def test_mercator_to_utm(self):
        to3857 = geo.parse_crs("EPSG:3857")
        mx, my = to3857.fwd(-122.0, 45.0)
        tr = geo.create_crs_transformer("EPSG:3857", "EPSG:32610")
        x, y = tr.transform(mx, my)
        direct = geo.parse_crs("EPSG:32610").fwd(-122.0, 45.0)
        np.testing.assert_allclose(float(x), float(direct[0]), atol=1e-6)


class TestECEF:
    def test_known_ecef(self):
        x, y, z = geo.geodetic_to_ecef(0.0, 0.0, 0.0)
        np.testing.assert_allclose(float(x), 6378137.0, atol=1e-6)
        x, y, z = geo.geodetic_to_ecef(0.0, 90.0, 0.0)
        np.testing.assert_allclose(float(z), 6356752.3142, atol=1e-3)

    def test_roundtrip_with_height(self):
        lon, lat, h = geo.ecef_to_geodetic(
            *geo.geodetic_to_ecef(-71.06, 42.36, 125.0))
        np.testing.assert_allclose(
            [float(lon), float(lat), float(h)], [-71.06, 42.36, 125.0],
            atol=1e-6)


class TestGeodesics:
    def test_vincenty_standard_case(self):
        """Flinders Peak -> Buninyong (the canonical Vincenty test):
        s = 54972.271 m, a1 = 306°52'05.37", a2 = 127°10'25.07"."""
        fl = (144.0 + 25 / 60 + 29.52440 / 3600, -(37 + 57 / 60 + 3.72030 / 3600))
        bu = (143.0 + 55 / 60 + 35.38390 / 3600, -(37 + 39 / 60 + 10.15610 / 3600))
        r = geo.geodesic_inverse(fl[0], fl[1], bu[0], bu[1])
        np.testing.assert_allclose(r["distance"], 54972.271, atol=1e-3)
        np.testing.assert_allclose(r["azimuth1"], 306.86815, atol=1e-4)

    def test_direct_inverse_consistency(self):
        d = geo.geodesic_direct(-122.0, 45.0, 37.5, 100000.0)
        inv = geo.geodesic_inverse(-122.0, 45.0, d["lon"], d["lat"])
        np.testing.assert_allclose(inv["distance"], 100000.0, atol=1e-3)
        np.testing.assert_allclose(inv["azimuth1"], 37.5, atol=1e-6)

    def test_zero_distance(self):
        r = geo.geodesic_inverse(10.0, 50.0, 10.0, 50.0)
        assert r["distance"] == 0.0


class TestHelpers:
    def test_estimate_local_utm(self):
        assert geo.estimate_local_utm(-122.0, 45.0) == "EPSG:32610"
        assert geo.estimate_local_utm(15.0, -30.0) == "EPSG:32733"

    def test_slippy_and_bounds(self):
        xt, yt = geo.slippy_tile_index(0.0, 0.0, 1)
        assert (xt, yt) == (1, 0) or (xt, yt) == (1, 1)  # boundary
        b = geo.web_mercator_bounds(0, 0, 0)
        np.testing.assert_allclose(b[0], -20037508.342789244)
        with pytest.raises(TransformFailed):
            geo.web_mercator_bounds(2, 9, 0)

    def test_slippy_known_tile(self):
        # Berlin (13.4, 52.52) at z=10 -> tile (550, 335)
        assert geo.slippy_tile_index(13.4, 52.52, 10) == (550, 335)

    def test_inspect(self):
        info = geo.inspect_crs("EPSG:32601")
        assert info["kind"] == "projected"
