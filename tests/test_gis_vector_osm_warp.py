# Tests: vector GIS ops (clip/dissolve/buffer/overlay), OSM parsing,
# Terrarium codec, raster warp/reproject.

import json
import math

import numpy as np
import pytest

from forge3d_tpu.gis.vector import (VectorError, buffer_geometry,
                                    clip_vector, difference_geometries,
                                    dissolve_vector, geometry_mask,
                                    intersect_geometries, point_in_polygon,
                                    polygon_area, read_vector,
                                    reproject_vector, union_geometries)


def _sq(x0, y0, x1, y1):
    return {"type": "Polygon", "coordinates": [[
        [x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]]}


def _geom_area(g):
    if g["type"] == "Polygon":
        rings = g["coordinates"]
        return sum(polygon_area(r) for r in rings)
    if g["type"] == "MultiPolygon":
        return sum(sum(polygon_area(r) for r in poly)
                   for poly in g["coordinates"])
    return 0.0


# ---------------------------------------------------------------------------
# vector basics


def test_read_vector_forms():
    fc = read_vector({"type": "Feature", "geometry": _sq(0, 0, 1, 1),
                      "properties": {}})
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 1
    fc2 = read_vector(_sq(0, 0, 1, 1))
    assert len(fc2["features"]) == 1
    with pytest.raises(VectorError):
        read_vector({"type": "Nonsense"})


def test_point_in_polygon_and_area():
    ring = [[0, 0], [4, 0], [4, 4], [0, 4]]
    assert point_in_polygon(2, 2, ring)
    assert not point_in_polygon(5, 2, ring)
    assert polygon_area(ring) == pytest.approx(16.0)


def test_clip_polygon():
    fc = {"type": "FeatureCollection",
          "features": [{"type": "Feature", "properties": {"name": "big"},
                        "geometry": _sq(0, 0, 10, 10)}]}
    out = clip_vector(fc, (2, 2, 6, 6))
    assert len(out["features"]) == 1
    g = out["features"][0]["geometry"]
    assert _geom_area(g) == pytest.approx(16.0, rel=1e-6)
    assert out["features"][0]["properties"]["name"] == "big"
    # fully outside clips away
    out2 = clip_vector(fc, (20, 20, 30, 30))
    assert out2["features"] == []


def test_clip_line_and_point():
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {},
         "geometry": {"type": "LineString",
                      "coordinates": [[-5, 5], [15, 5]]}},
        {"type": "Feature", "properties": {},
         "geometry": {"type": "Point", "coordinates": [5, 5]}},
        {"type": "Feature", "properties": {},
         "geometry": {"type": "Point", "coordinates": [50, 50]}},
    ]}
    out = clip_vector(fc, (0, 0, 10, 10))
    kinds = sorted(f["geometry"]["type"] for f in out["features"])
    assert kinds == ["LineString", "Point"]
    line = [f for f in out["features"]
            if f["geometry"]["type"] == "LineString"][0]
    xs = [p[0] for p in line["geometry"]["coordinates"]]
    assert min(xs) >= -0.01 and max(xs) <= 10.01


def test_overlay_intersection_union_difference():
    a = _sq(0, 0, 4, 4)
    b = _sq(2, 2, 6, 6)
    inter = intersect_geometries(a, b)
    assert _geom_area(inter) == pytest.approx(4.0, rel=0.05)
    uni = union_geometries(a, b)
    assert _geom_area(uni) == pytest.approx(28.0, rel=0.05)
    diff = difference_geometries(a, b)
    assert _geom_area(diff) == pytest.approx(12.0, rel=0.05)
    # disjoint intersection is empty
    empty = intersect_geometries(_sq(0, 0, 1, 1), _sq(5, 5, 6, 6))
    assert _geom_area(empty) == pytest.approx(0.0, abs=1e-9)


def test_dissolve():
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"zone": "a"},
         "geometry": _sq(0, 0, 2, 2)},
        {"type": "Feature", "properties": {"zone": "a"},
         "geometry": _sq(1, 0, 3, 2)},
        {"type": "Feature", "properties": {"zone": "b"},
         "geometry": _sq(10, 10, 12, 12)},
    ]}
    out = dissolve_vector(fc, by="zone")
    assert len(out["features"]) == 2
    areas = sorted(_geom_area(f["geometry"]) for f in out["features"])
    assert areas[0] == pytest.approx(4.0, rel=0.05)    # zone b square
    assert areas[1] == pytest.approx(6.0, rel=0.05)    # merged overlap


def test_buffer():
    pt = {"type": "Point", "coordinates": [0, 0]}
    circ = buffer_geometry(pt, 2.0, resolution=64)
    assert _geom_area(circ) == pytest.approx(math.pi * 4, rel=0.01)
    line = {"type": "LineString", "coordinates": [[0, 0], [10, 0]]}
    cap = buffer_geometry(line, 1.0, resolution=64)
    assert _geom_area(cap) == pytest.approx(20 + math.pi, rel=0.02)
    with pytest.raises(VectorError):
        buffer_geometry(pt, -1.0)


def test_reproject_vector():
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {},
         "geometry": {"type": "Point", "coordinates": [-122.3, 47.6]}}]}
    out = reproject_vector(fc, "EPSG:4326", "EPSG:3857")
    x, y = out["features"][0]["geometry"]["coordinates"]
    assert x == pytest.approx(-13614373, rel=1e-3)
    assert y == pytest.approx(6042252, rel=1e-3)


def test_geometry_mask():
    g = _sq(2, 2, 8, 8)
    mask = geometry_mask([g], (10, 10))
    assert mask.dtype == bool
    assert not mask[5, 5]       # inside -> False (masked out)
    assert mask[0, 0]


# ---------------------------------------------------------------------------
# OSM


def test_parse_osm_overpass():
    from forge3d_tpu.gis.osm import parse_osm_features, query_osm_features

    doc = {"elements": [
        {"type": "node", "id": 1, "lon": 0.0, "lat": 0.0},
        {"type": "node", "id": 2, "lon": 0.001, "lat": 0.0},
        {"type": "node", "id": 3, "lon": 0.001, "lat": 0.001},
        {"type": "node", "id": 4, "lon": 0.0, "lat": 0.001},
        {"type": "node", "id": 5, "lon": 0.0005, "lat": 0.0005,
         "tags": {"amenity": "cafe", "name": "Bean"}},
        {"type": "way", "id": 10, "nodes": [1, 2, 3, 4, 1],
         "tags": {"building": "yes", "height": "9"}},
        {"type": "way", "id": 11, "nodes": [1, 3],
         "tags": {"highway": "path"}},
    ]}
    fc = parse_osm_features(doc)
    types = sorted(f["geometry"]["type"] for f in fc["features"])
    assert types == ["LineString", "Point", "Polygon"]
    cafes = query_osm_features(fc, tags={"amenity": "cafe"})
    assert len(cafes["features"]) == 1
    assert cafes["features"][0]["properties"]["name"] == "Bean"
    buildings = query_osm_features(fc, tags={"building": None})
    assert len(buildings["features"]) == 1


def test_prepare_osm_scene():
    from forge3d_tpu.gis.osm import parse_osm_features, prepare_osm_scene

    doc = {"elements": [
        {"type": "node", "id": i, "lon": lon, "lat": lat}
        for i, (lon, lat) in enumerate(
            [(0, 0), (0.001, 0), (0.001, 0.001), (0, 0.001)], start=1)
    ] + [
        {"type": "way", "id": 10, "nodes": [1, 2, 3, 4, 1],
         "tags": {"building": "yes", "building:levels": "3"}},
        {"type": "way", "id": 11, "nodes": [1, 3],
         "tags": {"highway": "residential"}},
    ]}
    scene = prepare_osm_scene(parse_osm_features(doc))
    assert scene["building_count"] == 1
    assert scene["buildings_mesh"].triangle_count > 0
    assert len(scene["roads"]) == 1


def test_terrarium_roundtrip():
    from forge3d_tpu.gis.osm import build_terrarium_dem, decode_terrarium_dem

    rng = np.random.default_rng(0)
    dem = rng.uniform(-400, 8800, (64, 64)).astype(np.float32)
    rgb = build_terrarium_dem(dem)
    assert rgb.dtype == np.uint8 and rgb.shape == (64, 64, 3)
    rec = decode_terrarium_dem(rgb)
    assert np.abs(rec - dem).max() < 1.0 / 256.0 + 1e-3


# ---------------------------------------------------------------------------
# warp


def test_reproject_raster_identity_crs():
    from forge3d_tpu.gis.warp import reproject_raster

    rng = np.random.default_rng(1)
    data = rng.normal(100, 10, (60, 80)).astype(np.float32)
    src_t = (0.01, 0.0, -120.0, 0.0, -0.01, 45.0)
    out, dst_t, rep = reproject_raster(data, src_t, "EPSG:4326", "EPSG:4326")
    assert rep["transform_failures"] == 0
    # same-CRS warp at native res reproduces the data closely
    assert out.shape[0] >= 58 and out.shape[1] >= 78
    inner = out[2:-2, 2:-2]
    assert np.nanstd(inner) > 5  # real content, not fill


def test_reproject_raster_to_mercator():
    from forge3d_tpu.gis.warp import reproject_raster

    y, x = np.mgrid[0:50, 0:50].astype(np.float32)
    data = (x + y).astype(np.float32)
    src_t = (0.02, 0.0, -10.0, 0.0, -0.02, 50.0)
    out, dst_t, rep = reproject_raster(data, src_t, "EPSG:4326", "EPSG:3857")
    assert rep["valid_pixels"] > 0.5 * rep["total_pixels"]
    # mercator resolution ~ deg * 111km, stretched by up to 1/cos(lat)
    assert 0.02 * 111320 * 0.9 < dst_t[0] < 0.02 * 111320 * 1.7
    # gradient direction preserved (increases right+down)
    v = out[~np.isnan(out)]
    assert v.max() > v.min() + 50


def test_align_raster_to():
    from forge3d_tpu.gis.warp import align_raster_to

    data = np.arange(100, dtype=np.float64).reshape(10, 10)
    src_t = (1.0, 0.0, 0.0, 0.0, -1.0, 10.0)
    # same grid: identity
    out = align_raster_to(data, src_t, src_t, (10, 10))
    np.testing.assert_allclose(out, data, atol=1e-9)
    # 2x upsample
    ref_t = (0.5, 0.0, 0.0, 0.0, -0.5, 10.0)
    up = align_raster_to(data, src_t, ref_t, (20, 20))
    assert up.shape == (20, 20)
    assert np.nanmean(up) == pytest.approx(np.mean(data), rel=0.05)


# ---------------------------------------------------------------------------
# DEM preparation + gridded datasets + geoid


def test_fill_nodata_and_prepare():
    from forge3d_tpu.gis.dem import fill_nodata, prepare_dem

    y, x = np.mgrid[0:32, 0:32].astype(np.float64)
    dem = 10 * np.sin(x * 0.2) * np.cos(y * 0.2)
    holey = dem.copy()
    holey[10:14, 10:14] = np.nan
    filled, iters = fill_nodata(holey)
    assert np.isfinite(filled).all()
    assert np.abs(filled[12, 12] - dem[12, 12]) < 2.0   # plausible infill
    out = prepare_dem(holey, clip_range=(-8, 8), out_shape=(16, 16))
    assert out["heights"].shape == (16, 16)
    assert out["report"]["nodata_cells"] == 16
    assert out["heights"].max() <= 8 + 1e-5


def test_read_gridded_dataset(tmp_path):
    from forge3d_tpu.gis.dem import read_gridded_dataset

    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.save(tmp_path / "g.npy", a)
    out, meta = read_gridded_dataset(tmp_path / "g.npy")
    np.testing.assert_array_equal(out, a)
    np.savez(tmp_path / "g.npz", elevation=a, slope=a * 2)
    out2, meta2 = read_gridded_dataset(tmp_path / "g.npz",
                                       variable="slope")
    np.testing.assert_array_equal(out2, a * 2)
    with pytest.raises(Exception):
        read_gridded_dataset(tmp_path / "g.xyz")


def test_geoid_fail_closed_and_grid():
    from forge3d_tpu.geo.geoid import (GeoidUnavailable, geoid_undulation,
                                       load_geoid_grid,
                                       orthometric_to_ellipsoidal,
                                       synthetic_test_grid)
    import forge3d_tpu.geo.geoid as G

    G._ACTIVE["earth"] = None
    # with no grid loaded the packaged EGM96 harmonic model answers
    # (geo/egm96.py); Seattle-area undulation is about -23 m
    n_egm = float(geoid_undulation(-122.3, 47.6))
    assert -35.0 < n_egm < -10.0
    # fail-closed only when the coefficient asset itself is unavailable
    import forge3d_tpu.geo.egm96 as egm96_mod

    def _broken(lon, lat):
        raise OSError("asset missing (simulated)")

    saved_fn = egm96_mod.egm96_undulation
    egm96_mod.egm96_undulation = _broken
    try:
        with pytest.raises(GeoidUnavailable):
            geoid_undulation(-122.3, 47.6)
    finally:
        egm96_mod.egm96_undulation = saved_fn
    grid = synthetic_test_grid()
    load_geoid_grid(grid)
    n = geoid_undulation(-122.3, 47.6)
    assert -60 < n < 60
    h_ell = orthometric_to_ellipsoidal(100.0, -122.3, 47.6)
    assert h_ell == pytest.approx(100.0 + n)
    # vectorized + interpolation continuity
    lons = np.linspace(-123, -121, 5)
    vals = geoid_undulation(lons, np.full(5, 47.6))
    assert np.all(np.abs(np.diff(vals)) < 5.0)
    G._ACTIVE["earth"] = None


def test_copc_and_attr_seams(tmp_path):
    import struct

    from forge3d_tpu.pointcloud import (LazUnsupported,
                                        copc_read_node_points,
                                        read_laz_point_attributes)
    from tests.test_viewer_pointcloud_bundle import _write_las

    pts = np.random.default_rng(0).uniform(-5, 5, (20, 3))
    p = tmp_path / "c.las"
    _write_las(p, pts)
    pb = copc_read_node_points(p)          # plain LAS serves directly
    assert pb.count == 20
    attrs = read_laz_point_attributes(p)
    assert "intensity" in attrs["attributes"]
    raw = bytearray(p.read_bytes())
    raw[104] |= 0x80
    p2 = tmp_path / "c.copc.laz"
    p2.write_bytes(bytes(raw))
    with pytest.raises(LazUnsupported):
        copc_read_node_points(p2)
