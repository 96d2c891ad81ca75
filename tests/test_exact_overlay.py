# Exact boolean overlay (geometry/overlay.py, EUCLIDEA parity): adjacency
# and degeneracy cases the supersampled grid overlay could not do exactly
# (round-1 verdict item 9; ref src/geometry/exact/ + src/geometry/overlay/).

import numpy as np
import pytest

from forge3d_tpu.geometry.overlay import boolean_overlay
from forge3d_tpu.gis.vector import (
    difference_geometries,
    intersect_geometries,
    union_geometries,
)


def _area(rings):
    total = 0.0
    for r in rings:
        a = np.asarray(r, np.float64)
        x = a[:, 0]
        y = a[:, 1]
        total += abs(float(np.dot(x, np.roll(y, -1))
                           - np.dot(y, np.roll(x, -1))) / 2.0)
    return total


def _sq(x0, y0, w, h):
    return [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]]


def test_adjacent_squares_union_is_one_rectangle():
    out = boolean_overlay([_sq(0, 0, 1, 1)], [_sq(1, 0, 1, 1)], "union")
    assert len(out) == 1, out
    assert _area(out) == pytest.approx(2.0, abs=1e-9)
    # the shared edge must vanish: exactly 4 corners
    assert len(out[0]) == 4


def test_adjacent_squares_intersection_empty():
    out = boolean_overlay([_sq(0, 0, 1, 1)], [_sq(1, 0, 1, 1)],
                          "intersection")
    assert _area(out) == pytest.approx(0.0, abs=1e-12)


def test_overlapping_squares():
    a = [_sq(0, 0, 2, 2)]
    b = [_sq(1, 1, 2, 2)]
    inter = boolean_overlay(a, b, "intersection")
    assert _area(inter) == pytest.approx(1.0, abs=2e-7)
    union = boolean_overlay(a, b, "union")
    assert _area(union) == pytest.approx(7.0, abs=2e-7)
    diff = boolean_overlay(a, b, "difference")
    assert _area(diff) == pytest.approx(3.0, abs=2e-7)


def test_identical_polygons_degenerate():
    a = [_sq(0, 0, 3, 2)]
    assert _area(boolean_overlay(a, a, "union")) == pytest.approx(6.0, 1e-6)
    assert _area(boolean_overlay(a, a, "intersection")) == pytest.approx(
        6.0, 1e-6)
    assert _area(boolean_overlay(a, a, "difference")) == pytest.approx(
        0.0, abs=1e-9)


def test_contained_difference_makes_hole():
    outer = [_sq(0, 0, 4, 4)]
    inner = [_sq(1, 1, 2, 2)]
    out = boolean_overlay(outer, inner, "difference")
    # ring areas: 16 (outer) + 4 (hole ring)
    assert len(out) == 2
    areas = sorted(_area([r]) for r in out)
    assert areas[0] == pytest.approx(4.0, abs=2e-7)
    assert areas[1] == pytest.approx(16.0, abs=2e-7)


def test_shared_vertex_touching():
    a = [_sq(0, 0, 1, 1)]
    b = [_sq(1, 1, 1, 1)]  # touches only at (1,1)
    u = boolean_overlay(a, b, "union")
    assert _area(u) == pytest.approx(2.0, abs=2e-7)
    i = boolean_overlay(a, b, "intersection")
    assert _area(i) == pytest.approx(0.0, abs=1e-12)


def _rand_convex(rng, cx, cy, r):
    ang = np.sort(rng.uniform(0, 2 * np.pi, rng.integers(5, 9)))
    return [[cx + r * np.cos(a), cy + r * np.sin(a)] for a in ang]


def test_inclusion_exclusion_property():
    rng = np.random.default_rng(11)
    for _ in range(12):
        a = [_rand_convex(rng, 0.0, 0.0, 1.0)]
        b = [_rand_convex(rng, rng.uniform(-0.8, 0.8),
                          rng.uniform(-0.8, 0.8), 1.0)]
        au = _area(boolean_overlay(a, b, "union"))
        ai = _area(boolean_overlay(a, b, "intersection"))
        aa = _area([a[0]])
        ab = _area([b[0]])
        # union + intersection == A + B (exact identity; snapping tolerance)
        assert au + ai == pytest.approx(aa + ab, rel=2e-6, abs=2e-6)


def test_geometry_api_roundtrip():
    a = {"type": "Polygon", "coordinates": [_sq(0, 0, 2, 2)]}
    b = {"type": "Polygon", "coordinates": [_sq(2, 0, 2, 2)]}  # adjacent
    u = union_geometries(a, b)
    assert u["type"] == "Polygon"
    assert _area(u["coordinates"]) == pytest.approx(8.0, abs=2e-7)
    i = intersect_geometries(a, b)
    assert _area(i.get("coordinates", [])) == pytest.approx(0.0, abs=1e-9)
    d = difference_geometries(a, b)
    assert _area(d["coordinates"]) == pytest.approx(4.0, abs=2e-7)
