# EGM96 spherical-harmonic geoid vs the committed NGA reference values
# (VERDICT r2 missing item 7; reference gate: test_geoid_egm96.py,
# |N - published| < 0.5 m, truncation-dominated).

from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data" / "egm96_test_values.txt"


def _reference_points():
    pts = []
    for line in DATA.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        lat, lon, n, src = line.split()
        pts.append((float(lat), float(lon), float(n), src))
    return pts


@pytest.mark.parametrize("lat,lon,n_ref,src", _reference_points(),
                         ids=lambda v: str(v)[:18])
def test_egm96_matches_nga_published(lat, lon, n_ref, src):
    from forge3d_tpu.geo.egm96 import egm96_undulation

    got = egm96_undulation(lon, lat)
    assert abs(got - n_ref) < 0.5, (lat, lon, src, got, n_ref)


def test_egm96_vectorized_matches_scalar():
    from forge3d_tpu.geo.egm96 import egm96_undulation

    pts = _reference_points()[:6]
    lats = np.array([p[0] for p in pts])
    lons = np.array([p[1] for p in pts])
    vec = egm96_undulation(lons, lats)
    for i, (lat, lon, _, _) in enumerate(pts):
        assert abs(vec[i] - egm96_undulation(lon, lat)) < 1e-9


def test_geoid_seam_defaults_to_egm96():
    from forge3d_tpu.geo.geoid import geoid_undulation

    # a known NGA point: (38.6281550N, 269.7791550E) -> -31.628 m
    n = geoid_undulation(269.7791550, 38.6281550)
    assert abs(n - (-31.628)) < 0.5


def test_height_conversions_roundtrip():
    from forge3d_tpu.geo.geoid import (ellipsoidal_to_orthometric,
                                       orthometric_to_ellipsoidal)

    h = orthometric_to_ellipsoidal(100.0, 10.0, 45.0)
    back = ellipsoidal_to_orthometric(h, 10.0, 45.0)
    assert abs(back - 100.0) < 1e-9


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
