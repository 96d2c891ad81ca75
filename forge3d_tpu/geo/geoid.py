# forge3d_tpu/geo/geoid.py
# Geoid/areoid undulation from standard geoid grid files + height-system
# conversions.
#
# Parity notes (reference behavior, not code): /root/reference/src/geo/
# geoid.rs evaluates EGM96 undulations and height-system conversions
# (seams geoid_undulation, areoid_undulation). Real EGM96 coefficients are
# a data product, not code — this module loads standard geoid grids
# (ESRI-ASCII .asc or raw lat/lon grids) and interpolates bilinearly;
# without a grid it FAILS CLOSED (GeoidUnavailable) rather than inventing
# undulations. A tiny synthetic grid ships for tests/demos.

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..errors import RenderError

__all__ = ["GeoidGrid", "load_geoid_grid", "geoid_undulation",
           "areoid_undulation", "orthometric_to_ellipsoidal",
           "ellipsoidal_to_orthometric", "GeoidUnavailable",
           "synthetic_test_grid"]


class GeoidUnavailable(RenderError):
    """No geoid grid loaded — refuse to fabricate undulations."""


class GeoidGrid:
    """Regular lat/lon undulation grid with bilinear interpolation."""

    def __init__(self, values: np.ndarray, lat0: float, lon0: float,
                 dlat: float, dlon: float, name: str = "geoid"):
        self.values = np.asarray(values, np.float64)
        self.lat0 = float(lat0)    # latitude of row 0 (north edge if dlat<0)
        self.lon0 = float(lon0)
        self.dlat = float(dlat)
        self.dlon = float(dlon)
        self.name = name

    def undulation(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        H, W = self.values.shape
        # wrap longitude into grid domain
        lon_rel = (lon - self.lon0) % 360.0 if abs(
            self.dlon * W - 360.0) < 1.0 else lon - self.lon0
        r = (lat - self.lat0) / self.dlat
        c = lon_rel / self.dlon
        r0 = np.clip(np.floor(r).astype(int), 0, H - 2)
        c0 = np.clip(np.floor(c).astype(int), 0, W - 2)
        fr = np.clip(r - r0, 0, 1)
        fc = np.clip(c - c0, 0, 1)
        v = self.values
        out = (v[r0, c0] * (1 - fr) * (1 - fc) + v[r0, c0 + 1] * (1 - fr) * fc
               + v[r0 + 1, c0] * fr * (1 - fc) + v[r0 + 1, c0 + 1] * fr * fc)
        return out if out.shape else float(out)


_ACTIVE: dict = {"earth": None, "mars": None}


def load_geoid_grid(path_or_grid, *, body: str = "earth") -> GeoidGrid:
    """Load and activate a geoid grid: GeoidGrid instance, .npz
    (values/lat0/lon0/dlat/dlon), or ESRI ASCII .asc."""
    if isinstance(path_or_grid, GeoidGrid):
        grid = path_or_grid
    else:
        p = Path(str(path_or_grid))
        if p.suffix == ".npz":
            z = np.load(p)
            grid = GeoidGrid(z["values"], float(z["lat0"]), float(z["lon0"]),
                             float(z["dlat"]), float(z["dlon"]), name=p.stem)
        elif p.suffix == ".asc":
            header = {}
            with open(p) as fh:
                lines = fh.readlines()
            i = 0
            while i < len(lines) and not lines[i].strip()[0].isdigit() \
                    and not lines[i].strip().startswith("-"):
                k, v = lines[i].split()
                header[k.lower()] = float(v)
                i += 1
            vals = np.loadtxt(lines[i:])
            cell = header["cellsize"]
            nrows = int(header["nrows"])
            lat_top = header["yllcorner"] + cell * nrows
            grid = GeoidGrid(vals, lat_top, header["xllcorner"],
                             -cell, cell, name=p.stem)
        else:
            raise RenderError(f"unsupported geoid grid format: {p.suffix}")
    _ACTIVE[body] = grid
    return grid


def geoid_undulation(lon, lat, *, grid: Optional[GeoidGrid] = None):
    """Geoid height above the ellipsoid (m) — reference seam
    geoid_undulation. With no explicit grid loaded, evaluates the
    packaged EGM96 model by spherical-harmonic synthesis to n=120
    (geo/egm96.py; public NGA coefficient data, <0.5 m of the published
    degree-360 values). Fails closed only if the coefficient asset is
    missing or unreadable."""
    g = grid or _ACTIVE["earth"]
    if g is None:
        try:
            from .egm96 import egm96_undulation

            return egm96_undulation(lon, lat)
        except (OSError, ValueError) as exc:
            raise GeoidUnavailable(
                "EGM96 coefficient asset unavailable "
                f"({exc}); call load_geoid_grid(path) with an "
                "EGM96/EGM2008 grid") from exc
    return g.undulation(lon, lat)


def areoid_undulation(lon, lat, *, grid: Optional[GeoidGrid] = None):
    """Mars areoid height (m) — reference seam areoid_undulation."""
    g = grid or _ACTIVE["mars"]
    if g is None:
        raise GeoidUnavailable(
            "no areoid grid loaded; call load_geoid_grid(path, body='mars')")
    return g.undulation(lon, lat)


def orthometric_to_ellipsoidal(h_ortho, lon, lat, **kw):
    """H + N: orthometric (geoid-relative) -> ellipsoidal height."""
    return np.asarray(h_ortho, np.float64) + geoid_undulation(lon, lat, **kw)


def ellipsoidal_to_orthometric(h_ell, lon, lat, **kw):
    return np.asarray(h_ell, np.float64) - geoid_undulation(lon, lat, **kw)


def synthetic_test_grid(*, amplitude: float = 30.0) -> GeoidGrid:
    """A smooth synthetic undulation field for tests/demos (clearly NOT
    EGM96 — amplitude and wavelengths are merely plausible)."""
    lats = np.linspace(90, -90, 91)
    lons = np.linspace(0, 358, 180)
    LA, LO = np.meshgrid(np.radians(lats), np.radians(lons), indexing="ij")
    v = amplitude * (np.sin(2 * LA) * np.cos(3 * LO)
                     + 0.4 * np.sin(5 * LA + 1.0) * np.sin(2 * LO))
    return GeoidGrid(v, 90.0, 0.0, -2.0, 2.0, name="synthetic-test")
