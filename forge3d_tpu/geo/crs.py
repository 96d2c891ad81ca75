# forge3d_tpu/geo/crs.py
# Coordinate reference systems and projections (MENSURA core).
#
# Implemented from the standard published formulae (Snyder, "Map
# Projections — A Working Manual", USGS PP 1395; Karney 2011 for the
# Krüger-series Transverse Mercator). Reference parity:
# /root/reference/src/geo/projections/ (SURVEY §2.5 "CRS engine").

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import numpy as np

from ..errors import TransformFailed


@dataclass(frozen=True)
class Ellipsoid:
    name: str
    a: float       # semi-major axis (m)
    f: float       # flattening

    @property
    def b(self) -> float:
        return self.a * (1.0 - self.f)

    @property
    def e2(self) -> float:
        return self.f * (2.0 - self.f)

    @property
    def ep2(self) -> float:
        return self.e2 / (1.0 - self.e2)


WGS84 = Ellipsoid("WGS84", 6378137.0, 1.0 / 298.257223563)
GRS80 = Ellipsoid("GRS80", 6378137.0, 1.0 / 298.257222101)


# ---------------------------------------------------------------------------
# Projection kernels (forward: lon/lat deg -> x/y meters; inverse back)
# ---------------------------------------------------------------------------

def _merc_fwd(ell, lon, lat, lon0=0.0):
    # spherical web mercator (EPSG:3857 semantics uses sphere R=a)
    R = ell.a
    x = R * np.radians(lon - lon0)
    lat = np.clip(lat, -85.051128779806, 85.051128779806)
    y = R * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    return x, y


def _merc_inv(ell, x, y, lon0=0.0):
    R = ell.a
    lon = np.degrees(x / R) + lon0
    lat = np.degrees(2 * np.arctan(np.exp(y / R)) - np.pi / 2)
    return lon, lat


def _tm_consts(ell):
    """Krüger series alpha/beta coefficients (order 6) + rectifying radius."""
    n = ell.f / (2.0 - ell.f)
    n2, n3, n4, n5, n6 = n**2, n**3, n**4, n**5, n**6
    A = ell.a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    alpha = [
        0.0,
        1 / 2 * n - 2 / 3 * n2 + 5 / 16 * n3 + 41 / 180 * n4 - 127 / 288 * n5 + 7891 / 37800 * n6,
        13 / 48 * n2 - 3 / 5 * n3 + 557 / 1440 * n4 + 281 / 630 * n5 - 1983433 / 1935360 * n6,
        61 / 240 * n3 - 103 / 140 * n4 + 15061 / 26880 * n5 + 167603 / 181440 * n6,
        49561 / 161280 * n4 - 179 / 168 * n5 + 6601661 / 7257600 * n6,
        34729 / 80640 * n5 - 3418889 / 1995840 * n6,
        212378941 / 319334400 * n6,
    ]
    beta = [
        0.0,
        1 / 2 * n - 2 / 3 * n2 + 37 / 96 * n3 - 1 / 360 * n4 - 81 / 512 * n5 + 96199 / 604800 * n6,
        1 / 48 * n2 + 1 / 15 * n3 - 437 / 1440 * n4 + 46 / 105 * n5 - 1118711 / 3870720 * n6,
        17 / 480 * n3 - 37 / 840 * n4 - 209 / 4480 * n5 + 5569 / 90720 * n6,
        4397 / 161280 * n4 - 11 / 504 * n5 - 830251 / 7257600 * n6,
        4583 / 161280 * n5 - 108847 / 3991680 * n6,
        20648693 / 638668800 * n6,
    ]
    return A, alpha, beta


def _tm_fwd(ell, lon, lat, lon0, k0=0.9996, fe=500000.0, fn=0.0):
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    A, alpha, _ = _tm_consts(ell)
    e = math.sqrt(ell.e2)
    phi = np.radians(lat)
    lam = np.radians(lon - lon0)
    # conformal latitude
    t = np.sinh(np.arctanh(np.sin(phi)) - e * np.arctanh(e * np.sin(phi)))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(1, 7):
        xi = xi + alpha[j] * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta = eta + alpha[j] * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    x = fe + k0 * A * eta
    y = fn + k0 * A * xi
    return x, y


def _tm_inv(ell, x, y, lon0, k0=0.9996, fe=500000.0, fn=0.0):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    A, _, beta = _tm_consts(ell)
    e = math.sqrt(ell.e2)
    xi = (y - fn) / (k0 * A)
    eta = (x - fe) / (k0 * A)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(1, 7):
        xi_p = xi_p - beta[j] * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p = eta_p - beta[j] * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    # iterate conformal -> geodetic latitude
    phi = chi.copy()
    for _ in range(6):
        esin = e * np.sin(phi)
        phi = np.arcsin(np.clip(
            np.tanh(np.arctanh(np.sin(chi)) + e * np.arctanh(esin)), -1, 1))
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam) + lon0, np.degrees(phi)


def _lcc2sp(ell, lat1, lat2, lat0, lon0, fe=0.0, fn=0.0):
    """Lambert Conformal Conic 2SP (Snyder 15-1..15-10)."""
    e = math.sqrt(ell.e2)

    def m(phi):
        return math.cos(phi) / math.sqrt(1 - ell.e2 * math.sin(phi) ** 2)

    def t_of(phi):
        esin = e * np.sin(phi)
        return np.tan(np.pi / 4 - phi / 2) / ((1 - esin) / (1 + esin)) ** (e / 2)

    p1, p2, p0 = map(math.radians, (lat1, lat2, lat0))
    m1, m2 = m(p1), m(p2)
    t1, t2, t0 = (float(t_of(np.float64(v))) for v in (p1, p2, p0))
    if abs(p1 - p2) > 1e-12:
        nconst = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    else:
        nconst = math.sin(p1)
    F = m1 / (nconst * t1**nconst)
    rho0 = ell.a * F * t0**nconst

    def fwd(lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        t = t_of(np.radians(lat))
        rho = ell.a * F * np.sign(nconst) * np.abs(t) ** nconst
        th = nconst * np.radians(lon - lon0)
        return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)

    def inv(x, y):
        x = np.asarray(x, np.float64) - fe
        y = rho0 - (np.asarray(y, np.float64) - fn)
        rho = np.sign(nconst) * np.hypot(x, y)
        th = np.arctan2(np.sign(nconst) * x, np.sign(nconst) * y)
        t = (rho / (ell.a * F)) ** (1 / nconst)
        phi = np.pi / 2 - 2 * np.arctan(t)
        for _ in range(8):
            esin = e * np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(t * ((1 - esin) / (1 + esin)) ** (e / 2))
        return np.degrees(th / nconst) + lon0, np.degrees(phi)

    return fwd, inv


def _albers(ell, lat1, lat2, lat0, lon0, fe=0.0, fn=0.0):
    """Albers Equal Area (Snyder 14-1..14-11)."""
    e = math.sqrt(ell.e2)
    e2 = ell.e2

    def q_of(phi):
        s = np.sin(phi)
        return (1 - e2) * (s / (1 - e2 * s**2)
                           - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))

    def m(phi):
        return math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) ** 2)

    p1, p2, p0 = map(math.radians, (lat1, lat2, lat0))
    m1, m2 = m(p1), m(p2)
    q1, q2, q0 = (float(q_of(np.float64(v))) for v in (p1, p2, p0))
    if abs(p1 - p2) > 1e-12:
        nconst = (m1**2 - m2**2) / (q2 - q1)
    else:
        nconst = math.sin(p1)
    C = m1**2 + nconst * q1
    rho0 = ell.a * math.sqrt(C - nconst * q0) / nconst

    def fwd(lon, lat):
        q = q_of(np.radians(np.asarray(lat, np.float64)))
        rho = ell.a * np.sqrt(C - nconst * q) / nconst
        th = nconst * np.radians(np.asarray(lon, np.float64) - lon0)
        return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)

    def inv(x, y):
        x = np.asarray(x, np.float64) - fe
        y = rho0 - (np.asarray(y, np.float64) - fn)
        rho = np.hypot(x, y)
        th = np.arctan2(x, y)
        q = (C - (rho * nconst / ell.a) ** 2) / nconst
        beta = np.arcsin(np.clip(q / q_of(np.float64(np.pi / 2)), -1, 1))
        phi = beta.copy()
        for _ in range(8):
            s = np.sin(phi)
            phi = phi + (1 - e2 * s**2) ** 2 / (2 * np.cos(phi) + 1e-300) * (
                q / (1 - e2) - s / (1 - e2 * s**2)
                + (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
            )
        return np.degrees(th / nconst) + lon0, np.degrees(phi)

    return fwd, inv


def _polar_stereo(ell, lat0, lon0, k0=0.994, fe=2000000.0, fn=2000000.0):
    """Polar Stereographic variant B-ish (Snyder 21); lat0 = +/-90."""
    e = math.sqrt(ell.e2)
    south = lat0 < 0

    def t_of(phi):
        esin = e * np.sin(phi)
        return np.tan(np.pi / 4 - phi / 2) / ((1 - esin) / (1 + esin)) ** (e / 2)

    def fwd(lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        if south:
            lon, lat = -lon, -lat
        t = t_of(np.radians(lat))
        rho = 2 * ell.a * k0 * t / math.sqrt(
            (1 + e) ** (1 + e) * (1 - e) ** (1 - e))
        th = np.radians(lon - (-lon0 if south else lon0))
        x = rho * np.sin(th)
        y = -rho * np.cos(th)
        if south:
            x, y = -x, -y
        return fe + x, fn + y

    def inv(x, y):
        x = np.asarray(x, np.float64) - fe
        y = np.asarray(y, np.float64) - fn
        if south:
            x, y = -x, -y
        rho = np.hypot(x, y)
        t = rho * math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e)) / (2 * ell.a * k0)
        phi = np.pi / 2 - 2 * np.arctan(t)
        for _ in range(8):
            esin = e * np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(t * ((1 - esin) / (1 + esin)) ** (e / 2))
        lon = np.degrees(np.arctan2(x, -y)) + (-lon0 if south else lon0)
        lat = np.degrees(phi)
        if south:
            lon, lat = -lon, -lat
        return lon, lat

    return fwd, inv


# ---------------------------------------------------------------------------
# ECEF
# ---------------------------------------------------------------------------

def geodetic_to_ecef(lon, lat, h=0.0, ell: Ellipsoid = WGS84):
    lon = np.radians(np.asarray(lon, np.float64))
    lat = np.radians(np.asarray(lat, np.float64))
    h = np.asarray(h, np.float64)
    N = ell.a / np.sqrt(1 - ell.e2 * np.sin(lat) ** 2)
    x = (N + h) * np.cos(lat) * np.cos(lon)
    y = (N + h) * np.cos(lat) * np.sin(lon)
    z = (N * (1 - ell.e2) + h) * np.sin(lat)
    return x, y, z


def ecef_to_geodetic(x, y, z, ell: Ellipsoid = WGS84):
    """Bowring/iterative conversion, millimeter-accurate."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    lon = np.arctan2(y, x)
    p = np.hypot(x, y)
    lat = np.arctan2(z, p * (1 - ell.e2))
    for _ in range(8):
        N = ell.a / np.sqrt(1 - ell.e2 * np.sin(lat) ** 2)
        h = p / np.cos(lat) - N
        lat = np.arctan2(z, p * (1 - ell.e2 * N / (N + h)))
    N = ell.a / np.sqrt(1 - ell.e2 * np.sin(lat) ** 2)
    h = p / np.cos(lat) - N
    return np.degrees(lon), np.degrees(lat), h


# ---------------------------------------------------------------------------
# CRS registry / transformer
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CRS:
    code: str                   # e.g. "EPSG:4326"
    kind: str                   # geographic|projected
    name: str
    fwd: Optional[Callable] = None   # lon,lat -> x,y
    inv: Optional[Callable] = None   # x,y -> lon,lat

    def __repr__(self):
        return f"CRS({self.code}: {self.name})"


def parse_crs(spec) -> CRS:
    """Parse 'EPSG:nnnn' (4326, 3857, UTM 326xx/327xx, 5070 CONUS Albers,
    3031/3413 polar stereo, 2154 Lambert-93)."""
    if isinstance(spec, CRS):
        return spec
    s = str(spec).strip().upper()
    m = re.match(r"EPSG:(\d+)$", s)
    if not m:
        raise TransformFailed(f"unsupported CRS spec {spec!r}")
    code = int(m.group(1))
    ident = lambda lon, lat: (np.asarray(lon, np.float64), np.asarray(lat, np.float64))
    if code == 4326:
        return CRS("EPSG:4326", "geographic", "WGS 84", ident, ident)
    if code == 4258:
        return CRS("EPSG:4258", "geographic", "ETRS89", ident, ident)
    if code == 3857:
        return CRS("EPSG:3857", "projected", "WGS 84 / Pseudo-Mercator",
                   lambda lon, lat: _merc_fwd(WGS84, lon, lat),
                   lambda x, y: _merc_inv(WGS84, x, y))
    if 32601 <= code <= 32660:
        zone = code - 32600
        lon0 = -183 + 6 * zone
        return CRS(f"EPSG:{code}", "projected", f"WGS 84 / UTM {zone}N",
                   lambda lon, lat, l0=lon0: _tm_fwd(WGS84, lon, lat, l0),
                   lambda x, y, l0=lon0: _tm_inv(WGS84, x, y, l0))
    if 32701 <= code <= 32760:
        zone = code - 32700
        lon0 = -183 + 6 * zone
        return CRS(f"EPSG:{code}", "projected", f"WGS 84 / UTM {zone}S",
                   lambda lon, lat, l0=lon0: _tm_fwd(WGS84, lon, lat, l0, fn=10000000.0),
                   lambda x, y, l0=lon0: _tm_inv(WGS84, x, y, l0, fn=10000000.0))
    if code == 5070:  # NAD83 CONUS Albers (GRS80)
        fwd, inv = _albers(GRS80, 29.5, 45.5, 23.0, -96.0)
        return CRS("EPSG:5070", "projected", "NAD83 / Conus Albers", fwd, inv)
    if code == 2154:  # RGF93 / Lambert-93 (GRS80)
        fwd, inv = _lcc2sp(GRS80, 44.0, 49.0, 46.5, 3.0, fe=700000.0, fn=6600000.0)
        return CRS("EPSG:2154", "projected", "RGF93 / Lambert-93", fwd, inv)
    if code == 3031:  # Antarctic Polar Stereographic
        fwd, inv = _polar_stereo(WGS84, -90.0, 0.0, k0=0.97276901289, fe=0.0, fn=0.0)
        return CRS("EPSG:3031", "projected", "WGS 84 / Antarctic Polar Stereo", fwd, inv)
    if code == 3413:  # NSIDC Sea Ice Polar Stereo North
        fwd, inv = _polar_stereo(WGS84, 90.0, -45.0, k0=0.97276901289, fe=0.0, fn=0.0)
        return CRS("EPSG:3413", "projected", "NSIDC Polar Stereo North", fwd, inv)
    raise TransformFailed(f"EPSG:{code} not in the MENSURA registry")


def inspect_crs(spec) -> dict:
    crs = parse_crs(spec)
    return {"code": crs.code, "kind": crs.kind, "name": crs.name}


class Transformer:
    """Transform coordinates between two CRS via the geographic hub."""

    def __init__(self, src, dst):
        self.src = parse_crs(src)
        self.dst = parse_crs(dst)

    def transform(self, x, y):
        lon, lat = self.src.inv(x, y)
        return self.dst.fwd(lon, lat)

    def transform_inverse(self, x, y):
        lon, lat = self.dst.inv(x, y)
        return self.src.fwd(lon, lat)


def create_crs_transformer(src, dst) -> Transformer:
    return Transformer(src, dst)


def estimate_local_utm(lon: float, lat: float) -> str:
    """Best-fitting UTM EPSG code for a point (reference:
    estimate_local_utm_py)."""
    zone = int(math.floor((float(lon) + 180.0) / 6.0)) % 60 + 1
    return f"EPSG:{(32600 if lat >= 0 else 32700) + zone}"


def web_mercator_bounds(z: int, x: int, y: int) -> Tuple[float, float, float, float]:
    """Web-mercator meter bounds of slippy tile (z, x, y)."""
    n = 1 << int(z)
    if not (0 <= x < n and 0 <= y < n):
        raise TransformFailed(f"tile ({z},{x},{y}) out of range")
    world = 2 * math.pi * WGS84.a / 2  # half-extent 20037508.34...
    size = 2 * world / n
    minx = -world + x * size
    maxy = world - y * size
    return (minx, maxy - size, minx + size, maxy)


def slippy_tile_index(lon: float, lat: float, z: int) -> Tuple[int, int]:
    """Slippy-map tile (x, y) containing a lon/lat at zoom z."""
    n = 1 << int(z)
    lat = max(min(float(lat), 85.051128779806), -85.051128779806)
    xt = int((float(lon) + 180.0) / 360.0 * n) % n
    lat_r = math.radians(lat)
    yt = int((1.0 - math.asinh(math.tan(lat_r)) / math.pi) / 2.0 * n)
    return (xt, min(max(yt, 0), n - 1))
