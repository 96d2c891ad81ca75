# forge3d_tpu/geo/egm96.py — EGM96 geoid undulation by spherical-harmonic
# synthesis (degree/order 120).
#
# Parity notes (reference behavior, not code): the reference evaluates
# EGM96 with NGA's F477 reference algorithm from a committed coefficient
# binary (src/geo/geoid.rs; assets/geoid/README.md documents the public
# NGA provenance, binary layout and constants). The coefficient file is
# PUBLIC NGA DATA (the EGM96 release truncated to n=120) and ships here
# as a data asset (forge3d_tpu/assets/geoid/egm96_n120.bin, same layout);
# the synthesis below is an independent vectorized NumPy implementation
# of the published F477 procedure: WGS84(G873) normal field, geocentric
# transfer, fully-normalized Legendre recursion (Holmes & Featherstone
# 2002 forward-column), Somigliana gravity, the NGA height-anomaly ->
# geoid correction model, and the -0.53 m zero-degree term. Gate:
# |N - NGA-published| < 0.5 m (120-vs-360 truncation dominates), enforced
# by tests/test_egm96.py over the committed NGA reference values.

from __future__ import annotations

import struct
from functools import lru_cache
from pathlib import Path

import numpy as np

__all__ = ["egm96_undulation", "load_coefficients"]

_ASSET = Path(__file__).resolve().parent.parent / "assets" / "geoid" \
    / "egm96_n120.bin"

NMAX = 120
# WGS84(G873) constants as in NGA F477
GM = 3.986_004_418e14
AE = 6_378_137.0
E2 = 0.006_694_379_990_13
GEQT = 9.780_325_335_9
SOMIGLIANA_K = 0.001_931_852_652_46
_EVEN_ZONALS = {2: 0.108262982131e-2, 4: -0.237091120053e-5,
                6: 0.608346498882e-8, 8: -0.142681087920e-10,
                10: 0.121439275882e-13}
ZERO_DEGREE_M = -0.53


def _tri(n, m):
    return (n * (n + 1)) // 2 + m


@lru_cache(maxsize=1)
def load_coefficients():
    """(pot_c, pot_s, corr_c, corr_s) as dense (7381,) tri-indexed arrays
    (n-major, m within n); potential pairs start at n=2, correction at
    n=0. The WGS84 even zonals are removed from the potential at load."""
    b = _ASSET.read_bytes()
    if b[:8] != b"F3DEGM96":
        raise ValueError("EGM96 asset magic mismatch")
    version, nmax, n_pot, n_corr = struct.unpack_from("<4I", b, 8)
    if version != 1 or nmax != NMAX:
        raise ValueError("EGM96 asset version/degree mismatch")
    total = _tri(NMAX, NMAX) + 1
    if n_pot != total - 3 or n_corr != total:
        raise ValueError("EGM96 asset coefficient counts mismatch")
    pairs = np.frombuffer(b, "<f8", count=2 * (n_pot + n_corr), offset=24)
    pot = pairs[:2 * n_pot].reshape(-1, 2)
    corr = pairs[2 * n_pot:].reshape(-1, 2)
    pot_c = np.zeros(total)
    pot_s = np.zeros(total)
    pot_c[3:] = pot[:, 0]
    pot_s[3:] = pot[:, 1]
    for n, j in _EVEN_ZONALS.items():
        pot_c[_tri(n, 0)] += j / np.sqrt(2 * n + 1.0)
    return pot_c, pot_s, corr[:, 0].copy(), corr[:, 1].copy()


def _legendre_all(cos_t: np.ndarray, sin_t: np.ndarray) -> np.ndarray:
    """Fully-normalized P̄nm(cos θ) for all n<=NMAX, shape (P, T) with P
    tri-indexed; Holmes & Featherstone forward-column recursion."""
    npts = cos_t.shape[0]
    total = _tri(NMAX, NMAX) + 1
    p = np.zeros((total, npts))
    p[_tri(0, 0)] = 1.0
    s3 = np.sqrt(3.0)
    p[_tri(1, 0)] = s3 * cos_t
    p[_tri(1, 1)] = s3 * sin_t
    for m in range(2, NMAX + 1):
        f = np.sqrt((2 * m + 1) / (2.0 * m))
        p[_tri(m, m)] = f * sin_t * p[_tri(m - 1, m - 1)]
    for m in range(0, NMAX):
        p[_tri(m + 1, m)] = np.sqrt(2 * m + 3.0) * cos_t * p[_tri(m, m)]
    for m in range(0, NMAX + 1):
        for n in range(m + 2, NMAX + 1):
            a = np.sqrt((2.0 * n + 1.0) / ((n + m) * (n - m)))
            bq = np.sqrt(2.0 * n - 1.0)
            c = np.sqrt((n + m - 1.0) * (n - m - 1.0) / (2.0 * n - 3.0))
            p[_tri(n, m)] = a * (bq * cos_t * p[_tri(n - 1, m)]
                                 - c * p[_tri(n - 2, m)])
    return p


def egm96_undulation(lon_deg, lat_deg):
    """EGM96 geoid undulation N (metres above the WGS84 ellipsoid),
    vectorized over points."""
    pot_c, pot_s, corr_c, corr_s = load_coefficients()
    lon = np.radians(np.atleast_1d(np.asarray(lon_deg, np.float64)))
    lat = np.radians(np.atleast_1d(np.asarray(lat_deg, np.float64)))
    scalar = np.isscalar(lat_deg) or np.asarray(lat_deg).ndim == 0

    sin_lat = np.sin(lat)
    cos_lat = np.cos(lat)
    t1 = sin_lat * sin_lat
    nu = AE / np.sqrt(1.0 - E2 * t1)
    pxy = nu * cos_lat
    z = nu * (1.0 - E2) * sin_lat
    r = np.hypot(pxy, z)
    lat_gc = np.arctan2(z, pxy)
    gamma = GEQT * (1.0 + SOMIGLIANA_K * t1) / np.sqrt(1.0 - E2 * t1)

    theta = np.pi / 2.0 - lat_gc
    pnm = _legendre_all(np.cos(theta), np.sin(theta))

    m_idx = np.arange(NMAX + 1)
    cosml = np.cos(m_idx[:, None] * lon[None, :])
    sinml = np.sin(m_idx[:, None] * lon[None, :])

    ar = AE / r
    arn = ar.copy()
    a_sum = np.zeros_like(lon)
    corr_sum = np.zeros_like(lon)
    # correction degrees 0 and 1 (potential starts at n=2)
    for n in range(0, 2):
        base = _tri(n, 0)
        for m in range(0, n + 1):
            corr_sum += pnm[base + m] * (corr_c[base + m] * cosml[m]
                                         + corr_s[base + m] * sinml[m])
    for n in range(2, NMAX + 1):
        arn = arn * ar
        base = _tri(n, 0)
        sl = slice(base, base + n + 1)
        harm = pnm[sl] * (pot_c[sl, None] * cosml[:n + 1]
                          + pot_s[sl, None] * sinml[:n + 1])
        a_sum += harm.sum(axis=0) * arn
        ch = pnm[sl] * (corr_c[sl, None] * cosml[:n + 1]
                        + corr_s[sl, None] * sinml[:n + 1])
        corr_sum += ch.sum(axis=0)
    zeta = a_sum * GM / (gamma * r)
    out = zeta + corr_sum / 100.0 + ZERO_DEGREE_M
    return float(out[0]) if scalar else out
