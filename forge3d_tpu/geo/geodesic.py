# forge3d_tpu/geo/geodesic.py
# Geodesic direct/inverse problems on the ellipsoid (Vincenty with
# antipodal fallback note). Reference parity: geodesic_direct/inverse
# (/root/reference/src/geo/geodesic.rs — Karney there; Vincenty here is
# mm-accurate away from near-antipodal pairs, which is the operating range
# of map-scale workloads; the antipodal case raises rather than returning a
# wrong answer).

from __future__ import annotations

import math
from typing import Tuple

from ..errors import TransformFailed
from .crs import WGS84, Ellipsoid


def geodesic_inverse(lon1, lat1, lon2, lat2, ell: Ellipsoid = WGS84) -> dict:
    """Distance + forward/back azimuths between two points (Vincenty)."""
    a, f = ell.a, ell.f
    b = ell.b
    phi1, phi2 = math.radians(lat1), math.radians(lat2)
    L = math.radians(lon2 - lon1)
    U1 = math.atan((1 - f) * math.tan(phi1))
    U2 = math.atan((1 - f) * math.tan(phi2))
    sinU1, cosU1 = math.sin(U1), math.cos(U1)
    sinU2, cosU2 = math.sin(U2), math.cos(U2)

    if abs(lat1 - lat2) < 1e-13 and abs(L) < 1e-13:
        return {"distance": 0.0, "azimuth1": 0.0, "azimuth2": 0.0}

    lam = L
    for _ in range(200):
        sinl, cosl = math.sin(lam), math.cos(lam)
        sin_sigma = math.hypot(cosU2 * sinl, cosU1 * sinU2 - sinU1 * cosU2 * cosl)
        if sin_sigma == 0.0:
            return {"distance": 0.0, "azimuth1": 0.0, "azimuth2": 0.0}
        cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cosl
        sigma = math.atan2(sin_sigma, cos_sigma)
        sin_alpha = cosU1 * cosU2 * sinl / sin_sigma
        cos2_alpha = 1.0 - sin_alpha**2
        cos_2sm = cos_sigma - 2 * sinU1 * sinU2 / cos2_alpha if cos2_alpha else 0.0
        C = f / 16 * cos2_alpha * (4 + f * (4 - 3 * cos2_alpha))
        lam_prev = lam
        lam = L + (1 - C) * f * sin_alpha * (
            sigma + C * sin_sigma * (cos_2sm + C * cos_sigma * (-1 + 2 * cos_2sm**2))
        )
        if abs(lam - lam_prev) < 1e-13:
            break
    else:
        raise TransformFailed(
            "Vincenty inverse failed to converge (near-antipodal points)"
        )

    u2 = cos2_alpha * ell.ep2
    A = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    B = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    d_sigma = B * sin_sigma * (
        cos_2sm + B / 4 * (
            cos_sigma * (-1 + 2 * cos_2sm**2)
            - B / 6 * cos_2sm * (-3 + 4 * sin_sigma**2) * (-3 + 4 * cos_2sm**2)
        )
    )
    s = b * A * (sigma - d_sigma)
    az1 = math.atan2(cosU2 * math.sin(lam), cosU1 * sinU2 - sinU1 * cosU2 * math.cos(lam))
    az2 = math.atan2(cosU1 * math.sin(lam), -sinU1 * cosU2 + cosU1 * sinU2 * math.cos(lam))
    return {
        "distance": s,
        "azimuth1": math.degrees(az1) % 360.0,
        "azimuth2": math.degrees(az2) % 360.0,
    }


def geodesic_direct(lon1, lat1, azimuth_deg, distance_m,
                    ell: Ellipsoid = WGS84) -> dict:
    """Destination point from start + azimuth + distance (Vincenty direct)."""
    a, f = ell.a, ell.f
    b = ell.b
    alpha1 = math.radians(azimuth_deg)
    s = float(distance_m)
    phi1 = math.radians(lat1)
    U1 = math.atan((1 - f) * math.tan(phi1))
    sigma1 = math.atan2(math.tan(U1), math.cos(alpha1))
    sin_alpha = math.cos(U1) * math.sin(alpha1)
    cos2_alpha = 1 - sin_alpha**2
    u2 = cos2_alpha * ell.ep2
    A = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    B = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    sigma = s / (b * A)
    for _ in range(200):
        cos_2sm = math.cos(2 * sigma1 + sigma)
        sin_sigma = math.sin(sigma)
        cos_sigma = math.cos(sigma)
        d_sigma = B * sin_sigma * (
            cos_2sm + B / 4 * (
                cos_sigma * (-1 + 2 * cos_2sm**2)
                - B / 6 * cos_2sm * (-3 + 4 * sin_sigma**2) * (-3 + 4 * cos_2sm**2)
            )
        )
        sigma_prev = sigma
        sigma = s / (b * A) + d_sigma
        if abs(sigma - sigma_prev) < 1e-13:
            break
    sin_sigma = math.sin(sigma)
    cos_sigma = math.cos(sigma)
    cos_2sm = math.cos(2 * sigma1 + sigma)
    sinU1, cosU1 = math.sin(U1), math.cos(U1)
    phi2 = math.atan2(
        sinU1 * cos_sigma + cosU1 * sin_sigma * math.cos(alpha1),
        (1 - f) * math.hypot(sin_alpha,
                             sinU1 * sin_sigma - cosU1 * cos_sigma * math.cos(alpha1)),
    )
    lam = math.atan2(sin_sigma * math.sin(alpha1),
                     cosU1 * cos_sigma - sinU1 * sin_sigma * math.cos(alpha1))
    C = f / 16 * cos2_alpha * (4 + f * (4 - 3 * cos2_alpha))
    L = lam - (1 - C) * f * sin_alpha * (
        sigma + C * sin_sigma * (cos_2sm + C * cos_sigma * (-1 + 2 * cos_2sm**2))
    )
    lon2 = (math.degrees(L) + lon1 + 540) % 360 - 180
    az2 = math.atan2(sin_alpha, -(sinU1 * sin_sigma - cosU1 * cos_sigma * math.cos(alpha1)))
    return {
        "lon": lon2,
        "lat": math.degrees(phi2),
        "azimuth2": math.degrees(az2) % 360.0,
    }
