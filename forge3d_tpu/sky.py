# forge3d_tpu/sky.py
# Analytic daylight sky model + sun ephemeris helpers.
#
# Parity notes (reference behavior, not code): /root/reference/src/terrain/
# hosek_sky.rs evaluates the Hosek-Wilkie analytic sky from baked
# coefficient tables; src/lighting/ephemeris.rs is a NOAA solar
# calculator. Here the sky is the Preetham et al. 1999 model (the classic
# public Perez-function fit — same role: turbidity-parameterized analytic
# clear-sky radiance), evaluated in fused jnp so renderers sample it
# on-device; the solar-position ephemeris reuses astro.py (Meeus).

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PreethamSky", "make_sky", "sky_radiance", "sun_position_at",
           "sky_environment_map", "HosekSky", "make_hosek_sky",
           "hosek_radiance", "hosek_environment_map"]

_F32 = jnp.float32


class PreethamSky(NamedTuple):
    """Precomputed Perez coefficients for one (turbidity, sun) state."""

    sun_dir: jax.Array          # (3,) unit, y up
    perez_Y: jax.Array          # (5,)
    perez_x: jax.Array
    perez_y: jax.Array
    zenith_Y: jax.Array         # ()
    zenith_x: jax.Array
    zenith_y: jax.Array
    exposure: jax.Array


def _perez_coeffs(T: float):
    """Preetham's published linear fits of the Perez parameters vs
    turbidity T."""
    pY = np.array([0.1787 * T - 1.4630, -0.3554 * T + 0.4275,
                   -0.0227 * T + 5.3251, 0.1206 * T - 2.5771,
                   -0.0670 * T + 0.3703])
    px = np.array([-0.0193 * T - 0.2592, -0.0665 * T + 0.0008,
                   -0.0004 * T + 0.2125, -0.0641 * T - 0.8989,
                   -0.0033 * T + 0.0452])
    py = np.array([-0.0167 * T - 0.2608, -0.0950 * T + 0.0092,
                   -0.0079 * T + 0.2102, -0.0441 * T - 1.6537,
                   -0.0109 * T + 0.0529])
    return pY, px, py


def _zenith_values(T: float, theta_s: float):
    chi = (4.0 / 9.0 - T / 120.0) * (math.pi - 2 * theta_s)
    Yz = (4.0453 * T - 4.9710) * math.tan(chi) - 0.2155 * T + 2.4192  # kcd/m2
    ts = theta_s
    tv = np.array([ts ** 3, ts ** 2, ts, 1.0])
    Tv = np.array([T * T, T, 1.0])
    Mx = np.array([[0.00166, -0.00375, 0.00209, 0.0],
                   [-0.02903, 0.06377, -0.03202, 0.00394],
                   [0.11693, -0.21196, 0.06052, 0.25886]])
    My = np.array([[0.00275, -0.00610, 0.00317, 0.0],
                   [-0.04214, 0.08970, -0.04153, 0.00516],
                   [0.15346, -0.26756, 0.06670, 0.26688]])
    xz = float(Tv @ (Mx @ tv))
    yz = float(Tv @ (My @ tv))
    return max(Yz, 1e-3), xz, yz


def make_sky(sun_azimuth_deg: float, sun_elevation_deg: float, *,
             turbidity: float = 3.0, exposure: float = 0.05) -> PreethamSky:
    """Build the sky state for a sun position (reference seam: the
    hosek_sky constructor)."""
    T = float(np.clip(turbidity, 1.7, 10.0))
    el = math.radians(sun_elevation_deg)
    az = math.radians(sun_azimuth_deg)
    sun = np.array([math.cos(el) * math.sin(az), math.sin(el),
                    math.cos(el) * math.cos(az)])
    theta_s = math.pi / 2 - el
    pY, px, py = _perez_coeffs(T)
    Yz, xz, yz = _zenith_values(T, theta_s)
    return PreethamSky(
        sun_dir=jnp.asarray(sun, _F32),
        perez_Y=jnp.asarray(pY, _F32), perez_x=jnp.asarray(px, _F32),
        perez_y=jnp.asarray(py, _F32),
        zenith_Y=jnp.asarray(Yz, _F32), zenith_x=jnp.asarray(xz, _F32),
        zenith_y=jnp.asarray(yz, _F32),
        exposure=jnp.asarray(exposure, _F32))


def _perez(coeff, cos_theta, gamma, cos_gamma):
    A, B, C, D, E = (coeff[i] for i in range(5))
    ct = jnp.maximum(cos_theta, 0.01)
    return ((1.0 + A * jnp.exp(B / ct))
            * (1.0 + C * jnp.exp(D * gamma) + E * cos_gamma * cos_gamma))


def sky_radiance(sky: PreethamSky, dx, dy, dz):
    """Linear RGB radiance toward view direction (any array shape);
    below-horizon directions fade to the horizon color."""
    dy_c = jnp.maximum(dy, 0.0)
    norm = jnp.sqrt(dx * dx + dy_c * dy_c + dz * dz) + 1e-9
    vx = dx / norm
    vy = dy_c / norm
    vz = dz / norm
    cos_theta = vy
    cos_gamma = jnp.clip(vx * sky.sun_dir[0] + vy * sky.sun_dir[1]
                         + vz * sky.sun_dir[2], -1.0, 1.0)
    gamma = jnp.arccos(cos_gamma)
    sun_cos_theta = jnp.maximum(sky.sun_dir[1], 0.01)
    gamma_s = jnp.arccos(jnp.clip(sun_cos_theta, -1, 1))

    def channel(coeff, zenith):
        num = _perez(coeff, cos_theta, gamma, cos_gamma)
        den = _perez(coeff, sun_cos_theta * 0 + 1.0, gamma_s, sun_cos_theta)
        return zenith * num / jnp.maximum(den, 1e-6)

    Y = channel(sky.perez_Y, sky.zenith_Y)
    x = channel(sky.perez_x, sky.zenith_x)
    y = channel(sky.perez_y, sky.zenith_y)

    # xyY -> XYZ -> linear sRGB
    ys = jnp.maximum(y, 1e-4)
    X = x / ys * Y
    Z = (1 - x - y) / ys * Y
    r = 3.2406 * X - 1.5372 * Y - 0.4986 * Z
    g = -0.9689 * X + 1.8758 * Y + 0.0415 * Z
    b = 0.0557 * X - 0.2040 * Y + 1.0570 * Z
    e = sky.exposure
    return (jnp.maximum(r, 0.0) * e, jnp.maximum(g, 0.0) * e,
            jnp.maximum(b, 0.0) * e)


def sun_position_at(jd: float, latitude_deg: float, longitude_deg: float
                    ) -> Tuple[float, float]:
    """(azimuth_deg, elevation_deg) of the sun for an observer — the NOAA
    ephemeris seam, served by the Meeus solar series in astro.py."""
    from .astro import astro_body_position, equatorial_to_altaz

    sun = astro_body_position("sun", jd)
    alt, az = equatorial_to_altaz(sun["ra_deg"], sun["dec_deg"], jd,
                                  latitude_deg, longitude_deg, refract=True)
    return az, alt


def sky_environment_map(sky: PreethamSky, width: int = 256,
                        height: int = 128) -> np.ndarray:
    """Bake an equirect environment map (H, W, 3) float32 for IBL."""
    us = (np.arange(width) + 0.5) / width
    vs = (np.arange(height) + 0.5) / height
    phi = (us * 2 - 1) * math.pi
    theta = vs * math.pi
    P, Th = np.meshgrid(phi, theta)
    dx = np.sin(Th) * np.sin(P)
    dy = np.cos(Th)
    dz = np.sin(Th) * np.cos(P)
    r, g, b = sky_radiance(sky, jnp.asarray(dx, _F32),
                           jnp.asarray(dy, _F32), jnp.asarray(dz, _F32))
    return np.stack([np.asarray(r), np.asarray(g), np.asarray(b)],
                    -1).astype(np.float32)


# ---------------------------------------------------------------------------
# Hosek-Wilkie RGB sky (the reference's model: src/terrain/hosek_sky.rs)
# ---------------------------------------------------------------------------
# Coefficients are the published Hosek/Wilkie RGB dataset
# (ArHosekSkyModelData_RGB.h, (c) 2012-2013 Lukas Hosek & Alexander Wilkie,
# BSD 3-clause), stored as assets/hosek_rgb.npz. Layout per channel:
# config 1080 = 2 albedos x 10 turbidities x 6 elevation-Bezier knots x 9
# coefficients; radiance 120 = 2 x 10 x 6.


class HosekSky(NamedTuple):
    """Cooked Hosek-Wilkie state for one (turbidity, albedo, sun)."""

    sun_dir: jax.Array       # (3,) unit, y up
    configs: jax.Array       # (3, 9) per-channel coefficients
    radiances: jax.Array     # (3,) expected-value scale
    exposure: jax.Array


_HOSEK_DATA = None


def _hosek_data():
    global _HOSEK_DATA
    if _HOSEK_DATA is None:
        from pathlib import Path

        z = np.load(Path(__file__).parent / "assets" / "hosek_rgb.npz")
        _HOSEK_DATA = ([z[f"rgb{c}"] for c in (1, 2, 3)],
                       [z[f"rad{c}"] for c in (1, 2, 3)])
    return _HOSEK_DATA


def _elevation_basis(solar_elevation: float) -> np.ndarray:
    """Quintic Bezier basis over cbrt-warped normalized solar elevation
    (hosek_sky.rs:71-84)."""
    s = min(max(solar_elevation / (math.pi / 2), 0.0), 1.0) ** (1.0 / 3.0)
    o = 1.0 - s
    return np.array([o ** 5, 5 * o ** 4 * s, 10 * o ** 3 * s * s,
                     10 * o * o * s ** 3, 5 * o * s ** 4, s ** 5])


def _cook_channel(cfg: np.ndarray, rad: np.ndarray, turbidity: float,
                  albedo: float, elev: float):
    """Quad-linear blend over (albedo, turbidity) of Bezier-mixed elevation
    blocks (hosek_sky.rs:107-186)."""
    t = min(max(turbidity, 1.0), 10.0)
    it = int(min(math.floor(t), 10.0))
    rem = 0.0 if it == 10 else t - it
    a = min(max(albedo, 0.0), 1.0)
    basis = _elevation_basis(elev)

    cfg = cfg.reshape(2, 10, 6, 9)
    rad = rad.reshape(2, 10, 6)

    def mix(arr, ai, ti):
        return np.tensordot(basis, arr[ai, ti], axes=(0, 0))

    out_c = ((1 - a) * (1 - rem) * mix(cfg, 0, it - 1)
             + a * (1 - rem) * mix(cfg, 1, it - 1))
    out_r = ((1 - a) * (1 - rem) * mix(rad, 0, it - 1)
             + a * (1 - rem) * mix(rad, 1, it - 1))
    if it != 10:
        out_c += ((1 - a) * rem * mix(cfg, 0, it)
                  + a * rem * mix(cfg, 1, it))
        out_r += ((1 - a) * rem * mix(rad, 0, it)
                  + a * rem * mix(rad, 1, it))
    return out_c, float(out_r)


def make_hosek_sky(sun_azimuth_deg: float, sun_elevation_deg: float, *,
                   turbidity: float = 3.0, ground_albedo: float = 0.3,
                   exposure: float = 1.0) -> HosekSky:
    """Cook the Hosek-Wilkie RGB sky for a sun position."""
    cfgs, rads = _hosek_data()
    elev = math.radians(max(sun_elevation_deg, 0.0))
    configs = []
    radiances = []
    for c in range(3):
        cc, rr = _cook_channel(cfgs[c], rads[c], turbidity, ground_albedo,
                               elev)
        configs.append(cc)
        radiances.append(rr)
    az = math.radians(sun_azimuth_deg)
    el = math.radians(sun_elevation_deg)
    sun = np.array([math.cos(az) * math.cos(el), math.sin(el),
                    math.sin(az) * math.cos(el)], np.float32)
    return HosekSky(
        sun_dir=jnp.asarray(sun),
        configs=jnp.asarray(np.stack(configs), _F32),
        radiances=jnp.asarray(np.asarray(radiances), _F32),
        exposure=jnp.asarray(exposure, _F32),
    )


def hosek_radiance(sky: HosekSky, dx, dy, dz):
    """Per-direction RGB radiance (fused jnp; hosek_sky.rs eval_channel /
    ArHosekSkyModel_GetRadianceInternal). Directions below the horizon
    clamp to the horizon value."""
    inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    dxn, dyn, dzn = dx * inv, dy * inv, dz * inv
    cos_theta = jnp.maximum(dyn, 0.0)
    cos_gamma = jnp.clip(dxn * sky.sun_dir[0] + dyn * sky.sun_dir[1]
                         + dzn * sky.sun_dir[2], -1.0, 1.0)
    gamma = jnp.arccos(cos_gamma)
    ray_m = cos_gamma * cos_gamma
    zenith = jnp.sqrt(cos_theta)

    out = []
    for c in range(3):
        cf = sky.configs[c]
        exp_m = jnp.exp(cf[4] * gamma)
        mie_denom = jnp.maximum(1.0 + cf[8] * cf[8] - 2.0 * cf[8] * cos_gamma,
                                1e-4)
        mie_m = (1.0 + ray_m) / (mie_denom * jnp.sqrt(mie_denom))
        val = ((1.0 + cf[0] * jnp.exp(cf[1] / (cos_theta + 0.01)))
               * (cf[2] + cf[3] * exp_m + cf[5] * ray_m + cf[6] * mie_m
                  + cf[7] * zenith))
        out.append(val * sky.radiances[c] * sky.exposure)
    return out[0], out[1], out[2]


def hosek_environment_map(sun_azimuth_deg: float, sun_elevation_deg: float,
                          *, turbidity: float = 3.0,
                          ground_albedo: float = 0.3,
                          exposure: float = 1.0,
                          width: int = 256, height: int = 128) -> np.ndarray:
    """Bake an equirect (H, W, 3) f32 env map in the convention consumed by
    ops.shading.env_radiance (u = atan2(z, x)/2pi + 0.5, v = acos(y)/pi)."""
    sky = make_hosek_sky(sun_azimuth_deg, sun_elevation_deg,
                         turbidity=turbidity, ground_albedo=ground_albedo,
                         exposure=exposure)
    us = (np.arange(width) + 0.5) / width
    vs = (np.arange(height) + 0.5) / height
    phi = (us - 0.5) * 2 * math.pi
    theta = vs * math.pi
    P, Th = np.meshgrid(phi, theta)
    dx = np.sin(Th) * np.cos(P)
    dy = np.cos(Th)
    dz = np.sin(Th) * np.sin(P)
    r, g, b = hosek_radiance(sky, jnp.asarray(dx, _F32),
                             jnp.asarray(dy, _F32), jnp.asarray(dz, _F32))
    return np.stack([np.asarray(r), np.asarray(g), np.asarray(b)],
                    -1).astype(np.float32)
