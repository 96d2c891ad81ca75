# forge3d_tpu/ops/shading.py
# Shared shading math: luminance, cosine-hemisphere sampling, environment
# radiance. Pure jnp; used by the terrain PT reference and the megakernel.
#
# Parity notes: terrain_luminance / terrain_cosine_dir / terrain_env_radiance
# in /root/reference/src/shaders/hybrid_terrain_traversal.wgsl:332-371.

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_PI = 3.14159265358979323846


def luminance(r, g, b):
    return 0.2126 * r + 0.7152 * g + 0.0722 * b


def cosine_dir(nx, ny, nz, u1, u2):
    """Cosine-weighted hemisphere direction about n (branchless
    Duff-et-al. orthonormal basis, matching the reference)."""
    sign = jnp.where(nz < 0.0, -1.0, 1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    tx = 1.0 + sign * nx * nx * a
    ty = sign * b
    tz = -sign * nx
    bx = b
    by = sign + ny * ny * a
    bz = -ny
    r = jnp.sqrt(u1)
    phi = 2.0 * _PI * u2
    lx = r * jnp.cos(phi)
    ly = r * jnp.sin(phi)
    lz = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    dx = lx * tx + ly * bx + lz * nx
    dy = lx * ty + ly * by + lz * ny
    dz = lx * tz + ly * bz + lz * nz
    inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    return dx * inv, dy * inv, dz * inv


class EnvMap(NamedTuple):
    """Equirect environment map (or the constant-white fallback when rgb is
    None-shaped: width 0 is encoded by passing `None` for rgb)."""

    rgb: Optional[jax.Array]   # (eh, ew, 3) f32 or None
    intensity: jax.Array       # () f32


def env_radiance(env: EnvMap, dx, dy, dz):
    """Equirect nearest-texel lookup by direction; constant-white fallback
    scaled by intensity when no map is bound (wgsl:332-345)."""
    if env.rgb is None:
        ones = jnp.ones_like(dx)
        return env.intensity * ones, env.intensity * ones, env.intensity * ones
    eh, ew, _ = env.rgb.shape
    inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    nxd, nyd, nzd = dx * inv, dy * inv, dz * inv
    uu = jnp.arctan2(nzd, nxd) / (2.0 * _PI) + 0.5
    vv = jnp.arccos(jnp.clip(nyd, -1.0, 1.0)) / _PI
    px = jnp.minimum((uu * ew).astype(jnp.int32), ew - 1)
    py = jnp.minimum((vv * eh).astype(jnp.int32), eh - 1)
    flat = py * ew + px
    r = jnp.take(env.rgb[..., 0].ravel(), flat)
    g = jnp.take(env.rgb[..., 1].ravel(), flat)
    b = jnp.take(env.rgb[..., 2].ravel(), flat)
    return r * env.intensity, g * env.intensity, b * env.intensity


def sun_direction(azimuth_deg, elevation_deg):
    """Unit vector from surface toward the sun
    (reference: render_terrain.rs:606-609)."""
    az = jnp.deg2rad(azimuth_deg)
    el = jnp.deg2rad(elevation_deg)
    return jnp.cos(az) * jnp.cos(el), jnp.sin(el), jnp.sin(az) * jnp.cos(el)
