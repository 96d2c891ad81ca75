# forge3d_tpu/ops/tonemap.py
# Tonemap operators + sRGB transfer. All pure jnp, fusible.
#
# Parity notes: Reinhard with exposure matches the hybrid kernel's
# reinhard_tonemap (/root/reference/src/shaders/hybrid_kernel.wgsl:109-112);
# filmic/ACES/sRGB match tone_map.wgsl / postprocess_tonemap.wgsl operators.

from __future__ import annotations

import jax.numpy as jnp


def reinhard(color, exposure=1.0):
    """exposed / (1 + exposed), per channel."""
    exposed = color * exposure
    return exposed / (1.0 + exposed)


def reinhard_extended(color, exposure=1.0, white_point=4.0):
    c = color * exposure
    w2 = white_point * white_point
    return c * (1.0 + c / w2) / (1.0 + c)


def filmic_hejl(color, exposure=1.0):
    """Hejl-Burgess-Dawson filmic approximation (includes its own sRGB)."""
    c = jnp.maximum(color * exposure - 0.004, 0.0)
    return (c * (6.2 * c + 0.5)) / (c * (6.2 * c + 1.7) + 0.06)


def aces(color, exposure=1.0):
    """Narkowicz ACES fit."""
    c = color * exposure
    a, b, cc, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((c * (a * c + b)) / (c * (cc * c + d) + e), 0.0, 1.0)


def srgb_eotf_inv(linear):
    """Linear -> sRGB encode."""
    linear = jnp.clip(linear, 0.0, 1.0)
    lo = linear * 12.92
    hi = 1.055 * jnp.power(jnp.maximum(linear, 1e-7), 1.0 / 2.4) - 0.055
    return jnp.where(linear <= 0.0031308, lo, hi)


def srgb_eotf(srgb):
    """sRGB -> linear decode."""
    srgb = jnp.clip(srgb, 0.0, 1.0)
    lo = srgb / 12.92
    hi = jnp.power((srgb + 0.055) / 1.055, 2.4)
    return jnp.where(srgb <= 0.04045, lo, hi)


_OPERATORS = {
    "reinhard": reinhard,
    "reinhard_extended": reinhard_extended,
    "filmic": filmic_hejl,
    "aces": aces,
}


def apply(name: str, color, exposure=1.0, **kw):
    try:
        fn = _OPERATORS[name]
    except KeyError:
        raise ValueError(f"unknown tonemap operator {name!r}; have {sorted(_OPERATORS)}")
    return fn(color, exposure=exposure, **kw)


def f16_round(x):
    """Round-trip through float16 — models the reference's RGBA16F output
    texture readback so u8 quantization matches (render_terrain.rs:1240)."""
    return x.astype(jnp.float16).astype(jnp.float32)


def to_u8(x):
    """clamp(0,1) * 255 + 0.5, truncated — the reference's u8 quantizer."""
    return jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5  # caller casts to uint8
