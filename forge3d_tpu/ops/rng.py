# forge3d_tpu/ops/rng.py
# Deterministic, estimator-parity RNG for all path-tracing kernels.
#
# Parity notes: the reference advances a per-pixel u32 xorshift32 state
# (/root/reference/src/shaders/pt_raygen.wgsl:75-82) seeded as
#   state = seed_hi ^ (x*1664525) ^ (y*1013904223) ^ (frame*92837111) ^ seed_lo
# (/root/reference/src/shaders/hybrid_terrain_traversal.wgsl:407-408) with
# seed_lo = seed ^ 0x85EBCA6B (render_terrain.rs:627). We reproduce the exact
# bit pattern so sample streams (and therefore images) can match the
# reference estimator sample-for-sample. All ops are vectorized uint32
# lattices — counter-ish and fully fusible under XLA; there is no sequential
# dependence between pixels.

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def seed_state(seed_hi, seed_lo, x, y, frame_index):
    """Initial per-pixel xorshift32 state (exact reference bit pattern)."""
    x = x.astype(_U32)
    y = y.astype(_U32)
    return (
        _U32(seed_hi)
        ^ (x * _U32(1664525))
        ^ (y * _U32(1013904223))
        ^ (_U32(frame_index) * _U32(92837111))
        ^ _U32(seed_lo)
    )


def xorshift32(state):
    """One xorshift32 step. Returns (new_state, uniform f32 in [0,1))."""
    x = state
    x = x ^ (x << _U32(13))
    x = x ^ (x >> _U32(17))
    x = x ^ (x << _U32(5))
    u = x.astype(jnp.float32) / jnp.float32(4294967296.0)
    return x, u


def tent_offset(u):
    """Zero-mean tent-distributed sample in [-1, 1] via inverse CDF.

    Matches terrain_tent_offset (hybrid_terrain_traversal.wgsl:349-354).
    """
    lo = jnp.sqrt(2.0 * u) - 1.0
    hi = 1.0 - jnp.sqrt(jnp.maximum(2.0 * (1.0 - u), 0.0))
    return jnp.where(u < 0.5, lo, hi)


def derive_seed_lo(seed: int) -> int:
    """seed_lo companion word (reference: render_terrain.rs:627)."""
    return (int(seed) ^ 0x85EBCA6B) & 0xFFFFFFFF
