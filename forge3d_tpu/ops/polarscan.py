# forge3d_tpu/ops/polarscan.py
# Polar primary-visibility scan: per-pixel heightfield ray casting without
# per-ray gathers.
#
# Reference behavior being replaced (not copied): the primary camera-ray
# pass of the terrain PT (/root/reference/src/shaders/
# hybrid_terrain_traversal.wgsl:193-314 quadtree descent). Per-ray descent
# is gather-bound on TPU (PERF.md); this module exploits that ALL primary
# rays share one origin:
#
#   * every ray lies in a vertical plane through the camera, indexed by its
#     horizontal azimuth tangent tan(beta) relative to the camera's forward;
#   * the intersection of that plane with the height surface is a 1D height
#     profile, sampled where the plane crosses each camera-aligned grid row
#     (a per-row 1D interpolation = small batched matmuls on the MXU);
#   * along a profile, the running maximum M(k) of the sample elevation
#     tangents is monotone, so the FIRST crossing of a ray at elevation
#     tangent q is also the first k with M(k) >= q — first-hit for a whole
#     column of rays becomes one cumulative max plus a first-crossing
#     indicator contraction (MXU), no marching loop at all;
#   * the (tan(beta), q) "polar" radiance image is warped to the screen once
#     per resolve with a single structured bilinear resample.
#
# Everything is rolls / interpolation matmuls / cumulative max — the shapes
# XLA tiles well onto the MXU/VPU.

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_F32 = jnp.float32
_NEG = jnp.float32(-1.0e30)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class PolarStatic:
    """Static polar-scan geometry (python floats; jitted programs
    specialize on the camera, which is static per render)."""

    a_count: int       # azimuth columns
    e_count: int       # elevation rows
    k_count: int       # radial samples (camera-aligned grid rows)
    k0: int            # first rotated-grid row index used (floor(cam_iv))
    t_lo: float        # tan(beta) of azimuth column 0
    t_step: float
    q_lo: float        # elevation tangent of row 0
    q_step: float
    cam_y: float
    # world-frame unit axes of the rotated grid (horizontal)
    e_u: Tuple[float, float, float]
    e_v: Tuple[float, float, float]
    cam_iu: float      # camera ground position in grid index units
    cam_iv: float
    spacing: float


def plan_polar(*, width: int, height: int, fov_y_deg: float,
               right, up, fwd, cam_y: float,
               rg_n_v: int, rg_n_u: int, rg_spacing: float,
               e_u, e_v, cam_iu: float, cam_iv: float,
               density: float = 1.3, max_axis: int = 4096) -> PolarStatic:
    """Size the polar grid from the camera frustum.

    Requires a roll-free camera whose forward has a horizontal component
    (d . e_v > 0 for every frustum ray); raises ValueError otherwise — the
    caller falls back to the per-ray traversal engines for exotic cameras.
    """
    right = np.asarray(right, np.float64)
    up_v = np.asarray(up, np.float64)
    fwd = np.asarray(fwd, np.float64)
    e_u3 = np.asarray(e_u, np.float64)
    e_v3 = np.asarray(e_v, np.float64)
    if abs(float(right[1])) > 1e-3:
        raise ValueError("polar scan requires a roll-free camera")
    hh = math.tan(math.radians(fov_y_deg) * 0.5)
    hw = hh * (width / height)
    # probe frustum directions on a dense border grid for coverage bounds
    xs = np.linspace(-1.0, 1.0, 9)
    ys = np.linspace(-1.0, 1.0, 9)
    gx, gy = np.meshgrid(xs, ys)
    d = (fwd[None, None, :]
         + gx[..., None] * hw * right[None, None, :]
         + gy[..., None] * hh * up_v[None, None, :])
    cu = d @ e_u3
    cv = d @ e_v3
    cy = d[..., 1]
    if float(cv.min()) < 0.05:
        raise ValueError(
            "frustum contains near-vertical rays; polar scan unsupported "
            "(fall back to traversal='dda'/'mxu')")
    tanb = cu / cv
    q = cy / np.sqrt(cu * cu + cv * cv)
    t_margin = 0.02 * (tanb.max() - tanb.min() + 1e-6)
    q_margin = 0.02 * (q.max() - q.min() + 1e-6)
    t_lo, t_hi = float(tanb.min() - t_margin), float(tanb.max() + t_margin)
    q_lo, q_hi = float(q.min() - q_margin), float(q.max() + q_margin)

    # pixel-footprint-matched grid densities (a touch denser than the
    # densest screen mapping so the final warp never undersamples)
    dt_pix = (2.0 * hw / width) / float(cv.max())
    dq_pix = np.inf
    qg = q
    dq_pix = min(float(np.abs(np.diff(qg, axis=0)).min()) / (ys[1] - ys[0])
                 * (2.0 / height), np.inf)
    a_count = _round_up(int(math.ceil((t_hi - t_lo) / (dt_pix / density))), 128)
    e_count = _round_up(int(math.ceil((q_hi - q_lo) / max(dq_pix / density,
                                                          1e-6))), 128)
    a_count = min(a_count, max_axis)
    e_count = min(e_count, max_axis)

    # first radial row: just past the camera when it sits inside the grid,
    # else the grid start (the grid covers only the DEM bbox; the camera
    # may be far outside it)
    k0 = min(max(int(math.floor(cam_iv)), 0), max(rg_n_v - 12, 0))
    k_count = max(rg_n_v - k0 - 3, 8)
    return PolarStatic(
        a_count=a_count, e_count=e_count, k_count=k_count, k0=k0,
        t_lo=t_lo, t_step=(t_hi - t_lo) / a_count,
        q_lo=q_lo, q_step=(q_hi - q_lo) / e_count,
        cam_y=float(cam_y), e_u=tuple(map(float, e_u3)),
        e_v=tuple(map(float, e_v3)), cam_iu=float(cam_iu),
        cam_iv=float(cam_iv), spacing=float(rg_spacing))


def polar_directions(ps: PolarStatic, ja=0.0, je=0.0):
    """World-frame unit direction for each (elevation, azimuth) polar texel
    center (+ sub-texel jitter)."""
    t = ps.t_lo + (jnp.arange(ps.a_count, dtype=_F32) + 0.5 + ja) * ps.t_step
    q = ps.q_lo + (jnp.arange(ps.e_count, dtype=_F32) + 0.5 + je) * ps.q_step
    inv_h = jax.lax.rsqrt(1.0 + t * t)
    hx = (ps.e_v[0] + t * ps.e_u[0]) * inv_h
    hz = (ps.e_v[2] + t * ps.e_u[2]) * inv_h
    inv = jax.lax.rsqrt(1.0 + q * q)[:, None]
    dx = hx[None, :] * inv
    dz = hz[None, :] * inv
    dy = q[:, None] * inv * jnp.ones((1, ps.a_count), _F32)
    return dx, dy, dz, t, q


def extract_profiles(rotbuf, ps: PolarStatic, *, xi=0.0, ja=0.0,
                     chunk: int = 128):
    """Sample per-azimuth profiles from the rotated channel buffer.

    rotbuf: (n_v, n_u, C) — channel 0 MUST be world height (used for the
    out-of-range mask). xi in [0, 1): radial phase jitter (fraction of a
    row); ja in [-0.5, 0.5): azimuth grid jitter (sub-texel).
    Radial sample k lives at grid row k0 + k + 1 + xi, i.e. at horizontal
    offset (k0 + k + 1 + xi - cam_iv) rows past the camera.
    Returns profiles (K, A, C).
    """
    n_v, n_u, C = rotbuf.shape
    K, A = ps.k_count, ps.a_count
    t = ps.t_lo + (jnp.arange(A, dtype=_F32) + 0.5 + ja) * ps.t_step
    # radial row lerp commutes with the column interpolation
    src = (1.0 - xi) * jax.lax.dynamic_slice_in_dim(rotbuf, ps.k0 + 1, K, 0) \
        + xi * jax.lax.dynamic_slice_in_dim(rotbuf, ps.k0 + 2, K, 0)

    iota_j = jnp.arange(n_u, dtype=_F32)
    base = ps.k0 + 1.0 - ps.cam_iv

    def do_chunk(args):
        src_c, k_idx = args
        # u position per (k, a): cam_iu + koff * tan(beta)
        koff = k_idx.astype(_F32) + base + xi
        p = ps.cam_iu + koff[:, None] * t[None, :]          # (kc, A)
        w = jnp.maximum(
            0.0, 1.0 - jnp.abs(p[:, None, :] - iota_j[None, :, None]))
        prof = jnp.einsum("kjc,kja->kac", src_c, w,
                          preferred_element_type=_F32)
        oob = (p < 0.0) | (p > n_u - 1)
        # out-of-grid samples must read as "no terrain": mask the height
        # channel to -1e30 (other channels are only consumed where hit)
        h = jnp.where(oob, _NEG, prof[..., 0])
        return jnp.concatenate([h[..., None], prof[..., 1:]], axis=-1)

    n_chunks = (K + chunk - 1) // chunk
    Kp = n_chunks * chunk
    pad = Kp - K
    src_p = jnp.pad(src, ((0, pad), (0, 0), (0, 0)))
    k_ids = jnp.arange(Kp, dtype=jnp.int32).reshape(n_chunks, chunk)
    prof = jax.lax.map(
        do_chunk, (src_p.reshape(n_chunks, chunk, n_u, C), k_ids))
    prof = prof.reshape(Kp, A, C)[:K]
    return prof


def profile_hit_tangents(h_prof, ps: PolarStatic, xi=0.0, ja=0.0):
    """Elevation tangent of each profile sample as seen from the camera,
    plus the horizontal distance per sample. Returns (q_prof, s_h)."""
    K, A = h_prof.shape
    t = ps.t_lo + (jnp.arange(A, dtype=_F32) + 0.5 + ja) * ps.t_step
    sec_b = jnp.sqrt(1.0 + t * t)
    base = ps.k0 + 1.0 - ps.cam_iv                        # static offset
    koff = jnp.arange(K, dtype=_F32) + base + xi
    s_h = koff[:, None] * ps.spacing * sec_b[None, :]     # (K, A) horizontal
    q_prof = (h_prof - ps.cam_y) / jnp.maximum(s_h, 1e-6)
    # out-of-DEM samples carry h = -1e30; clamp the tangent to a finite
    # sentinel (still far below any real ray tangent) so downstream
    # squaring can't overflow to inf and poison 0*inf = NaN in the
    # first-crossing contraction. Rows at/behind the camera (possible when
    # the camera ground point is past the grid) can never be hit.
    q_prof = jnp.clip(q_prof, -1e4, 1e4)
    q_prof = jnp.where(koff[:, None] > 0.25, q_prof, -1e4)
    return q_prof, s_h


def synthesize_polar(values, q_prof, miss_values, ps: PolarStatic,
                     je=0.0, a_chunk: int = 128):
    """First-hit contraction: polar(e, a, c) = values at the first profile
    sample whose running-max tangent crosses the ray tangent q_e; rays with
    no crossing get miss_values.

    values:      (K, A, C) per-profile-sample shaded values
    q_prof:      (K, A) sample elevation tangents
    miss_values: (E, A, C) environment values
    Returns (E, A, C).
    """
    K, A, C = values.shape
    E = ps.e_count
    M = jax.lax.cummax(q_prof, axis=0)                    # (K, A) monotone
    q_e = ps.q_lo + (jnp.arange(E, dtype=_F32) + 0.5 + je) * ps.q_step

    def do_chunk(args):
        m_c, v_c = args                                   # (K, Ac), (K, Ac, C)
        ge = (m_c[None, :, :] >= q_e[:, None, None]).astype(_F32)  # (E,K,Ac)
        cross = ge - jnp.concatenate(
            [jnp.zeros((E, 1, ge.shape[2]), _F32), ge[:, :-1]], axis=1)
        out = jnp.einsum("eka,kac->eac", cross, v_c,
                         preferred_element_type=_F32)
        hit_any = ge[:, -1, :]                            # (E, Ac)
        return out, hit_any

    n_chunks = (A + a_chunk - 1) // a_chunk
    Ap = n_chunks * a_chunk
    m_p = jnp.pad(M, ((0, 0), (0, Ap - A)))
    v_p = jnp.pad(values, ((0, 0), (0, Ap - A), (0, 0)))
    out, hit_any = jax.lax.map(
        do_chunk,
        (m_p.reshape(K, n_chunks, a_chunk).transpose(1, 0, 2),
         v_p.reshape(K, n_chunks, a_chunk, C).transpose(1, 0, 2, 3)))
    out = out.transpose(1, 0, 2, 3).reshape(E, Ap, C)[:, :A]
    hit_any = hit_any.transpose(1, 0, 2).reshape(E, Ap)[:, :A]
    return out + (1.0 - hit_any[..., None]) * miss_values


def warp_to_screen(polar, ps: PolarStatic, *, width: int, height: int,
                   fov_y_deg: float, right, up, fwd, supersample: int = 2):
    """Resample the polar image to the screen (bilinear, box-downsampled
    from a supersampled grid). polar: (E, A, C) -> (height, width, C)."""
    E, A, C = polar.shape
    ss = int(supersample)
    Ws, Hs = width * ss, height * ss
    hh = math.tan(math.radians(fov_y_deg) * 0.5)
    hw = hh * (width / height)
    xs = jax.lax.broadcasted_iota(_F32, (Hs, Ws), 1)
    ys = jax.lax.broadcasted_iota(_F32, (Hs, Ws), 0)
    ndc_x = ((xs + 0.5) / Ws) * 2.0 - 1.0
    ndc_y = (1.0 - (ys + 0.5) / Hs) * 2.0 - 1.0
    r = jnp.asarray(right, _F32)
    u = jnp.asarray(up, _F32)
    f = jnp.asarray(fwd, _F32)
    dx = f[0] + ndc_x * hw * r[0] + ndc_y * hh * u[0]
    dy = f[1] + ndc_x * hw * r[1] + ndc_y * hh * u[1]
    dz = f[2] + ndc_x * hw * r[2] + ndc_y * hh * u[2]
    eu = ps.e_u
    ev = ps.e_v
    cu = dx * eu[0] + dy * eu[1] + dz * eu[2]
    cv = dx * ev[0] + dy * ev[1] + dz * ev[2]
    tanb = cu / jnp.maximum(cv, 1e-6)
    q = dy * jax.lax.rsqrt(cu * cu + cv * cv)
    a_f = (tanb - ps.t_lo) / ps.t_step - 0.5
    e_f = (q - ps.q_lo) / ps.q_step - 0.5
    a0 = jnp.clip(jnp.floor(a_f), 0, A - 2).astype(jnp.int32)
    e0 = jnp.clip(jnp.floor(e_f), 0, E - 2).astype(jnp.int32)
    wa = jnp.clip(a_f - a0, 0.0, 1.0)[None, ...]
    we = jnp.clip(e_f - e0, 0.0, 1.0)[None, ...]
    base = (e0 * A + a0).reshape(-1)
    # Row-takes of (E*A, C) pad the small channel dim to the 128-lane tile
    # (14x HBM expansion) — fine for small frames and far fewer gathers;
    # large frames use per-channel flat takes to stay inside HBM.
    if Hs * Ws * 128 * 4 <= (1 << 31):
        flat = polar.reshape(E * A, C)
        wa2 = wa.reshape(Hs, Ws)[..., None]
        we2 = we.reshape(Hs, Ws)[..., None]
        p00 = jnp.take(flat, base, axis=0).reshape(Hs, Ws, C)
        p01 = jnp.take(flat, base + 1, axis=0).reshape(Hs, Ws, C)
        p10 = jnp.take(flat, base + A, axis=0).reshape(Hs, Ws, C)
        p11 = jnp.take(flat, base + A + 1, axis=0).reshape(Hs, Ws, C)
        img = (p00 * (1 - wa2) * (1 - we2) + p01 * wa2 * (1 - we2)
               + p10 * (1 - wa2) * we2 + p11 * wa2 * we2)
        if ss > 1:
            img = img.reshape(height, ss, width, ss, C).mean(axis=(1, 3))
        return img
    w00 = ((1 - wa) * (1 - we)).reshape(Hs, Ws)
    w01 = (wa * (1 - we)).reshape(Hs, Ws)
    w10 = ((1 - wa) * we).reshape(Hs, Ws)
    w11 = (wa * we).reshape(Hs, Ws)
    chans = []
    for c in range(C):
        flat_c = polar[..., c].reshape(-1)
        v = (jnp.take(flat_c, base).reshape(Hs, Ws) * w00
             + jnp.take(flat_c, base + 1).reshape(Hs, Ws) * w01
             + jnp.take(flat_c, base + A).reshape(Hs, Ws) * w10
             + jnp.take(flat_c, base + A + 1).reshape(Hs, Ws) * w11)
        if ss > 1:
            v = v.reshape(height, ss, width, ss).mean(axis=(1, 3))
        chans.append(v)
    return jnp.stack(chans, axis=-1)
