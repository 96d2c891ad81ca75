# forge3d_tpu/pt/adjudication.py — the built-in AEQUITAS adjudication scene.
#
# Parity notes (reference behavior, not code): the reference commits a fully
# literal analytic scene (src/path_tracing/reference_scene.rs:53-98 — three
# GGX spheres + a 40-unit ground quad, sun (-0.45,-0.80,-0.30) at 3.2,
# constant ambient (0.40,0.48,0.62) for env NEE, constant sky
# (0.35,0.45,0.70) for path misses, camera (0,2.2,6.5)->(0,0.9,0) fov 40)
# and renders it through BOTH a wavefront path tracer and a deterministic
# raster twin, resolved by the one shared tonemap
# (src/core/tonemap.rs:11-30 — reinhard x/(1+x) then the EXACT piecewise
# sRGB encode, +0.5 round).
#
# The estimator semantics both lanes share (src/shaders/pt_shade.wgsl:
# 588-618 env NEE, 644 sun NEE, 795-845 Lambert continuation + RR;
# src/shaders/pt_scatter.wgsl:112-133 miss accumulation):
#   - per path vertex: sun NEE  f * Li * cos * V   (full iso Lambert+GGX f),
#   - env NEE sampled from the 0.5*power-cosine(up,16) + 0.5*cosine(n)
#     mixture with the balance-heuristic MIS weight pdf_l/(pdf_l+pdf_bsdf)
#     against the CONSTANT ambient, visibility-tested,
#   - cosine continuation with throughput *= albedo (Lambert branch),
#     Russian roulette from depth 4 (q = clamp(1-max_c, 0, 0.95)),
#     hard cap depth 16,
#   - path miss accumulates throughput * sky UNWEIGHTED (pt_scatter's miss
#     processing carries no MIS weight — the sky is a separate constant
#     from the env-NEE ambient, so the two never double count).
# The raster twin (src/shaders/adjudication_raster.wgsl:296-433) replaces
# the stochastic estimator with a 24x48 midpoint cosine quadrature plus an
# analytic secondary-vertex closure; both are mirrored exactly here as jnp
# programs.

from __future__ import annotations

import math
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# --- the committed scene (literal constants) -------------------------------

CAM_ORIGIN = (0.0, 2.2, 6.5)
CAM_LOOK_AT = (0.0, 0.9, 0.0)
CAM_UP = (0.0, 1.0, 0.0)
FOV_Y_DEG = 40.0

SPHERES = np.array([
    # cx, cy, cz, radius
    [-1.15, 1.0, 0.0, 1.0],
    [1.30, 0.8, 0.55, 0.8],
    [0.25, 0.5, -1.45, 0.5],
], np.float32)
# material slots 0..2 = spheres, 3 = ground plane (reference_scene.rs:62-88)
MAT_ALBEDO = np.array([
    [0.63, 0.28, 0.22],
    [0.24, 0.40, 0.62],
    [0.78, 0.68, 0.30],
    [0.42, 0.42, 0.42],
], np.float32)
MAT_ROUGH = np.array([0.70, 0.55, 0.85, 0.90], np.float32)
PLANE_HALF_EXTENT = 40.0

SUN_DIR = np.array([-0.45, -0.80, -0.30], np.float32)   # travel direction
SUN_INTENSITY = 3.2
SUN_COLOR = np.array([1.0, 0.97, 0.92], np.float32)
AMBIENT = np.array([0.40, 0.48, 0.62], np.float32)       # env-NEE constant
SKY = np.array([0.35, 0.45, 0.70], np.float32)           # miss constant

ENV_QUAD_U = 24      # adjudication_raster.wgsl:58
ENV_QUAD_V = 48
MAX_DEPTH = 16       # pt_shade.wgsl:831
RR_START_DEPTH = 4   # pt_shade.wgsl:813
_PI = math.pi


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def _nearest_hit(ro, rd, tmin=1e-3, tmax=1e30):
    """Nearest hit over 3 spheres + the finite ground quad, mirroring
    adjudication_raster.wgsl::nearest_hit (incl. its t0-else-t1 branch
    order). Returns (t, kind): kind -1=miss, 0..2=sphere, 3=plane."""
    tbest = jnp.full(ro.shape[:-1], tmax, jnp.float32)
    kind = jnp.full(ro.shape[:-1], -1, jnp.int32)
    for i in range(3):
        c = jnp.asarray(SPHERES[i, :3])
        r = float(SPHERES[i, 3])
        oc = ro - c
        b = jnp.sum(oc * rd, -1)
        disc = b * b - (jnp.sum(oc * oc, -1) - r * r)
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        ok0 = (disc > 0.0) & (t0 > tmin) & (t0 < tbest)
        ok1 = (disc > 0.0) & ~ok0 & (t1 > tmin) & (t1 < tbest)
        t = jnp.where(ok0, t0, t1)
        ok = ok0 | ok1
        tbest = jnp.where(ok, t, tbest)
        kind = jnp.where(ok, i, kind)
    denom = rd[..., 1]
    tp = -ro[..., 1] / jnp.where(jnp.abs(denom) < 1e-7, 1e-7, denom)
    px = ro[..., 0] + tp * rd[..., 0]
    pz = ro[..., 2] + tp * rd[..., 2]
    okp = ((jnp.abs(denom) > 1e-7) & (tp > tmin) & (tp < tbest)
           & (jnp.abs(px) <= PLANE_HALF_EXTENT)
           & (jnp.abs(pz) <= PLANE_HALF_EXTENT))
    tbest = jnp.where(okp, tp, tbest)
    kind = jnp.where(okp, 3, kind)
    return tbest, kind


def _occluded(ro, rd, tmin=1e-3, tmax=1e30):
    """Any-hit: spheres (either root in range, no self exclusion — the
    1e-3 surface offset keeps outward rays clear) + the ground quad
    (adjudication_raster.wgsl::occluded)."""
    occ = jnp.zeros(ro.shape[:-1], bool)
    for i in range(3):
        c = jnp.asarray(SPHERES[i, :3])
        r = float(SPHERES[i, 3])
        oc = ro - c
        b = jnp.sum(oc * rd, -1)
        disc = b * b - (jnp.sum(oc * oc, -1) - r * r)
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        hit0 = (t0 > tmin) & (t0 < tmax)
        hit1 = (t1 > tmin) & (t1 < tmax)
        occ |= (disc > 0.0) & (hit0 | hit1)
    denom = rd[..., 1]
    tp = -ro[..., 1] / jnp.where(jnp.abs(denom) < 1e-7, 1e-7, denom)
    px = ro[..., 0] + tp * rd[..., 0]
    pz = ro[..., 2] + tp * rd[..., 2]
    occ |= ((jnp.abs(denom) > 1e-7) & (tp > tmin) & (tp < tmax)
            & (jnp.abs(px) <= PLANE_HALF_EXTENT)
            & (jnp.abs(pz) <= PLANE_HALF_EXTENT))
    return occ


def _surface(ro, rd, t, kind):
    """Hit point, normal, material by kind (plane kind 3: +Y, mat slot 3)."""
    pos = ro + t[..., None] * rd
    n = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                         pos.shape)
    alb = jnp.broadcast_to(jnp.asarray(MAT_ALBEDO[3]), pos.shape)
    rough = jnp.full(pos.shape[:-1], float(MAT_ROUGH[3]), jnp.float32)
    for i in range(3):
        c = jnp.asarray(SPHERES[i, :3])
        sel = (kind == i)[..., None]
        n = jnp.where(sel, _normalize(pos - c), n)
        alb = jnp.where(sel, jnp.asarray(MAT_ALBEDO[i]), alb)
        rough = jnp.where(kind == i, float(MAT_ROUGH[i]), rough)
    return pos, n, alb, rough


def _tangent_basis(n):
    """Branchless ONB (pt_shade.wgsl::make_tangent_basis). Returns (t, b)."""
    sign = jnp.where(n[..., 2] < 0, -1.0, 1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack([1.0 + sign * n[..., 0] ** 2 * a, sign * b,
                   -sign * n[..., 0]], -1)
    bt = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], -1)
    return t, bt


def _cosine_local(u1, u2):
    r = jnp.sqrt(u1)
    phi = 2.0 * _PI * u2
    return (r * jnp.cos(phi), r * jnp.sin(phi),
            jnp.sqrt(jnp.maximum(1.0 - u1, 0.0)))


def _to_world(n, x, y, z):
    t, bt = _tangent_basis(n)
    return _normalize(x[..., None] * t + y[..., None] * bt
                      + z[..., None] * n)


def _bsdf_eval_pdf(wo, wi, n, albedo, rough):
    """Isotropic Lambert+GGX eval + mixture pdf
    (adjudication_raster.wgsl::bsdf_eval_pdf; metallic = 0 scene-wide so
    kd = 1 and the mixture pdf collapses to the diffuse pdf)."""
    ndl = jnp.maximum(jnp.sum(n * wi, -1), 0.0)
    ndv = jnp.maximum(jnp.sum(n * wo, -1), 0.0)
    valid = (ndl > 0.0) & (ndv > 0.0)
    fd = albedo / _PI
    pdf_d = ndl / _PI
    m = jnp.maximum(0.02, rough * rough)
    h = _normalize(wi + wo)
    ndh = jnp.maximum(jnp.sum(n * h, -1), 0.0)
    vdh = jnp.maximum(jnp.sum(wo * h, -1), 0.0)
    a2 = m * m
    d = a2 / jnp.maximum(_PI * jnp.square(ndh * ndh * (a2 - 1.0) + 1.0),
                         1e-6)
    k = jnp.square(m + 1.0) / 8.0
    g = (ndl / (ndl * (1.0 - k) + k)) * (ndv / (ndv * (1.0 - k) + k))
    f = 0.04 + 0.96 * jnp.power(1.0 - jnp.clip(vdh, 0.0, 1.0), 5.0)
    spec = d * g / jnp.maximum(4.0 * ndl * ndv, 1e-6)
    fs = (spec * f)[..., None]
    ftot = jnp.where(valid[..., None], fd + fs, 0.0)
    pdf = jnp.where(valid, jnp.maximum(pdf_d, 1e-8), 0.0)
    return ftot, pdf


def _power_cosine_pdf_up(wi, m=16.0):
    c = jnp.maximum(wi[..., 1], 0.0)
    return (m + 1.0) * jnp.power(c, m) / (2.0 * _PI)


def _env_mixture_pdf(n, wi):
    pdf_up = _power_cosine_pdf_up(wi)
    pdf_cos = jnp.maximum(jnp.sum(n * wi, -1), 0.0) / _PI
    return 0.5 * pdf_up + 0.5 * pdf_cos


_SUN_WI = tuple((-SUN_DIR / np.linalg.norm(SUN_DIR)).tolist())


def _sun_nee(pos, n, wo, alb, rough):
    """Sun NEE with the full isotropic BRDF and analytic occlusion
    (pt_shade.wgsl:644; p_sel = 1 single light)."""
    wi = jnp.broadcast_to(jnp.asarray(_SUN_WI, jnp.float32), pos.shape)
    cos_surf = jnp.maximum(jnp.sum(n * wi, -1), 0.0)
    f, _ = _bsdf_eval_pdf(wo, wi, n, alb, rough)
    vis = ~_occluded(pos + n * 1e-3, wi)
    li = SUN_INTENSITY * jnp.asarray(SUN_COLOR)
    return f * li * (cos_surf * vis.astype(jnp.float32))[..., None]


# --- raster twin: analytic multi-bounce closure ----------------------------

def _plane_exit_radiance(qx, qz):
    """Radiance leaving the ground plane at (qx, 0, qz)
    (adjudication_raster.wgsl::plane_exit_radiance): Lambert sun NEE with
    real occlusion, ambient NEE with the Lambert-MIS constant 0.43752, and
    quaternary sky escape, both attenuated by the solid-angle AO."""
    q = jnp.stack([qx, jnp.zeros_like(qx), qz], -1)
    alb_p = jnp.asarray(MAT_ALBEDO[3])
    wi_s = jnp.asarray(_SUN_WI, jnp.float32)
    l_sun = jnp.zeros(q.shape, jnp.float32)
    if _SUN_WI[1] > 0.0:
        vis = ~_occluded(q + jnp.asarray([0.0, 1e-3, 0.0]),
                         jnp.broadcast_to(wi_s, q.shape))
        l_sun = ((alb_p / _PI) * SUN_INTENSITY * jnp.asarray(SUN_COLOR)
                 * _SUN_WI[1] * vis.astype(jnp.float32)[..., None])
    ao = jnp.ones(qx.shape, jnp.float32)
    for i in range(3):
        c = jnp.asarray(SPHERES[i, :3])
        r = float(SPHERES[i, 3])
        d = c - q
        d2 = jnp.sum(d * d, -1)
        cosf = jnp.clip(d[..., 1] / jnp.sqrt(jnp.maximum(d2, 1e-12)),
                        0.0, 1.0)
        ao = ao - jnp.where(d2 > r * r, (r * r / jnp.maximum(d2, 1e-12))
                            * cosf, 0.0)
    ao = jnp.clip(ao, 0.0, 1.0)[..., None]
    return (l_sun + alb_p * jnp.asarray(AMBIENT) * 0.43752 * ao
            + alb_p * jnp.asarray(SKY) * ao)


def _sphere_plane_exit():
    """plane_exit_radiance below each sphere center — scene constants
    (XLA constant-folds these under jit)."""
    xs = jnp.asarray(SPHERES[:, 0])
    zs = jnp.asarray(SPHERES[:, 2])
    return _plane_exit_radiance(xs, zs)


def _secondary_radiance(p2, n2, idx2, wo2):
    """Analytic secondary-vertex closure
    (adjudication_raster.wgsl::secondary_radiance): sun NEE + the
    cosine-hemisphere partition into open sky / plane-blocked /
    sphere-blocked fractions, with the tmis cubic for the Lambert-pdf
    MIS-weighted ambient integral."""
    idx_c = jnp.clip(idx2, 0, 3)
    alb2 = jnp.asarray(MAT_ALBEDO)[idx_c]
    rough2 = jnp.asarray(MAT_ROUGH)[idx_c]
    l = _sun_nee(p2, n2, wo2, alb2, rough2)

    ny = n2[..., 1]
    fp = jnp.where(idx2 != 3, 0.5 * (1.0 - ny), 0.0)
    ao = 1.0 - fp
    fss = []
    for i in range(3):
        c = jnp.asarray(SPHERES[i, :3])
        r = float(SPHERES[i, 3])
        d = c - p2
        d2 = jnp.sum(d * d, -1)
        cosf = jnp.clip(jnp.sum(n2 * d, -1)
                        / jnp.sqrt(jnp.maximum(d2, 1e-12)), 0.0, 1.0)
        f = (r * r / jnp.maximum(d2, 1e-12)) * cosf
        f = jnp.where((idx2 != i) & (d2 > r * r), f, 0.0)
        fss.append(f)
        ao = ao - f
    ao = jnp.clip(ao, 0.0, 1.0)

    c = jnp.clip(ny, -1.0, 1.0)
    tmis = 0.35583 + c * (0.06546 + c * (0.03152 - c * 0.01529))
    l = l + alb2 * jnp.asarray(AMBIENT) * (tmis * ao)[..., None]
    l = l + alb2 * jnp.asarray(SKY) * ao[..., None]
    pe_here = _plane_exit_radiance(p2[..., 0], p2[..., 2])
    l = l + alb2 * pe_here * fp[..., None]
    pe_s = _sphere_plane_exit()
    for i in range(3):
        l = l + (alb2 * jnp.asarray(MAT_ALBEDO[i]) * pe_s[i]
                 * fss[i][..., None])
    return l


def _camera_rays(width, height, jx, jy):
    eye = jnp.asarray(CAM_ORIGIN, jnp.float32)
    fwd = _normalize(jnp.asarray(CAM_LOOK_AT, jnp.float32) - eye)
    right = _normalize(jnp.cross(fwd, jnp.asarray(CAM_UP, jnp.float32)))
    up = jnp.cross(right, fwd)
    half_h = math.tan(math.radians(FOV_Y_DEG) * 0.5)
    half_w = half_h * width / height
    ys, xs = jnp.mgrid[0:height, 0:width]
    u = ((xs + jx) / width * 2.0 - 1.0) * half_w
    v = (1.0 - (ys + jy) / height * 2.0) * half_h
    rd = _normalize(u[..., None] * right + v[..., None] * up + fwd)
    ro = jnp.broadcast_to(eye, rd.shape)
    return ro, rd


def _raster_frame(width, height):
    """Deterministic raster twin: pixel-center rays + the converged
    analytic estimate (adjudication_raster.wgsl::surface_radiance —
    sun NEE, 24x48 midpoint cosine env quadrature collecting the
    MIS-weighted ambient NEE AND the unweighted sky continuation per
    escaped direction, the secondary closure per blocked direction)."""
    ro, rd = _camera_rays(width, height,
                          jnp.full((height, width), 0.5),
                          jnp.full((height, width), 0.5))
    t, kind = _nearest_hit(ro, rd)
    hit = kind >= 0
    pos, n, alb, rough = _surface(ro, rd, t, kind)
    wo = _normalize(jnp.asarray(CAM_ORIGIN, jnp.float32) - pos)
    radiance = _sun_nee(pos, n, wo, alb, rough)

    shadow_o = pos + n * 1e-3
    tvec, btvec = _tangent_basis(n)

    ii, jj = np.meshgrid(np.arange(ENV_QUAD_U), np.arange(ENV_QUAD_V),
                         indexing="ij")
    u1s = ((ii.ravel() + 0.5) / ENV_QUAD_U).astype(np.float32)
    u2s = ((jj.ravel() + 0.5) / ENV_QUAD_V).astype(np.float32)

    def step(accum, uu):
        u1, u2 = uu
        x, y, z = _cosine_local(u1, u2)   # scalars: one quadrature node
        wi = _normalize(x * tvec + y * btvec + z * n)
        cos_surf = jnp.maximum(jnp.sum(n * wi, -1), 0.0)
        live = cos_surf > 0.0
        t2, kind2 = _nearest_hit(shadow_o, wi)
        escaped = kind2 < 0
        f, pdf_b = _bsdf_eval_pdf(wo, wi, n, alb, rough)
        pdf_l = _env_mixture_pdf(n, wi)
        w_mis = pdf_l / jnp.maximum(pdf_l + pdf_b, 1e-8)
        esc = (f * jnp.asarray(AMBIENT) * w_mis[..., None]
               + (alb / _PI) * jnp.asarray(SKY))
        p2 = shadow_o + t2[..., None] * wi
        n2 = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                              p2.shape)
        for i in range(3):
            c = jnp.asarray(SPHERES[i, :3])
            n2 = jnp.where((kind2 == i)[..., None], _normalize(p2 - c), n2)
        sec = (alb / _PI) * _secondary_radiance(p2, n2, kind2, -wi)
        contrib = jnp.where(escaped[..., None], esc, sec)
        return accum + jnp.where(live[..., None], contrib, 0.0), None

    # scan over the 1152 quadrature directions (each step is an H x W map)
    zero = jnp.zeros(pos.shape, jnp.float32)
    accum, _ = jax.lax.scan(step, zero, (jnp.asarray(u1s), jnp.asarray(u2s)))
    radiance = radiance + accum * (_PI / float(ENV_QUAD_U * ENV_QUAD_V))
    return jnp.where(hit[..., None], radiance, jnp.asarray(SKY))


# --- PT lane: the wavefront estimator as a dense masked path loop ----------

def _pt_sample(key, width, height):
    """One spp of the reference wavefront estimator (pt_shade/pt_scatter):
    full 16-depth Lambert path with per-vertex sun + mixture-MIS env NEE,
    RR from depth 4, unweighted sky on miss. (The RNG stream layout is not
    contractual — the goldens are converged at 4096 spp, so only the
    estimator's expectation matters; a rank-1-lattice variant was tried and
    REVERTED: its cross-dimension correlations cost more SSIM than the
    stratification bought.)"""
    shape = (height, width)
    kj, kpath = jax.random.split(key)
    jx = jax.random.uniform(jax.random.fold_in(kj, 0), shape)
    jy = jax.random.uniform(jax.random.fold_in(kj, 1), shape)
    ro0, rd0 = _camera_rays(width, height, jx, jy)

    def body(depth, state):
        ro, rd, thr, alive, acc = state
        kd = jax.random.fold_in(kpath, depth)

        def u(j):
            return jax.random.uniform(jax.random.fold_in(kd, j), shape)
        t, kind = _nearest_hit(ro, rd)
        miss = kind < 0
        acc = acc + jnp.where((alive & miss)[..., None],
                              thr * jnp.asarray(SKY), 0.0)
        alive = alive & ~miss
        pos, n, alb, rough = _surface(ro, rd, t, kind)
        wo = -rd
        # sun NEE
        sun = _sun_nee(pos, n, wo, alb, rough)
        acc = acc + jnp.where(alive[..., None], thr * sun, 0.0)
        # env NEE: mixture sample + balance-heuristic MIS + visibility
        u1 = u(0)
        u2 = u(1)
        u3 = u(2)
        # power-cosine about up (exponent 16)
        cos_t = jnp.power(1.0 - u2, 1.0 / 17.0)
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
        phi = 2.0 * _PI * u3
        wi_up = jnp.stack([sin_t * jnp.cos(phi), cos_t,
                           sin_t * jnp.sin(phi)], -1)
        x, y, z = _cosine_local(u2, u3)
        wi_cos = _to_world(n, x, y, z)
        take_up = (u1 < 0.5)[..., None]
        wi_l = jnp.where(take_up, wi_up, wi_cos)
        cos_surf = jnp.maximum(jnp.sum(n * wi_l, -1), 0.0)
        pdf_l = _env_mixture_pdf(n, wi_l)
        f, pdf_b = _bsdf_eval_pdf(wo, wi_l, n, alb, rough)
        w_mis = pdf_l / jnp.maximum(pdf_l + pdf_b, 1e-8)
        vis = ~_occluded(pos + n * 1e-3, wi_l)
        env_c = (f * jnp.asarray(AMBIENT)
                 * (cos_surf / jnp.maximum(pdf_l, 1e-8) * w_mis
                    * vis.astype(jnp.float32))[..., None])
        acc = acc + jnp.where((alive & (cos_surf > 0.0))[..., None],
                              thr * env_c, 0.0)
        # Lambert continuation: throughput *= albedo exactly; hard cap 16
        u4 = u(3)
        u5 = u(4)
        x, y, z = _cosine_local(u4, u5)
        d = _to_world(n, x, y, z)
        thr_new = thr * alb
        # RR from depth 4 (masked before that: q = 0 is a no-op)
        max_c = jnp.max(thr_new, -1)
        q = jnp.where(depth >= RR_START_DEPTH,
                      jnp.clip(1.0 - max_c, 0.0, 0.95), 0.0)
        u6 = u(5)
        alive = alive & (u6 >= q) & (depth + 1 < MAX_DEPTH)
        thr_new = thr_new / jnp.maximum(1.0 - q, 1e-6)[..., None]
        return (pos + n * 1e-3, d, thr_new, alive, acc)

    state = (ro0, rd0, jnp.ones(ro0.shape, jnp.float32),
             jnp.ones(shape, bool), jnp.zeros(ro0.shape, jnp.float32))
    state = jax.lax.fori_loop(0, MAX_DEPTH, body, state)
    return state[4]


def _tonemap(hdr):
    """The shared resolve (src/core/tonemap.rs:11-30): reinhard then the
    exact piecewise sRGB encode, +0.5 round."""
    from forge3d_tpu.ops.tonemap import srgb_eotf_inv

    x = jnp.maximum(hdr, 0.0)
    y = x / (1.0 + x)
    srgb = jnp.clip(srgb_eotf_inv(y), 0.0, 1.0)
    rgba = jnp.concatenate(
        [jnp.clip(srgb * 255.0 + 0.5, 0, 255).astype(jnp.uint8),
         jnp.full(srgb.shape[:-1] + (1,), 255, jnp.uint8)], -1)
    return rgba


def render_adjudication_builtin(width: int = 512, height: int = 512, *,
                                spp: int = 64,
                                seed: int = 7) -> Tuple[np.ndarray,
                                                        np.ndarray, Dict]:
    """Render the committed adjudication scene through both lanes.

    Returns (pt_rgba, raster_rgba, meta) in the native seam's contract
    (render_adjudication_pair)."""
    width, height, spp = int(width), int(height), max(int(spp), 1)

    @jax.jit
    def pt():
        def body(i, acc):
            return acc + _pt_sample(jax.random.fold_in(
                jax.random.PRNGKey(seed), i), width, height)
        hdr = jax.lax.fori_loop(
            0, spp, body, jnp.zeros((height, width, 3), jnp.float32))
        return _tonemap(hdr / spp)

    @jax.jit
    def raster():
        return _tonemap(_raster_frame(width, height))

    meta_common = {
        "cam_origin": CAM_ORIGIN, "cam_look_at": CAM_LOOK_AT,
        "fov_y_deg": FOV_Y_DEG,
        "sun_intensity": SUN_INTENSITY,
        "ambient_r": float(AMBIENT[0]), "ambient_g": float(AMBIENT[1]),
        "ambient_b": float(AMBIENT[2]),
        "sky_r": float(SKY[0]), "sky_g": float(SKY[1]),
        "sky_b": float(SKY[2]),
    }
    return (np.asarray(pt()), np.asarray(raster()),
            {"pt": dict(meta_common), "raster": dict(meta_common)})
