# forge3d_tpu/pt/adjudication.py — the built-in AEQUITAS adjudication scene.
#
# Parity notes (reference behavior, not code): the reference commits a
# fully literal analytic scene (src/path_tracing/reference_scene.rs:53-98 —
# three GGX spheres + a 40-unit ground plane, sun (-0.45,-0.80,-0.30) at
# 3.2, constant ambient (0.40,0.48,0.62), constant sky (0.35,0.45,0.70),
# camera (0,2.2,6.5)->(0,0.9,0) fov 40) and renders it through BOTH a
# wavefront path tracer and an analytic raster twin, resolved by one
# shared reinhard+gamma tonemap (test_adjudication_gate.py gates dE2000
# and shadow-band SSIM between the two). Here both lanes are jnp
# programs: the PT lane is a depth-2 path integrator with sun/ambient
# NEE; the raster twin is the deterministic direct+ambient closure.

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
SPHERE_ALBEDO = np.array([
    [0.63, 0.28, 0.22],
    [0.24, 0.40, 0.62],
    [0.78, 0.68, 0.30],
], np.float32)
SPHERE_ROUGH = np.array([0.70, 0.55, 0.85], np.float32)
PLANE_ALBEDO = np.array([0.42, 0.42, 0.42], np.float32)
PLANE_ROUGH = 0.90
PLANE_HALF_EXTENT = 40.0

SUN_DIR = np.array([-0.45, -0.80, -0.30], np.float32)   # travel direction
SUN_INTENSITY = 3.2
SUN_COLOR = np.array([1.0, 0.97, 0.92], np.float32)
AMBIENT = np.array([0.40, 0.48, 0.62], np.float32)
SKY = np.array([0.35, 0.45, 0.70], np.float32)


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def _intersect(ro, rd):
    """Nearest hit over 3 spheres + the finite plane.

    Returns (t, kind) with kind -1=miss, 0..2=sphere, 3=plane."""
    tbest = jnp.full(ro.shape[:-1], jnp.inf, jnp.float32)
    kind = jnp.full(ro.shape[:-1], -1, jnp.int32)
    for i in range(3):
        c = jnp.asarray(SPHERES[i, :3])
        r = float(SPHERES[i, 3])
        oc = ro - c
        b = jnp.sum(oc * rd, -1)
        disc = b * b - (jnp.sum(oc * oc, -1) - r * r)
        ok = disc > 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        t = jnp.where(t0 > 1e-3, t0, t1)
        ok &= (t > 1e-3) & (t < tbest)
        tbest = jnp.where(ok, t, tbest)
        kind = jnp.where(ok, i, kind)
    # plane y = 0
    denom = rd[..., 1]
    tp = -ro[..., 1] / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    px = ro[..., 0] + tp * rd[..., 0]
    pz = ro[..., 2] + tp * rd[..., 2]
    okp = ((tp > 1e-3) & (tp < tbest)
           & (jnp.abs(px) <= PLANE_HALF_EXTENT)
           & (jnp.abs(pz) <= PLANE_HALF_EXTENT))
    tbest = jnp.where(okp, tp, tbest)
    kind = jnp.where(okp, 3, kind)
    return tbest, kind


def _occluded(ro, rd, tmax, self_kind=None):
    """Any-hit against the spheres; `self_kind` excludes the originating
    sphere (its self-shadowing is the ndl clamp, and keeping it in the
    test speckles the terminator with grazing self-hits)."""
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
        t = jnp.where(t0 > 1e-3, t0, t1)
        hit = (disc > 0.0) & (t > 1e-3) & (t < tmax)
        if self_kind is not None:
            hit &= self_kind != i
        occ |= hit
    return occ


def _surface(ro, rd, t, kind):
    pos = ro + t[..., None] * rd
    n = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                         pos.shape)
    alb = jnp.broadcast_to(jnp.asarray(PLANE_ALBEDO), pos.shape)
    rough = jnp.full(pos.shape[:-1], PLANE_ROUGH, jnp.float32)
    for i in range(3):
        c = jnp.asarray(SPHERES[i, :3])
        sel = (kind == i)[..., None]
        n = jnp.where(sel, _normalize(pos - c), n)
        alb = jnp.where(sel, jnp.asarray(SPHERE_ALBEDO[i]), alb)
        rough = jnp.where(kind == i, float(SPHERE_ROUGH[i]), rough)
    return pos, n, alb, rough


def _ggx_brdf(n, v, l, rough):
    """GGX specular (scalar weight; F0 = 0.04 dielectric)."""
    h = _normalize(v + l)
    ndl = jnp.maximum(jnp.sum(n * l, -1), 0.0)
    ndv = jnp.maximum(jnp.sum(n * v, -1), 1e-4)
    ndh = jnp.maximum(jnp.sum(n * h, -1), 0.0)
    vdh = jnp.maximum(jnp.sum(v * h, -1), 0.0)
    a = jnp.maximum(rough * rough, 1e-3)
    a2 = a * a
    d = a2 / jnp.maximum(math.pi * jnp.square(ndh * ndh * (a2 - 1) + 1),
                         1e-7)
    k = jnp.square(rough + 1.0) / 8.0
    g = (ndl / (ndl * (1 - k) + k)) * (ndv / (ndv * (1 - k) + k))
    f = 0.04 + 0.96 * jnp.power(1.0 - vdh, 5.0)
    return d * g * f / jnp.maximum(4.0 * ndl * ndv, 1e-6)


def _direct_light(pos, n, v, alb, rough, kind=None):
    """Sun NEE (diffuse + GGX) with analytic shadow visibility."""
    l = -jnp.asarray(_normalize(jnp.asarray(SUN_DIR))[...])
    ndl = jnp.maximum(jnp.sum(n * l, -1), 0.0)
    vis = ~_occluded(pos + n * 1e-3, jnp.broadcast_to(l, pos.shape),
                     jnp.inf, self_kind=kind)
    spec = _ggx_brdf(n, v, jnp.broadcast_to(l, pos.shape), rough)
    radiance = SUN_INTENSITY * jnp.asarray(SUN_COLOR)
    diff = alb / math.pi
    return (diff + spec[..., None]) * radiance * (
        ndl * vis.astype(jnp.float32))[..., None]


def _cosine_dir(n, u1, u2):
    r = jnp.sqrt(u1)
    phi = 2 * math.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1 - u1, 0.0))
    # tangent basis
    sign = jnp.where(n[..., 2] < 0, -1.0, 1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack([1.0 + sign * n[..., 0] ** 2 * a, sign * b,
                   -sign * n[..., 0]], -1)
    bt = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], -1)
    return _normalize(x[..., None] * t + y[..., None] * bt
                      + z[..., None] * n)


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


def _pt_sample(key, width, height):
    """One spp: primary hit -> sun NEE + ambient NEE + one cosine bounce."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    jx = jax.random.uniform(k1, (height, width))
    jy = jax.random.uniform(k2, (height, width))
    ro, rd = _camera_rays(width, height, jx, jy)
    t, kind = _intersect(ro, rd)
    hit = kind >= 0
    pos, n, alb, rough = _surface(ro, rd, t, kind)
    v = -rd
    radiance = _direct_light(pos, n, v, alb, rough, kind)
    # ambient NEE: one cosine-sampled visibility ray against the constant
    # environment (the reference's constant-ambient NEE)
    u1 = jax.random.uniform(k3, (height, width))
    u2 = jax.random.uniform(k4, (height, width))
    d1 = _cosine_dir(n, u1, u2)
    t2, kind2 = _intersect(pos + n * 1e-3, d1)
    open_sky = kind2 < 0
    radiance = radiance + jnp.where(
        open_sky[..., None], alb * jnp.asarray(AMBIENT), 0.0)
    # one indirect bounce: direct sun at the bounce point
    pos2, n2, alb2, rough2 = _surface(pos + n * 1e-3, d1, t2, kind2)
    bounce = _direct_light(pos2, n2, -d1, alb2, rough2, kind2)
    radiance = radiance + jnp.where((~open_sky)[..., None],
                                    alb * bounce, 0.0)
    return jnp.where(hit[..., None], radiance, jnp.asarray(SKY))


def _tonemap(hdr):
    x = jnp.maximum(hdr, 0.0)
    y = x / (1.0 + x)
    srgb = jnp.power(jnp.clip(y, 0.0, 1.0), 1.0 / 2.2)
    rgba = jnp.concatenate(
        [jnp.clip(srgb * 255.0 + 0.5, 0, 255).astype(jnp.uint8),
         jnp.full(srgb.shape[:-1] + (1,), 255, jnp.uint8)], -1)
    return rgba


def _raster_frame(width, height):
    """Deterministic raster twin: pixel-center rays, sun NEE + analytic
    ambient occlusion against the spheres."""
    ro, rd = _camera_rays(width, height,
                          jnp.full((height, width), 0.5),
                          jnp.full((height, width), 0.5))
    t, kind = _intersect(ro, rd)
    hit = kind >= 0
    pos, n, alb, rough = _surface(ro, rd, t, kind)
    radiance = _direct_light(pos, n, -rd, alb, rough, kind)
    # ambient: constant env times the unoccluded cosine-weighted solid
    # angle; each sphere removes approximately its projected solid-angle
    # fraction weighted by the cosine toward its center
    occ = jnp.zeros(pos.shape[:-1], jnp.float32)
    for i in range(3):
        c = jnp.asarray(SPHERES[i, :3])
        r = float(SPHERES[i, 3])
        d = c - pos
        dist2 = jnp.maximum(jnp.sum(d * d, -1), 1e-6)
        dist = jnp.sqrt(dist2)
        sin2 = jnp.clip(r * r / dist2, 0.0, 1.0)
        cos_cone = jnp.sqrt(1.0 - sin2)
        cosw = jnp.maximum(jnp.sum(n * d, -1) / dist, 0.0)
        frac = (1.0 - cos_cone) * cosw
        # a point ON sphere i has dist == r up to float noise; the
        # self-sphere's below-horizon occlusion is already excluded by
        # the cosine clamp, so skip it instead of dithering at dist ~ r
        occ = occ + jnp.where((dist > r * 1.001) & (kind != i), frac, 0.0)
    amb_vis = jnp.clip(1.0 - occ, 0.0, 1.0)
    radiance = radiance + alb * jnp.asarray(AMBIENT) * amb_vis[..., None]
    return jnp.where(hit[..., None], radiance, jnp.asarray(SKY))


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
