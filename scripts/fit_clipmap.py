#!/usr/bin/env python3
"""Fit the clipmap-recipe camera/mesh parameters against the reference
golden (mapscene_clipmap_large_region).

Model = the reference's clipmap render convention: terrain mesh in the
world XY plane with heights along +Z (terrain_pbr_pom.wgsl
vs_clipmap_main), orbit camera parameterized around +Y
(upload.rs build_camera_matrices non-zup branch: eye_offset =
(R sin(theta) cos(phi), R cos(theta), R sin(theta) sin(phi)), up = +Y),
perspective fov over 128x80, flat-shaded triangles colored by the height
colormap, navy clear color.
"""
import math
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim

GOLD = png_to_numpy(
    "/root/reference/tests/golden/recipes/mapscene_clipmap_large_region.png"
).astype(np.float32)[..., :3] / 255.0
H, W = GOLD.shape[:2]

size = 32
x = np.linspace(-1.0, 1.0, size, dtype=np.float32)
xx, yy = np.meshgrid(x, x)
DEM = (0.35 * np.sin(xx * np.pi * 2.0)
       + 0.22 * np.cos(yy * np.pi * 3.0)).astype(np.float32)

# colormap fitted for the recipe board (ref_terrain_stops)
POS = np.array([0.0, 1 / 3, 2 / 3, 1.0])
COLS = np.array([[0.0, 0.877, 0.0], [0.626, 0.84, 0.0],
                 [1.126, 0.633, 0.0], [0.708, 0.094, 0.052]], np.float32)
T256 = np.linspace(0, 1, 256)
LUT = np.stack([np.interp(T256, POS, COLS[:, c]) for c in range(3)], -1)

CLEAR = np.array([25, 25, 38], np.float32) / 255.0


def render(p):
    (E, R, theta_deg, phi_deg, fov_deg, zs, sun_az, sun_el, inten, amb,
     flip) = p
    n = size
    dem = DEM
    if int(flip) & 1:
        dem = dem[::-1]
    if int(flip) & 2:
        dem = dem[:, ::-1]
    if int(flip) & 4:
        dem = dem.T
    lo, hi = float(dem.min()), float(dem.max())
    t01 = np.clip(0.5 + dem / max(2 * max(abs(lo), abs(hi)), 1e-9), 0, 1)
    g = np.linspace(-0.5 * E, 0.5 * E, n)
    vx, vy = np.meshgrid(g, g)
    vz = (dem - (lo + hi) * 0.5) * zs

    theta = math.radians(theta_deg)
    phi = math.radians(phi_deg)
    eye = np.array([R * math.sin(theta) * math.cos(phi),
                    R * math.cos(theta),
                    R * math.sin(theta) * math.sin(phi)])
    target = np.zeros(3)
    fwd = (target - eye)
    fwd /= np.linalg.norm(fwd)
    upw = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, upw)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    half_h = math.tan(math.radians(fov_deg) * 0.5)
    half_w = (W / H) * half_h

    world = np.stack([vx, vy, vz], -1)
    rel = world - eye
    cz = rel @ fwd
    czc = np.maximum(cz, 1e-6)
    sx = ((rel @ right) / (czc * half_w) + 1) * 0.5 * W - 0.5
    sy = (1 - (rel @ up) / (czc * half_h)) * 0.5 * H - 0.5

    az = math.radians(sun_az)
    el = math.radians(sun_el)
    lvec = np.array([math.cos(el) * math.sin(az),
                     math.cos(el) * math.cos(az),
                     math.sin(el)])

    img = np.tile(CLEAR, (H, W, 1)).astype(np.float32)
    zbuf = np.full((H, W), np.inf)
    ys2, xs2 = np.mgrid[0:H, 0:W]
    for i in range(n - 1):
        for j in range(n - 1):
            quad = [(i, j), (i, j + 1), (i + 1, j + 1), (i + 1, j)]
            zs4 = np.array([cz[a, b] for a, b in quad])
            if (zs4 <= 0).all():
                continue
            pts = np.array([[sx[a, b], sy[a, b]] for a, b in quad])
            if pts[:, 0].max() < 0 or pts[:, 0].min() >= W \
                    or pts[:, 1].max() < 0 or pts[:, 1].min() >= H:
                continue
            wpos = np.array([world[a, b] for a, b in quad])
            tcell = float(np.mean([t01[a, b] for a, b in quad]))
            albedo = LUT[int(np.clip(tcell * 255, 0, 255))]
            for tri in ((0, 1, 2), (0, 2, 3)):
                tp = pts[list(tri)]
                tz = zs4[list(tri)]
                if (tz <= 0).any():
                    continue
                xmin = max(int(np.floor(tp[:, 0].min())), 0)
                xmax = min(int(np.ceil(tp[:, 0].max())) + 1, W)
                ymin = max(int(np.floor(tp[:, 1].min())), 0)
                ymax = min(int(np.ceil(tp[:, 1].max())) + 1, H)
                if xmin >= xmax or ymin >= ymax:
                    continue
                e1 = tp[1] - tp[0]
                e2 = tp[2] - tp[0]
                den = e1[0] * e2[1] - e1[1] * e2[0]
                if abs(den) < 1e-9:
                    continue
                px = xs2[ymin:ymax, xmin:xmax] - tp[0][0]
                py = ys2[ymin:ymax, xmin:xmax] - tp[0][1]
                b1 = (px * e2[1] - py * e2[0]) / den
                b2 = (py * e1[0] - px * e1[1]) / den
                inside = (b1 >= -1e-6) & (b2 >= -1e-6) & (b1 + b2 <= 1 + 1e-6)
                if not inside.any():
                    continue
                zi = tz[0] + b1 * (tz[1] - tz[0]) + b2 * (tz[2] - tz[0])
                wp = wpos[list(tri)]
                nvec = np.cross(wp[1] - wp[0], wp[2] - wp[0])
                nl = np.linalg.norm(nvec)
                if nl < 1e-12:
                    continue
                nvec = nvec / nl
                if nvec[2] < 0:
                    nvec = -nvec
                ndl = max(float((nvec * lvec).sum()), 0.0)
                lit = albedo * (inten * ndl + amb)
                lit = lit / (1.0 + lit)
                lit = np.clip(lit, 0, 1) ** (1 / 2.2)
                sub = (slice(ymin, ymax), slice(xmin, xmax))
                nearer = inside & (zi < zbuf[sub])
                zbuf[sub] = np.where(nearer, zi, zbuf[sub])
                img[sub] = np.where(nearer[..., None], lit[None, None],
                                    img[sub])
    return img


def score(p):
    return float(ssim(GOLD, render(p)))


def main():
    # p = (E, R, theta, phi, fov, zs, sun_az, sun_el, intensity, amb, flip)
    best = None
    rng = np.random.default_rng(0)
    R = 800.0
    for E in (1600.0, 3200.0, 6400.0, 12800.0):
        for flip in range(8):
            p = [E, R, 45.0, 35.0, 45.0, 40.0, 135.0, 35.0, 2.0, 0.15,
                 flip]
            s = score(p)
            if best is None or s > best[0]:
                best = (s, list(p))
            print(f"E={E:7.0f} flip={flip} ssim={s:.4f}")
    print("best coarse:", best[0], best[1])
    # random refinement
    s0, p0 = best
    scales = [0.4, 0.0, 8.0, 15.0, 10.0, 0.6, 60.0, 20.0, 0.5, 0.1, 0]
    for it in range(300):
        cand = list(p0)
        for k, sc in enumerate(scales):
            if sc == 0:
                continue
            if k == 0:
                cand[k] = p0[k] * math.exp(rng.normal(0, sc * 0.5))
            else:
                cand[k] = p0[k] + rng.normal(0, sc)
        s = score(cand)
        if s > s0:
            s0, p0 = s, cand
            print(f"it {it}: ssim={s0:.4f} p={['%.1f' % v for v in p0]}")
            scales = [sc * 0.97 for sc in scales]
    print("FINAL", s0, p0)
    img = render(p0)
    sep = np.ones((H, 2, 3), np.float32)
    panel = np.concatenate([img, sep, GOLD,
                            sep, np.clip(np.abs(img - GOLD) * 4, 0, 1)], 1)
    numpy_to_png("/tmp/diag/clipmap_fit.png",
                 (panel * 255 + 0.5).astype(np.uint8))


if __name__ == "__main__":
    main()
