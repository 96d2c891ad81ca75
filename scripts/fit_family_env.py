#!/usr/bin/env python3
"""Prototype: terrain-family screen render with the reference test-HDR
environment (8x4 RGBE gradient) driving the ambient term. Fit against
terrain_pbr/water/atmosphere goldens."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import itertools
import math

import numpy as np

from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim

import importlib.util
spec = importlib.util.spec_from_file_location(
    "fam", os.path.join(os.path.dirname(__file__), "..", "tests",
                        "test_reference_family_goldens.py"))
fam = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fam)


def test_env(w=8, h=4):
    """The reference test HDR: R = x/(w-1), G = y/(h-1), B = 0.5, e=128."""
    x = np.arange(w) / max(w - 1, 1)
    y = np.arange(h) / max(h - 1, 1)
    env = np.zeros((h, w, 3), np.float32)
    env[..., 0] = x[None, :] * (255 / 256)
    env[..., 1] = y[:, None] * (255 / 256)
    env[..., 2] = 128 / 256
    return env


def bilin(hm, uu, vv):
    h, w = hm.shape
    x = np.clip(uu * (w - 1), 0, w - 1)
    y = np.clip(vv * (h - 1), 0, h - 1)
    x0 = np.floor(x).astype(int); y0 = np.floor(y).astype(int)
    x1 = np.minimum(x0 + 1, w - 1); y1 = np.minimum(y0 + 1, h - 1)
    fx = x - x0; fy = y - y0
    return (hm[y0, x0] * (1 - fx) * (1 - fy) + hm[y0, x1] * fx * (1 - fy)
            + hm[y1, x0] * (1 - fx) * fy + hm[y1, x1] * fx * fy)


def render(hm, lut, W, H, az_deg, el_deg, sun_i, p, water_mask=None):
    ys, xs = np.mgrid[0:H, 0:W]
    u = (xs + 0.5) / W
    v = (ys + 0.5) / H
    flip = p.get("flip_v", True)
    vv = v if not flip else 1.0 - v
    t = bilin(hm, u, vv)
    # normals from screen-space derivatives of bilinear height
    zs = p["zs"]
    gx = np.zeros((H, W), np.float32); gz = np.zeros((H, W), np.float32)
    d = 1.0
    tx = bilin(hm, np.clip(u + d / W, 0, 1), vv)
    ty = bilin(hm, u, np.clip(vv + (d / H) * (-1 if flip else 1), 0, 1))
    gx = (tx - t) * zs * W
    gz = (ty - t) * zs * H
    inv = 1.0 / np.sqrt(1.0 + gx * gx + gz * gz)
    nx, ny, nz = -gx * inv, inv, -gz * inv
    az = math.radians(az_deg + p.get("az_off", 180.0))
    el = math.radians(el_deg)
    lx = math.cos(el) * math.sin(az)
    ly = math.sin(el)
    lz = math.cos(el) * math.cos(az)
    ndl = np.maximum(nx * lx + ny * ly + nz * lz, 0.0)
    idx = np.clip(t * (len(lut) - 1), 0, len(lut) - 1)
    i0 = idx.astype(np.int32); fr = (idx - i0)[..., None]
    i1 = np.minimum(i0 + 1, len(lut) - 1)
    alb = lut[i0][..., :3] * (1 - fr) + lut[i1][..., :3] * fr
    # env ambient: sample test env by the normal direction (equirect)
    env = test_env()
    eh, ew = env.shape[:2]
    n_az = np.arctan2(nx, nz)          # [-pi, pi]
    n_el = np.arcsin(np.clip(ny, -1, 1))   # [-pi/2, pi/2]
    eu = (n_az / (2 * np.pi) + 0.5 + p.get("env_rot", 0.0)) % 1.0
    ev = np.clip(0.5 - n_el / np.pi, 0.0, 1.0)
    if p.get("env_nearest", True):
        ex = np.clip((eu * ew).astype(int), 0, ew - 1)
        ey = np.clip((ev * eh).astype(int), 0, eh - 1)
        amb = env[ey, ex]
    else:
        amb = np.stack([bilin(env[..., c], eu, ev) for c in range(3)], -1)
    sun = np.array([1.0, 0.95, 0.9], np.float32) * sun_i * p["k_sun"]
    rgb = alb * (sun[None, None] * ndl[..., None]
                 + p["k_amb"] * amb) * p["gain"]
    if water_mask is not None:
        wm = bilin(water_mask, u, vv) > 0.5
        rgb = np.where(wm[..., None],
                       np.array([95, 185, 217], np.float32) / 255.0, rgb)
    return np.clip(rgb * 255.0, 0, 255)


def main():
    hm = fam._terrain_family_heightmap()
    stops = [(0.0, "#18391f"), (0.38, "#4e7c35"), (0.65, "#8f7a4a"),
             (0.82, "#b8ac88"), (1.0, "#f2f4f7")]
    pos = np.array([s[0] for s in stops])
    cols = np.array([[int(s[1][i:i + 2], 16) / 255 for i in (1, 3, 5)]
                     for s in stops])
    tt = np.linspace(0, 1, 256)
    lut = np.stack([np.interp(tt, pos, cols[:, c]) for c in range(3)], -1)

    golds = {
        "terrain_pbr": (png_to_numpy(
            "/root/reference/tests/golden/terrain/terrain_pbr.png"
        ).astype(np.float32)[..., :3] / 255, 135.0, 24.0, 2.4, None),
        "terrain_water": (png_to_numpy(
            "/root/reference/tests/golden/terrain/terrain_water.png"
        ).astype(np.float32)[..., :3] / 255, 135.0, 18.0, 2.4,
            fam._terrain_family_water_mask()),
        "terrain_atmosphere": (png_to_numpy(
            "/root/reference/tests/golden/terrain/terrain_atmosphere.png"
        ).astype(np.float32)[..., :3] / 255, 135.0, 12.0, 2.4, None),
    }

    best = (-1, None)
    for zs, k_sun, k_amb, gain, az_off, rot in itertools.product(
            (0.3, 0.6, 1.0, 1.45), (0.05, 0.12, 0.25),
            (0.4, 0.8, 1.2), (0.9, 1.2), (0.0, 180.0), (0.0, 0.5)):
        p = dict(zs=zs, k_sun=k_sun, k_amb=k_amb, gain=gain,
                 az_off=az_off, env_rot=rot)
        tot = 0.0
        ss = {}
        for name, (gold, azd, eld, sun_i, wmask) in golds.items():
            H, W = gold.shape[:2]
            got = render(hm, lut, W, H, azd, eld, sun_i, p, wmask) / 255
            s = float(ssim(gold, got))
            ss[name] = round(s, 4)
            tot += s
        if tot > best[0]:
            best = (tot, p, ss)
            print(p, ss, round(tot / 3, 4))
    print("BEST", best[1], best[2])
    # dump best render
    p = best[1]
    for name, (gold, azd, eld, sun_i, wmask) in golds.items():
        H, W = gold.shape[:2]
        got = render(hm, lut, W, H, azd, eld, sun_i, p, wmask) / 255
        pair = np.concatenate(
            [gold, np.ones((H, 2, 3), np.float32), got], 1)
        numpy_to_png(f"/tmp/fitenv_{name}.png",
                     (np.repeat(np.repeat(pair, 3, 0), 3, 1) * 255
                      + 0.5).astype(np.uint8))


if __name__ == "__main__":
    main()
