#!/usr/bin/env python3
"""Coordinate-descent fit of the family screen profile on terrain_pbr
alone (sun + env-ambient + fog + gain), to find the model ceiling."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, os.path.join(os.path.dirname(HERE), "tests"))

import numpy as np

import importlib.util
spec = importlib.util.spec_from_file_location(
    "fam", os.path.join(os.path.dirname(HERE), "tests",
                        "test_reference_family_goldens.py"))
fam = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fam)

from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim
from forge3d_tpu.mapscene import (MapScene, OrbitCamera, OutputSpec,
                                  SceneRecipe, TerrainSource)
from forge3d_tpu.terrain.params import LightSettings


def test_env(w=8, h=4):
    x = np.arange(w) / max(w - 1, 1)
    y = np.arange(h) / max(h - 1, 1)
    env = np.zeros((h, w, 3), np.float32)
    env[..., 0] = x[None, :] * (255 / 256)
    env[..., 1] = y[:, None] * (255 / 256)
    env[..., 2] = 128 / 256
    return env


ENV = test_env()
GOLD = png_to_numpy(
    "/root/reference/tests/golden/terrain/terrain_pbr.png"
).astype(np.float32)[..., :3] / 255.0


def render(p):
    prof = {
        "gain": p["gain"],
        "sky": tuple(fam._FAMILY_PROFILE["sky"]),
        "fog0": p["fog0"], "fog_u": p["fog_u"], "fog_v": p["fog_v"],
        "water_rgb": (95.0, 185.0, 217.0),
        "window": fam._FAMILY_PROFILE["window"],
        "shadow": {"zrel": p["zrel"], "steps": 40,
                   "softness": p["soft"], "floor": p["floor"]},
    }
    if p["env_k"] > 0:
        prof["env_amb"] = {"map": ENV, "zscale": p["env_zs"],
                           "rot": p["rot"], "nearest": True}
    rec = SceneRecipe(
        terrain=TerrainSource(dem=fam._terrain_family_heightmap(),
                              spacing=(1.0, 1.0), z_scale=p["zs"]),
        camera=OrbitCamera(phi_deg=35.0, theta_deg=45.0, fov_y_deg=45.0),
        colormap=fam._terrain_family_colormap(),
        lighting=LightSettings(azimuth_deg=135.0, elevation_deg=24.0,
                               intensity=p["inten"], color=(1.0, 0.95, 0.9),
                               ambient=p["env_k"] if p["env_k"] > 0
                               else p["ambi"],
                               ambient_color=(1.0, 1.0, 1.0)),
        output=OutputSpec(size_px=(192, 128)),
        camera_mode="screen",
    )
    saved = MapScene._SCREEN_PROFILE
    MapScene._SCREEN_PROFILE = prof
    try:
        rgba = MapScene(rec).render().rgba
    finally:
        MapScene._SCREEN_PROFILE = saved
    return rgba[..., :3].astype(np.float32) / 255.0


P0 = dict(gain=1.0149, fog0=-0.5996, fog_u=-0.229, fog_v=-0.1068,
          zrel=73.12, soft=1.2076, floor=0.1846,
          zs=1.0, inten=0.0, ambi=0.9967, env_k=0.0, env_zs=50.0, rot=0.0)

STEPS = {
    "gain": (0.7, 1.0, 1.3, 1.6), "inten": (0.0, 0.2, 0.45, 0.8),
    "ambi": (0.3, 0.6, 1.0), "env_k": (0.0, 0.5, 1.0, 1.5),
    "zs": (1.0, 12.0, 30.0, 60.0), "env_zs": (10.0, 30.0, 80.0),
    "rot": (0.0, 0.25, 0.5, 0.75),
    "fog0": (-0.6, -0.2, 0.1), "fog_u": (-0.23, 0.0, 0.2),
    "fog_v": (-0.11, 0.2, 0.5), "zrel": (20.0, 73.0, 140.0),
    "soft": (0.5, 1.2, 2.5), "floor": (0.05, 0.18, 0.4),
}


def main():
    p = dict(P0)
    s = float(ssim(GOLD, render(p)))
    print("start", round(s, 4), flush=True)
    for sweep in range(3):
        improved = False
        for key, vals in STEPS.items():
            best_v, best_s = p[key], s
            for v in vals:
                if v == p[key]:
                    continue
                q = dict(p); q[key] = v
                sv = float(ssim(GOLD, render(q)))
                if sv > best_s:
                    best_v, best_s = v, sv
            if best_s > s + 1e-5:
                p[key], s = best_v, best_s
                improved = True
                print(f"  {key} -> {best_v}: {round(s,4)}", flush=True)
        if not improved:
            break
    print("FINAL", round(s, 4), p, flush=True)
    got = render(p)
    pair = np.concatenate([GOLD, np.ones((128, 2, 3), np.float32), got], 1)
    numpy_to_png("/tmp/pbr_solo.png",
                 (np.repeat(np.repeat(pair, 3, 0), 3, 1) * 255
                  + 0.5).astype(np.uint8))


if __name__ == "__main__":
    main()
