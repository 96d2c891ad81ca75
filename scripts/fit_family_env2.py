#!/usr/bin/env python3
"""Fit env-ambient (test-HDR IBL) params for the terrain family goldens,
on top of the committed family profile."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import itertools

import numpy as np

import importlib.util
spec = importlib.util.spec_from_file_location(
    "fam", os.path.join(os.path.dirname(__file__), "..", "tests",
                        "test_reference_family_goldens.py"))
fam = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fam)

from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim

NAMES = ["terrain_pbr", "terrain_water", "terrain_atmosphere",
         "terrain_low_sun_sky", "terrain_pom", "terrain_water_reflection"]


def test_env(w=8, h=4):
    x = np.arange(w) / max(w - 1, 1)
    y = np.arange(h) / max(h - 1, 1)
    env = np.zeros((h, w, 3), np.float32)
    env[..., 0] = x[None, :] * (255 / 256)
    env[..., 1] = y[:, None] * (255 / 256)
    env[..., 2] = 128 / 256
    return env


def main():
    golds = {}
    for n in NAMES:
        g = png_to_numpy(fam.FAMILY_GOLDENS[n]["golden"])
        golds[n] = g.astype(np.float32)[..., :3] / 255.0

    base_prof = dict(fam._FAMILY_PROFILE)
    env = test_env()

    def score(env_cfg, dump=False):
        fam._FAMILY_PROFILE.clear()
        fam._FAMILY_PROFILE.update(base_prof)
        if env_cfg is not None:
            fam._FAMILY_PROFILE["env_amb"] = dict(env_cfg, map=env)
        out = {}
        for n in NAMES:
            got = np.asarray(fam.FAMILY_GOLDENS[n]["render"]())
            got = got[..., :3].astype(np.float32) / 255.0
            out[n] = float(ssim(golds[n], got))
            if dump:
                H = got.shape[0]
                pair = np.concatenate(
                    [golds[n], np.ones((H, 2, 3), np.float32), got], 1)
                numpy_to_png(f"/tmp/fenv_{n}.png",
                             (np.repeat(np.repeat(pair, 3, 0), 3, 1) * 255
                              + 0.5).astype(np.uint8))
        return out

    base = score(None)
    print("baseline:", {k: round(v, 4) for k, v in base.items()},
          round(sum(base.values()) / len(base), 4))

    best = (sum(base.values()), None)
    for zs, rot, nearest, ev_off in itertools.product(
            (20.0, 60.0, 120.0, 240.0), (0.0, 0.25, 0.5, 0.75),
            (True, False), (0.0, 0.15)):
        cfg = {"zscale": zs, "rot": rot, "nearest": nearest,
               "ev_off": ev_off}
        s = score(cfg)
        tot = sum(s.values())
        if tot > best[0]:
            best = (tot, cfg)
            print(cfg, {k: round(v, 4) for k, v in s.items()},
                  round(tot / len(s), 4), "*")
    print("BEST", best[1],
          round(best[0] / len(NAMES), 4))
    if best[1]:
        score(best[1], dump=True)


if __name__ == "__main__":
    main()
