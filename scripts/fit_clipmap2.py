#!/usr/bin/env python3
"""Clipmap fit stage A: sky-mask IoU (geometry only), then SSIM refine."""
import math, os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
sys.path.insert(0, '/root/repo')
from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim
import importlib.util
spec = importlib.util.spec_from_file_location("fc", "/root/repo/scripts/fit_clipmap.py")
fc = importlib.util.module_from_spec(spec); spec.loader.exec_module(fc)

GOLD = fc.GOLD
H, W = GOLD.shape[:2]
gsky = (np.abs(GOLD*255 - np.array([25,25,38])).max(-1) < 10)
print("gold sky fraction", gsky.mean())

def sky_mask(p):
    img = fc.render(p)
    return (np.abs(img*255 - np.array([25,25,38])).max(-1) < 10)

def iou(p):
    m = sky_mask(p)
    return ((m & gsky).sum()) / max((m | gsky).sum(), 1)

rng = np.random.default_rng(5)
best = None
# broad random search over geometry; shading fixed
for it in range(400):
    E = float(np.exp(rng.uniform(np.log(2000), np.log(40000))))
    theta = rng.uniform(20, 75)
    phi = rng.uniform(0, 360)
    fov = rng.uniform(25, 70)
    zs = float(np.exp(rng.uniform(np.log(1), np.log(100))))
    flip = int(rng.integers(0, 8))
    p = [E, 800.0, theta, phi, fov, zs, 135.0, 25.0, 2.0, 0.15, flip]
    s = iou(p)
    if best is None or s > best[0]:
        best = (s, p); print(f"it {it}: iou={s:.3f} E={E:.0f} th={theta:.0f} ph={phi:.0f} fov={fov:.0f} zs={zs:.1f} fl={flip}")
s0, p0 = best
print("stage A best", s0, p0)
# local refine on IoU
sc = [0.25, 0.0, 6.0, 10.0, 8.0, 0.4, 0, 0, 0, 0, 0]
for it in range(250):
    c = list(p0)
    c[0] = p0[0]*math.exp(rng.normal(0, sc[0]*0.4))
    c[2] = p0[2]+rng.normal(0, sc[2]); c[3] = p0[3]+rng.normal(0, sc[3])
    c[4] = min(max(p0[4]+rng.normal(0, sc[4]), 15), 90)
    c[5] = p0[5]*math.exp(rng.normal(0, 0.25))
    s = iou(c)
    if s > s0:
        s0, p0 = s, c; print(f"refine {it}: iou={s0:.3f}")
        sc = [v*0.95 for v in sc]
print("stage A refined", s0, p0)
print("ssim at this geometry:", round(float(ssim(GOLD, fc.render(p0))),4))
np.save('/tmp/diag/clipmap_geomfit.npy', np.array(p0))
img = fc.render(p0)
sep = np.ones((H,2,3),np.float32)
numpy_to_png('/tmp/diag/clipmap_fit2.png', (np.concatenate([img,sep,GOLD,sep,np.clip(np.abs(img-GOLD)*4,0,1)],1)*255+0.5).astype(np.uint8))
