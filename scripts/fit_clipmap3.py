#!/usr/bin/env python3
"""Clipmap stage B: SSIM refine from the sky-IoU geometry basin."""
import math, os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo')
import numpy as np
from forge3d_tpu.utils.metrics import ssim
from forge3d_tpu.io.image import numpy_to_png
import importlib.util
spec = importlib.util.spec_from_file_location("fc", "/root/repo/scripts/fit_clipmap.py")
fc = importlib.util.module_from_spec(spec); spec.loader.exec_module(fc)
GOLD = fc.GOLD; H, W = GOLD.shape[:2]
p0 = list(np.load('/tmp/diag/clipmap_geomfit.npy'))
s0 = float(ssim(GOLD, fc.render(p0)))
print("start ssim", round(s0,4), "p", [round(float(v),2) for v in p0])
rng = np.random.default_rng(9)
sc = dict(E=0.25, th=5.0, ph=8.0, fov=6.0, zs=0.3, saz=25.0, sel=10.0, inten=0.3, amb=0.06)
for it in range(500):
    c = list(p0)
    c[0] = p0[0]*math.exp(rng.normal(0, sc["E"]*0.4))
    c[2] = p0[2]+rng.normal(0, sc["th"]); c[3] = p0[3]+rng.normal(0, sc["ph"])
    c[4] = min(max(p0[4]+rng.normal(0, sc["fov"]), 15), 85)
    c[5] = p0[5]*math.exp(rng.normal(0, sc["zs"]))
    c[6] = p0[6]+rng.normal(0, sc["saz"]); c[7] = p0[7]+rng.normal(0, sc["sel"])
    c[8] = max(0.1, p0[8]+rng.normal(0, sc["inten"])); c[9] = max(0.0, p0[9]+rng.normal(0, sc["amb"]))
    if rng.random() < 0.1: c[10] = int(rng.integers(0,8))
    s = float(ssim(GOLD, fc.render(c)))
    if s > s0:
        s0, p0 = s, c
        print(f"it {it}: ssim={s0:.4f}")
        for k in sc: sc[k] *= 0.96
print("FINAL", s0, [round(float(v),3) for v in p0])
np.save('/tmp/diag/clipmap_fit_final.npy', np.array(p0, dtype=float))
img = fc.render(p0); sep = np.ones((H,2,3),np.float32)
numpy_to_png('/tmp/diag/clipmap_fit3.png', (np.concatenate([img,sep,GOLD,sep,np.clip(np.abs(img-GOLD)*4,0,1)],1)*255+0.5).astype(np.uint8))
