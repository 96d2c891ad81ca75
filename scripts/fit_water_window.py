# Fit the terrain-family screen window from the water_reflection golden's
# lake shape (mask IoU only; no shading involved).
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
import numpy as np
from forge3d_tpu.io.image import png_to_numpy

ref = png_to_numpy('/root/reference/tests/golden/terrain/terrain_water_reflection.png').astype(np.float32)[...,:3]
H, W = ref.shape[:2]
blue = (ref[...,2] > ref[...,0] + 30) & (ref[...,2] > 100)
print("golden water px:", blue.sum(), "/", H*W, ref.shape)

size = 96
x = np.linspace(-1.0, 1.0, size, dtype=np.float32)
y = np.linspace(-1.0, 1.0, size, dtype=np.float32)
xx, yy = np.meshgrid(x, y)
lake = ((xx + 0.02)/0.55)**2 + ((yy + 0.18)/0.28)**2 <= 1.0
inlet = ((xx - 0.34)/0.22)**2 + ((yy + 0.10)/0.18)**2 <= 1.0
mask = (lake | inlet)

ys, xs = np.mgrid[0:H, 0:W]
u = (xs + 0.5) / W
v = 1.0 - (ys + 0.5) / H

def pred(u0, v0, wu, wv, vup):
    uu = u0 + u*wu
    vv = v0 + (v if vup else 1.0 - v)*wv
    jj = np.clip((uu*size).astype(int), 0, size-1)
    ii = np.clip((vv*size).astype(int), 0, size-1)
    return mask[ii, jj]

best=None
for vup in (True, False):
    for u0 in np.arange(-0.2, 0.75, 0.05):
        for v0 in np.arange(-0.2, 0.75, 0.05):
            for wu in np.arange(0.2, 1.45, 0.1):
                for wv in np.arange(0.2, 1.45, 0.1):
                    m = pred(u0, v0, wu, wv, vup)
                    inter = (m & blue).sum(); union = (m | blue).sum()
                    s = inter/max(union, 1)
                    if best is None or s > best[0]:
                        best = (s, round(u0,2), round(v0,2), round(wu,2), round(wv,2), vup)
print("BEST IoU", best)
# refine
s0, u0, v0, wu, wv, vup = best
for du in np.arange(-0.05, 0.055, 0.01):
    for dv in np.arange(-0.05, 0.055, 0.01):
        for dwu in np.arange(-0.08, 0.085, 0.02):
            for dwv in np.arange(-0.08, 0.085, 0.02):
                m = pred(u0+du, v0+dv, wu+dwu, wv+dwv, vup)
                inter = (m & blue).sum(); union = (m | blue).sum()
                s = inter/max(union,1)
                if s > best[0]:
                    best = (s, round(u0+du,3), round(v0+dv,3), round(wu+dwu,3), round(wv+dwv,3), vup)
print("REFINED", best)
