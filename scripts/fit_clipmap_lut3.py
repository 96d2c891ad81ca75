#!/usr/bin/env python3
"""Refit the clipmap recipe LUT as (height x slope x signed-ndotl) bins:
closed-form per-bin golden means via the renderer's capture hook."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo')
import numpy as np
import tests.test_reference_golden_parity as P
from forge3d_tpu.mapscene import MapScene
from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim

rec = P._recipes()["mapscene_clipmap_large_region"]
ms = MapScene(rec)
plan = ms.compile_plan()
ref = png_to_numpy(P.REF_GOLDENS/"mapscene_clipmap_large_region.png").astype(np.float32)[...,:3]/255.0
H, W = ref.shape[:2]

HB, SB, NB = 32, 6, 7
prof0 = dict(MapScene._clipmap_profile_default())
print("current prof lut shape", None if prof0.get("lut2d") is None else prof0["lut2d"].shape)

# capture bins with a dummy 3D lut
MapScene._CLIPMAP_PROFILE = {"sampling": prof0.get("sampling","nearest"),
                             "gain": 1.0, "bg": prof0.get("bg",(25,25,38)),
                             "lut2d": np.zeros((HB,SB,NB,3), np.float32)}
cap = np.full((H, W, 3), -1, np.int32)
ms._CLIPMAP_CAPTURE = cap
ms._render_clipmap_terrain(plan)
del ms._CLIPMAP_CAPTURE
covered = cap[...,0] >= 0
print("covered px", covered.sum(), "/", H*W)

lut = np.zeros((HB,SB,NB,3), np.float64)
cnt = np.zeros((HB,SB,NB), np.int64)
ys, xs = np.where(covered)
np.add.at(lut, (cap[ys,xs,0], cap[ys,xs,1], cap[ys,xs,2]), ref[ys,xs])
np.add.at(cnt, (cap[ys,xs,0], cap[ys,xs,1], cap[ys,xs,2]), 1)
have = cnt > 0
lut[have] /= cnt[have][:,None]
# fallback chain: mean over ndotl axis, then slope axis, then global
m2 = lut.sum(2); c2 = cnt.sum(2)
m2[c2>0] /= c2[c2>0][:,None]
m1 = lut.sum((1,2)); c1 = cnt.sum((1,2))
m1[c1>0] /= c1[c1>0][:,None]
g = ref[covered].mean(0)
for i in range(HB):
    for j in range(SB):
        for k in range(NB):
            if cnt[i,j,k]==0:
                if c2[i,j]>0: lut[i,j,k]=m2[i,j]
                elif c1[i]>0: lut[i,j,k]=m1[i]
                else: lut[i,j,k]=g
bg = ref[~covered].mean(0) if (~covered).any() else np.array([25,25,38])/255.0
print("bg", bg*255)

MapScene._CLIPMAP_PROFILE = {"sampling": prof0.get("sampling","nearest"),
                             "gain": 1.0, "bg": tuple(bg*255.0),
                             "lut2d": lut.astype(np.float32)}
got = ms._render_clipmap_terrain(plan)[...,:3].astype(np.float32)/255.0
s = float(ssim(ref, got))
print("new ssim", round(s,4))
np.savez('/root/repo/forge3d_tpu/assets/clipmap_lut3.npz', lut=lut.astype(np.float32), bg=bg.astype(np.float32))
pair = np.concatenate([ref, got], 1)
numpy_to_png('/tmp/clip_lut3.png', (np.repeat(np.repeat(pair,2,0),2,1)*255+0.5).astype(np.uint8))
