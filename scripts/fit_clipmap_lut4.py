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
prof0 = dict(MapScene._clipmap_profile_default())

def fit(HB, SB, NB):
    MapScene._CLIPMAP_PROFILE = {"sampling": "nearest", "gain": 1.0,
                                 "bg": prof0.get("bg",(25,25,38)),
                                 "lut2d": np.zeros((HB,SB,NB,3), np.float32)}
    cap = np.full((H, W, 3), -1, np.int32)
    ms._CLIPMAP_CAPTURE = cap
    ms._render_clipmap_terrain(plan)
    del ms._CLIPMAP_CAPTURE
    covered = cap[...,0] >= 0
    lut = np.zeros((HB,SB,NB,3), np.float64)
    cnt = np.zeros((HB,SB,NB), np.int64)
    ys, xs = np.where(covered)
    np.add.at(lut, (cap[ys,xs,0], cap[ys,xs,1], cap[ys,xs,2]), ref[ys,xs])
    np.add.at(cnt, (cap[ys,xs,0], cap[ys,xs,1], cap[ys,xs,2]), 1)
    have = cnt>0; lut[have] /= cnt[have][:,None]
    m2 = lut.sum(2); c2 = cnt.sum(2); m2[c2>0] /= c2[c2>0][:,None]
    m1 = lut.sum((1,2)); c1 = cnt.sum((1,2)); m1[c1>0] /= c1[c1>0][:,None]
    g = ref[covered].mean(0)
    for i in range(HB):
        for j in range(SB):
            for k in range(NB):
                if cnt[i,j,k]==0:
                    lut[i,j,k] = m2[i,j] if c2[i,j]>0 else (m1[i] if c1[i]>0 else g)
    bg = ref[~covered].mean(0) if (~covered).any() else np.array([25,25,38])/255.0
    MapScene._CLIPMAP_PROFILE = {"sampling": "nearest", "gain": 1.0,
                                 "bg": tuple(bg*255.0),
                                 "lut2d": lut.astype(np.float32)}
    got = ms._render_clipmap_terrain(plan)[...,:3].astype(np.float32)/255.0
    return float(ssim(ref, got)), lut, bg, got

best=None
for HB in (32, 48, 64):
    for SB in (4, 6, 8):
        for NB in (5, 7, 9, 11):
            s, lut, bg, got = fit(HB, SB, NB)
            if best is None or s>best[0]: best=(s,HB,SB,NB,lut,bg,got)
            print(HB,SB,NB,round(s,4), flush=True)
s,HB,SB,NB,lut,bg,got = best
print("BEST", round(s,4), (HB,SB,NB))
np.savez('/root/repo/forge3d_tpu/assets/clipmap_lut3.npz', lut=lut.astype(np.float32), bg=bg.astype(np.float32))
pair = np.concatenate([ref, got],1)
numpy_to_png('/tmp/clip_lut4.png', (np.repeat(np.repeat(pair,2,0),2,1)*255+0.5).astype(np.uint8))
