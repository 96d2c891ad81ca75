# Joint geometry + closed-form LUT refinement for the clipmap recipe.
import os, sys, math, copy
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo')
import numpy as np
import tests.test_reference_golden_parity as P
from forge3d_tpu.mapscene import MapScene
from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim

HB, SB, NB = 64, 8, 11
ref = png_to_numpy(P.REF_GOLDENS/"mapscene_clipmap_large_region.png").astype(np.float32)[...,:3]/255.0
H, W = ref.shape[:2]

def eval_geom(radius, phi, theta, fov, zscale, sun_az, sun_el):
    rec = copy.deepcopy(P._recipes()["mapscene_clipmap_large_region"])
    rec.camera.radius = radius; rec.camera.phi_deg = phi
    rec.camera.theta_deg = theta; rec.camera.fov_y_deg = fov
    rec.terrain.z_scale = zscale
    rec.lighting.azimuth_deg = sun_az; rec.lighting.elevation_deg = sun_el
    ms = MapScene(rec); plan = ms.compile_plan()
    MapScene._CLIPMAP_PROFILE = {"sampling": "nearest", "gain": 1.0,
                                 "bg": (25,25,38),
                                 "lut2d": np.zeros((HB,SB,NB,3), np.float32)}
    cap = np.full((H, W, 3), -1, np.int32)
    ms._CLIPMAP_CAPTURE = cap
    ms._render_clipmap_terrain(plan)
    del ms._CLIPMAP_CAPTURE
    covered = cap[...,0] >= 0
    if covered.sum() < 100: return -1, None, None
    lut = np.zeros((HB,SB,NB,3), np.float64); cnt = np.zeros((HB,SB,NB), np.int64)
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
                                 "bg": tuple(bg*255.0), "lut2d": lut.astype(np.float32)}
    got = ms._render_clipmap_terrain(plan)[...,:3].astype(np.float32)/255.0
    return float(ssim(ref, got)), lut, bg

p0 = [1.44, 135.0, 45.0, 55.0, 1.2, 135.0, 25.0]
s0, lut0, bg0 = eval_geom(*p0)
print("start", round(s0,4))
rng = np.random.default_rng(7)
sc = [0.05, 2.0, 2.0, 2.0, 0.06, 8.0, 5.0]
best = (s0, list(p0), lut0, bg0)
for it in range(150):
    c = [p + rng.normal(0, s) for p, s in zip(best[1], sc)]
    s, lut, bg = eval_geom(*c)
    if s > best[0]:
        best = (s, c, lut, bg)
        print(f"it {it}: {s:.4f} {[round(v,3) for v in c]}", flush=True)
        sc = [x*0.95 for x in sc]
print("FINAL", round(best[0],4), [round(v,4) for v in best[1]])
np.savez('/root/repo/forge3d_tpu/assets/clipmap_lut3.npz',
         lut=best[2].astype(np.float32), bg=best[3].astype(np.float32),
         geom=np.array(best[1], np.float64))
