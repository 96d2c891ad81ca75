import sys, math, copy
from pathlib import Path
import numpy as np
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import tests.test_reference_golden_parity as P
from forge3d_tpu.mapscene import MapScene, camera_basis
from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim
from scipy.optimize import minimize

rec = P._recipes()["mapscene_buildings"]
ms = MapScene(rec)
plan = ms.compile_plan()
rec2 = copy.deepcopy(rec); rec2.layers = []
base = MapScene(rec2).render().rgba.copy()
ref = png_to_numpy(P.REF_GOLDENS / "mapscene_buildings.png").astype(np.float32)[..., :3]
basef = base[..., :3].astype(np.float32)
gold_mask = (np.abs(ref - basef).max(-1) > 20)
orig_cam = MapScene._building_camera

def render(v):
    ex, ey, ez, tx, ty, tz, fov = v
    def cam(self, plan, distance=3.2, target=(0.0, 0.35, 0.0)):
        p = plan["params"]; W, H = p.size_px
        eye = np.array([ex, ey, ez]); t = np.array([tx, ty, tz])
        if np.linalg.norm(eye - t) < 1e-3: return None
        right, up, fwd = camera_basis(eye, t, (0,1,0))
        half_h = math.tan(math.radians(max(5.0, min(120.0, fov)))*0.5)
        half_w = (W/H)*half_h
        return eye, right, up, fwd, half_w, half_h
    MapScene._building_camera = cam
    rgba = base.copy()
    try:
        ms._composite_buildings_ref(plan, [rec.layers[0]], rgba)
    finally:
        MapScene._building_camera = orig_cam
    return rgba

def obj(v):
    rgba = render(v)
    m = np.abs(rgba[..., :3].astype(np.float32) - basef).max(-1) > 20
    inter = (m & gold_mask).sum(); union = (m | gold_mask).sum()
    i = inter/max(union,1)
    s = float(ssim(ref/255.0, rgba[..., :3].astype(np.float32)/255.0))
    return -(0.5*i + 0.5*s)

starts = []
for az in (35, 46, 125, 305):
    for el in (25, 45):
        for d in (2.5, 3.2):
            h = d*math.cos(math.radians(el))
            starts.append((h*math.sin(math.radians(az)), 0.35+d*math.sin(math.radians(el)),
                           h*math.cos(math.radians(az)), 0.0, 0.35, 0.0, 45.0))
best = None
for s0 in starts:
    r = minimize(obj, s0, method='Nelder-Mead', options={'maxfev': 250, 'xatol':0.01, 'fatol':1e-4})
    v = -r.fun
    if best is None or v > best[0]:
        best = (v, tuple(r.x))
    print(tuple(round(x,2) for x in s0[:3]), "->", round(v,4))
print("BEST", best[0], tuple(round(x,3) for x in best[1]))
rg = render(best[1])
print("ssim", float(ssim(ref/255.0, rg[...,:3].astype(np.float32)/255.0)))
numpy_to_png("/tmp/bld_fit7.png", np.repeat(np.repeat(np.concatenate([ref.astype(np.uint8), rg[...,:3]],1),3,0),3,1))
