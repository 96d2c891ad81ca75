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
orig_light = MapScene._building_light
orig_int = MapScene._sun_intensity

def render(v):
    az, el, dist, fov, laz, lel, inten, tx, ty, tz, amb = v
    def cam(self, plan, distance=3.2, target=(0.0, 0.35, 0.0)):
        p = plan["params"]; W, H = p.size_px
        a = math.radians(az); e = math.radians(el)
        t = np.array([tx, ty, tz])
        h = dist * math.cos(e)
        eye = t + np.array([h*math.sin(a), dist*math.sin(e), h*math.cos(a)])
        right, up, fwd = camera_basis(eye, t, (0,1,0))
        half_h = math.tan(math.radians(max(5,min(120,fov)))*0.5)
        half_w = (W/H)*half_h
        return eye, right, up, fwd, half_w, half_h
    def light(self):
        a, e = math.radians(laz), math.radians(lel)
        return np.array([math.cos(e)*math.sin(a), math.sin(e), math.cos(e)*math.cos(a)])
    def intensity(self):
        return max(0.0, inten)
    MapScene._building_camera = cam
    MapScene._building_light = light
    MapScene._sun_intensity = intensity
    rgba = base.copy()
    try:
        ms._composite_buildings_ref(plan, [rec.layers[0]], rgba)
    finally:
        MapScene._building_camera = orig_cam
        MapScene._building_light = orig_light
        MapScene._sun_intensity = orig_int
    return rgba

def obj(v):
    rgba = render(v)
    m = np.abs(rgba[..., :3].astype(np.float32) - basef).max(-1) > 20
    i = (m & gold_mask).sum()/max((m | gold_mask).sum(),1)
    s = float(ssim(ref/255.0, rgba[..., :3].astype(np.float32)/255.0))
    mad = np.abs(ref - rgba[...,:3].astype(np.float32)).mean()/255.0
    return -(0.2*i + 0.8*s - 0.3*mad)

starts = [
  (322.9, 11.5, 2.19, 52.0, 119.1, 89.7, 1.15, 0, 0, 0, 0.2),
  (323.8, 16.2, 2.62, 42.5, 20.6, 89.5, 1.15, 0, 0, 0, 0.2),
  (321.5, 19.3, 2.56, 47.0, 269.5, 64.2, 1.15, 0, 0, 0, 0.2),
]
best=None
for s0 in starts:
    r = minimize(obj, s0, method='Nelder-Mead', options={'maxfev':900,'xatol':0.003,'fatol':1e-6})
    v=-r.fun
    rg = render(r.x)
    s = float(ssim(ref/255.0, rg[...,:3].astype(np.float32)/255.0))
    print("->", round(v,4), "ssim", round(s,4), tuple(round(x,3) for x in r.x), flush=True)
    if best is None or s>best[0]: best=(s, tuple(r.x))
print("BEST ssim", best[0])
print("params", tuple(round(x,4) for x in best[1]))
rg = render(best[1])
numpy_to_png("/tmp/bld_fit12.png", np.repeat(np.repeat(np.concatenate([ref.astype(np.uint8), rg[...,:3]],1),3,0),3,1))
