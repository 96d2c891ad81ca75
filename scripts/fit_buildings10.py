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

def render(v):
    az_deg, el_deg, dist, fov, laz, lel = v
    def cam(self, plan, distance=3.2, target=(0.0, 0.35, 0.0)):
        p = plan["params"]; W, H = p.size_px
        az = math.radians(az_deg); el = math.radians(el_deg)
        t = np.zeros(3)
        h = dist * math.cos(el)
        eye = t + np.array([h*math.sin(az), dist*math.sin(el), h*math.cos(az)])
        right, up, fwd = camera_basis(eye, t, (0,1,0))
        half_h = math.tan(math.radians(max(5,min(120,fov)))*0.5)
        half_w = (W/H)*half_h
        return eye, right, up, fwd, half_w, half_h
    def light(self):
        a, e = math.radians(laz), math.radians(lel)
        return np.array([math.cos(e)*math.sin(a), math.sin(e), math.cos(e)*math.cos(a)])
    MapScene._building_camera = cam
    MapScene._building_light = light
    rgba = base.copy()
    try:
        ms._composite_buildings_ref(plan, [rec.layers[0]], rgba)
    finally:
        MapScene._building_camera = orig_cam
        MapScene._building_light = orig_light
    return rgba

def obj(v):
    rgba = render(v)
    m = np.abs(rgba[..., :3].astype(np.float32) - basef).max(-1) > 20
    i = (m & gold_mask).sum()/max((m | gold_mask).sum(),1)
    s = float(ssim(ref/255.0, rgba[..., :3].astype(np.float32)/255.0))
    return -(0.3*i + 0.7*s)

best=None
for laz in (35, 135, 215, 315):
    for lel in (25, 60):
        s0 = (315, 20, 2.6, 45, laz, lel)
        r = minimize(obj, s0, method='Nelder-Mead', options={'maxfev':300,'xatol':0.005,'fatol':1e-5})
        v=-r.fun
        print(laz, lel, "->", round(v,4), tuple(round(x,2) for x in r.x))
        if best is None or v>best[0]: best=(v, tuple(r.x))
print("BEST", best[0], tuple(round(x,4) for x in best[1]))
rg = render(best[1])
print("ssim", float(ssim(ref/255.0, rg[...,:3].astype(np.float32)/255.0)))
numpy_to_png("/tmp/bld_fit10.png", np.repeat(np.repeat(np.concatenate([ref.astype(np.uint8), rg[...,:3]],1),3,0),3,1))
