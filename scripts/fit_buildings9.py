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
    az_deg, el_deg, dist, tx, ty, tz, fov = v
    def cam(self, plan, distance=3.2, target=(0.0, 0.35, 0.0)):
        p = plan["params"]; W, H = p.size_px
        az = math.radians(az_deg); el = math.radians(el_deg)
        t = np.array([tx, ty, tz])
        h = dist * math.cos(el)
        eye = t + np.array([h*math.sin(az), dist*math.sin(el), h*math.cos(az)])
        right, up, fwd = camera_basis(eye, t, (0,1,0))
        half_h = math.tan(math.radians(max(5,min(120,fov)))*0.5)
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
    i = (m & gold_mask).sum()/max((m | gold_mask).sum(),1)
    s = float(ssim(ref/255.0, rgba[..., :3].astype(np.float32)/255.0))
    return -(0.4*i + 0.6*s)

best=None
for s0 in [(315,20,2.6,0,0,0,45),(315,25,2.6,0,0.2,0,45),(320,18,2.4,0.1,0,0.1,50),(310,22,2.8,-0.1,0,-0.1,40)]:
    r = minimize(obj, s0, method='Nelder-Mead', options={'maxfev':400,'xatol':0.005,'fatol':1e-5})
    v=-r.fun
    print(s0[:3], "->", round(v,4), tuple(round(x,3) for x in r.x))
    if best is None or v>best[0]: best=(v, tuple(r.x))
print("BEST", best[0], tuple(round(x,4) for x in best[1]))
rg = render(best[1])
print("ssim", float(ssim(ref/255.0, rg[...,:3].astype(np.float32)/255.0)))
numpy_to_png("/tmp/bld_fit9.png", np.repeat(np.repeat(np.concatenate([ref.astype(np.uint8), rg[...,:3]],1),3,0),3,1))
