import sys, math, copy, itertools
from pathlib import Path
import numpy as np
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import tests.test_reference_golden_parity as P
from forge3d_tpu.mapscene import MapScene, camera_basis
from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim

rec = P._recipes()["mapscene_buildings"]
ms = MapScene(rec)
plan = ms.compile_plan()
rec2 = copy.deepcopy(rec); rec2.layers = []
base = MapScene(rec2).render().rgba.copy()
ref = png_to_numpy(P.REF_GOLDENS / "mapscene_buildings.png").astype(np.float32)[..., :3]
basef = base[..., :3].astype(np.float32)
gold_mask = (np.abs(ref - basef).max(-1) > 20)

layer0 = rec.layers[0]
fps = [np.asarray(fp, np.float64) for fp in layer0.footprints]
allp = np.concatenate(fps); mn = allp.min(0); mx = allp.max(0)

def swap_layer():
    out = [fp[:, ::-1].copy() for fp in fps]
    l = copy.copy(layer0); l.footprints = out
    return l
GEOMS = {"orig": layer0, "swap": swap_layer()}

orig_cam = MapScene._building_camera

def render(geom, az_deg, el_deg, dist, ty, fov):
    def cam(self, plan, distance=3.2, target=(0.0, 0.35, 0.0)):
        p = plan["params"]; W, H = p.size_px
        az = math.radians(az_deg); el = math.radians(el_deg)
        t = np.array([0.0, ty, 0.0])
        horiz = dist * math.cos(el)
        eye = t + np.array([horiz*math.sin(az), dist*math.sin(el), horiz*math.cos(az)])
        right, up, fwd = camera_basis(eye, t, (0,1,0))
        half_h = math.tan(math.radians(fov)*0.5)
        half_w = (W/H)*half_h
        return eye, right, up, fwd, half_w, half_h
    MapScene._building_camera = cam
    rgba = base.copy()
    ms._composite_buildings_ref(plan, [GEOMS[geom]], rgba)
    MapScene._building_camera = orig_cam
    return rgba

def obj(rgba):
    m = np.abs(rgba[..., :3].astype(np.float32) - basef).max(-1) > 20
    inter = (m & gold_mask).sum(); union = (m | gold_mask).sum()
    i = inter/max(union,1)
    s = float(ssim(ref/255.0, rgba[..., :3].astype(np.float32)/255.0))
    return 0.5*i + 0.5*s

from scipy.optimize import minimize
best_all = None
for geom in GEOMS:
    # multi-start Nelder-Mead
    starts = [(35,45,3.2,0.35,45), (35,25,2.0,0.35,45), (-40,45,3.0,0.0,45),
              (125,30,2.5,0.2,45), (215,35,2.5,0.3,45), (305,40,2.8,0.2,45)]
    for s0 in starts:
        f = lambda v: -obj(render(geom, *v))
        r = minimize(f, s0, method='Nelder-Mead',
                     options={'maxfev': 120, 'xatol':0.02, 'fatol':1e-4})
        val = -r.fun
        if best_all is None or val > best_all[0]:
            best_all = (val, geom, tuple(round(x,3) for x in r.x))
        print(geom, s0, "->", round(val,4), tuple(round(x,2) for x in r.x))
print("BEST", best_all)
v, g, x = best_all
r = render(g, *x)
print("final ssim", float(ssim(ref/255.0, r[...,:3].astype(np.float32)/255.0)))
numpy_to_png("/tmp/bld_fit6.png", np.repeat(np.repeat(np.concatenate([ref.astype(np.uint8), r[...,:3]],1),3,0),3,1))
