# Joint building-model fit over mapscene_buildings + screen_space_contact.
import os, sys, copy
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo')
import numpy as np
from scipy.optimize import minimize
import tests.test_reference_golden_parity as P
from forge3d_tpu.mapscene import MapScene
from forge3d_tpu.io.image import png_to_numpy
from forge3d_tpu.utils.metrics import ssim

IDS = ["mapscene_buildings", "mapscene_screen_space_contact"]
recipes = {i: P._recipes()[i] for i in IDS}
refs = {i: png_to_numpy(P.REF_GOLDENS/f"{i}.png").astype(np.float32)[...,:3]/255.0 for i in IDS}
KEYS = ["az_deg","el_deg","distance","fov_deg","light_az_deg","light_el_deg",
        "intensity","ku","kd","kx","kh","kz","shadow_strength","shadow_shift"]
BASE = dict(MapScene._BUILDING_SCATTER)

def score(v):
    MapScene._BUILDING_SCATTER = {k: float(x) for k, x in zip(KEYS, v)}
    out = {}
    try:
        for i in IDS:
            got = MapScene(copy.deepcopy(recipes[i])).render().rgba[...,:3].astype(np.float32)/255.0
            out[i] = float(ssim(refs[i], got))
    finally:
        MapScene._BUILDING_SCATTER = BASE
    return out

v0 = [BASE[k] for k in KEYS]
s0 = score(v0)
print("start", {k.split("mapscene_")[1]: round(x,4) for k,x in s0.items()}, flush=True)
def obj(v):
    s = score(v)
    return -(s[IDS[0]] + 1.3*s[IDS[1]])   # weight contact (the laggard)
r = minimize(obj, v0, method='Nelder-Mead', options={'maxfev': 800, 'xatol': 1e-3, 'fatol': 1e-6})
s = score(r.x)
print("fit", {k.split("mapscene_")[1]: round(x,4) for k,x in s.items()})
print("params", {k: round(float(x),4) for k,x in zip(KEYS, r.x)})
