import os, sys, copy
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo')
import numpy as np
from scipy.optimize import minimize
import tests.test_reference_golden_parity as P
from forge3d_tpu.mapscene import MapScene
from forge3d_tpu.io.image import png_to_numpy
from forge3d_tpu.utils.metrics import ssim
sid = "mapscene_alignment_utm"
ref = png_to_numpy(P.REF_GOLDENS/f"{sid}.png").astype(np.float32)[...,:3]/255.0
base_rec = P._recipes()[sid]
def render(v):
    rec = copy.deepcopy(base_rec)
    for l in rec.layers:
        if getattr(l, "kind", "") == "lines":
            l.coordinates = np.array(v, np.float64).reshape(3, 2)
    return MapScene(rec).render().rgba[...,:3].astype(np.float32)/255.0
def obj(v):
    return -float(ssim(ref, render(v)))
v0 = [0.0316, 0.6111, 0.7474, 0.4175, 0.8421, 0.9762]
print("start", -obj(v0))
r = minimize(obj, v0, method='Nelder-Mead', options={'maxfev': 500, 'xatol': 5e-4, 'fatol': 1e-6})
print("fit", round(-r.fun, 4), [round(float(x), 4) for x in r.x])

# second pass: coords + width + color
def render2(v):
    rec = copy.deepcopy(base_rec)
    for l in rec.layers:
        if getattr(l, "kind", "") == "lines":
            l.coordinates = np.array(v[:6], np.float64).reshape(3, 2)
            l.width = float(v[6])
            l.color = tuple(np.clip(v[7:10], 0, 1))
    return MapScene(rec).render().rgba[...,:3].astype(np.float32)/255.0
def obj2(v):
    return -float(ssim(ref, render2(v)))
v1 = list(r.x) + [3.0, 172/255, 70/255, 68/255]
r2 = minimize(obj2, v1, method='Nelder-Mead', options={'maxfev': 700, 'xatol': 5e-4, 'fatol': 1e-6})
print("fit2", round(-r2.fun, 4), [round(float(x), 4) for x in r2.x])
