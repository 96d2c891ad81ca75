import sys, math, copy
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
orig_cam = MapScene._building_camera

def render(az_deg, el_deg, dist, ty, fov=45.0, conv="sin"):
    def cam(self, plan, distance=3.2, target=(0.0, 0.35, 0.0)):
        p = plan["params"]; W, H = p.size_px
        az = math.radians(az_deg); el = math.radians(el_deg)
        t = np.array([0.0, ty, 0.0])
        h = dist * math.cos(el)
        if conv == "sin":
            eye = t + np.array([h*math.sin(az), dist*math.sin(el), h*math.cos(az)])
        else:
            eye = t + np.array([h*math.cos(az), dist*math.sin(el), h*math.sin(az)])
        right, up, fwd = camera_basis(eye, t, (0,1,0))
        half_h = math.tan(math.radians(fov)*0.5)
        half_w = (W/H)*half_h
        return eye, right, up, fwd, half_w, half_h
    MapScene._building_camera = cam
    rgba = base.copy()
    try:
        ms._composite_buildings_ref(plan, [rec.layers[0]], rgba)
    finally:
        MapScene._building_camera = orig_cam
    return rgba

def iou(rgba):
    m = np.abs(rgba[..., :3].astype(np.float32) - basef).max(-1) > 20
    inter = (m & gold_mask).sum(); union = (m | gold_mask).sum()
    return inter/max(union,1)

best = []
for az in range(0, 360, 15):
    row_best = 0
    for el in (10, 20, 30, 45):
        for d in (1.4, 2.0, 2.6, 3.2):
            for ty in (0.0, 0.35):
                s = iou(render(az, el, d, ty))
                row_best = max(row_best, s)
                best.append((s, az, el, d, ty))
    print(az, round(row_best,3), flush=True)
best.sort(reverse=True)
print("TOP10:")
for b in best[:10]: print(b)
