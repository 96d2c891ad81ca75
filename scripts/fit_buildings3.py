# Fit the native-compositor camera against the mapscene_buildings golden
# using the exact reference shading model (scripts-only; not shipped).
import sys, math, itertools
from pathlib import Path
import numpy as np
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import tests.test_reference_golden_parity as P
from forge3d_tpu.mapscene import MapScene, camera_basis
from forge3d_tpu.io.image import png_to_numpy
from forge3d_tpu.utils.metrics import ssim

rec = P._recipes()["mapscene_buildings"]
ms = MapScene(rec)
plan = ms.compile_plan()
# base image without buildings: temporarily drop layers
import copy
rec2 = copy.deepcopy(rec); rec2.layers = []
base = MapScene(rec2).render().rgba.copy()

ref = png_to_numpy(P.REF_GOLDENS / "mapscene_buildings.png").astype(np.float32)[..., :3] / 255.0

orig_cam = MapScene._building_camera

def score(dist, el_deg, az_deg, ty):
    def cam(self, plan, distance=3.2, target=(0.0, 0.35, 0.0)):
        p = plan["params"]; W, H = p.size_px
        az = math.radians(az_deg); el = math.radians(el_deg)
        t = np.array([0.0, ty, 0.0])
        horiz = dist * math.cos(el)
        eye = t + np.array([horiz*math.sin(az), dist*math.sin(el), horiz*math.cos(az)])
        right, up, fwd = camera_basis(eye, t, (0,1,0))
        half_h = math.tan(math.radians(p.fov_y_deg)*0.5)
        half_w = (W/H)*half_h
        return eye, right, up, fwd, half_w, half_h
    MapScene._building_camera = cam
    rgba = base.copy()
    ms._composite_buildings_ref(plan, [rec.layers[0]], rgba)
    MapScene._building_camera = orig_cam
    got = rgba[..., :3].astype(np.float32)/255.0
    return float(ssim(ref, got)), rgba

best = None
for dist in [1.6, 2.0, 2.4, 2.8, 3.2]:
    for el in [25, 35, 45]:
        for az in [35, 215, -35, 145]:
            for ty in [0.35]:
                s, _ = score(dist, el, az, ty)
                if best is None or s > best[0]:
                    best = (s, dist, el, az, ty)
                print(f"d={dist} el={el} az={az} ty={ty}: {s:.4f}")
print("BEST", best)
