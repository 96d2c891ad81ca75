# Wide camera fit against the buildings golden using mask IoU.
import sys, math, copy
from pathlib import Path
import numpy as np
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import tests.test_reference_golden_parity as P
from forge3d_tpu.mapscene import MapScene, camera_basis
from forge3d_tpu.io.image import png_to_numpy, numpy_to_png

rec = P._recipes()["mapscene_buildings"]
ms = MapScene(rec)
plan = ms.compile_plan()
rec2 = copy.deepcopy(rec); rec2.layers = []
base = MapScene(rec2).render().rgba.copy()
ref = png_to_numpy(P.REF_GOLDENS / "mapscene_buildings.png").astype(np.float32)[..., :3]
gold_mask = (np.abs(ref - base[..., :3].astype(np.float32)).max(-1) > 20)
print("gold mask px", gold_mask.sum())

orig_cam = MapScene._building_camera

def render(dist, el_deg, az_deg, ty, fov=None):
    def cam(self, plan, distance=3.2, target=(0.0, 0.35, 0.0)):
        p = plan["params"]; W, H = p.size_px
        az = math.radians(az_deg); el = math.radians(el_deg)
        t = np.array([0.0, ty, 0.0])
        horiz = dist * math.cos(el)
        eye = t + np.array([horiz*math.sin(az), dist*math.sin(el), horiz*math.cos(az)])
        right, up, fwd = camera_basis(eye, t, (0,1,0))
        half_h = math.tan(math.radians(fov if fov else p.fov_y_deg)*0.5)
        half_w = (W/H)*half_h
        return eye, right, up, fwd, half_w, half_h
    MapScene._building_camera = cam
    rgba = base.copy()
    ms._composite_buildings_ref(plan, [rec.layers[0]], rgba)
    MapScene._building_camera = orig_cam
    return rgba

def iou(rgba):
    m = np.abs(rgba[..., :3].astype(np.float32) - base[..., :3].astype(np.float32)).max(-1) > 20
    inter = (m & gold_mask).sum(); union = (m | gold_mask).sum()
    return inter / max(union, 1)

best = None
for dist in [1.2, 1.6, 2.0, 2.4, 2.8, 3.2, 4.0]:
    for el in [15, 25, 35, 45, 60]:
        for az in [35, 125, 215, 305]:
            r = render(dist, el, az, 0.35)
            s = iou(r)
            if best is None or s > best[0]:
                best = (s, dist, el, az)
print("BEST", best)
# refine around best
s0, d0, e0, a0 = best
for dist in np.arange(max(0.8, d0-0.6), d0+0.7, 0.2):
    for el in range(max(5, e0-12), e0+13, 4):
        for az in range(a0-15, a0+16, 5):
            for ty in [0.0, 0.2, 0.35, 0.5]:
                r = render(dist, el, az, ty)
                s = iou(r)
                if s > best[0]:
                    best = (s, float(dist), el, az, ty)
print("BEST2", best)
r = render(*best[1:]) if len(best)==5 else render(best[1],best[2],best[3],0.35)
pair = np.concatenate([ref.astype(np.uint8), r[..., :3]], axis=1)
numpy_to_png("/tmp/bld_fit.png", np.repeat(np.repeat(pair, 3, 0), 3, 1))
