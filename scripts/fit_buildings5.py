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

layer0 = rec.layers[0]
fps = [np.asarray(fp, np.float64) for fp in layer0.footprints]
allp = np.concatenate(fps); mn = allp.min(0); mx = allp.max(0)

def variant(mx_flip, my_flip, swap=False):
    out = []
    for fp in fps:
        f = fp.copy()
        if mx_flip: f[:,0] = mn[0]+mx[0]-f[:,0]
        if my_flip: f[:,1] = mn[1]+mx[1]-f[:,1]
        if swap: f = f[:, ::-1].copy()
        out.append(f)
    l = copy.copy(layer0); l.footprints = out
    return l

def iou_and_ssim(l):
    rgba = base.copy()
    ms._composite_buildings_ref(plan, [l], rgba)
    m = np.abs(rgba[..., :3].astype(np.float32) - base[..., :3].astype(np.float32)).max(-1) > 20
    inter = (m & gold_mask).sum(); union = (m | gold_mask).sum()
    from forge3d_tpu.utils.metrics import ssim
    s = float(ssim(ref/255.0, rgba[..., :3].astype(np.float32)/255.0))
    return inter/max(union,1), s, rgba

for name, l in [("orig", variant(0,0)), ("fx", variant(1,0)), ("fy", variant(0,1)),
                ("fxy", variant(1,1)), ("swap", variant(0,0,True)),
                ("swap_fx", variant(1,0,True)), ("swap_fy", variant(0,1,True)),
                ("swap_fxy", variant(1,1,True))]:
    i, s, r = iou_and_ssim(l)
    print(f"{name}: iou {i:.3f} ssim {s:.4f}")
    numpy_to_png(f"/tmp/bldv_{name}.png", np.repeat(np.repeat(np.concatenate([ref.astype(np.uint8), r[...,:3]],1),3,0),3,1))
