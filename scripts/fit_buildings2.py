#!/usr/bin/env python3
"""Stage-2 building-camera fit: IoU of building-silhouette masks."""
import math, os, sys, copy
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
import numpy as np
from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim

import test_reference_golden_parity as harness
from forge3d_tpu.mapscene import MapScene

gold = png_to_numpy(harness.REF_GOLDENS/"mapscene_buildings.png").astype(np.float32)[...,:3]/255.0
recipes = harness._recipes()
rec = recipes["mapscene_buildings"]
scene = MapScene(rec)
# base without buildings
rec_nb = copy.deepcopy(rec); rec_nb.layers = []
base = MapScene(rec_nb).render().rgba[...,:3].astype(np.float32)/255.0
gmask = (np.abs(gold-base).max(-1) > 0.08)
print("gold mask px:", gmask.sum())

def render(cam):
    MapScene._BUILDING_CAMERA = cam
    return scene.render().rgba[...,:3].astype(np.float32)/255.0

def iou(cam):
    img = render(cam)
    m = (np.abs(img-base).max(-1) > 0.08)
    inter = (m & gmask).sum(); union = (m | gmask).sum()
    return inter/max(union,1)

best=None
rng = np.random.default_rng(2)
for dist in (1.0,1.4,1.8,2.2,2.6):
    for el in (20.0,30.0,40.0,50.0):
        for azo in (0.0,-35.0,-70.0,35.0,145.0,180.0):
            cam = dict(distance=dist, elevation_deg=el, az_offset_deg=azo,
                       target=(0.0,0.35,0.0), fov_axis="y")
            s = iou(cam)
            if best is None or s>best[0]:
                best=(s,cam); print(f"d={dist} el={el} azo={azo} iou={s:.3f} *")
s0,cam0=best
sc = dict(distance=0.3, el=6.0, azo=12.0, tx=0.15, ty=0.15, tz=0.15)
for it in range(250):
    cam = dict(cam0)
    cam["distance"]=max(0.3,cam0["distance"]+rng.normal(0,sc["distance"]))
    cam["elevation_deg"]=cam0["elevation_deg"]+rng.normal(0,sc["el"])
    cam["az_offset_deg"]=cam0["az_offset_deg"]+rng.normal(0,sc["azo"])
    t=list(cam0["target"]); t[0]+=rng.normal(0,sc["tx"]); t[1]+=rng.normal(0,sc["ty"]); t[2]+=rng.normal(0,sc["tz"])
    cam["target"]=tuple(t)
    s=iou(cam)
    if s>s0:
        s0,cam0=s,cam; print(f"it {it}: iou={s0:.3f} {cam}")
        for k in sc: sc[k]*=0.94
img = render(cam0)
print("FINAL iou",s0,"ssim",float(ssim(gold,img)),cam0)
sep=np.ones((gold.shape[0],2,3),np.float32)
numpy_to_png("/tmp/diag/buildings_fit2.png",(np.concatenate([img,sep,gold,sep,np.clip(np.abs(img-gold)*4,0,1)],1)*255+0.5).astype(np.uint8))
