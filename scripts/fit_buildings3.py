#!/usr/bin/env python3
"""Stage-3: joint camera+shading SSIM fit for the building composite."""
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
rec = harness._recipes()["mapscene_buildings"]
scene = MapScene(rec)

def render(cam):
    MapScene._BUILDING_CAMERA = cam
    return scene.render().rgba[...,:3].astype(np.float32)/255.0

cam0 = {'distance': 2.548, 'elevation_deg': 50.63, 'az_offset_deg': -79.76,
        'target': (-0.147, -0.017, 0.107), 'fov_axis': 'y',
        'shade': (0.2, 0.7), 'shade_space': 'srgb'}
s0 = float(ssim(gold, render(cam0)))
print("start ssim", s0)
rng = np.random.default_rng(3)
sc = dict(distance=0.15, el=4.0, azo=6.0, tx=0.08, ty=0.08, tz=0.08, amb=0.06, dif=0.15)
for it in range(400):
    cam = dict(cam0)
    cam["distance"]=max(0.3,cam0["distance"]+rng.normal(0,sc["distance"]))
    cam["elevation_deg"]=cam0["elevation_deg"]+rng.normal(0,sc["el"])
    cam["az_offset_deg"]=cam0["az_offset_deg"]+rng.normal(0,sc["azo"])
    t=list(cam0["target"]); t[0]+=rng.normal(0,sc["tx"]); t[1]+=rng.normal(0,sc["ty"]); t[2]+=rng.normal(0,sc["tz"])
    cam["target"]=tuple(t)
    sh=list(cam0.get("shade",(0.2,0.7)))
    sh[0]=max(0.0,sh[0]+rng.normal(0,sc["amb"])); sh[1]=max(0.0,sh[1]+rng.normal(0,sc["dif"]))
    cam["shade"]=tuple(sh)
    if rng.random()<0.2: cam["shade_space"] = "linear" if cam0.get("shade_space")=="srgb" else "srgb"
    s=float(ssim(gold,render(cam)))
    if s>s0:
        s0,cam0=s,cam; print(f"it {it}: ssim={s0:.4f} {cam}")
        for k in sc: sc[k]*=0.95
print("FINAL", s0, cam0)
img=render(cam0)
sep=np.ones((gold.shape[0],2,3),np.float32)
numpy_to_png("/tmp/diag/buildings_fit3.png",(np.concatenate([img,sep,gold,sep,np.clip(np.abs(img-gold)*4,0,1)],1)*255+0.5).astype(np.uint8))
