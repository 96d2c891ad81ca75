#!/usr/bin/env python3
"""Stage-5: long joint fit (camera+fov+shading), all four buildings."""
import math, os, sys
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
cam0 = {'distance': 3.302, 'elevation_deg': 26.68, 'az_offset_deg': -70.67,
        'target': (-0.182, -0.098, -0.001), 'fov_axis': 'y',
        'shade': (0.174, 0.0), 'shade_space': 'srgb', 'fov_deg': 45.0}
s0 = float(ssim(gold, render(cam0)))
print("start", s0)
rng = np.random.default_rng(7)
sc = dict(d=0.2, el=5.0, azo=8.0, t=0.08, amb=0.04, dif=0.06, fov=6.0)
for it in range(600):
    cam = dict(cam0)
    cam["distance"]=max(0.3,cam0["distance"]+rng.normal(0,sc["d"]))
    cam["elevation_deg"]=cam0["elevation_deg"]+rng.normal(0,sc["el"])
    cam["az_offset_deg"]=cam0["az_offset_deg"]+rng.normal(0,sc["azo"])
    cam["fov_deg"]=min(120,max(15,cam0.get("fov_deg",45.0)+rng.normal(0,sc["fov"])))
    t=[v+rng.normal(0,sc["t"]) for v in cam0["target"]]; cam["target"]=tuple(t)
    sh=list(cam0["shade"]); sh[0]=max(0,sh[0]+rng.normal(0,sc["amb"])); sh[1]=max(0,sh[1]+rng.normal(0,sc["dif"])); cam["shade"]=tuple(sh)
    if rng.random()<0.15: cam["shade_space"]="linear" if cam0["shade_space"]=="srgb" else "srgb"
    s=float(ssim(gold,render(cam)))
    if s>s0:
        s0,cam0=s,cam; print(f"it {it}: {s0:.4f}")
        for k in sc: sc[k]*=0.96
print("FINAL", s0); print(cam0)
