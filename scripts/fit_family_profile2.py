import os, sys, math
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
import numpy as np
import importlib.util
spec = importlib.util.spec_from_file_location("fam", "/root/repo/tests/test_reference_family_goldens.py")
fam = importlib.util.module_from_spec(spec); spec.loader.exec_module(fam)
from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim

ENTRIES = {
 "terrain_pbr": dict(size_px=(192,128), azimuth=135.0, elevation=24.0),
 "terrain_atmosphere": dict(size_px=(192,128), azimuth=135.0, elevation=12.0),
 "terrain_low_sun_sky": dict(size_px=(192,128), azimuth=118.0, elevation=5.0),
 "terrain_water": dict(size_px=(192,128), azimuth=135.0, elevation=18.0,
                       water_mask=fam._terrain_family_water_mask()),
 "terrain_water_reflection": dict(size_px=(256,160), azimuth=135.0, elevation=15.0,
                       water_mask=fam._terrain_family_water_mask()),
}
refs = {n: png_to_numpy(fam.FAMILY_GOLDENS[n]["golden"]).astype(np.float32)[...,:3]/255.0 for n in ENTRIES}

def score(profile, inten, ambi):
    out = {}
    for n, kw in ENTRIES.items():
        img = fam._screen_render(fam._terrain_family_heightmap(),
                                 fam._terrain_family_colormap(),
                                 intensity=inten, ambient=ambi,
                                 profile=profile, **kw)
        out[n] = float(ssim(refs[n], np.asarray(img)[...,:3].astype(np.float32)/255.0))
    return out

P0 = dict(fam._FAMILY_PROFILE)
def make(vec):
    (gain, sr, sg, sb, f0, fu, fv, zrel, soft, floor, inten, ambi) = vec
    prof = dict(P0)
    prof["gain"] = abs(gain)
    prof["sky"] = (abs(sr), abs(sg), abs(sb))
    prof["fog0"], prof["fog_u"], prof["fog_v"] = f0, fu, fv
    prof["shadow"] = {"zrel": abs(zrel), "steps": 40, "softness": abs(soft),
                      "floor": min(max(floor, 0.0), 1.0)}
    return prof, inten, ambi

v0 = [0.813, 56.9, 118.1, 0.0, -0.2449, 0.1155, 0.2517, 78.7, 5.04, 0.087, 0.1, 1.43]
p, i_, a_ = make(v0)
sc = score(p, i_, a_)
print("start", {k: round(v,3) for k,v in sc.items()}, round(sum(sc.values()),4), flush=True)
rng = np.random.default_rng(3)
cur = (sum(sc.values()), v0)
scale = np.array([0.1, 10., 15., 10., 0.1, 0.08, 0.1, 12., 1.2, 0.05, 0.1, 0.3])
for it in range(250):
    cand = [c + rng.normal(0, s) for c, s in zip(cur[1], scale)]
    p, i_, a_ = make(cand)
    try: sc = score(p, i_, a_)
    except Exception: continue
    v = sum(sc.values())
    if v > cur[0]:
        cur = (v, cand); scale *= 0.97
        print(f"it {it}: {v:.4f} " + str({k: round(x,3) for k,x in sc.items()}), flush=True)
print("FINAL", round(cur[0],4))
p, i_, a_ = make(cur[1])
sc = score(p, i_, a_)
print({k: round(v,4) for k,v in sc.items()})
print("vec:", [round(float(x),4) for x in cur[1]])
