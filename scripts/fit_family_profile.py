# Joint refit of _FAMILY_PROFILE (window/shadow/exposure) on the terrain
# visual goldens.
import os, sys, math
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tests')
import numpy as np
import importlib.util
spec = importlib.util.spec_from_file_location("fam", "/root/repo/tests/test_reference_family_goldens.py")
fam = importlib.util.module_from_spec(spec); spec.loader.exec_module(fam)
from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim

NAMES = ["terrain_pbr", "terrain_atmosphere", "terrain_low_sun_sky"]
refs = {n: png_to_numpy(fam.FAMILY_GOLDENS[n]["golden"]).astype(np.float32)[...,:3]/255.0 for n in NAMES}

def render_with(profile, inten, ambi):
    out = {}
    for n in NAMES:
        spec_ = fam.FAMILY_GOLDENS[n]
        # re-create the entry with overridden profile/intensity
        kw = {"terrain_pbr": dict(size_px=(192,128), azimuth=135.0, elevation=24.0),
              "terrain_atmosphere": dict(size_px=(192,128), azimuth=135.0, elevation=12.0),
              "terrain_low_sun_sky": dict(size_px=(192,128), azimuth=118.0, elevation=5.0)}[n]
        img = fam._screen_render(fam._terrain_family_heightmap(),
                                 fam._terrain_family_colormap(),
                                 intensity=inten, ambient=ambi,
                                 profile=profile, **kw)
        out[n] = np.asarray(img)[...,:3].astype(np.float32)/255.0
    return out

def score(profile, inten, ambi):
    out = render_with(profile, inten, ambi)
    return {n: float(ssim(refs[n], out[n])) for n in NAMES}, out

P0 = dict(fam._FAMILY_PROFILE)
s0 = score(P0, 0.1, 1.43)[0]
print("current:", {k: round(v,4) for k,v in s0.items()}, "sum", round(sum(s0.values()),4))

def make(vec):
    (u0,v0,wu,wv,vup, gain, f0,fu,fv, zrel, soft, floor, inten, ambi) = vec
    prof = dict(P0)
    prof["window"] = (u0, v0, wu, wv, vup > 0.5)
    prof["gain"] = gain
    prof["fog0"], prof["fog_u"], prof["fog_v"] = f0, fu, fv
    prof["shadow"] = {"zrel": abs(zrel), "steps": 40, "softness": abs(soft),
                      "floor": min(max(floor, 0.0), 1.0)}
    return prof, inten, ambi

starts = [
    [0.0, 0.0, 1.0, 1.0, 1, 0.8, -0.24, 0.12, 0.25, 60.0, 3.0, 0.1, 0.1, 1.43],
    [0.0, 0.0, 1.0, 1.0, 0, 0.8, -0.24, 0.12, 0.25, 60.0, 3.0, 0.1, 0.1, 1.43],
    list(P0["window"][:4]) + [1, P0["gain"], P0["fog0"], P0["fog_u"], P0["fog_v"],
        P0["shadow"]["zrel"], P0["shadow"]["softness"], P0["shadow"]["floor"], 0.1, 1.43],
    [0.0, 0.0, 0.75, 0.75, 1, 0.8, -0.24, 0.12, 0.25, 60.0, 3.0, 0.1, 0.1, 1.43],
]
rng = np.random.default_rng(11)
best = None
for s0v in starts:
    p, i_, a_ = make(s0v)
    sc = score(p, i_, a_)[0]; val = sum(sc.values())
    cur = (val, list(s0v))
    scale = np.array([0.05,0.05,0.08,0.08,0, 0.12, 0.08,0.08,0.12, 12.0, 1.0, 0.05, 0.08, 0.25])
    for it in range(120):
        cand = [c + rng.normal(0, s) for c, s in zip(cur[1], scale)]
        cand[4] = cur[1][4]
        p, i_, a_ = make(cand)
        try:
            sc = score(p, i_, a_)[0]
        except Exception:
            continue
        v = sum(sc.values())
        if v > cur[0]:
            cur = (v, cand); scale *= 0.96
    print("start", [round(x,2) for x in s0v[:5]], "->", round(cur[0],4), flush=True)
    if best is None or cur[0] > best[0]:
        best = cur
print("BEST sum", round(best[0],4))
p, i_, a_ = make(best[1])
sc, out = score(p, i_, a_)
print({k: round(v,4) for k,v in sc.items()})
print("profile:", {k: (tuple(round(float(x),4) for x in v) if isinstance(v,tuple) else
       ({kk: round(float(vv),4) for kk,vv in v.items()} if isinstance(v,dict) else round(float(v),4)))
      for k,v in p.items()})
print("light:", round(i_,4), round(a_,4))
for n in NAMES:
    pair = np.concatenate([refs[n], out[n]],1)
    numpy_to_png(f"/tmp/famfit_{n}.png", (np.repeat(np.repeat(pair,3,0),3,1)*255+0.5).astype(np.uint8))
