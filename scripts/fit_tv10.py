# Joint TV10 refit: shared colormap stops + window + per-scene light.
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
import numpy as np
import importlib.util
spec = importlib.util.spec_from_file_location("fam", "/root/repo/tests/test_reference_family_goldens.py")
fam = importlib.util.module_from_spec(spec); spec.loader.exec_module(fam)
from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim
from forge3d_tpu import colormaps

NAMES = ["terrain_tv10_zero_sss", "terrain_tv10_scene_a_sss", "terrain_tv10_scene_b_sss"]
SCENES = {"terrain_tv10_zero_sss": (fam._TV10_A, fam._TV10_A_PROFILE),
          "terrain_tv10_scene_a_sss": (fam._TV10_A, fam._TV10_A_PROFILE),
          "terrain_tv10_scene_b_sss": (fam._TV10_B, fam._TV10_B_PROFILE)}
refs = {n: png_to_numpy(fam.FAMILY_GOLDENS[n]["golden"]).astype(np.float32)[...,:3]/255.0 for n in NAMES}
POS = np.array([0.0, 0.22, 0.5, 0.72, 1.0])

def reg(stops):
    t = np.linspace(0,1,256)
    lut = np.stack([np.interp(t, POS, stops[:,c]) for c in range(3)], -1)
    colormaps.register("tv10_fit", np.clip(lut,0,4).astype(np.float32))
    return "tv10_fit"

def score(stops, pa, pb):
    name = reg(stops)
    out = {}
    for n in NAMES:
        scene, prof0 = SCENES[n]
        prof = dict(prof0); prof.update(pa if prof0 is fam._TV10_A_PROFILE else pb)
        inten, ambi = prof["light"]
        img = fam._screen_render(fam._tv10_heightmap(), name,
                                 size_px=scene["size_px"],
                                 azimuth=scene["light_azimuth_deg"],
                                 elevation=scene["light_elevation_deg"],
                                 intensity=inten, ambient=ambi, profile=prof)
        out[n] = float(ssim(refs[n], np.asarray(img)[...,:3].astype(np.float32)/255.0))
    return out

hexs = ["#1b381d", "#416a30", "#7d7a4b", "#b6a98d", "#f4f7fb"]
s0 = np.array([[int(h[i:i+2],16)/255 for i in (1,3,5)] for h in hexs])
pa0 = {"gain": fam._TV10_A_PROFILE["gain"], "light": fam._TV10_A_PROFILE["light"]}
pb0 = {"gain": fam._TV10_B_PROFILE["gain"], "light": fam._TV10_B_PROFILE["light"]}
cur_sc = score(s0, pa0, pb0)
print("start", {k.split("tv10_")[1]: round(v,4) for k,v in cur_sc.items()}, flush=True)
rng = np.random.default_rng(4)
cur = (sum(cur_sc.values()), s0, pa0, pb0)
sc = 0.06
for it in range(300):
    st = np.clip(cur[1] + rng.normal(0, sc, cur[1].shape), 0, 1.5)
    pa = {"gain": max(cur[2]["gain"]+rng.normal(0,0.07), 0.05),
          "light": (max(cur[2]["light"][0]+rng.normal(0,0.07),0),
                    max(cur[2]["light"][1]+rng.normal(0,0.1),0))}
    pb = {"gain": max(cur[3]["gain"]+rng.normal(0,0.07), 0.05),
          "light": (max(cur[3]["light"][0]+rng.normal(0,0.07),0),
                    max(cur[3]["light"][1]+rng.normal(0,0.1),0))}
    try: s_ = score(st, pa, pb)
    except Exception: continue
    v = sum(s_.values())
    if v > cur[0]:
        cur = (v, st, pa, pb); sc *= 0.98
        if it % 25 == 0: print(f"it {it}: {v:.4f}", flush=True)
print("FINAL", round(cur[0],4))
print({k: round(v,4) for k,v in score(cur[1], cur[2], cur[3]).items()})
print("stops:", np.round(cur[1],4).tolist())
print("pa:", cur[2]); print("pb:", cur[3])
