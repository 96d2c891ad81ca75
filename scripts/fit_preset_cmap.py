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

ref = png_to_numpy(fam.FAMILY_GOLDENS["preset_rainier_showcase_mapscene"]["golden"]).astype(np.float32)[...,:3]/255.0
P0 = dict(fam._PRESET_PROFILE)
POS = np.array([0.0, 0.33, 0.66, 0.85, 1.0])

def register(stops):
    t = np.linspace(0, 1, 256)[:, None]
    cols = np.stack([np.interp(t[:,0], POS, stops[:, c]) for c in range(3)], -1)
    colormaps.register("preset_fit", np.clip(cols, 0, 4).astype(np.float32))
    return "preset_fit"

def score(stops, inten, ambi, gain):
    name = register(stops)
    prof = dict(P0); prof["gain"] = gain
    img = fam._screen_render(fam._preset_heightmap(), name, size_px=(128,128),
                             azimuth=135.0, elevation=25.0,
                             intensity=inten, ambient=ambi, profile=prof)
    got = np.asarray(img)[...,:3].astype(np.float32)/255.0
    return float(ssim(ref, got)), got

s0 = np.array([[0.05, 0.35, 0.08], [0.1, 0.55, 0.12], [0.45, 0.5, 0.15],
               [0.65, 0.45, 0.35], [0.95, 0.95, 0.95]])
inten, ambi = P0.get("light", (0.877, 0.781))
gain = P0["gain"]
cur_s, _ = score(s0, inten, ambi, gain)
print("start", round(cur_s,4), flush=True)
rng = np.random.default_rng(2)
cur = (cur_s, s0, inten, ambi, gain)
sc = 0.08
for it in range(400):
    st = np.clip(cur[1] + rng.normal(0, sc, cur[1].shape), 0, 1.2)
    i2 = max(cur[2] + rng.normal(0, 0.06), 0)
    a2 = max(cur[3] + rng.normal(0, 0.08), 0)
    g2 = max(cur[4] + rng.normal(0, 0.05), 0.05)
    s, _ = score(st, i2, a2, g2)
    if s > cur[0]:
        cur = (s, st, i2, a2, g2); sc *= 0.98
        if it % 20 == 0: print(f"it {it}: {s:.4f}", flush=True)
print("FINAL", round(cur[0],4))
print("stops:", np.round(cur[1],4).tolist())
print("light:", round(cur[2],4), round(cur[3],4), "gain:", round(cur[4],4))
s, got = score(cur[1], cur[2], cur[3], cur[4])
pair = np.concatenate([ref, got],1)
numpy_to_png('/tmp/preset_fit.png', (np.repeat(np.repeat(pair,2,0),2,1)*255+0.5).astype(np.uint8))
