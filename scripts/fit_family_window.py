import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
import numpy as np
import importlib.util
spec = importlib.util.spec_from_file_location("fam", "/root/repo/tests/test_reference_family_goldens.py")
fam = importlib.util.module_from_spec(spec); spec.loader.exec_module(fam)
from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim

ref = png_to_numpy(fam.FAMILY_GOLDENS["terrain_pbr"]["golden"]).astype(np.float32)[...,:3]/255.0
P0 = dict(fam._FAMILY_PROFILE)

def render(window):
    prof = dict(P0); prof["window"] = window
    img = fam._screen_render(fam._terrain_family_heightmap(),
                             fam._terrain_family_colormap(),
                             size_px=(192,128), azimuth=135.0, elevation=24.0,
                             intensity=0.1, ambient=1.43, profile=prof)
    return np.asarray(img)[...,:3].astype(np.float32)/255.0

best = []
for vup in (True, False):
    for u0 in np.arange(0.0, 0.65, 0.1):
        for v0 in np.arange(0.0, 0.65, 0.1):
            for wu in (0.2, 0.4, 0.6, 0.8, 1.0):
                for wv in (0.2, 0.4, 0.6, 0.8, 1.0):
                    if u0 + wu > 1.25 or v0 + wv > 1.25: continue
                    s = float(ssim(ref, render((u0, v0, wu, wv, vup))))
                    best.append((s, round(u0,2), round(v0,2), wu, wv, vup))
best.sort(reverse=True)
for b in best[:8]: print(b)
s, u0, v0, wu, wv, vup = best[0]
img = render((u0, v0, wu, wv, vup))
pair = np.concatenate([ref, img], 1)
numpy_to_png("/tmp/famwin_pbr.png", (np.repeat(np.repeat(pair,3,0),3,1)*255+0.5).astype(np.uint8))
