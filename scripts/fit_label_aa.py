import os, sys, itertools
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo')
import numpy as np
import tests.test_reference_golden_parity as P
import forge3d_tpu.labels.render as R
from forge3d_tpu.mapscene import MapScene
from forge3d_tpu.io.image import png_to_numpy
from forge3d_tpu.utils.metrics import ssim

IDS = ["mapscene_vector_labels", "mapscene_label_halo_depth",
       "mapscene_label_occlusion_ridge", "mapscene_label_arabic_joining"]
recipes = P._recipes()
refs = {i: png_to_numpy(P.REF_GOLDENS/f"{i}.png").astype(np.float32)[...,:3]/255.0 for i in IDS}

def scores():
    out = {}
    for i in IDS:
        got = MapScene(recipes[i]).render().rgba[...,:3].astype(np.float32)/255.0
        out[i] = float(ssim(refs[i], got))
    return out

base = scores()
print("base:", {k.split('_',1)[1]: round(v,4) for k,v in base.items()})
best = (sum(base.values()), R.AA_RAMP, R.FILL_BIAS)
for aa in (0.35, 0.45, 0.55, 0.6, 0.7):
    for fb in (0.25, 0.35, 0.45, 0.55):
        R.AA_RAMP = aa; R.FILL_BIAS = fb
        s = scores()
        tot = sum(s.values())
        tag = "*" if tot > best[0] else ""
        print(f"aa={aa} fb={fb}: {round(tot/4,4)} {[round(v,4) for v in s.values()]} {tag}", flush=True)
        if tot > best[0]: best = (tot, aa, fb)
print("BEST", best)
