import os, sys, subprocess
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo')
import numpy as np
import tests.test_reference_golden_parity as P
from forge3d_tpu.mapscene import MapScene
from forge3d_tpu.io.image import png_to_numpy
from forge3d_tpu.utils.metrics import ssim
import copy
base_rec = P._recipes()["mapscene_vector_stroke_quality"]
ref = png_to_numpy(P.REF_GOLDENS/"mapscene_vector_stroke_quality.png").astype(np.float32)[...,:3]/255.0
b = np.array([33., 63., 13.])
g = np.array([194., 180., 142.])
best=None
for alpha in (0.82, 0.86, 0.90, 0.94, 0.98, 1.0):
    c = np.clip((g - b*(1-alpha)) / max(alpha*alpha,1e-6), 0, 255)
    rec = copy.deepcopy(base_rec)
    for l in rec.layers:
        if getattr(l, "kind", "") == "polygons":
            l.color = tuple(c/255); l.opacity = alpha
    got = MapScene(rec).render().rgba[...,:3].astype(np.float32)/255.0
    s = float(ssim(ref, got))
    print(round(alpha,2), np.round(c,0), round(s,4))
    if best is None or s>best[0]: best=(s, alpha, c)
print("BEST", best[0], best[1], np.round(best[2],1))
