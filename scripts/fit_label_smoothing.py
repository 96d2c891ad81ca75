import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo')
import numpy as np
import tests.test_reference_golden_parity as P
import forge3d_tpu.labels.native_text as NT
from forge3d_tpu.mapscene import MapScene
from forge3d_tpu.io.image import png_to_numpy
from forge3d_tpu.utils.metrics import ssim

IDS = ["mapscene_vector_labels", "mapscene_label_halo_depth",
       "mapscene_label_occlusion_ridge", "mapscene_label_arabic_joining"]
recipes = P._recipes()
refs = {i: png_to_numpy(P.REF_GOLDENS/f"{i}.png").astype(np.float32)[...,:3]/255.0 for i in IDS}
def scores():
    return {i: float(ssim(refs[i], MapScene(recipes[i]).render().rgba[...,:3].astype(np.float32)/255.0)) for i in IDS}
for sm in (0.8, 0.9, 1.0, 1.1):
    NT._SMOOTHING = sm
    s = scores()
    print(f"smoothing={sm}: mean {round(sum(s.values())/4,4)} {[round(v,4) for v in s.values()]}", flush=True)
