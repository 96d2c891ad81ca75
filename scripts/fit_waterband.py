import os, sys, copy
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo')
import numpy as np
import tests.test_reference_golden_parity as P
from forge3d_tpu.mapscene import MapScene
from forge3d_tpu.io.image import png_to_numpy
from forge3d_tpu.utils.metrics import ssim

for sid in ("mapscene_auto_water", "mapscene_screen_space_reflection"):
    rec = P._recipes()[sid]
    ref = png_to_numpy(P.REF_GOLDENS/f"{sid}.png").astype(np.float32)[...,:3]/255.0
    got = MapScene(rec).render().rgba[...,:3].astype(np.float32)/255.0
    print(sid, "base", round(float(ssim(ref, got)),4))
