import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo')
import numpy as np
import tests.test_reference_golden_parity as P
from forge3d_tpu.mapscene import MapScene
from forge3d_tpu.io.image import png_to_numpy
from forge3d_tpu.utils.metrics import ssim
import forge3d_tpu.mapscene as M
rec = P._recipes()["mapscene_tiles3d_points"]
ref = png_to_numpy(P.REF_GOLDENS/"mapscene_tiles3d_points.png").astype(np.float32)[...,:3]/255.0
import re
src = open('/root/repo/forge3d_tpu/mapscene.py').read()
for mult in (0.3, 0.4, 0.5, 0.6):
    s2 = src.replace("float(layer.point_size) * 0.4", f"float(layer.point_size) * {mult}")
    open('/root/repo/forge3d_tpu/mapscene.py','w').write(s2)
    import importlib
    import forge3d_tpu.mapscene as MM
    importlib.reload(MM)
    got = MM.MapScene(rec).render().rgba[...,:3].astype(np.float32)/255.0
    print(mult, round(float(ssim(ref, got)),4))
open('/root/repo/forge3d_tpu/mapscene.py','w').write(src)
