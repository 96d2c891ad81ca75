import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
import numpy as np
import importlib.util
spec = importlib.util.spec_from_file_location("fam", "/root/repo/tests/test_reference_family_goldens.py")
fam = importlib.util.module_from_spec(spec); spec.loader.exec_module(fam)
from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim
only = sys.argv[1:] or None
for name, spec_ in sorted(fam.FAMILY_GOLDENS.items()):
    if only and not any(k in name for k in only): continue
    ref = png_to_numpy(spec_["golden"]).astype(np.float32)[...,:3]/255.0
    got = np.asarray(spec_["render"]()).astype(np.float32)[...,:3]/255.0
    s = float(ssim(ref, got))
    print(f"{name}: {s:.4f}")
    pair = np.concatenate([ref, np.ones((ref.shape[0],2,3),np.float32), got],1)
    f = max(1, 600//ref.shape[1])
    numpy_to_png(f"/tmp/fam_{name}.png", (np.repeat(np.repeat(pair,f,0),f,1)*255+0.5).astype(np.uint8))
