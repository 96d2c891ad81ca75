import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
import numpy as np
from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim
import forge3d_tpu as f3d

ref = png_to_numpy('/root/reference/tests/golden/hybrid_terrain/mini_dem_reference.png').astype(np.float32)[...,:3]/255.0
def render(sub):
    dem = np.load('/root/reference/python/forge3d/data/mini_dem.npy')
    if sub > 1:
        dem = dem[::sub, ::sub]
    dem = dem.astype(np.float32)
    dem -= dem.min()
    dem /= max(float(dem.max()), 1e-6)
    half = 50.0
    cam = {"origin": (half + 0.0, 35.0, half + 90.0), "look_at": (half, 5.0, half),
           "up": (0.0, 1.0, 0.0), "fov_y": 45.0, "exposure": 1.0}
    spacing = 100.0 / (dem.shape[1] - 1)
    out = f3d.hybrid_render_terrain_reference(
        dem, 256, 256, cam, spacing=(spacing, spacing), exaggeration=20.0,
        albedo=(0.55, 0.52, 0.48), sun_azimuth_deg=225.0,
        sun_elevation_deg=35.0, sun_intensity=2.5, env_intensity=0.35,
        seed=7, traversal="sweep", spp=2)
    return out["rgba"][...,:3].astype(np.float32)/255.0
for sub in (2, 1):
    got = render(sub)
    print("sub", sub, "ssim", round(float(ssim(ref, got)),4))
    if sub == 1:
        pair = np.concatenate([ref, got], 1)
        numpy_to_png('/tmp/minidem_full.png', (np.repeat(np.repeat(pair,2,0),2,1)*255+0.5).astype(np.uint8))
