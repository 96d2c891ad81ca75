import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo')
import numpy as np
from forge3d_tpu.pt.terrain_ref import TerrainRefDesc, render_terrain_reference
from forge3d_tpu.pt.terrain_sweep import render_terrain_sweep
from forge3d_tpu.utils.metrics import ssim
from forge3d_tpu.io.image import numpy_to_png

n = 65
yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
dem = (6.0 * np.sin(xx * 0.15) * np.cos(yy * 0.12)).astype(np.float32)
kw = dict(heights=dem, cam_origin=(32.0, 22.0, 90.0),
          cam_look_at=(32.0, 0.0, 32.0), fov_y_deg=42.0,
          width=128, height=96)
ref = render_terrain_reference(TerrainRefDesc(
    spp=8, min_frames=32, max_frames=64, variance_threshold=1e9,
    restir=False, **kw))
sw = render_terrain_sweep(TerrainRefDesc(spp=1, **kw), frames=16)
a = ref["rgba"][..., :3].astype(np.float32)/255
b = sw["rgba"][..., :3].astype(np.float32)/255
print("ssim", round(float(ssim(a,b)),4), "mad", round(float(np.abs(a-b).mean()*255),3))
d = np.abs(a-b).max(-1)
print("err>0.1 px:", (d>0.1).sum(), "err>0.05:", (d>0.05).sum())
hm = np.clip(d*4,0,1)
pair = np.concatenate([a, b, np.stack([hm]*3,-1)],1)
numpy_to_png('/tmp/sweep_resid.png', (np.repeat(np.repeat(pair,3,0),3,1)*255+0.5).astype(np.uint8))
# row/col distribution of error
print("top error rows:", np.argsort(d.sum(1))[-5:], "of", d.shape[0])
