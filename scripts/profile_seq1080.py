import time, sys
sys.path.insert(0, '/root/repo')
import numpy as np
import forge3d_tpu as f3d

W, H = 1920, 1080
n = 1025
y, x = np.mgrid[0:n, 0:n].astype(np.float32)
rng = np.random.default_rng(7)
dem = (40.0*np.sin(x*0.02)*np.cos(y*0.017)
       + 12.0*np.sin(x*0.11+1.3)*np.cos(y*0.09)
       + 2.0*rng.standard_normal((n,n)).astype(np.float32)).astype(np.float32)
cam = dict(origin=(512.0, 260.0, 1400.0), look_at=(512.0, 0.0, 512.0), fov_y=45.0)
for s in (7, 8):
    f3d.hybrid_render_terrain_reference(dem, W, H, cam, spp=2, seed=s, traversal="sweep")
print("warm", flush=True)
K = 4
t0 = time.perf_counter()
outs = f3d.hybrid_render_terrain_sequence(dem, W, H, cam, seeds=[11+s for s in range(K)], spp=2)
dt = time.perf_counter() - t0
print(f"sequence {K}: {dt:.2f}s = {dt/K:.2f}s/render = {K*W*H*64/dt/1e6:.1f} Ms/s", flush=True)
# single render split: compute only (block) vs full with unpack
import jax
t0 = time.perf_counter()
out = f3d.hybrid_render_terrain_reference(dem, W, H, cam, spp=2, seed=31, traversal="sweep")
t1 = time.perf_counter()
print(f"single render end-to-end: {t1-t0:.2f}s")
