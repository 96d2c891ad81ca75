# Stage-wise timing of the 1080p sweep render on the real chip.
import time, sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

import forge3d_tpu as f3d
from forge3d_tpu.pt.terrain_sweep import _build_pipeline, _F32
from forge3d_tpu.pt.terrain_ref import TerrainRefDesc
from forge3d_tpu.ops.sweep import EnvMap

W, H = 1920, 1080
n = 1025
y, x = np.mgrid[0:n, 0:n].astype(np.float32)
rng = np.random.default_rng(7)
dem = (40.0*np.sin(x*0.02)*np.cos(y*0.017)
       + 12.0*np.sin(x*0.11+1.3)*np.cos(y*0.09)
       + 2.0*rng.standard_normal((n,n)).astype(np.float32)).astype(np.float32)
desc = TerrainRefDesc(heights=dem, width=W, height=H,
                      cam_origin=(512.0, 260.0, 1400.0),
                      cam_look_at=(512.0, 0.0, 512.0), fov_y_deg=45.0)
heights = np.asarray(desc.heights, np.float32)
rg, ps, prepare, frame_fn, resolve, render_all = _build_pipeline(
    heights.shape, tuple(map(float, desc.spacing)), float(desc.exaggeration),
    tuple(map(float, desc.cam_origin)), tuple(map(float, desc.cam_look_at)),
    tuple(map(float, desc.cam_up)), float(desc.fov_y_deg), W, H,
    32, 12, -0.55, float(desc.sun_azimuth_deg), float(desc.sun_elevation_deg),
    bool(desc.shadows_enabled), None)
print("rot grid n_v x n_u:", rg.n_v, rg.n_u)
print("polar e,k,a:", ps.e_count, ps.k_count, ps.a_count, "batch_n", frame_fn.batch_n)

env = EnvMap(rgb=None, intensity=jnp.asarray(desc.env_intensity, _F32))
lc = jnp.asarray([desc.sun_intensity * c for c in desc.sun_color], _F32)
albedo = jnp.asarray(desc.albedo, _F32)
h_rng = float(heights.max() - heights.min()) * desc.exaggeration
shadow_eps = jnp.asarray(1e-4 * (h_rng + 1.0), _F32)
hgt = jax.device_put(heights)

def t(label, fn, *a, **k):
    r = fn(*a, **k); jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r = fn(*a, **k); jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1000:.0f} ms (best of 3)", flush=True)
    return r

rot = t("rotate", render_all.rotate_only, hgt)
h_rot, _v, du, dv = rot
keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(0), i))(
    jnp.arange(frame_fn.batch_n))
acc = t(f"batch({frame_fn.batch_n} frames)", frame_fn, hgt, h_rot, du, dv,
        env, lc, albedo, shadow_eps, keys)
t("resolve+pack", resolve, acc / _F32(8), jnp.asarray(1.0, _F32))
# full render timing (2 batches of 4 = 8 frames)
t("render_all(8f)", render_all, hgt, env, lc, albedo, shadow_eps,
  jnp.asarray(1.0, _F32), jnp.uint32(7), 2, 4)
