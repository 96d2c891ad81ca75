#!/usr/bin/env python
# bench.py — north-star benchmark: path-traced terrain throughput per chip.
#
# Prints ONE JSON line:
#   {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
#
# Metric (driver-defined, /root/repo/BASELINE.json): terrain PT
# Msamples/sec/chip (sample = one full camera sample: primary ray + sun
# shadow ray + cosine env ray + shading + accumulation + Welford).
# Baseline target: 1920x1080 @ 256 spp < 1 s on a v5e-8
# => 66.4 Msamples/sec/chip. vs_baseline = measured / 66.4.
#
# The sample rate is resolution-independent (per-ray cost dominates), so the
# harness measures at a size that completes quickly and reports the rate.

import json
import time

import numpy as np

BASELINE_MSPS_PER_CHIP = (1920 * 1080 * 256) / 8 / 1e6  # 66.355


def main():
    import jax
    import jax.numpy as jnp

    from forge3d_tpu.ops import restir as rst
    from forge3d_tpu.ops.pyramid import build_pyramid
    from forge3d_tpu.ops.shading import EnvMap
    from forge3d_tpu.ops.traversal import scene_from_pyramid
    from forge3d_tpu.pt.terrain_ref import TerrainRefDesc, _make_frame_step

    W, H = 512, 512
    SPP = 2
    n = 513
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    rng = np.random.default_rng(7)
    dem = (
        40.0 * np.sin(x * 0.02) * np.cos(y * 0.017)
        + 12.0 * np.sin(x * 0.11 + 1.3) * np.cos(y * 0.09)
        + 2.0 * rng.standard_normal((n, n)).astype(np.float32)
    ).astype(np.float32)

    desc = TerrainRefDesc(
        heights=dem,
        cam_origin=(256.0, 140.0, 700.0),
        cam_look_at=(256.0, 0.0, 256.0),
        fov_y_deg=45.0,
        width=W,
        height=H,
        spp=SPP,
        exaggeration=1.0,
        traversal="mxu",
    )
    pyr = build_pyramid(dem)
    scene, static = scene_from_pyramid(pyr, spacing_xz=desc.spacing,
                                       exaggeration=desc.exaggeration)
    scene = jax.device_put(scene)
    from forge3d_tpu.ops.traversal_mxu import build_mxu_tables

    tables, mxu_static = build_mxu_tables(dem, exaggeration=desc.exaggeration)
    scene_arg = (scene, jax.device_put(tables))
    env = EnvMap(rgb=None, intensity=jnp.float32(desc.env_intensity))
    step = jax.jit(_make_frame_step(desc, static, mxu_static),
                   donate_argnums=(2, 3))

    accum = jnp.zeros((H, W, 4), jnp.float32)
    welford = jnp.zeros((H, W, 2), jnp.float32)
    res_prev = rst.Reservoirs.zeros(H * W)

    def sync(a):
        # Force real completion: async dispatch through the TPU tunnel makes
        # block_until_ready unreliable; a scalar readback is authoritative.
        return float(jnp.sum(a[..., 3]))

    # warmup/compile
    accum, welford, curr, _ = step(scene_arg, env, accum, welford, res_prev,
                                   jnp.uint32(0))
    sync(accum)

    iters = 2
    t0 = time.perf_counter()
    for f in range(1, 1 + iters):
        accum, welford, curr, _ = step(scene_arg, env, accum, welford,
                                       res_prev, jnp.uint32(f))
    sync(accum)
    dt = (time.perf_counter() - t0) / iters

    msamples = W * H * SPP / dt / 1e6
    out = {
        "metric": "terrain PT Msamples/sec/chip (target 66.4 = 1080p@256spp <1s on v5e-8)",
        "value": round(msamples, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msamples / BASELINE_MSPS_PER_CHIP, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
