#!/usr/bin/env python
# bench.py — north-star benchmark: 1080p path-traced terrain throughput.
#
# Prints ONE JSON line:
#   {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
#
# Metric (driver-defined, /root/repo/BASELINE.json): 1080p terrain
# path-trace Msamples/sec/chip at 64 spp. Baseline target: 1920x1080 @
# 256 spp in < 1 s on a v5e-8 => 256*1920*1080/8 samples/chip/s
# = 66.4 Msamples/sec/chip. vs_baseline = measured / 66.4.

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

    W, H = 1920, 1080
    SPP = 64
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
    )
    pyr = build_pyramid(dem)
    scene, static = scene_from_pyramid(pyr, spacing_xz=desc.spacing,
                                       exaggeration=desc.exaggeration)
    env = EnvMap(rgb=None, intensity=jnp.float32(desc.env_intensity))
    step = jax.jit(_make_frame_step(desc, scene, static, env),
                   donate_argnums=(0, 1))

    accum = jnp.zeros((H, W, 4), jnp.float32)
    welford = jnp.zeros((H, W, 2), jnp.float32)
    res_prev = rst.Reservoirs.zeros(H * W)

    # warmup/compile
    accum, welford, curr, res_prev_c = step(accum, welford, res_prev, jnp.uint32(0))
    jax.block_until_ready(accum)

    iters = 3
    t0 = time.perf_counter()
    for f in range(1, 1 + iters):
        accum, welford, curr, res_prev_c = step(accum, welford, res_prev, jnp.uint32(f))
    jax.block_until_ready(accum)
    dt = (time.perf_counter() - t0) / iters

    msamples = W * H * SPP / dt / 1e6
    n_chips = 1  # bench runs single-chip; metric is per chip
    out = {
        "metric": "1080p terrain PT Msamples/sec/chip @ 64spp",
        "value": round(msamples / n_chips, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msamples / n_chips / BASELINE_MSPS_PER_CHIP, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
