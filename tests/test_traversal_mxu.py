# Tests: matmul-gather traversal agrees with the reference-parity gather
# traversal and the brute-force oracle.

import numpy as np
import pytest

from forge3d_tpu.ops.pyramid import build_pyramid
from forge3d_tpu.ops.traversal import (scene_from_pyramid, trace,
                                       trace_bruteforce_numpy)
from forge3d_tpu.ops.traversal_mxu import build_mxu_tables, trace_mxu


def _setup(n=33, seed=0, exaggeration=1.0, spacing=(1.0, 1.0),
           origin=(0.0, 0.0)):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = (4.0 * np.sin(x * 0.33) * np.cos(y * 0.27)
           + rng.normal(0, 0.3, (n, n))).astype(np.float32)
    pyr = build_pyramid(dem)
    scene, static = scene_from_pyramid(pyr, origin_xz=origin,
                                       spacing_xz=spacing,
                                       exaggeration=exaggeration)
    tables, ms = build_mxu_tables(dem, exaggeration=exaggeration)
    return dem, scene, static, tables, ms


def _rays(n, count, seed=1):
    rng = np.random.default_rng(seed)
    ro = np.stack([rng.uniform(-5, n + 5, count),
                   rng.uniform(6, 30, count),
                   rng.uniform(-5, n + 5, count)], 1).astype(np.float32)
    target = np.stack([rng.uniform(0, n, count),
                       rng.uniform(-4, 4, count),
                       rng.uniform(0, n, count)], 1)
    rd = target - ro
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return ro, rd.astype(np.float32)


def test_matches_reference_trace():
    dem, scene, static, tables, ms = _setup(33)
    ro, rd = _rays(32, 200)
    r_ref = trace(scene, static,
                  (ro[:, 0], ro[:, 1], ro[:, 2]),
                  (rd[:, 0], rd[:, 1], rd[:, 2]))
    r_mxu = trace_mxu(scene, static, tables, ms,
                      (ro[:, 0], ro[:, 1], ro[:, 2]),
                      (rd[:, 0], rd[:, 1], rd[:, 2]))
    hit_ref = np.asarray(r_ref.hit)
    hit_mxu = np.asarray(r_mxu.hit)
    np.testing.assert_array_equal(hit_mxu, hit_ref)
    t_ref = np.asarray(r_ref.t)[hit_ref]
    t_mxu = np.asarray(r_mxu.t)[hit_ref]
    np.testing.assert_allclose(t_mxu, t_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(r_mxu.cell_x)[hit_ref],
                                  np.asarray(r_ref.cell_x)[hit_ref])


def test_matches_oracle():
    dem, scene, static, tables, ms = _setup(17, seed=5)
    ro, rd = _rays(16, 60, seed=2)
    o_hit, o_t = trace_bruteforce_numpy(dem, (0, 0), (1, 1), 1.0, ro, rd)
    r = trace_mxu(scene, static, tables, ms,
                  (ro[:, 0], ro[:, 1], ro[:, 2]),
                  (rd[:, 0], rd[:, 1], rd[:, 2]))
    np.testing.assert_array_equal(np.asarray(r.hit), o_hit)
    np.testing.assert_allclose(np.asarray(r.t)[o_hit], o_t[o_hit],
                               rtol=1e-3, atol=1e-3)


def test_exaggeration_and_spacing():
    dem, scene, static, tables, ms = _setup(
        25, seed=3, exaggeration=2.5, spacing=(0.4, 0.7), origin=(-3.0, 2.0))
    ro, rd = _rays(10, 80, seed=7)
    ro[:, 0] = ro[:, 0] * 0.4 - 3.0
    ro[:, 2] = ro[:, 2] * 0.7 + 2.0
    r_ref = trace(scene, static,
                  (ro[:, 0], ro[:, 1], ro[:, 2]),
                  (rd[:, 0], rd[:, 1], rd[:, 2]))
    r_mxu = trace_mxu(scene, static, tables, ms,
                      (ro[:, 0], ro[:, 1], ro[:, 2]),
                      (rd[:, 0], rd[:, 1], rd[:, 2]))
    np.testing.assert_array_equal(np.asarray(r_mxu.hit), np.asarray(r_ref.hit))
    m = np.asarray(r_ref.hit)
    np.testing.assert_allclose(np.asarray(r_mxu.t)[m], np.asarray(r_ref.t)[m],
                               rtol=1e-4, atol=1e-4)


def test_vertical_rays_and_misses():
    dem, scene, static, tables, ms = _setup(21, seed=9)
    n = 21
    # straight-down rays over every cell center + some guaranteed misses
    xs, zs = np.meshgrid(np.arange(n - 1) + 0.5, np.arange(n - 1) + 0.5)
    ro = np.stack([xs.ravel(), np.full(xs.size, 50.0), zs.ravel()], 1)
    rd = np.tile([0.0, -1.0, 0.0], (xs.size, 1))
    r = trace_mxu(scene, static, tables, ms,
                  (ro[:, 0], ro[:, 1], ro[:, 2]),
                  (rd[:, 0], rd[:, 1], rd[:, 2]))
    assert np.asarray(r.hit).all()
    # hit heights equal DEM bilinear at centers (average of 4 corners)
    t = np.asarray(r.t)
    hit_y = 50.0 - t
    expect = 0.25 * (dem[:-1, :-1] + dem[:-1, 1:] + dem[1:, :-1]
                     + dem[1:, 1:]).ravel()
    np.testing.assert_allclose(hit_y, expect, atol=1e-3)
    # rays above the terrain pointing up never hit
    r2 = trace_mxu(scene, static, tables, ms,
                   (ro[:, 0], ro[:, 1], ro[:, 2]),
                   (rd[:, 0], -rd[:, 1], rd[:, 2]))
    assert not np.asarray(r2.hit).any()


def test_chunking_padding():
    dem, scene, static, tables, ms = _setup(33)
    ms2 = ms.__class__(**{**ms.__dict__, "chunk": 64})
    ro, rd = _rays(32, 150)  # 150 rays -> 3 chunks of 64 with padding
    r1 = trace_mxu(scene, static, tables, ms,
                   (ro[:, 0], ro[:, 1], ro[:, 2]),
                   (rd[:, 0], rd[:, 1], rd[:, 2]))
    r2 = trace_mxu(scene, static, tables, ms2,
                   (ro[:, 0], ro[:, 1], ro[:, 2]),
                   (rd[:, 0], rd[:, 1], rd[:, 2]))
    np.testing.assert_array_equal(np.asarray(r1.hit), np.asarray(r2.hit))
    np.testing.assert_allclose(np.asarray(r1.t), np.asarray(r2.t),
                               rtol=1e-6, atol=1e-6)


def test_2d_ray_shape():
    dem, scene, static, tables, ms = _setup(17)
    ro, rd = _rays(16, 24)
    shape = (4, 6)
    r = trace_mxu(scene, static, tables, ms,
                  tuple(ro[:, i].reshape(shape) for i in range(3)),
                  tuple(rd[:, i].reshape(shape) for i in range(3)))
    assert r.hit.shape == shape and r.t.shape == shape


def test_block_size_selection():
    from forge3d_tpu.ops.traversal_mxu import build_mxu_tables

    _, ms = build_mxu_tables(np.zeros((513, 513), np.float32))
    assert ms.block == 8 and ms.cbw == 64
    _, ms2 = build_mxu_tables(np.zeros((65, 65), np.float32))
    assert ms2.block == 1 and ms2.cbw == 64
    _, ms3 = build_mxu_tables(np.zeros((1025, 257), np.float32))
    assert ms3.block == 16


def test_terrain_reference_mxu_matches_dda():
    """The flagship renderer produces near-identical frames through either
    traversal backend."""
    import forge3d_tpu as f3d

    n = 33
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = 3.0 * np.sin(x * 0.3) * np.cos(y * 0.25)
    kw = dict(spp=2, min_frames=2, max_frames=6, variance_threshold=1e9,
              seed=5)
    cam = {"origin": (16, 14, 48), "look_at": (16, 0, 16)}
    a = f3d.hybrid_render_terrain_reference(dem, 64, 48, cam,
                                            traversal="dda", **kw)
    b = f3d.hybrid_render_terrain_reference(dem, 64, 48, cam,
                                            traversal="mxu", **kw)
    diff = np.abs(a["rgba"].astype(int) - b["rgba"].astype(int))
    assert diff.max() <= 2, diff.max()      # u8 quantization slack
    with pytest.raises(ValueError):
        f3d.hybrid_render_terrain_reference(dem, 8, 8, cam, max_frames=1,
                                            traversal="warp")
