# Async height-tile streaming (reference height_loader.rs parity:
# worker-pool tile loads, LRU byte budget, prefetch horizon, mosaic
# window feeding the Clipmap source contract).

import time

import numpy as np

from forge3d_tpu.terrain.streaming import (HeightTileLoader,
                                           geotiff_tile_source)


def _proc_source(tx, tz, lod):
    # deterministic procedural tiles: value = tile id ramp
    n = 32
    base = float(tx * 1000 + tz * 10 + lod)
    return np.full((n, n), base, np.float32)


def test_async_request_and_cache_hit():
    ld = HeightTileLoader(_proc_source, tile_px=32, budget_bytes=1 << 20)
    t = ld.request((2, 3, 0)).result(timeout=10)
    assert t.shape == (32, 32) and float(t[0, 0]) == 2030.0
    before = ld.stats.loaded
    t2 = ld.request((2, 3, 0)).result(timeout=10)
    assert ld.stats.loaded == before and ld.stats.hits >= 1
    assert np.array_equal(t, t2)
    ld.close()


def test_lru_budget_evicts():
    tile_bytes = 32 * 32 * 4
    ld = HeightTileLoader(_proc_source, tile_px=32,
                          budget_bytes=3 * tile_bytes)
    for k in range(6):
        ld.request((k, 0, 0)).result(timeout=10)
    ld.drain(timeout=10)
    assert ld.stats.evicted >= 2
    assert ld.stats.resident_bytes <= 3 * tile_bytes
    ld.close()


def test_prefetch_horizon_queues_neighborhood():
    ld = HeightTileLoader(_proc_source, tile_px=32, spacing=1.0)
    n = ld.prefetch_around(100.0, 100.0, radius_tiles=1)
    assert n == 9
    ld.drain(timeout=10)
    assert ld.stats.loaded >= 1
    ld.close()


def test_window_mosaic_crosses_tiles_and_feeds_clipmap():
    def ramp_source(tx, tz, lod):
        n = 32
        iz, ix = np.mgrid[0:n, 0:n].astype(np.float32)
        step = float(1 << lod)
        return (tx * n * step + ix * step) + 1000.0 * (
            tz * n * step + iz * step)

    ld = HeightTileLoader(ramp_source, tile_px=32, spacing=1.0)
    # window spanning a tile boundary: world height = x + 1000 z
    win = ld.window(28.0, 30.0, 1.0, 8)
    expect_x = 28.0 + np.arange(8, dtype=np.float32)
    expect_z = 30.0 + np.arange(8, dtype=np.float32)
    expect = expect_x[None, :] + 1000.0 * expect_z[:, None]
    assert np.allclose(win, expect)

    from forge3d_tpu.terrain.clipmap import Clipmap, ClipmapConfig

    cm = Clipmap(ld.window, ClipmapConfig(levels=2, size=17))
    cm.center_on(40.0, 40.0)
    s = float(np.asarray(cm.sample(40.0, 40.0)))
    assert abs(s - (40.0 + 1000.0 * 40.0)) < 2000.0  # coarse-level tolerance
    ld.close()


def test_failed_tiles_fill_and_stats(tmp_path):
    calls = {"n": 0}

    def flaky(tx, tz, lod):
        calls["n"] += 1
        raise IOError("missing tile")

    ld = HeightTileLoader(flaky, tile_px=32, fill_value=-1.0)
    t = ld.request((0, 0, 0)).result(timeout=10)
    assert (t == -1.0).all()
    ld.close()


def test_geotiff_tile_source_roundtrip(tmp_path):
    from forge3d_tpu.gis.geotiff import write_raster

    dem = np.arange(64 * 64, dtype=np.float32).reshape(64, 64)
    p = tmp_path / "dem.tif"
    write_raster(p, dem)
    src = geotiff_tile_source(p, tile_px=32)
    t00 = src(0, 0, 0)
    assert np.allclose(t00, dem[:32, :32])
    t11 = src(1, 1, 0)
    assert np.allclose(t11, dem[32:, 32:])
    # lod 1 = whole raster decimated to one 32px tile
    t_l1 = src(0, 0, 1)
    assert t_l1.shape == (32, 32)
    assert np.allclose(t_l1, dem[::2, ::2])
