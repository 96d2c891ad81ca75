# Tests: terrain scatter, stats endpoints, clipmap LOD, virtual texture
# store.

import numpy as np
import pytest

from forge3d_tpu.terrain.clipmap import Clipmap, ClipmapConfig, geomorph_weight
from forge3d_tpu.terrain.scatter import (ScatterRule, scatter_instances,
                                         scatter_memory_report, scatter_stats)
from forge3d_tpu.terrain.stats import (record_frame_stats, reset_stats,
                                       terrain_culling_stats,
                                       terrain_seam_stats,
                                       terrain_visibility_stats,
                                       terrain_vt_stats)
from forge3d_tpu.terrain.vt import (PAGE_SIZE, VTStore, VtError,
                                    morton_decode, morton_encode, vt_pack)


# ---------------------------------------------------------------------------
# scatter


def _dem(n=65):
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    return 10.0 * np.sin(x * 0.1) * np.cos(y * 0.1)


def test_scatter_deterministic_and_rules():
    dem = _dem()
    rules = [ScatterRule(kind="tree", density=0.3, max_slope_deg=25,
                         min_height=-5, max_height=5, seed=1),
             ScatterRule(kind="rock", density=0.05, max_slope_deg=80, seed=2)]
    b1 = scatter_instances(dem, rules)
    b2 = scatter_instances(dem, rules)
    assert b1[0].count == b2[0].count
    np.testing.assert_array_equal(b1[0].positions, b2[0].positions)
    assert b1[0].count > 50
    # height rule respected
    assert b1[0].positions[:, 1].max() <= 5 + 1e-5
    assert b1[0].positions[:, 1].min() >= -5 - 1e-5
    st = scatter_stats(b1)
    assert st["total_instances"] == b1[0].count + b1[1].count
    mem = scatter_memory_report(b1)
    assert mem["total_bytes"] > 0


def test_scatter_mask():
    dem = np.zeros((33, 33), np.float32)
    mask = np.zeros((32, 32))
    mask[:16] = 1.0
    b = scatter_instances(dem, [ScatterRule(density=0.5, mask=mask, seed=3)])
    assert b[0].count > 50
    assert b[0].positions[:, 2].max() < 17  # only the masked half


# ---------------------------------------------------------------------------
# stats


def test_stats_endpoints():
    reset_stats()
    hit = np.zeros((10, 10), bool)
    hit[:5] = True
    t = np.full((10, 10), 7.0)
    record_frame_stats(hit, t, blocks_total=100, blocks_tested=30)
    c = terrain_culling_stats()
    assert c["rays"] == 100 and c["hits"] == 50
    assert c["culled_fraction"] == pytest.approx(0.7)
    v = terrain_visibility_stats()
    assert v["visible_fraction"] == pytest.approx(0.5)
    assert v["mean_depth"] == pytest.approx(7.0)
    vt = terrain_vt_stats()
    assert vt["requests"] == 0
    reset_stats()


def test_seam_stats():
    a = np.ones((8, 8), np.float32)
    b = np.ones((8, 8), np.float32)
    b[:, 0] = 1.0            # matches a's right edge
    rep = terrain_seam_stats({(0, 0): a, (1, 0): b})
    assert rep["cracks"] == 0
    b2 = b.copy()
    b2[:, 0] = 2.0           # crack
    rep2 = terrain_seam_stats({(0, 0): a, (1, 0): b2})
    assert rep2["cracks"] == 8
    assert rep2["max_seam_error"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# clipmap


def _source(x0, z0, step, n):
    xs = x0 + np.arange(n) * step
    zs = z0 + np.arange(n) * step
    X, Z = np.meshgrid(xs, zs)
    return (5.0 * np.sin(X * 0.01) * np.cos(Z * 0.013)).astype(np.float32)


def test_clipmap_levels_and_sampling():
    cm = Clipmap(_source, ClipmapConfig(levels=4, size=65, base_spacing=2.0))
    cm.center_on(1000.0, 500.0)
    assert len(cm.levels) == 4
    # finest near center, coarser further out
    assert cm.active_level_at(1000.0, 500.0) == 0
    far = cm.extent(0) * 1.5
    assert cm.active_level_at(1000.0 + far, 500.0) >= 1
    # samples agree with the source within interpolation error
    xs = np.array([1000.0, 1010.0, 1000.0 + far])
    zs = np.array([500.0, 505.0, 500.0])
    got = cm.sample(xs, zs)
    want = 5.0 * np.sin(xs * 0.01) * np.cos(zs * 0.013)
    np.testing.assert_allclose(got, want, atol=0.05)


def test_clipmap_incremental_streaming():
    cm = Clipmap(_source, ClipmapConfig(levels=3, size=65, base_spacing=1.0))
    s0 = cm.center_on(0.0, 0.0)
    assert s0["texels_streamed"] == 3 * 65 * 65
    # small move: only strips stream, not full levels
    s1 = cm.center_on(3.0, 0.0)
    assert 0 < s1["texels_streamed"] < 65 * 65
    # values remain correct after the toroidal update
    got = cm.sample(np.array([10.0]), np.array([4.0]))[0]
    want = 5.0 * np.sin(10.0 * 0.01) * np.cos(4.0 * 0.013)
    assert got == pytest.approx(want, abs=0.05)


def test_geomorph_weight():
    w = geomorph_weight(np.array([0.0, 90.0, 100.0]), 100.0)
    assert w[0] == 0.0 and w[2] == 1.0 and 0 < w[1] < 1


# ---------------------------------------------------------------------------
# virtual texture


def test_morton_roundtrip():
    for x, y in [(0, 0), (5, 9), (1023, 7), (12345, 54321)]:
        assert morton_decode(morton_encode(x, y)) == (x, y)
    # locality: adjacent pages have nearby codes
    assert abs(morton_encode(4, 4) - morton_encode(5, 4)) < 64


def test_vt_store_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pages = {}
    for px in range(3):
        for py in range(2):
            base = np.full((PAGE_SIZE, PAGE_SIZE, 4),
                           ((px * 60) % 255, (py * 90) % 255, 120, 255),
                           np.uint8)
            pages[("albedo", 0, px, py)] = base
    pages[("normal", 0, 0, 0)] = np.full((PAGE_SIZE, PAGE_SIZE, 2), 128,
                                         np.uint8)
    pages[("height", 0, 0, 0)] = rng.normal(
        100, 10, (PAGE_SIZE, PAGE_SIZE)).astype(np.float32)
    p = tmp_path / "store.f3dvt"
    manifest = vt_pack(p, pages)
    assert len(manifest["entries"]) == len(pages)

    store = VTStore(p, budget_bytes=4 * 1024 * 1024)
    page = store.request("albedo", 0, 1, 1)
    assert page.shape == (PAGE_SIZE, PAGE_SIZE, 4)
    assert abs(int(page[0, 0, 0]) - 60) < 16       # BC7 lossy but close
    h = store.request("height", 0, 0, 0)
    np.testing.assert_allclose(h, pages[("height", 0, 0, 0)], atol=1e-6)
    # cache hit on repeat
    before = store.stats()["resident_pages"]
    store.request("albedo", 0, 1, 1)
    assert store.stats()["resident_pages"] == before
    with pytest.raises(VtError):
        store.request("albedo", 3, 9, 9)
    store.close()


def test_vt_budget_eviction(tmp_path):
    pages = {("albedo", 0, i, 0):
             np.full((PAGE_SIZE, PAGE_SIZE, 4), i * 20, np.uint8)
             for i in range(8)}
    p = tmp_path / "s.f3dvt"
    vt_pack(p, pages)
    page_bytes = PAGE_SIZE * PAGE_SIZE * 4
    store = VTStore(p, budget_bytes=3 * page_bytes + 100)
    for i in range(8):
        store.request("albedo", 0, i, 0)
    st = store.stats()
    assert st["resident_pages"] <= 3
    assert st["evictions"] >= 5
    assert st["resident_bytes"] <= store.budget_bytes
    store.close()


def test_vt_corruption_fails_closed(tmp_path):
    pages = {("albedo", 0, 0, 0):
             np.full((PAGE_SIZE, PAGE_SIZE, 4), 99, np.uint8)}
    p = tmp_path / "s.f3dvt"
    vt_pack(p, pages)
    raw = bytearray(p.read_bytes())
    raw[-10] ^= 0xFF
    p.write_bytes(bytes(raw))
    store = VTStore(p)
    with pytest.raises(VtError):
        store.request("albedo", 0, 0, 0)
