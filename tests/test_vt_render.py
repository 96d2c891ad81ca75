# Virtual texturing in the render path (VERDICT round-1 item 6): the
# terrain renderer resolves albedo through a VT page atlas with analytic
# residency under a hard budget, counting fallback texels — a scaled
# TESSELLA evidence test (reference thresholds:
# scripts/tessella_evidence_thresholds.py:10-17 — logical texels >> budget,
# 0 fallback texels within <= 8 settling frames, peak resident < budget).

import numpy as np
import pytest

from forge3d_tpu.terrain.params import make_terrain_params
from forge3d_tpu.terrain.renderer import MaterialSet, TerrainRenderer
from forge3d_tpu.terrain.vt import PAGE_SIZE, VTStore, vt_pack


def _checker_page(level, x, y):
    """Distinct per-page procedural albedo so VT sampling is visible."""
    i = np.arange(PAGE_SIZE)
    xx, yy = np.meshgrid(i, i)
    r = ((xx // 16 + yy // 16) % 2) * 120 + 60 + 25 * level
    g = np.full_like(r, 40 + 37 * ((x * 5 + y * 3) % 5))
    b = np.full_like(r, 200 - 30 * level)
    a = np.full_like(r, 255)
    return np.stack([r, g, b, a], -1).astype(np.uint8)


@pytest.fixture(scope="module")
def vt_store_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("vt") / "terrain.f3dvt"
    pages = {}
    # 3 mip levels: 8x8, 4x4, 2x2 pages of 128^2 texels
    for level, n in ((0, 8), (1, 4), (2, 2)):
        for y in range(n):
            for x in range(n):
                pages[("albedo", level, x, y)] = _checker_page(level, x, y)
    vt_pack(path, pages)
    return path


def test_vt_render_resolves_pages(vt_store_path):
    n = 65
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = 3.0 * np.sin(xx * 0.2) * np.cos(yy * 0.17)
    budget = 24 * PAGE_SIZE * PAGE_SIZE * 3 * 4  # 24 resident pages
    ms = MaterialSet(vt_store=VTStore(vt_store_path, budget_bytes=budget),
                     vt_budget_bytes=budget)
    p = make_terrain_params(size_px=(96, 64))
    p.light.intensity = 1.2  # keep tonemap out of saturation
    r = TerrainRenderer()

    frames = []
    fallbacks = []
    for _ in range(3):
        frames.append(r.render_terrain_pbr_pom(material_set=ms, params=p,
                                               heightmap=dem))
        st = r.last_vt_stats
        fallbacks.append(st["fallback_texels_frame"])
    # TESSELLA-scaled gates
    assert fallbacks[-1] == 0.0, f"fallback texels: {fallbacks}"
    assert st["resident_bytes"] <= budget
    logical = st["logical_texels"]
    resident_texels = budget // (3 * 4)
    assert logical / resident_texels >= 3.0, (logical, resident_texels)

    # the VT albedo must actually drive pixels: compare against the
    # colormap-only render (checker contrast survives the tonemap)
    base = TerrainRenderer().render_terrain_pbr_pom(params=p, heightmap=dem)
    d = np.abs(frames[-1].rgba[..., :3].astype(int)
               - base.rgba[..., :3].astype(int))
    assert (d.sum(-1) > 20).mean() > 0.05, "VT albedo not visible"
    # and the VT image itself carries the checker texture (structured
    # variation within terrain pixels)
    _, aov = r.render_with_aov(material_set=ms, params=p, heightmap=dem)
    alb_r = aov["albedo"][..., 0]
    hitpix = alb_r > 0
    assert np.unique(np.round(alb_r[hitpix], 2)).size >= 2

    # determinism: repeat renders are identical
    assert np.array_equal(frames[1].rgba, frames[2].rgba)


def test_vt_budget_pressure_counts_fallback(vt_store_path):
    """A budget too small for the working set must produce fallback texels
    (graceful degradation), never crash."""
    n = 65
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = 3.0 * np.sin(xx * 0.2) * np.cos(yy * 0.17)
    budget = 2 * PAGE_SIZE * PAGE_SIZE * 3 * 4  # 2 pages only
    ms = MaterialSet(vt_store=VTStore(vt_store_path, budget_bytes=budget),
                     vt_budget_bytes=budget)
    p = make_terrain_params(size_px=(96, 64))
    r = TerrainRenderer()
    frame = r.render_terrain_pbr_pom(material_set=ms, params=p, heightmap=dem)
    assert np.isfinite(frame.rgba.astype(float)).all()
    assert r.last_vt_stats["fallback_texels_frame"] > 0
    assert r.last_vt_stats["resident_bytes"] <= budget
