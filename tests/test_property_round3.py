# Round-3 property/fuzz tests: geometric and codec invariants for the
# screen compositor, building mesh, sweep packing, and postfx.
import numpy as np
import pytest

SEEDS = list(range(12))


# -- polygon coverage ------------------------------------------------------

@pytest.mark.parametrize("seed", SEEDS)
def test_polygon_coverage_bounds_and_determinism(seed):
    from forge3d_tpu.screen_compose import polygon_coverage

    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 9))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = rng.uniform(5, 28, n)
    cx, cy = rng.uniform(16, 48, 2)
    ring = [(cx + rr * np.cos(a), cy + rr * np.sin(a))
            for a, rr in zip(ang, r)]
    cov = polygon_coverage([ring], 64, 64)
    cov2 = polygon_coverage([ring], 64, 64)
    assert np.array_equal(cov, cov2)
    assert cov.min() >= 0.0 and cov.max() <= 1.0
    # coverage approximates the shoelace area (convex-ish star polygon)
    area = 0.5 * abs(sum(
        ring[i][0] * ring[(i + 1) % n][1] - ring[(i + 1) % n][0] * ring[i][1]
        for i in range(n)))
    assert abs(cov.sum() - area) / max(area, 1.0) < 0.08


@pytest.mark.parametrize("seed", SEEDS[:6])
def test_polygon_hole_subtracts(seed):
    from forge3d_tpu.screen_compose import polygon_coverage

    rng = np.random.default_rng(seed)
    x0, y0 = rng.uniform(5, 15, 2)
    outer = [(x0, y0), (x0 + 40, y0), (x0 + 40, y0 + 40), (x0, y0 + 40)]
    hx, hy = x0 + 10, y0 + 10
    hole = [(hx, hy), (hx + 12, hy), (hx + 12, hy + 12), (hx, hy + 12)]
    solid = polygon_coverage([outer], 64, 64).sum()
    holed = polygon_coverage([outer, hole], 64, 64).sum()
    assert abs((solid - holed) - 144.0) < 4.0


# -- building mesh ---------------------------------------------------------

@pytest.mark.parametrize("seed", SEEDS)
def test_ccw_ring_orientation(seed):
    from forge3d_tpu.mapscene import MapScene

    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 8))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    pts = np.stack([np.cos(ang), np.sin(ang)], -1) * rng.uniform(0.2, 1.0)
    if seed % 2:
        pts = pts[::-1]         # feed CW half the time
    ring = MapScene._ccw_ring(pts)
    area = 0.0
    for i in range(len(ring)):
        j = (i + 1) % len(ring)
        area += ring[i][0] * ring[j][1] - ring[j][0] * ring[i][1]
    assert area > 0.0


@pytest.mark.parametrize("roof", ["gabled", "hipped", "pyramidal"])
def test_roof_covers_footprint_bbox(roof):
    from forge3d_tpu.mapscene import MapScene

    fp = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 1.0], [0.0, 1.0]])
    tris = MapScene._roof_triangles(fp, 0.6, roof)
    # projected (x, z) roof area equals the bbox area exactly
    area = 0.0
    for a, b, c in tris:
        ax, az = a[0], a[2]
        bx, bz = b[0], b[2]
        cx, cz = c[0], c[2]
        area += 0.5 * abs((bx - ax) * (cz - az) - (cx - ax) * (bz - az))
    assert abs(area - 2.0) < 1e-6
    # every roof vertex sits at or above the wall top
    for tri in tris:
        for v in tri:
            assert v[1] >= 0.6 - 1e-9


# -- sweep packed-buffer codecs -------------------------------------------

@pytest.mark.parametrize("seed", SEEDS)
def test_rgbe_roundtrip_error_bound(seed):
    rng = np.random.default_rng(seed)
    hdr = rng.uniform(0.0, 8.0, (16, 16, 3)).astype(np.float32)
    # encode exactly as resolve_impl does
    m = hdr.max(-1)
    mant_, ex = np.frexp(np.maximum(m, 1e-30))
    scale = np.exp2(8.0 - ex.astype(np.float32))
    mant = np.clip(np.floor(hdr * scale[..., None]), 0, 255).astype(np.uint8)
    e_u8 = np.clip(ex + 128, 0, 255).astype(np.uint8)
    # decode exactly as _unpack_render does
    hscale = np.ldexp(1.0, e_u8.astype(np.int32) - 136).astype(np.float32)
    dec = (mant.astype(np.float32) + 0.5) * hscale[..., None]
    live = m > 1e-30
    # RGBE shares one exponent across channels: error bound is relative
    # to the per-pixel MAX channel (1/256 quantization + half-step bias)
    rel = (np.abs(dec - hdr).max(-1) / np.maximum(m, 1e-3))[live]
    assert rel.max() < 0.01


@pytest.mark.parametrize("seed", SEEDS)
def test_oct_normal_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n = rng.normal(size=(64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    # encode (resolve_impl)
    s1 = np.abs(n).sum(-1)
    px = n[:, 0] / s1
    pz = n[:, 2] / s1
    neg = n[:, 1] < 0
    fx = np.where(neg, (1 - np.abs(pz)) * np.sign(px), px)
    fz = np.where(neg, (1 - np.abs(px)) * np.sign(pz), pz)
    u8 = np.stack([np.clip((fx * 0.5 + 0.5) * 255 + 0.5, 0, 255),
                   np.clip((fz * 0.5 + 0.5) * 255 + 0.5, 0, 255)],
                  -1).astype(np.uint8)
    # decode (_unpack_render)
    f = u8.astype(np.float32) / 255 * 2 - 1
    ny = 1 - np.abs(f[:, 0]) - np.abs(f[:, 1])
    t = np.clip(-ny, 0, 1)
    nx = f[:, 0] + np.where(f[:, 0] >= 0, -t, t)
    nz = f[:, 1] + np.where(f[:, 1] >= 0, -t, t)
    dec = np.stack([nx, ny, nz], -1)
    dec /= np.linalg.norm(dec, axis=-1, keepdims=True)
    ang = np.degrees(np.arccos(np.clip((dec * n).sum(-1), -1, 1)))
    assert ang.max() < 1.0


def test_lazy_unpack_serves_all_keys():
    from forge3d_tpu.pt.terrain_ref import TerrainRefDesc
    from forge3d_tpu.pt.terrain_sweep import _unpack_render

    W = H = 8
    desc = TerrainRefDesc(heights=np.zeros((4, 4), np.float32),
                          width=W, height=H)
    buf = np.zeros((W * H * 9,), np.uint8)
    out = _unpack_render(desc, buf, 4)
    assert out["rgba"].shape == (H, W, 4)
    assert out["hdr"].shape == (H, W, 3)
    assert out["depth"].shape == (H, W)
    assert out["normal"].shape == (H, W, 3)
    assert out["albedo"].shape == (H, W, 3)
    assert out["frames"] == 4
    assert "rgba" in out and "nonexistent" not in out
    assert set(("rgba", "hdr", "depth", "normal", "albedo")) <= set(out.keys())
    assert out.get("nonexistent") is None


# -- screen-space postfx ---------------------------------------------------

@pytest.mark.parametrize("seed", SEEDS[:6])
def test_water_mask_monotone_in_level(seed):
    from forge3d_tpu.mapscene import MapScene, SceneRecipe, TerrainSource
    from forge3d_tpu.mapscene import OutputSpec, MapFurniture

    rng = np.random.default_rng(seed)
    dem = rng.uniform(0, 1, (8, 8)).astype(np.float32)
    masks = []
    for wl in (0.2, 0.5, 0.8):
        rec = SceneRecipe(terrain=TerrainSource(dem=dem, spacing=(1, 1),
                                                z_scale=1.0),
                          output=OutputSpec(size_px=(64, 48)),
                          furniture=MapFurniture(),
                          water_level=wl, camera_mode="screen")
        rgba = MapScene(rec).render().rgba
        blue = (rgba[..., 2].astype(int) > rgba[..., 0].astype(int) + 40)
        masks.append(blue)
    assert masks[0].sum() <= masks[1].sum() <= masks[2].sum()
