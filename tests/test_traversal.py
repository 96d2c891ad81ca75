# Correctness of the stackless maxmip DDA against the exhaustive per-cell
# oracle, plus RNG bit-parity and pyramid structure checks.
import numpy as np
import pytest

from forge3d_tpu.ops.pyramid import build_pyramid, build_minmax_levels
from forge3d_tpu.ops.traversal import (
    scene_from_pyramid,
    trace,
    trace_bruteforce_numpy,
    normal_at,
    occluded,
)


def synth_dem(n=17, m=23, seed=3, amp=4.0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:n, 0:m].astype(np.float32)
    z = (
        amp * np.sin(x * 0.4) * np.cos(y * 0.3)
        + 0.5 * rng.standard_normal((n, m)).astype(np.float32)
    )
    return z.astype(np.float32)


class TestPyramid:
    def test_level0_bounds_cells(self):
        dem = synth_dem(9, 13)
        levels, dims, cw, ch = build_minmax_levels(dem)
        assert (cw, ch) == (12, 8)
        assert dims[0] == (16, 8)
        # every real cell's bounds contain its four corners
        for cz in range(ch):
            for cx in range(cw):
                corners = dem[cz:cz + 2, cx:cx + 2]
                lo, hi = levels[0][cz, cx]
                assert lo == corners.min() and hi == corners.max()
        # sentinel padding
        assert np.all(np.isinf(levels[0][:, cw:, 0]))

    def test_parent_covers_children(self):
        dem = synth_dem(33, 33)
        levels, dims, _, _ = build_minmax_levels(dem)
        for l in range(1, len(levels)):
            prev, cur = levels[l - 1], levels[l]
            ph, pw = prev.shape[:2]
            for y in range(cur.shape[0]):
                for x in range(cur.shape[1]):
                    ys = [min(2 * y, ph - 1), min(2 * y + 1, ph - 1)]
                    xs = [min(2 * x, pw - 1), min(2 * x + 1, pw - 1)]
                    block = prev[np.ix_(ys, xs)]
                    assert cur[y, x, 0] <= block[..., 0].min() + 1e-6
                    assert cur[y, x, 1] >= block[..., 1].max() - 1e-6

    def test_top_level_is_single_texel(self):
        dem = synth_dem(17, 9)
        pyr = build_pyramid(dem)
        assert pyr.level_w[-1] == 1 and pyr.level_h[-1] == 1
        assert pyr.mm_min[pyr.level_offset[-1]] <= dem.min() + 1e-6
        assert pyr.mm_max[pyr.level_offset[-1]] >= dem.max() - 1e-6

    def test_rejects_bad_input(self):
        from forge3d_tpu.errors import UploadError

        with pytest.raises(UploadError):
            build_minmax_levels(np.zeros((1, 5), np.float32))
        bad = np.zeros((4, 4), np.float32)
        bad[1, 1] = np.nan
        with pytest.raises(UploadError):
            build_minmax_levels(bad)


def random_rays(dem, spacing, n, seed, origin_xz=(0.0, 0.0)):
    rng = np.random.default_rng(seed)
    h, w = dem.shape
    ox, oz = origin_xz
    ext_x = (w - 1) * spacing[0]
    ext_z = (h - 1) * spacing[1]
    hmax = float(dem.max())
    # Mix of downward-looking rays from above and oblique rays from outside.
    origins = np.stack(
        [
            ox + rng.uniform(-0.3 * ext_x, 1.3 * ext_x, n),
            hmax + rng.uniform(1.0, 3.0 * max(1.0, hmax), n),
            oz + rng.uniform(-0.3 * ext_z, 1.3 * ext_z, n),
        ],
        axis=1,
    )
    targets = np.stack(
        [
            ox + rng.uniform(0, ext_x, n),
            rng.uniform(dem.min() - 1.0, hmax, n),
            oz + rng.uniform(0, ext_z, n),
        ],
        axis=1,
    )
    d = targets - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return origins.astype(np.float32), d.astype(np.float32)


class TestTraversal:
    @pytest.mark.parametrize("spacing,exag,origin_xz", [
        ((1.0, 1.0), 1.0, (0.0, 0.0)),
        ((2.5, 0.75), 3.0, (-10.0, 5.0)),
    ])
    def test_matches_bruteforce(self, spacing, exag, origin_xz):
        dem = synth_dem(17, 23)
        pyr = build_pyramid(dem)
        scene, static = scene_from_pyramid(pyr, origin_xz, spacing, exag)
        ro, rd = random_rays(dem * exag, spacing, 160, seed=11, origin_xz=origin_xz)

        res = trace(
            scene, static,
            (ro[:, 0], ro[:, 1], ro[:, 2]),
            (rd[:, 0], rd[:, 1], rd[:, 2]),
        )
        hit = np.asarray(res.hit)
        t = np.asarray(res.t)

        bf_hit, bf_t = trace_bruteforce_numpy(
            dem, origin_xz, spacing, exag, ro, rd
        )
        # hit/miss agreement (allow disagreement only on grazing tangencies)
        disagree = hit != bf_hit
        assert disagree.mean() < 0.02, f"{disagree.sum()} of {len(hit)} disagree"
        both = hit & bf_hit
        if both.any():
            err = np.abs(t[both] - bf_t[both]) / np.maximum(1.0, np.abs(bf_t[both]))
            assert err.max() < 1e-3, f"max rel t err {err.max():.2e}"

    def test_vertical_rays(self):
        dem = synth_dem(9, 9)
        pyr = build_pyramid(dem)
        scene, static = scene_from_pyramid(pyr)
        # straight down onto a known texel center
        n = 5
        xs = np.linspace(1.2, 6.7, n).astype(np.float32)
        ro = (xs, np.full(n, 50.0, np.float32), np.full(n, 3.4, np.float32))
        rd = (np.zeros(n, np.float32), -np.ones(n, np.float32), np.zeros(n, np.float32))
        res = trace(scene, static, ro, rd)
        assert np.asarray(res.hit).all()
        # hit height == bilinear surface height there
        t = np.asarray(res.t)
        for i, x in enumerate(xs):
            cx, cz = int(x), 3
            u, v = x - cx, 3.4 - cz
            h = (
                dem[cz, cx] * (1 - u) * (1 - v) + dem[cz, cx + 1] * u * (1 - v)
                + dem[cz + 1, cx] * (1 - u) * v + dem[cz + 1, cx + 1] * u * v
            )
            assert abs((50.0 - t[i]) - h) < 1e-3

    def test_miss_outside_domain(self):
        dem = synth_dem(9, 9)
        pyr = build_pyramid(dem)
        scene, static = scene_from_pyramid(pyr)
        ro = (np.float32([-5.0]), np.float32([10.0]), np.float32([-5.0]))
        rd = (np.float32([0.0]), np.float32([0.0]), np.float32([-1.0]))
        res = trace(scene, static, ro, rd)
        assert not np.asarray(res.hit).any()

    def test_normals_unit_and_upward(self):
        dem = synth_dem(17, 17, amp=2.0)
        pyr = build_pyramid(dem)
        scene, static = scene_from_pyramid(pyr)
        ro, rd = random_rays(dem, (1.0, 1.0), 64, seed=5)
        res = trace(scene, static, (ro[:, 0], ro[:, 1], ro[:, 2]), (rd[:, 0], rd[:, 1], rd[:, 2]))
        hit = np.asarray(res.hit)
        t = np.asarray(res.t)
        px = ro[:, 0] + t * rd[:, 0]
        py = ro[:, 1] + t * rd[:, 1]
        pz = ro[:, 2] + t * rd[:, 2]
        nx, ny, nz = normal_at(scene, static, (px, py, pz), res.cell_x, res.cell_z)
        n = np.stack([np.asarray(nx), np.asarray(ny), np.asarray(nz)], 1)[hit]
        assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
        assert (n[:, 1] > 0).all()

    def test_occlusion_consistency(self):
        dem = synth_dem(17, 17)
        pyr = build_pyramid(dem)
        scene, static = scene_from_pyramid(pyr)
        ro, rd = random_rays(dem, (1.0, 1.0), 64, seed=7)
        res = trace(scene, static, (ro[:, 0], ro[:, 1], ro[:, 2]), (rd[:, 0], rd[:, 1], rd[:, 2]))
        occ = occluded(scene, static, (ro[:, 0], ro[:, 1], ro[:, 2]), (rd[:, 0], rd[:, 1], rd[:, 2]))
        assert np.array_equal(np.asarray(occ), np.asarray(res.hit))

    def test_2d_ray_grids(self):
        """Traversal accepts (H, W)-shaped ray component arrays."""
        dem = synth_dem(9, 9)
        pyr = build_pyramid(dem)
        scene, static = scene_from_pyramid(pyr)
        H = W = 4
        xs = np.linspace(1.0, 7.0, W, dtype=np.float32)[None, :].repeat(H, 0)
        zs = np.linspace(1.0, 7.0, H, dtype=np.float32)[:, None].repeat(W, 1)
        ro = (xs, np.full((H, W), 30.0, np.float32), zs)
        rd = (np.zeros((H, W), np.float32), -np.ones((H, W), np.float32), np.zeros((H, W), np.float32))
        res = trace(scene, static, ro, rd)
        assert res.hit.shape == (H, W)
        assert np.asarray(res.hit).all()


class TestRng:
    def test_xorshift_bit_parity(self):
        """Vectorized xorshift32 must equal the scalar reference recurrence."""
        import jax.numpy as jnp
        from forge3d_tpu.ops.rng import seed_state, xorshift32

        def scalar_ref(state, steps):
            out = []
            for _ in range(steps):
                state ^= (state << 13) & 0xFFFFFFFF
                state ^= state >> 17
                state ^= (state << 5) & 0xFFFFFFFF
                state &= 0xFFFFFFFF
                # WGSL converts via f32(x) / 4294967296.0 in f32 precision
                out.append(float(np.float32(np.float32(state) / np.float32(4294967296.0))))
            return out

        seed_hi, seed_lo = 7, 7 ^ 0x85EBCA6B
        x = jnp.asarray([0, 3, 100], jnp.uint32)
        y = jnp.asarray([0, 9, 250], jnp.uint32)
        st = seed_state(seed_hi, seed_lo, x, y, frame_index=4)
        expect0 = [
            (seed_hi ^ (xi * 1664525) ^ (yi * 1013904223) ^ (4 * 92837111) ^ seed_lo) & 0xFFFFFFFF
            for xi, yi in [(0, 0), (3, 9), (100, 250)]
        ]
        assert list(np.asarray(st)) == expect0
        vals = []
        for _ in range(8):
            st, u = xorshift32(st)
            vals.append(np.asarray(u))
        for lane in range(3):
            ref = scalar_ref(expect0[lane], 8)
            got = [float(v[lane]) for v in vals]
            np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9)

    def test_tent_offset_range_and_symmetry(self):
        import jax.numpy as jnp
        from forge3d_tpu.ops.rng import tent_offset

        u = jnp.linspace(0.0, 0.999999, 1001)
        t = np.asarray(tent_offset(u))
        assert (t >= -1.0).all() and (t <= 1.0).all()
        assert abs(t.mean()) < 1e-3
        assert abs(float(tent_offset(jnp.float32(0.5)))) < 1e-6
