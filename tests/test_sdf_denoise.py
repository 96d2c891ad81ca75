# SDF primitives/CSG/raymarch and the à-trous denoiser.
import numpy as np
import pytest

from forge3d_tpu.ops.sdf import SdfSceneBuilder


class TestSdfPrimitives:
    def test_sphere_distance(self):
        b = SdfSceneBuilder()
        b.add_sphere((0, 0, 0), 1.0)
        s = b.build()
        d, m = s.evaluate(np.float32([2.0, 0.0, 0.5]), np.float32([0, 0, 0]),
                          np.float32([0, 0, 0]))
        np.testing.assert_allclose(np.asarray(d), [1.0, -1.0, -0.5], atol=1e-6)

    def test_box_distance(self):
        b = SdfSceneBuilder()
        b.add_box((0, 0, 0), (1, 2, 3))
        s = b.build()
        d, _ = s.evaluate(np.float32([3.0]), np.float32([0.0]), np.float32([0.0]))
        np.testing.assert_allclose(float(d[0]), 2.0, atol=1e-6)
        d, _ = s.evaluate(np.float32([0.0]), np.float32([0.0]), np.float32([0.0]))
        assert float(d[0]) == -1.0  # nearest face is x at distance 1

    def test_torus_capsule_cylinder_plane(self):
        b = SdfSceneBuilder()
        b.add_torus((0, 0, 0), 2.0, 0.5)
        s = b.build(0)
        d, _ = s.evaluate(np.float32([2.0]), np.float32([0.0]), np.float32([0.0]))
        np.testing.assert_allclose(float(d[0]), -0.5, atol=1e-6)

        b2 = SdfSceneBuilder()
        b2.add_capsule((0, 0, 0), (0, 2, 0), 0.5)
        s2 = b2.build()
        d, _ = s2.evaluate(np.float32([0.0]), np.float32([3.0]), np.float32([0.0]))
        np.testing.assert_allclose(float(d[0]), 0.5, atol=1e-6)

        b3 = SdfSceneBuilder()
        b3.add_cylinder((0, 0, 0), 1.0, 2.0)
        s3 = b3.build()
        d, _ = s3.evaluate(np.float32([0.0]), np.float32([5.0]), np.float32([0.0]))
        np.testing.assert_allclose(float(d[0]), 3.0, atol=1e-6)

        b4 = SdfSceneBuilder()
        b4.add_plane((0, 1, 0), 0.0)
        s4 = b4.build()
        d, _ = s4.evaluate(np.float32([10.0]), np.float32([2.5]), np.float32([-3.0]))
        np.testing.assert_allclose(float(d[0]), 2.5, atol=1e-6)


class TestCsg:
    def test_union_subtract_intersect(self):
        b = SdfSceneBuilder()
        s1 = b.add_sphere((-0.5, 0, 0), 1.0, material_id=1)
        s2 = b.add_sphere((0.5, 0, 0), 1.0, material_id=2)
        u = b.union(s1, s2)
        scene = b.build(u)
        d, m = scene.evaluate(np.float32([-1.4, 1.4]), np.float32([0, 0]),
                              np.float32([0, 0]))
        np.testing.assert_allclose(np.asarray(d), [-0.1, -0.1], atol=1e-5)
        assert list(np.asarray(m)) == [1, 2]

        bi = SdfSceneBuilder()
        a = bi.add_sphere((-0.5, 0, 0), 1.0)
        c = bi.add_sphere((0.5, 0, 0), 1.0)
        i = bi.intersect(a, c)
        si = bi.build(i)
        d, _ = si.evaluate(np.float32([0.0, -1.2]), np.float32([0, 0]), np.float32([0, 0]))
        assert float(d[0]) < 0  # lens interior
        assert float(d[1]) > 0  # only in left sphere -> outside intersection

        bs = SdfSceneBuilder()
        a = bs.add_sphere((0, 0, 0), 1.0)
        c = bs.add_sphere((0.9, 0, 0), 0.5)
        sub = bs.subtract(a, c)
        ss = bs.build(sub)
        d, _ = ss.evaluate(np.float32([0.9, -0.5]), np.float32([0, 0]), np.float32([0, 0]))
        assert float(d[0]) > -1e-6  # carved out
        assert float(d[1]) < 0     # remains solid

    def test_smooth_union_blends(self):
        b = SdfSceneBuilder()
        s1 = b.add_sphere((-0.6, 0, 0), 0.5)
        s2 = b.add_sphere((0.6, 0, 0), 0.5)
        sm = b.smooth_union(s1, s2, smoothing=0.5)
        scene = b.build(sm)
        d_smooth, _ = scene.evaluate(np.float32([0.0]), np.float32([0.0]), np.float32([0.0]))
        b2 = SdfSceneBuilder()
        s1 = b2.add_sphere((-0.6, 0, 0), 0.5)
        s2 = b2.add_sphere((0.6, 0, 0), 0.5)
        u = b2.union(s1, s2)
        hard = b2.build(u)
        d_hard, _ = hard.evaluate(np.float32([0.0]), np.float32([0.0]), np.float32([0.0]))
        assert float(d_smooth[0]) < float(d_hard[0])  # neck forms

    def test_invalid_refs(self):
        b = SdfSceneBuilder()
        s1 = b.add_sphere((0, 0, 0), 1.0)
        with pytest.raises(ValueError):
            b.union(s1, 99)
        with pytest.raises(ValueError):
            SdfSceneBuilder().build()


class TestRaymarch:
    def test_sphere_hit_distance(self):
        b = SdfSceneBuilder()
        b.add_sphere((0, 0, 0), 1.0, material_id=3)
        s = b.build()
        hit, t, m = s.raymarch(
            (np.float32([0.0]), np.float32([0.0]), np.float32([5.0])),
            (np.float32([0.0]), np.float32([0.0]), np.float32([-1.0])),
        )
        assert bool(hit[0])
        np.testing.assert_allclose(float(t[0]), 4.0, atol=5e-3)
        assert int(m[0]) == 3

    def test_miss(self):
        b = SdfSceneBuilder()
        b.add_sphere((0, 0, 0), 1.0)
        s = b.build()
        hit, t, m = s.raymarch(
            (np.float32([5.0]), np.float32([5.0]), np.float32([5.0])),
            (np.float32([0.0]), np.float32([1.0]), np.float32([0.0])),
            tmax=50.0,
        )
        assert not bool(hit[0])
        assert int(m[0]) == -1

    def test_normals(self):
        b = SdfSceneBuilder()
        b.add_sphere((0, 0, 0), 1.0)
        s = b.build()
        nx, ny, nz = s.normal(np.float32([1.0]), np.float32([0.0]), np.float32([0.0]))
        np.testing.assert_allclose(
            [float(nx[0]), float(ny[0]), float(nz[0])], [1, 0, 0], atol=1e-3
        )

    def test_image_render(self):
        """Mini SDF render: CSG bowl via smooth subtraction."""
        b = SdfSceneBuilder()
        s1 = b.add_sphere((0, 0, 0), 1.0, material_id=1)
        s2 = b.add_sphere((0, 0.8, 0), 0.8, material_id=2)
        root = b.smooth_subtract(s1, s2, smoothing=0.2)
        scene = b.build(root)
        H = W = 32
        xs = np.linspace(-1.5, 1.5, W, dtype=np.float32)
        ys = np.linspace(1.5, -1.5, H, dtype=np.float32)
        gx, gy = np.meshgrid(xs, ys)
        ro = (gx, gy, np.full((H, W), 4.0, np.float32))
        rd = (np.zeros((H, W), np.float32), np.zeros((H, W), np.float32),
              np.full((H, W), -1.0, np.float32))
        hit, t, m = scene.raymarch(ro, rd)
        hit = np.asarray(hit)
        assert 0.1 < hit.mean() < 0.9


class TestDenoise:
    def test_reduces_noise_preserves_edges(self):
        from forge3d_tpu.ops.denoise import atrous_denoise

        rng = np.random.default_rng(0)
        H = W = 48
        clean = np.zeros((H, W, 3), np.float32)
        clean[:, W // 2:] = 1.0  # hard vertical edge
        albedo = clean.copy()
        noisy = clean + rng.normal(0, 0.15, clean.shape).astype(np.float32)
        out = np.asarray(atrous_denoise(noisy, albedo=albedo, iterations=3))
        noise_before = np.abs(noisy - clean).mean()
        noise_after = np.abs(out - clean).mean()
        assert noise_after < noise_before * 0.6
        # edge preserved: the two halves remain distinct
        assert out[:, : W // 2 - 2].mean() < 0.25
        assert out[:, W // 2 + 2:].mean() > 0.75

    def test_shape_validation(self):
        from forge3d_tpu.ops.denoise import atrous_denoise

        with pytest.raises(ValueError):
            atrous_denoise(np.zeros((4, 4), np.float32))

    def test_depth_guide_accepts_nan(self):
        from forge3d_tpu.ops.denoise import atrous_denoise

        img = np.random.default_rng(1).random((16, 16, 3)).astype(np.float32)
        depth = np.full((16, 16), np.nan, np.float32)
        depth[4:12, 4:12] = 1.0
        out = np.asarray(atrous_denoise(img, depth=depth, iterations=2))
        assert np.isfinite(out).all()

    def test_oidn_unavailable(self):
        from forge3d_tpu.ops.denoise import oidn_denoise

        with pytest.raises(NotImplementedError):
            oidn_denoise(np.zeros((4, 4, 3), np.float32))
