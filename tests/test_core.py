# Device layer, memory ledger, degradation sink, PNG codec, colormaps,
# camera math.
import numpy as np
import pytest

import forge3d_tpu as f3d


class TestDevice:
    def test_probe_ok(self):
        info = f3d.device_probe()
        assert info["status"] == "ok"
        assert info["device_count"] >= 1

    def test_session(self):
        with f3d.Session(window=False) as s:
            assert s.device is not None
            assert s.info()["engine"] == "forge3d_tpu"

    def test_enumerate_adapters(self):
        ads = f3d.enumerate_adapters()
        assert len(ads) >= 1 and "platform" in ads[0]

    def test_capabilities(self):
        caps = f3d.capabilities()
        assert caps["features"]["bfloat16"] is True

    def test_poison(self):
        import forge3d_tpu.device as dev

        f3d.poison_context("test poison")
        try:
            with pytest.raises(f3d.DeviceError):
                dev.try_ctx()
        finally:
            f3d.unpoison_context()

    def test_report_device_string(self):
        assert "forge3d_tpu" in f3d.report_device()


class TestMem:
    def test_budget_enforced(self):
        from forge3d_tpu.mem import global_tracker

        tr = global_tracker()
        tr.set_budget(1000)
        tr.track("a", 800)
        with pytest.raises(f3d.MemoryBudgetExceeded):
            tr.track("b", 300)

    def test_warn_policy_records_degradation(self):
        from forge3d_tpu.mem import global_tracker

        tr = global_tracker()
        tr.set_budget(100)
        tr.set_policy("warn")
        tr.track("big", 500)
        degs = f3d.native_degradations()
        assert any(d["category"] == "memory_budget" for d in degs)

    def test_metrics_shape(self):
        m = f3d.memory_metrics()
        for k in ("tracked_bytes", "peak_tracked_bytes", "budget_bytes",
                  "policy", "within_budget"):
            assert k in m

    def test_tracked_scope_frees(self):
        from forge3d_tpu.mem import global_tracker, tracked

        tr = global_tracker()
        before = tr.metrics()["tracked_bytes"]
        with tracked("tmp", 1234):
            assert tr.metrics()["tracked_bytes"] == before + 1234
        assert tr.metrics()["tracked_bytes"] == before


class TestPng:
    @pytest.mark.parametrize("shape,dtype", [
        ((7, 5), np.uint8),
        ((7, 5, 3), np.uint8),
        ((4, 9, 4), np.uint8),
        ((6, 6, 3), np.uint16),
        ((5, 3, 1), np.uint8),
    ])
    def test_roundtrip(self, shape, dtype, tmp_path):
        rng = np.random.default_rng(0)
        hi = 255 if dtype == np.uint8 else 65535
        img = rng.integers(0, hi + 1, size=shape, dtype=dtype)
        p = tmp_path / "x.png"
        f3d.numpy_to_png(p, img)
        back = f3d.png_to_numpy(p)
        want = img if img.ndim == 3 else img[:, :, None]
        np.testing.assert_array_equal(back, want)

    def test_deterministic_bytes(self):
        from forge3d_tpu.io.png import encode_png

        img = (np.arange(7 * 5 * 3, dtype=np.uint8).reshape(7, 5, 3) * 3) % 251
        assert encode_png(img) == encode_png(img.copy())

    def test_pil_can_read_ours(self, tmp_path):
        PIL = pytest.importorskip("PIL.Image")
        img = np.random.default_rng(1).integers(0, 256, (16, 16, 4), dtype=np.uint8)
        p = tmp_path / "x.png"
        f3d.numpy_to_png(p, img)
        got = np.asarray(PIL.open(p))
        np.testing.assert_array_equal(got, img)

    def test_we_can_read_pil(self, tmp_path):
        PIL = pytest.importorskip("PIL.Image")
        img = np.random.default_rng(2).integers(0, 256, (16, 16, 3), dtype=np.uint8)
        p = tmp_path / "y.png"
        PIL.fromarray(img).save(p)
        got = f3d.png_to_numpy(p)
        np.testing.assert_array_equal(got, img)

    def test_float_quantization(self, tmp_path):
        img = np.array([[[0.0, 0.5, 1.0]]], np.float32)
        p = tmp_path / "f.png"
        f3d.numpy_to_png(p, img)
        got = f3d.png_to_numpy(p)
        np.testing.assert_array_equal(got[0, 0], [0, 128, 255])


class TestColormaps:
    def test_builtin_available(self):
        from forge3d_tpu import colormaps

        for name in ("viridis", "magma", "terrain"):
            assert name in colormaps.available()
            lut = colormaps.get_lut(name)
            assert lut.shape == (256, 3)

    def test_apply_range(self):
        from forge3d_tpu import colormaps

        v = np.linspace(-3, 7, 64).reshape(8, 8)
        rgb = colormaps.apply("viridis", v)
        assert rgb.shape == (8, 8, 3)
        assert rgb.min() >= 0 and rgb.max() <= 1

    def test_device_sample_matches_host(self):
        import jax.numpy as jnp
        from forge3d_tpu import colormaps

        lut = colormaps.get_lut("magma")
        t = np.linspace(0, 1, 97).astype(np.float32)
        host = colormaps.apply("magma", t, vmin=0.0, vmax=1.0)
        r, g, b = colormaps.sample_lut_jnp(jnp.asarray(lut), jnp.asarray(t))
        dev = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], -1)
        np.testing.assert_allclose(dev, host, atol=2e-6)

    def test_register_custom(self):
        from forge3d_tpu import colormaps

        colormaps.register("mycmap", np.array([[0, 0, 0], [1, 1, 1]], np.float32))
        assert "mycmap" in colormaps.available()
        rgb = colormaps.apply("mycmap", np.array([0.0, 1.0]))
        np.testing.assert_allclose(rgb, [[0, 0, 0], [1, 1, 1]])


class TestCamera:
    def test_lookat_basis_orthonormal(self):
        from forge3d_tpu.camera import camera_basis

        r, u, f = camera_basis([3, 4, 5], [0, 0, 0], [0, 1, 0])
        for v in (r, u, f):
            assert abs(np.linalg.norm(v) - 1) < 1e-6
        assert abs(np.dot(r, u)) < 1e-6
        assert abs(np.dot(r, f)) < 1e-6
        np.testing.assert_allclose(np.cross(f, u), r, atol=1e-6)

    def test_view_matrix_maps_target_to_minus_z(self):
        m = f3d.camera_look_at([0, 0, 10], [0, 0, 0], [0, 1, 0])
        p = m @ np.array([0, 0, 0, 1.0])
        assert p[2] < 0 and abs(p[0]) < 1e-6 and abs(p[1]) < 1e-6

    def test_perspective_depth_range(self):
        m = f3d.camera_perspective(45.0, 1.0, 0.1, 100.0)
        near = m @ np.array([0, 0, -0.1, 1.0])
        far = m @ np.array([0, 0, -100.0, 1.0])
        assert abs(near[2] / near[3]) < 1e-5
        assert abs(far[2] / far[3] - 1.0) < 1e-5

    def test_orbit_origin(self):
        o = f3d.orbit_camera_origin([1, 2, 3], radius=10, phi_deg=0, theta_deg=0)
        np.testing.assert_allclose(o, [11, 2, 3], atol=1e-5)
        o2 = f3d.orbit_camera_origin([0, 0, 0], radius=5, phi_deg=90, theta_deg=90)
        np.testing.assert_allclose(o2, [0, 5, 0], atol=1e-5)

    def test_dof_params(self):
        d = f3d.camera_dof_params(10.0, 2.8)
        assert d["aperture_radius"] > 0
        with pytest.raises(ValueError):
            f3d.camera_dof_params(-1, 2.8)
