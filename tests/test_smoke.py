# Smoke volumetrics: domain, emitters, fluid step, raymarch render.
import numpy as np
import pytest

from forge3d_tpu.smoke import (
    AtmosphericSmokeCube,
    SmokeDomain,
    SmokeEmitter,
    SmokeRenderSettings,
    SmokeStepSettings,
    domain_from_density,
    native_smoke_available,
)


class TestDomain:
    def test_construction_and_reports(self):
        d = SmokeDomain(16, 24, 8)
        assert d.memory_report()["shape"] == (8, 24, 16)
        rep = d.physics_report()
        assert rep["total_density"] == 0.0 and rep["steps"] == 0

    def test_from_density_and_sampling(self):
        dens = np.zeros((8, 8, 8), np.float32)
        dens[4, 4, 4] = 2.0
        d = domain_from_density(dens, voxel_size=(2.0, 2.0, 2.0))
        v = d.sample_density((9.0, 9.0, 9.0))  # center of voxel (4,4,4)
        assert abs(v - 2.0) < 1e-5
        assert d.sample_density((1.0, 1.0, 1.0)) < 1e-6

    def test_shape_validation(self):
        from forge3d_tpu.errors import UploadError

        with pytest.raises(UploadError):
            SmokeDomain(1, 4, 4)
        d = SmokeDomain(4, 4, 4)
        with pytest.raises(UploadError):
            d.set_density(np.zeros((5, 4, 4), np.float32))
        with pytest.raises(UploadError):
            d.set_velocity(np.zeros((2, 4, 4, 4), np.float32))


class TestEmittersAndStep:
    def test_emitter_injects(self):
        d = SmokeDomain(16, 16, 16)
        e = SmokeEmitter(center=(8.0, 4.0, 8.0), radius=3.0, density_rate=5.0)
        d.add_emitter(e, dt=0.1)
        assert float(d.density.max()) > 0.0
        assert float(d.temperature.max()) > 0.0

    def test_emitter_time_window(self):
        d = SmokeDomain(8, 8, 8)
        e = SmokeEmitter(center=(4, 4, 4), radius=2.0, start_time=5.0)
        d.add_emitter(e, dt=0.1)  # domain time 0 < start 5 -> no injection
        assert float(d.density.max()) == 0.0

    def test_emitter_validation(self):
        with pytest.raises(ValueError):
            SmokeEmitter(radius=-1.0)
        with pytest.raises(ValueError):
            SmokeEmitter(start_time=2.0, end_time=1.0)

    def test_buoyancy_moves_smoke_up(self):
        d = SmokeDomain(12, 24, 12)
        e = SmokeEmitter(center=(6.0, 4.0, 6.0), radius=2.5, density_rate=20.0,
                         temperature_rate=20.0)
        s = SmokeStepSettings(dt=0.2, buoyancy=4.0, jacobi_iters=8,
                              dissipation=0.0)
        for _ in range(10):
            d.step(s, emitters=[e])
        dens = d.to_density_numpy()
        com_before = 4.0  # emitter height
        ys = np.arange(24)[None, :, None]
        com = float((dens * ys).sum() / max(dens.sum(), 1e-6))
        assert com > com_before + 1.0  # plume rose
        rep = d.physics_report()
        assert rep["steps"] == 10 and rep["time"] > 0

    def test_dissipation_decays(self):
        dens = np.ones((8, 8, 8), np.float32)
        d = domain_from_density(dens)
        total0 = float(d.density.sum())
        d.step(SmokeStepSettings(dt=0.1, dissipation=0.5, jacobi_iters=0,
                                 buoyancy=0.0))
        assert float(d.density.sum()) < total0 * 0.75

    def test_step_settings_validation(self):
        with pytest.raises(ValueError):
            SmokeStepSettings(dt=-1.0)


class TestRender:
    def test_render_shows_plume(self):
        d = SmokeDomain(16, 24, 16, voxel_size=(1.0, 1.0, 1.0))
        e = SmokeEmitter(center=(8.0, 6.0, 8.0), radius=4.0, density_rate=30.0,
                         soot_rate=3.0)
        d.add_emitter(e, dt=0.3)
        img = d.render_rgba(64, 48, SmokeRenderSettings(step_count=32))
        assert img.shape == (48, 64, 4)
        # smoke occludes/brightens vs pure background
        empty = SmokeDomain(16, 24, 16).render_rgba(
            64, 48, SmokeRenderSettings(step_count=32))
        assert (img != empty).any()
        # background visible at corners
        assert img[0, 0, 2] > img[0, 0, 0]  # bluish sky

    def test_atmospheric_cube(self):
        dens = np.random.default_rng(0).random((6, 6, 6)).astype(np.float32)
        cube = AtmosphericSmokeCube(density=dens, voxel_size=(100.0, 50.0, 100.0),
                                    crs="EPSG:4326", source="hrrr")
        dom = cube.to_domain()
        assert dom.voxel_size == (100.0, 50.0, 100.0)
        np.testing.assert_array_equal(dom.to_density_numpy(), dens)
        with pytest.raises(Exception):
            AtmosphericSmokeCube(density=np.zeros((4, 4), np.float32))

    def test_native_available(self):
        assert native_smoke_available() is True
