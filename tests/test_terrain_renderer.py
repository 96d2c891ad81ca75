# TerrainRenderer (raster-equivalent), TerrainRenderParams, Scene.
import numpy as np
import pytest

import forge3d_tpu as f3d
from forge3d_tpu.terrain import (
    IBL,
    MaterialSet,
    TerrainRenderer,
    TerrainRenderParams,
    make_terrain_params,
)


def dem(n=65, amp=6.0):
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    return (amp * np.sin(x * 0.15) * np.cos(y * 0.12)).astype(np.float32)


def params(**kw):
    kw.setdefault("size_px", (96, 64))
    kw.setdefault("cam_radius", 110.0)
    kw.setdefault("cam_target", (32.0, 0.0, 32.0))
    return make_terrain_params(**kw)


@pytest.fixture(scope="module")
def renderer():
    return TerrainRenderer()


class TestParams:
    def test_defaults_valid(self):
        p = make_terrain_params()
        p.validate()
        assert p.light.azimuth_deg == 315.0

    def test_nested_dict_overrides(self):
        p = make_terrain_params(light=dict(azimuth_deg=90.0),
                                fog=dict(enabled=True, density=0.5))
        assert p.light.azimuth_deg == 90.0
        assert p.fog.enabled and p.fog.density == 0.5

    @pytest.mark.parametrize("bad", [
        dict(size_px=(0, 10)),
        dict(msaa_samples=3),
        dict(z_scale=-1),
        dict(albedo_mode="nope"),
        dict(sampling=dict(aa_samples=0)),
        dict(clip=(1.0, 0.5)),
    ])
    def test_validation_rejects(self, bad):
        with pytest.raises(ValueError):
            make_terrain_params(**bad)

    def test_to_dict_roundtrippable(self):
        d = params(fog=dict(enabled=True)).to_dict()
        assert d["fog"]["enabled"] is True
        assert "size_px" in d


class TestTerrainRenderer:
    def test_basic_render(self, renderer):
        frame = renderer.render_terrain_pbr_pom(params=params(), heightmap=dem())
        assert frame.rgba.shape == (64, 96, 4)
        assert frame.rgba[..., :3].std() > 5.0
        assert frame.metadata["render_ms"] > 0

    def test_deterministic(self, renderer):
        a = renderer.render_terrain_pbr_pom(params=params(), heightmap=dem())
        b = renderer.render_terrain_pbr_pom(params=params(), heightmap=dem())
        np.testing.assert_array_equal(a.rgba, b.rgba)

    def test_aov_render(self, renderer):
        frame, aov = renderer.render_with_aov(params=params(), heightmap=dem())
        assert set(aov.names()) == {"albedo", "depth", "hdr", "normal", "visibility"}
        vis = aov["visibility"]
        assert ((vis == 0) | (vis == 1)).all()
        nn = np.linalg.norm(aov["normal"], axis=-1)
        assert np.allclose(nn[vis > 0.5], 1.0, atol=1e-4)
        assert np.isnan(aov["depth"][vis < 0.5]).all()

    def test_sun_azimuth_changes_shading(self, renderer):
        a = renderer.render_terrain_pbr_pom(
            params=params(light=dict(azimuth_deg=0.0, elevation_deg=20.0)),
            heightmap=dem())
        b = renderer.render_terrain_pbr_pom(
            params=params(light=dict(azimuth_deg=180.0, elevation_deg=20.0)),
            heightmap=dem())
        assert (a.rgba != b.rgba).mean() > 0.1

    def test_shadows_darken(self, renderer):
        hm = dem(amp=10.0)
        p_on = params(light=dict(elevation_deg=10.0))
        p_off = params(light=dict(elevation_deg=10.0), shadows=dict(enabled=False))
        a = renderer.render_terrain_pbr_pom(params=p_on, heightmap=hm)
        b = renderer.render_terrain_pbr_pom(params=p_off, heightmap=hm)
        assert a.rgba[..., :3].mean() < b.rgba[..., :3].mean()

    def test_fog_brightens_distance(self, renderer):
        hm = dem()
        p_fog = params(fog=dict(enabled=True, density=0.05))
        a = renderer.render_terrain_pbr_pom(params=p_fog, heightmap=hm)
        b = renderer.render_terrain_pbr_pom(params=params(), heightmap=hm)
        assert (a.rgba != b.rgba).any()

    def test_water_covers_valleys(self, renderer):
        hm = dem(amp=8.0)
        p = params(water=dict(enabled=True, level=2.0))
        frame, aov = renderer.render_with_aov(params=p, heightmap=hm)
        nofr, _ = renderer.render_with_aov(params=params(), heightmap=hm)
        assert (frame.rgba != nofr.rgba).any()

    def test_constant_albedo_mode(self, renderer):
        p = params(albedo_mode="constant", constant_albedo=(1.0, 0.2, 0.2))
        frame, aov = renderer.render_with_aov(params=p, heightmap=dem())
        vis = aov["visibility"] > 0.5
        alb = aov["albedo"][vis]
        np.testing.assert_allclose(
            alb, np.broadcast_to([1.0, 0.2, 0.2], alb.shape), atol=1e-5
        )

    def test_material_layers_snow(self, renderer):
        p = params(albedo_mode="constant", constant_albedo=(0.2, 0.6, 0.2),
                   material_layers=dict(enabled=True, snow_height=0.5,
                                        snow_blend=0.05))
        frame, aov = renderer.render_with_aov(params=p, heightmap=dem(amp=10.0))
        vis = aov["visibility"] > 0.5
        alb = aov["albedo"]
        # some pixels should be snowy (near-white)
        snowy = (alb[..., 0] > 0.8) & (alb[..., 1] > 0.8) & vis
        assert snowy.any()

    def test_aa_samples_change_edges(self, renderer):
        a = renderer.render_terrain_pbr_pom(
            params=params(sampling=dict(aa_samples=4)), heightmap=dem())
        b = renderer.render_terrain_pbr_pom(params=params(), heightmap=dem())
        assert (a.rgba != b.rgba).any()

    def test_render_scale(self, renderer):
        frame = renderer.render_terrain_pbr_pom(
            params=params(render_scale=0.5), heightmap=dem())
        assert frame.rgba.shape == (32, 48, 4)

    def test_debug_normals_mode(self, renderer):
        frame = renderer.render_terrain_pbr_pom(
            params=params(debug_mode="normals"), heightmap=dem())
        assert frame.rgba[..., 1].mean() > 100  # up-facing normals → green

    def test_target_rejected(self, renderer):
        with pytest.raises(f3d.RenderError):
            renderer.render_terrain_pbr_pom(params=params(), heightmap=dem(),
                                            target="texture")

    def test_bad_heightmap(self, renderer):
        with pytest.raises(f3d.UploadError):
            renderer.render_terrain_pbr_pom(params=params(),
                                            heightmap=np.zeros((1, 5), np.float32))
        bad = dem()
        bad[3, 3] = np.inf
        with pytest.raises(f3d.UploadError):
            renderer.render_terrain_pbr_pom(params=params(), heightmap=bad)

    def test_certificate(self, renderer):
        cert = {}
        renderer.render_terrain_pbr_pom(params=params(), heightmap=dem(),
                                        certificate=cert)
        assert "digest" in cert

    def test_gpu_timings_recorded(self, renderer):
        renderer.render_terrain_pbr_pom(params=params(), heightmap=dem())
        assert "terrain_main_pass_ms" in renderer.last_gpu_timings

    def test_ibl_env_map(self, renderer):
        env = np.zeros((4, 8, 3), np.float32)
        env[..., 0] = 3.0  # red environment
        p = params(ibl=dict(enabled=True, intensity=1.0),
                   albedo_mode="constant", constant_albedo=(1, 1, 1),
                   light=dict(intensity=0.0, ambient=0.0))
        frame = renderer.render_terrain_pbr_pom(
            params=p, heightmap=dem(), env_maps=IBL(env_map=env, intensity=1.0))
        mid = frame.rgba[40:60, 30:70]
        assert mid[..., 0].mean() > mid[..., 2].mean() + 10


class TestScene:
    def test_render_rgba(self):
        s = f3d.Scene(64, 48, grid=32, colormap="magma")
        img = s.render_rgba()
        assert img.shape == (48, 64, 4)

    def test_render_png(self, tmp_path):
        s = f3d.Scene(48, 32, grid=16)
        p = tmp_path / "scene.png"
        s.render_png(p)
        back = f3d.png_to_numpy(p)
        assert back.shape == (32, 48, 4)

    def test_height_upload_and_camera(self):
        s = f3d.Scene(48, 32, grid=24)
        y, x = np.mgrid[0:16, 0:16].astype(np.float32)
        s.set_height_from_r32f(0.2 * np.sin(x) * np.cos(y))
        s.set_camera_look_at((2, 1.5, 2), (0, 0, 0), (0, 1, 0), 50.0, 0.1, 50.0)
        img = s.render_rgba()
        assert img[..., :3].std() > 5

    def test_camera_validation(self):
        s = f3d.Scene(32, 32)
        with pytest.raises(ValueError):
            s.set_camera_look_at((0, 0, 0), (0, 0, 0), (0, 1, 0), 45, 0.1, 10)
        with pytest.raises(ValueError):
            s.set_camera_look_at((1, 1, 1), (0, 0, 0), (0, 1, 0), 45, 5.0, 1.0)

    def test_ssao_api(self):
        s = f3d.Scene(32, 32)
        assert s.ssao_enabled() is False
        assert s.set_ssao_enabled(True) is True
        s.set_ssao_parameters(2.0, 0.8, 0.01)
        assert s.get_ssao_parameters() == (2.0, 0.8, 0.01)
        with pytest.raises(ValueError):
            s.set_ssao_parameters(-1.0, 1.0, 0.0)

    def test_bad_height_rejected(self):
        s = f3d.Scene(32, 32)
        with pytest.raises(f3d.UploadError):
            s.set_height_from_r32f(np.zeros((5,), np.float32))


class TestForwardShadingFeatures:
    """A.3 forward-shading features (ref terrain_pbr_pom.wgsl): triplanar
    sampling, procedural detail albedo + RNM detail normals with distance
    fade, POM-style parallax of material lookups, and TRUE planar water
    reflection (reflected ray traced against the terrain)."""

    def _dem(self, n=97):
        yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
        return (10.0 * np.sin(xx * 0.1) * np.cos(yy * 0.08)
                + 3.0 * np.sin(xx * 0.31)).astype(np.float32)

    def test_detail_triplanar_pom_change_shading(self):
        from forge3d_tpu.terrain.params import (DetailSettings,
                                                make_terrain_params)
        from forge3d_tpu.terrain.renderer import TerrainRenderer

        r = TerrainRenderer()
        dem = self._dem()
        base = r.render_terrain_pbr_pom(
            params=make_terrain_params(size_px=(128, 96)), heightmap=dem)
        p = make_terrain_params(size_px=(128, 96))
        p.detail = DetailSettings(enabled=True, strength=0.8, scale=24.0)
        p.triplanar.enabled = True
        p.pom.enabled = True
        p.pom.scale = 0.5
        feat = r.render_terrain_pbr_pom(params=p, heightmap=dem)
        d = np.abs(base.rgba[..., :3].astype(int)
                   - feat.rgba[..., :3].astype(int))
        assert d.mean() > 1.0          # features visibly change the image
        assert np.isfinite(feat.rgba.astype(np.float32)).all()
        # detail adds high-frequency variation: local contrast goes up
        g0 = np.diff(base.rgba[..., 1].astype(np.float32), axis=1)
        g1 = np.diff(feat.rgba[..., 1].astype(np.float32), axis=1)
        assert np.abs(g1).mean() > np.abs(g0).mean()

    def test_water_reflection_mirrors_terrain(self):
        from forge3d_tpu.terrain.params import (ReflectionSettings,
                                                WaterSettings,
                                                make_terrain_params)
        from forge3d_tpu.terrain.renderer import TerrainRenderer

        n = 129
        yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
        dem = np.where(xx > 85, 30.0 * np.minimum((xx - 85) / 10.0, 1.0),
                       0.0).astype(np.float32)

        def params():
            return make_terrain_params(
                size_px=(160, 120), cam_theta_deg=12.0, cam_phi_deg=90.0,
                cam_radius=150.0, cam_target=(64.0, 5.0, 64.0))

        r = TerrainRenderer()
        p_on = params()
        p_on.water = WaterSettings(enabled=True, level=1.0)
        p_on.reflection = ReflectionSettings(enabled=True, intensity=1.0)
        p_off = params()
        p_off.water = WaterSettings(enabled=True, level=1.0)
        on = r.render_terrain_pbr_pom(params=p_on, heightmap=dem)
        off = r.render_terrain_pbr_pom(params=p_off, heightmap=dem)
        d = np.abs(on.rgba[..., :3].astype(int)
                   - off.rgba[..., :3].astype(int))
        # the mirrored ridge darkens water pixels below it
        assert d.mean() > 0.5
        assert d.max() > 10
