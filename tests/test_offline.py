# Offline progressive accumulation pipeline.
import numpy as np
import pytest

import forge3d_tpu as f3d
from forge3d_tpu.terrain import (
    OfflineQualitySettings,
    TerrainRenderer,
    make_terrain_params,
    render_offline,
)


def dem():
    y, x = np.mgrid[0:49, 0:49].astype(np.float32)
    return (5.0 * np.sin(x * 0.2) * np.cos(y * 0.17)).astype(np.float32)


def params():
    return make_terrain_params(size_px=(64, 48), cam_radius=90,
                               cam_target=(24, 0, 24),
                               sampling=dict(aa_samples=1))


class TestOfflineSession:
    def test_full_driver(self):
        r = TerrainRenderer()
        progress = []
        res = render_offline(
            r, params=params(), heightmap=dem(),
            settings=OfflineQualitySettings(enabled=True, max_samples=24,
                                            batch_size=8),
            progress_callback=progress.append,
        )
        assert res.frame.rgba.shape == (48, 64, 4)
        assert res.hdr_frame.rgb.shape == (48, 64, 3)
        assert res.metadata["samples"] >= 8
        assert len(progress) >= 1
        assert progress[-1].samples_so_far == res.metadata["samples"]
        assert not r.offline_session_active()

    def test_requires_opt_in(self):
        r = TerrainRenderer()
        with pytest.raises(f3d.RenderError):
            render_offline(r, params=params(), heightmap=dem(),
                           settings=OfflineQualitySettings(enabled=False))

    def test_one_shot_blocked_during_session(self):
        r = TerrainRenderer()
        r.begin_offline_accumulation(params=params(), heightmap=dem())
        try:
            with pytest.raises(f3d.RenderError):
                r.render_terrain_pbr_pom(params=params(), heightmap=dem())
            with pytest.raises(f3d.RenderError):
                r.begin_offline_accumulation(params=params(), heightmap=dem())
        finally:
            r.end_offline_accumulation()

    def test_metrics_progression(self):
        r = TerrainRenderer()
        r.begin_offline_accumulation(params=params(), heightmap=dem())
        try:
            m0 = r.read_accumulation_metrics()
            assert m0["total_samples"] == 0
            m1 = r.accumulate_batch(4)
            assert m1["total_samples"] == 4
            m2 = r.accumulate_batch(4)
            assert m2["total_samples"] == 8
            # accumulation mean stabilizes: later delta smaller
            assert m2["mean_delta"] <= m1["mean_delta"] + 1e-6
            hdr, aov = r.resolve_offline_hdr()
            assert hdr.rgb.shape == (48, 64, 3)
            frame = r.tonemap_offline_hdr(hdr)
            assert frame.rgba.dtype == np.uint8
        finally:
            r.end_offline_accumulation()

    def test_errors_without_session(self):
        r = TerrainRenderer()
        with pytest.raises(f3d.RenderError):
            r.accumulate_batch(4)
        with pytest.raises(f3d.RenderError):
            r.resolve_offline_hdr()

    def test_accumulation_matches_oneshot_mean(self):
        """Accumulated mean with AA jitter should be close to the one-shot
        multi-AA render of the same scene (same estimator family)."""
        p = params()
        r = TerrainRenderer()
        res = render_offline(
            r, params=p, heightmap=dem(),
            settings=OfflineQualitySettings(enabled=True, max_samples=16,
                                            min_samples=16, batch_size=8,
                                            converged_ratio_target=2.0),
        )
        frame = r.render_terrain_pbr_pom(params=p, heightmap=dem())
        a = res.frame.rgba[..., :3].astype(np.float32)
        b = frame.rgba[..., :3].astype(np.float32)
        assert np.abs(a - b).mean() < 8.0

    def test_denoiser_runs(self):
        r = TerrainRenderer()
        res = render_offline(
            r, params=params(), heightmap=dem(),
            settings=OfflineQualitySettings(enabled=True, max_samples=8,
                                            batch_size=8, denoiser="atrous",
                                            denoise_iterations=2),
        )
        assert res.metadata["denoiser"] == "atrous"
        assert np.isfinite(res.hdr_frame.rgb).all()

    def test_certificate_metadata(self):
        r = TerrainRenderer()
        cert = {}
        res = render_offline(
            r, params=params(), heightmap=dem(),
            settings=OfflineQualitySettings(enabled=True, max_samples=8,
                                            batch_size=8),
            certificate=cert,
        )
        assert res.metadata["certificate_payload_sha256"] == cert["digest"]

    def test_settings_validation(self):
        with pytest.raises(ValueError):
            OfflineQualitySettings(enabled=True, max_samples=0).validate()
        with pytest.raises(ValueError):
            OfflineQualitySettings(enabled=True, denoiser="magic").validate()
