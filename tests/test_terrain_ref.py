# End-to-end tests of the PROMETHEUS terrain PT reference (CPU backend).
import numpy as np
import pytest

import forge3d_tpu as f3d
from forge3d_tpu.pt.terrain_ref import TerrainRefDesc, render_terrain_reference


def small_dem(n=49):
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    return (5.0 * np.sin(x * 0.2) * np.cos(y * 0.17)).astype(np.float32)


CAM = {"origin": (24, 20, 70), "look_at": (24, 0, 24), "fov_y": 42.0, "exposure": 1.0}


def quick(dem=None, w=64, h=48, **kw):
    kw.setdefault("spp", 2)
    kw.setdefault("max_frames", 96)
    kw.setdefault("min_frames", 8)
    kw.setdefault("variance_threshold", 3e-3)
    return f3d.hybrid_render_terrain_reference(
        dem if dem is not None else small_dem(), w, h, CAM, **kw
    )


class TestTerrainReference:
    def test_converges_and_output_shapes(self):
        out = quick()
        assert out["converged"] is True
        assert out["frames"] >= 8
        assert out["rgba"].shape == (48, 64, 4) and out["rgba"].dtype == np.uint8
        assert out["albedo"].shape == (48, 64, 3)
        assert out["normal"].shape == (48, 64, 3)
        assert out["depth"].shape == (48, 64)
        assert (out["rgba"][..., 3] == 255).all()
        # image is non-trivial: terrain pixels lit, some variation
        assert out["rgba"][..., :3].std() > 5.0

    def test_deterministic_same_seed(self):
        a = quick(seed=123)
        b = quick(seed=123)
        np.testing.assert_array_equal(a["rgba"], b["rgba"])
        assert a["frames"] == b["frames"]
        assert a["variance"] == b["variance"]

    def test_different_seed_differs(self):
        a = quick(seed=1)
        b = quick(seed=2)
        assert (a["rgba"] != b["rgba"]).any()

    def test_aovs_center_ray_semantics(self):
        out = quick()
        hitmask = np.isfinite(out["depth"])
        # albedo is the uniform terrain albedo on hits, 0 on sky
        assert np.allclose(out["albedo"][hitmask], 0.6, atol=1e-5)
        assert np.allclose(out["albedo"][~hitmask], 0.0)
        # normals unit length on hits, zero on sky
        nn = np.linalg.norm(out["normal"], axis=-1)
        assert np.allclose(nn[hitmask], 1.0, atol=1e-4)
        assert np.allclose(nn[~hitmask], 0.0)
        # depth NaN exactly on sky (reference writes NaN for misses)
        assert np.isnan(out["depth"][~hitmask]).all()

    def test_nonconvergence_raises(self):
        with pytest.raises(f3d.ConvergenceError) as ei:
            quick(max_frames=4, min_frames=2, variance_threshold=1e-12)
        assert ei.value.frames == 4

    def test_sun_shadows_darken(self):
        # Very low sun over bumpy terrain: with shadows, terrain should be
        # darker than without (env held equal).
        dem = small_dem()
        lit = quick(dem, sun_elevation_deg=8.0, seed=5,
                    max_frames=256, variance_threshold=5e-3)
        noshadow = render_terrain_reference(
            TerrainRefDesc(
                heights=dem, width=64, height=48,
                cam_origin=CAM["origin"], cam_look_at=CAM["look_at"],
                fov_y_deg=CAM["fov_y"], spp=2, max_frames=256, min_frames=8,
                variance_threshold=5e-3, shadows_enabled=False,
                sun_elevation_deg=8.0, seed=5,
            )
        )
        hit = np.isfinite(lit["depth"])
        assert lit["rgba"][hit][:, :3].mean() < noshadow["rgba"][hit][:, :3].mean() - 1.0

    def test_env_map_tints_sky(self):
        envmap = np.zeros((8, 16, 3), np.float32)
        envmap[..., 2] = 4.0  # bright blue environment
        out = quick(env_map=envmap, env_intensity=1.0)
        sky = ~np.isfinite(out["depth"])
        assert sky.any()
        px = out["rgba"][sky]
        assert px[:, 2].mean() > px[:, 0].mean() + 30  # blue dominates

    def test_mesh_args_validated(self):
        # must come together (terrain_reference.rs:176-181)
        with pytest.raises(ValueError, match="together"):
            quick(mesh_vertices=np.zeros((3, 3), np.float32))
        with pytest.raises(ValueError, match=r"\(N, 3\)"):
            quick(mesh_vertices=np.zeros((0, 3), np.float32),
                  mesh_indices=np.zeros((1, 3), np.uint32))
        with pytest.raises(ValueError, match=r"\(M, 3\)"):
            quick(mesh_vertices=np.zeros((3, 3), np.float32),
                  mesh_indices=np.zeros((3,), np.uint32))
        with pytest.raises(ValueError, match="non-finite"):
            quick(mesh_vertices=np.full((3, 3), np.nan, np.float32),
                  mesh_indices=np.zeros((1, 3), np.uint32))
        with pytest.raises(ValueError, match="out-of-bounds"):
            quick(mesh_vertices=np.zeros((3, 3), np.float32),
                  mesh_indices=np.array([[0, 1, 7]], np.uint32))

    def test_mixed_scene_mesh_and_terrain(self):
        """Terrain is a first-class primitive of the shared hybrid
        traversal (test_hybrid_terrain_pt.py:718-753): a quad hovering
        above the terrain occludes the heightfield, shortens depth, and
        carries the legacy constant mesh albedo (0.7, 0.7, 0.8)
        (hybrid_traversal.wgsl:233-241) through the AOVs."""
        dem = small_dem()
        kw = dict(spp=2, max_frames=8, min_frames=2,
                  variance_threshold=1e30)
        quad_v = np.array([[10, 8, 20], [38, 8, 20], [38, 22, 20],
                           [10, 22, 20]], np.float32)
        quad_i = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
        base = f3d.hybrid_render_terrain_reference(dem, 96, 72, CAM, **kw)
        mixed = f3d.hybrid_render_terrain_reference(
            dem, 96, 72, CAM, mesh_vertices=quad_v, mesh_indices=quad_i,
            **kw)
        d0, d1 = base["depth"], mixed["depth"]
        closer = np.isfinite(d1) & (~np.isfinite(d0) | (d1 < d0 - 1.0))
        assert closer.mean() > 0.01, "mesh did not appear in the scene"
        assert np.allclose(mixed["albedo"][closer], [0.7, 0.7, 0.8],
                           atol=2e-2)
        terr = np.isfinite(d1) & ~closer
        assert terr.mean() > 0.2
        assert np.allclose(mixed["albedo"][terr], [0.6, 0.6, 0.6],
                           atol=2e-2)
        # the mesh shadows the terrain: some terrain pixels darken
        db = base["rgba"][..., :3].astype(np.int32)
        dm = mixed["rgba"][..., :3].astype(np.int32)
        assert (dm[terr] < db[terr]).any()

    def test_mesh_sweep_falls_back_to_per_ray(self):
        dem = small_dem()
        quad_v = np.array([[10, 8, 20], [38, 8, 20], [38, 22, 20],
                           [10, 22, 20]], np.float32)
        quad_i = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
        kw = dict(spp=1, max_frames=4, min_frames=2,
                  variance_threshold=1e30)
        a = f3d.hybrid_render_terrain_reference(
            dem, 48, 36, CAM, mesh_vertices=quad_v, mesh_indices=quad_i,
            traversal="sweep", **kw)
        b = f3d.hybrid_render_terrain_reference(
            dem, 48, 36, CAM, mesh_vertices=quad_v, mesh_indices=quad_i,
            traversal="dda", **kw)
        assert np.array_equal(a["rgba"], b["rgba"])

    def test_bad_inputs_raise(self):
        with pytest.raises(f3d.UploadError):
            quick(dem=np.zeros((1, 8), np.float32))
        with pytest.raises(f3d.RenderError):
            quick(variance_threshold=-1.0)
        with pytest.raises(ValueError):
            quick(sun_color=(1.0, "x", 0.5))
        with pytest.raises(ValueError):
            quick(sun_color=(1.0, -0.5, 0.5))

    def test_certificate_kwarg(self):
        cert = {}
        quick(certificate=cert)
        assert cert["schema"].startswith("forge3d-tpu/certificate")
        assert len(cert["digest"]) == 64
        assert len(cert["signature"]) == 128  # 64-byte Ed25519 sig, hex

    def test_memory_diagnostics(self):
        out = quick()
        assert out["minmax_pyramid_bytes"] > 0
        assert out["gpu_resource_bytes"] >= out["minmax_pyramid_bytes"]
        assert out["peak_host_visible_bytes"] > 0
