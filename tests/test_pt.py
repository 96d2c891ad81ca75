# Megakernel PT, PathTracer facade, BVH build + traversal.
import numpy as np
import pytest

import forge3d_tpu as f3d
from forge3d_tpu.pt.megakernel import pt_render_aovs, pt_render_gpu
from forge3d_tpu.pt.path_tracer import PathTracer, iter_tiles


SCENE = [
    {"center": (0.0, 1.0, 0.0), "radius": 1.0, "albedo": (0.8, 0.2, 0.2)},
    {"center": (2.2, 0.6, -0.5), "radius": 0.6, "albedo": (0.2, 0.8, 0.2),
     "metallic": 1.0, "roughness": 0.15},
    {"center": (-2.0, 0.8, 0.5), "radius": 0.8, "albedo": (0.9, 0.8, 0.2),
     "ax": 0.4, "ay": 0.05},
]
CAM = {"origin": (0.0, 1.6, 6.0), "look_at": (0.0, 1.0, 0.0), "fov_y": 45.0}


class TestMegakernel:
    def test_deterministic(self):
        a = pt_render_gpu(96, 64, SCENE, CAM, seed=1, frames=1)
        b = pt_render_gpu(96, 64, SCENE, CAM, seed=9, frames=5)
        np.testing.assert_array_equal(a, b)  # kernel is RNG-free

    def test_shapes_and_alpha(self):
        img = pt_render_gpu(80, 50, SCENE, CAM)
        assert img.shape == (50, 80, 4) and img.dtype == np.uint8
        assert (img[..., 3] == 255).all()

    def test_spheres_visible(self):
        img = pt_render_gpu(128, 96, SCENE, CAM)
        center = img[40:60, 50:80, :3].astype(int)
        # red sphere dominates center
        assert center[..., 0].mean() > center[..., 1].mean() + 10

    def test_empty_scene_sky_and_ground(self):
        img = pt_render_gpu(64, 64, [], CAM)
        top = img[0, 32, :3].astype(int)
        assert top[2] > top[0]  # sky is blue at top

    def test_aovs(self):
        out = pt_render_aovs(64, 48, SCENE, CAM)
        assert set(out) == {"rgba", "albedo", "normal", "depth", "direct",
                            "indirect", "emission", "visibility"}
        assert out["depth"].shape == (48, 64)
        hit = out["visibility"] > 0.5
        assert hit.any() and (~hit).any()
        # normals unit on hits
        nn = np.linalg.norm(out["normal"], axis=-1)
        assert np.allclose(nn[hit], 1.0, atol=2e-3)
        # emission AOV is zero (no emissive in scene contract)
        assert np.allclose(out["emission"], 0.0)
        # sky depth sentinel is 1.0 (reference semantics)
        assert np.allclose(out["depth"][~hit], 1.0)

    def test_scene_validation(self):
        with pytest.raises(ValueError):
            pt_render_gpu(32, 32, [{"radius": 1.0}], CAM)
        with pytest.raises(ValueError):
            pt_render_gpu(32, 32, ["not-a-dict"], CAM)
        with pytest.raises(ValueError):
            pt_render_gpu(0, 32, [], CAM)


class TestPathTracerFacade:
    def test_synthetic_gate(self):
        pt = PathTracer(32, 32)
        with pytest.raises(f3d.ExperimentalSyntheticOutput):
            pt.render_rgba()
        img = pt.render_rgba(synthetic_ok=True)
        assert img.shape == (32, 32, 4)

    def test_gpu_path_no_gate(self):
        pt = PathTracer()
        img = pt.render_rgba(48, 32, scene=SCENE, camera=CAM, use_gpu=True)
        assert img.shape == (32, 48, 4)

    def test_luminance_clamp(self):
        pt = PathTracer()
        bright = [{"center": (0, 1, 0), "radius": 1.0, "emissive": (50, 50, 50)}]
        img = pt.render_rgba(48, 32, scene=bright, camera=CAM, use_gpu=True)
        clamped = pt.render_rgba(48, 32, scene=bright, camera=CAM, use_gpu=True,
                                 luminance_clamp=0.2)
        assert clamped[..., :3].mean() < img[..., :3].mean()

    def test_iter_tiles(self):
        tiles = list(iter_tiles(130, 70, 64))
        assert tiles[0] == (0, 0, 64, 64)
        assert tiles[-1] == (128, 64, 2, 6)
        assert sum(w * h for _, _, w, h in tiles) == 130 * 70

    def test_build_bvh_handle(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]], np.float32)
        i = np.array([[0, 1, 2], [1, 3, 2]], np.uint32)
        h = PathTracer().build_bvh(v, i)
        assert h.triangle_count == 2
        assert h.node_count >= 1
        assert "BvhHandle" in repr(h)


def icosphere(subdiv=2):
    """Crude triangulated sphere for BVH tests."""
    t = (1 + 5**0.5) / 2
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ])
    for _ in range(subdiv):
        mids = {}
        new_faces = []
        vl = verts.tolist()

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in mids:
                m = (np.asarray(vl[a]) + np.asarray(vl[b])) / 2
                m /= np.linalg.norm(m)
                mids[key] = len(vl)
                vl.append(m.tolist())
            return mids[key]

        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(vl)
        faces = np.asarray(new_faces)
    return verts.astype(np.float32), faces.astype(np.uint32)


class TestBvh:
    def test_traversal_matches_bruteforce(self):
        from forge3d_tpu.ops.bvh import (
            build_sah_bvh, mesh_scene, trace_mesh, trace_mesh_bruteforce_numpy,
        )

        v, f = icosphere(2)
        bvh = build_sah_bvh(v, f)
        assert bvh.triangle_count == len(f)
        scene, n_nodes = mesh_scene(bvh)

        rng = np.random.default_rng(3)
        n = 200
        ro = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        ro[:, 2] = 3.0
        target = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
        rd = target - ro
        rd /= np.linalg.norm(rd, axis=1, keepdims=True)

        res = trace_mesh(scene, n_nodes,
                         (ro[:, 0], ro[:, 1], ro[:, 2]),
                         (rd[:, 0], rd[:, 1], rd[:, 2]))
        bf_hit, bf_t = trace_mesh_bruteforce_numpy(v, f, ro, rd)
        hit = np.asarray(res.hit)
        t = np.asarray(res.t)
        assert (hit == bf_hit).mean() > 0.995
        both = hit & bf_hit
        np.testing.assert_allclose(t[both], bf_t[both], rtol=2e-4, atol=1e-4)

    def test_refit_tracks_moved_mesh(self):
        from forge3d_tpu.ops.bvh import build_sah_bvh, refit_bvh

        v, f = icosphere(1)
        bvh = build_sah_bvh(v, f)
        v2 = v * 2.0 + np.float32([5, 0, 0])
        re = refit_bvh(bvh, v2, f)
        lo, hi = np.asarray(re.world_aabb)
        assert lo[0] >= 3.0 and hi[0] <= 7.0
        # root bounds contain all triangles
        assert (re.bounds_min[0] <= v2.min(0) + 1e-5).all()
        assert (re.bounds_max[0] >= v2.max(0) - 1e-5).all()

    def test_build_validation(self):
        from forge3d_tpu.ops.bvh import build_sah_bvh

        with pytest.raises(ValueError):
            build_sah_bvh(np.zeros((3, 3), np.float32), np.zeros((0, 3), np.uint32))
        with pytest.raises(ValueError):
            build_sah_bvh(np.zeros((2, 3), np.float32),
                          np.array([[0, 1, 5]], np.uint32))


def test_save_aovs(tmp_path):
    from forge3d_tpu.io.formats import exr_to_numpy
    from forge3d_tpu.pt.path_tracer import PathTracer, save_aovs

    pt = PathTracer(32, 24)
    aovs = pt.render_aovs(32, 24, [{"center": (0, 1, 0), "radius": 1.0}],
                          {"origin": (0, 1, 3)},
                          aovs=("depth", "normal"))
    paths = save_aovs(str(tmp_path / "frame"), aovs)
    assert any(p.endswith("rgba.png") for p in paths)
    exrs = [p for p in paths if p.endswith(".exr")]
    assert len(exrs) == 2
    depth, names = exr_to_numpy(tmp_path / "frame_depth.exr")
    import numpy as np

    np.testing.assert_allclose(depth, aovs["depth"], atol=1e-6)
