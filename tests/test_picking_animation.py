# Picking queries, lasso selection, camera animation rigs.
import numpy as np
import pytest

from forge3d_tpu.animation import CameraAnimation, flythrough_rig, orbit_rig
from forge3d_tpu.camera import PinholeCamera
from forge3d_tpu.ops.pyramid import build_pyramid
from forge3d_tpu.ops.traversal import scene_from_pyramid
from forge3d_tpu.picking import Selection, lasso_select, pick_terrain, screen_ray


def setup_scene():
    y, x = np.mgrid[0:33, 0:33].astype(np.float32)
    dem = (3.0 * np.sin(x * 0.3) * np.cos(y * 0.25)).astype(np.float32)
    pyr = build_pyramid(dem)
    return scene_from_pyramid(pyr), dem


class TestPicking:
    def test_center_pick_hits_terrain(self):
        (scene, static), dem = setup_scene()
        cam = PinholeCamera.from_lookat((16, 30, 50), (16, 0, 16), aspect=4 / 3)
        res = pick_terrain(scene, static, cam, 160, 120, 80, 60)
        assert res.hit
        assert 0.0 <= res.uv[0] <= 1.0 and 0.0 <= res.uv[1] <= 1.0
        # picked world height matches DEM bilinear within tolerance
        assert abs(res.world[1] - res.height) < 1e-6
        nn = np.linalg.norm(res.normal)
        assert abs(nn - 1.0) < 1e-4

    def test_sky_pick_misses(self):
        (scene, static), _ = setup_scene()
        cam = PinholeCamera.from_lookat((16, 30, 50), (16, 0, 16), aspect=1.0)
        res = pick_terrain(scene, static, cam, 100, 100, 50, 0)  # top of frame
        assert not res.hit

    def test_pick_matches_render_depth(self):
        """CPU pick and the render engine agree (visibility-parity gate)."""
        from forge3d_tpu.ops.traversal import trace

        (scene, static), _ = setup_scene()
        cam = PinholeCamera.from_lookat((16, 25, 45), (16, 0, 16), aspect=1.0)
        W = H = 64
        for px, py in [(32, 40), (10, 50), (55, 35)]:
            res = pick_terrain(scene, static, cam, W, H, px, py)
            ro, rd = screen_ray(cam, W, H, px, py)
            t2 = trace(scene, static,
                       tuple(np.float32([v]) for v in ro),
                       tuple(np.float32([v]) for v in rd))
            assert bool(np.asarray(t2.hit)[0]) == res.hit
            if res.hit:
                assert abs(float(np.asarray(t2.t)[0]) - res.t) < 1e-6

    def test_lasso(self):
        pts = np.array([[1, 1], [5, 5], [9, 9], [5, 1]])
        lasso = [(0, 0), (6, 0), (6, 6), (0, 6)]
        m = lasso_select(pts, lasso)
        assert list(m) == [True, True, False, True]
        with pytest.raises(ValueError):
            lasso_select(pts, [(0, 0), (1, 1)])

    def test_selection_ops(self):
        s = Selection()
        s.add([1, 2, 3])
        s.remove(2)
        s.toggle([3, 4])
        assert s.ids == {1, 4}
        mask = s.mask_for(np.array([[1, 2], [4, 5]]))
        assert mask.tolist() == [[True, False], [True, False]]
        s.clear()
        assert not s.ids


class TestAnimation:
    def test_keyframe_interpolation(self):
        a = CameraAnimation(easing="linear")
        a.add_keyframe(0.0, (0, 0, 0), (1, 0, 0), 40)
        a.add_keyframe(2.0, (10, 0, 0), (11, 0, 0), 60)
        mid = a.sample(1.0)
        np.testing.assert_allclose(mid.origin, (5, 0, 0))
        np.testing.assert_allclose(mid.fov_y_deg, 50)
        # clamping
        assert a.sample(-1.0).origin == (0, 0, 0)
        assert a.sample(99.0).origin == (10, 0, 0)

    def test_keyframes_sorted_on_insert(self):
        a = CameraAnimation()
        a.add_keyframe(2.0, (2, 0, 0), (0, 0, 0))
        a.add_keyframe(0.0, (0, 0, 0), (0, 0, 0))
        assert a.keyframes[0].time == 0.0

    def test_frames_generator(self):
        a = CameraAnimation(easing="linear")
        a.add_keyframe(0.0, (0, 0, 0), (1, 0, 0))
        a.add_keyframe(1.0, (1, 0, 0), (2, 0, 0))
        frames = list(a.frames(fps=10))
        assert len(frames) == 11
        np.testing.assert_allclose(frames[5].origin[0], 0.5)

    def test_orbit_rig_radius(self):
        rig = orbit_rig((5, 0, 5), radius=10, height=3, duration=4.0)
        for kf in rig.keyframes:
            d = np.hypot(kf.origin[0] - 5, kf.origin[2] - 5)
            np.testing.assert_allclose(d, 10.0, atol=1e-6)
            assert kf.origin[1] == 3.0
        start = rig.sample(0.0)
        end = rig.sample(4.0)
        np.testing.assert_allclose(start.origin, end.origin, atol=1e-6)

    def test_flythrough_looks_ahead(self):
        rig = flythrough_rig([(0, 5, 0), (10, 5, 0), (20, 5, 10)], duration=2.0)
        k0 = rig.keyframes[0]
        assert k0.look_at == (10.0, 5.0, 0.0)
        last = rig.keyframes[-1]
        assert last.look_at != last.origin
        with pytest.raises(ValueError):
            flythrough_rig([(0, 0, 0)])
