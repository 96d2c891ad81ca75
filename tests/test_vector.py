# Vector overlay engine: analytic coverage vs supersampled reference
# (the LIMES-style fidelity gate), scene compositing, picking.
import numpy as np
import pytest

from forge3d_tpu.vector import (
    VectorScene,
    disc_coverage,
    polygon_coverage,
    render_overlay_rgba,
    stroke_coverage,
)


def supersample_stroke(width, height, segments, stroke_width, ss=8):
    """Brute-force ss x ss supersampled coverage reference."""
    segs = np.asarray(segments, np.float64).reshape(-1, 4)
    half = stroke_width / 2.0
    out = np.zeros((height, width))
    offs = (np.arange(ss) + 0.5) / ss
    for oy in offs:
        for ox in offs:
            px = np.arange(width)[None, :] + ox
            py = np.arange(height)[:, None] + oy
            dmin = np.full((height, width), np.inf)
            for x1, y1, x2, y2 in segs:
                vx, vy = x2 - x1, y2 - y1
                denom = max(vx * vx + vy * vy, 1e-12)
                t = np.clip(((px - x1) * vx + (py - y1) * vy) / denom, 0, 1)
                d = np.hypot(px - x1 - t * vx, py - y1 - t * vy)
                dmin = np.minimum(dmin, d)
            out += (dmin <= half)
    return out / (ss * ss)


class TestCoverage:
    def test_stroke_matches_supersampled(self):
        """The LIMES-class gate: mean err <= 2e-2, interior/exterior exact."""
        segs = np.array([[5.2, 5.7, 50.3, 20.1], [20.0, 40.0, 55.0, 8.0]])
        cov = np.asarray(stroke_coverage(64, 48, segs, 5.0))
        ref = supersample_stroke(64, 48, segs, 5.0, ss=8)
        assert np.abs(cov - ref).mean() < 2e-2
        assert cov[ref > 0.999].min() > 0.99
        assert cov[ref < 0.001].max() < 0.01

    def test_disc_coverage_area(self):
        cov = np.asarray(disc_coverage(64, 64, [(32.0, 32.0)], [10.0]))
        area = cov.sum()
        np.testing.assert_allclose(area, np.pi * 100.0, rtol=0.02)
        assert cov[32, 32] == 1.0
        assert cov[0, 0] == 0.0

    def test_polygon_coverage_area_and_hole(self):
        outer = [(8.0, 8.0), (56.0, 8.0), (56.0, 56.0), (8.0, 56.0)]
        cov = np.asarray(polygon_coverage(64, 64, [outer]))
        np.testing.assert_allclose(cov.sum(), 48.0 * 48.0, rtol=0.01)
        # hole: inner ring wound the opposite way (nonzero rule)
        inner = [(24.0, 24.0), (24.0, 40.0), (40.0, 40.0), (40.0, 24.0)]
        cov2 = np.asarray(polygon_coverage(64, 64, [outer, inner]))
        np.testing.assert_allclose(cov2.sum(), 48.0**2 - 16.0**2, rtol=0.02)
        assert cov2[32, 32] < 0.01

    def test_polygon_evenodd(self):
        outer = [(8.0, 8.0), (56.0, 8.0), (56.0, 56.0), (8.0, 56.0)]
        inner = [(24.0, 24.0), (40.0, 24.0), (40.0, 40.0), (40.0, 24.0)]
        # same winding, even-odd still makes a hole
        inner = [(24.0, 24.0), (40.0, 24.0), (40.0, 40.0), (24.0, 40.0)]
        cov = np.asarray(polygon_coverage(64, 64, [outer, inner], rule="evenodd"))
        assert cov[32, 32] < 0.01
        assert cov[12, 12] > 0.99


class TestVectorScene:
    def test_composite_and_pick(self):
        s = VectorScene()
        pid_line = s.add_lines([(4, 4), (60, 60)], color=(1, 0, 0), width=4.0)
        pid_poly = s.add_polygons(
            [[(40.0, 6.0), (60.0, 6.0), (60.0, 26.0), (40.0, 26.0)]],
            color=(0, 0, 1), opacity=0.8)
        rgb, alpha, pick = s.render(64, 64)
        assert rgb.shape == (64, 64, 3)
        # line center red
        assert rgb[32, 32, 0] > 0.9
        assert pick[32, 32] == pid_line
        assert pick[16, 50] == pid_poly
        assert s.pick_at(pick, 32, 32) == pid_line
        assert alpha.max() <= 1.0 + 1e-6

    def test_points_layer(self):
        s = VectorScene()
        s.add_points([(10.0, 10.0), (30.0, 20.0)], color=(0, 1, 0), size=8.0)
        rgb, alpha, _ = s.render(48, 32)
        assert rgb[10, 10, 1] > 0.9
        assert rgb[20, 30, 1] > 0.9
        assert alpha[0, 0] == 0.0

    def test_layer_order_matters(self):
        s = VectorScene()
        s.add_polygons([[(0.0, 0.0), (32.0, 0.0), (32.0, 32.0), (0.0, 32.0)]],
                       color=(1, 0, 0))
        s.add_polygons([[(0.0, 0.0), (32.0, 0.0), (32.0, 32.0), (0.0, 32.0)]],
                       color=(0, 1, 0))
        rgb, _, _ = s.render(32, 32)
        assert rgb[16, 16, 1] > 0.9  # last layer wins

    def test_overlay_rgba_straight_alpha(self):
        s = VectorScene()
        s.add_lines([(0, 16), (32, 16)], color=(0.5, 0.25, 1.0), width=2.0,
                    opacity=0.5)
        rgba = render_overlay_rgba(s, 32, 32)
        assert rgba.shape == (32, 32, 4)
        m = rgba[16, 16]
        np.testing.assert_allclose(m[:3], [0.5, 0.25, 1.0], atol=1e-5)
        np.testing.assert_allclose(m[3], 0.5, atol=1e-5)

    def test_clear(self):
        s = VectorScene()
        s.add_points([(1.0, 1.0)])
        s.clear_vectors()
        rgb, alpha, _ = s.render(8, 8)
        assert alpha.max() == 0.0

    def test_bad_polyline(self):
        with pytest.raises(ValueError):
            VectorScene().add_lines([(1.0, 1.0)])
