# Property tests for the screen-space compositor models calibrated in
# round 3: hard polygon-fill coverage (reference polygon_fill pass has no
# AA), the continuous fill coordinate mapping, the stroke feather law,
# dash phase continuity, and premultiplied fill blending.
#
# Reference behavior contracts:
#   - polygon fill: rasterized triangles, pixel covered iff its center
#     lies inside (measured on tests/golden/recipes/
#     mapscene_thematic_choropleth.png hard edges)
#   - strokes: LIMES analytic coverage with a 0.5px outward feather
#   - fills blend premultiplied in display space (c*a^2 + b*(1-a))

import numpy as np
import pytest

from forge3d_tpu.screen_compose import (
    blend_region_linear,
    dash_segments,
    draw_line,
    point_to_pixel_f,
    polygon_coverage_hard,
)


class TestPolygonCoverageHard:
    @pytest.mark.parametrize("x0frac", [0.0, 0.2, 0.49, 0.5, 0.51, 0.8])
    def test_pixel_center_rule_left_edge(self, x0frac):
        """A pixel is covered iff its center (i+0.5) is inside."""
        x0 = 10.0 + x0frac
        ring = [(x0, 2.0), (30.0, 2.0), (30.0, 20.0), (x0, 20.0)]
        cov = polygon_coverage_hard([ring], 40, 24)
        # column 10 center is 10.5: covered iff x0 <= 10.5
        assert bool(cov[10, 10] == 1.0) == (x0 <= 10.5)
        assert cov[10, 11] == 1.0            # center 11.5 always inside
        assert cov[10, 9] == 0.0

    @pytest.mark.parametrize("y1frac", [0.1, 0.45, 0.55, 0.96])
    def test_pixel_center_rule_bottom_edge(self, y1frac):
        y1 = 12.0 + y1frac
        ring = [(2.0, 2.0), (30.0, 2.0), (30.0, y1), (2.0, y1)]
        cov = polygon_coverage_hard([ring], 40, 24)
        assert bool(cov[12, 10] == 1.0) == (y1 >= 12.5)
        assert cov[11, 10] == 1.0
        assert cov[13, 10] == 0.0

    def test_binary_coverage(self):
        ring = [(3.3, 2.7), (17.2, 5.1), (12.9, 18.4)]
        cov = polygon_coverage_hard([ring], 24, 24)
        assert set(np.unique(cov)) <= {0.0, 1.0}

    def test_even_odd_hole(self):
        outer = [(2.0, 2.0), (22.0, 2.0), (22.0, 22.0), (2.0, 22.0)]
        inner = [(8.0, 8.0), (16.0, 8.0), (16.0, 16.0), (8.0, 16.0)]
        cov = polygon_coverage_hard([outer, inner], 24, 24)
        assert cov[12, 12] == 0.0          # inside the hole
        assert cov[4, 4] == 1.0
        assert cov[12, 4] == 1.0

    def test_area_matches_analytic(self):
        # axis-aligned rect snapped to pixel centers: exact area
        ring = [(4.5, 3.5), (20.5, 3.5), (20.5, 15.5), (4.5, 15.5)]
        cov = polygon_coverage_hard([ring], 32, 24)
        assert cov.sum() == 16 * 12

    def test_degenerate_rings_ignored(self):
        cov = polygon_coverage_hard([[(1.0, 1.0), (2.0, 2.0)]], 8, 8)
        assert cov.sum() == 0.0


class TestPointToPixelF:
    def test_fraction_maps_to_full_size(self):
        assert point_to_pixel_f((0.5, 0.25), 128, 88) == (64.0, 22.0)
        assert point_to_pixel_f((1.0, 1.0), 128, 88) == (128.0, 88.0)

    def test_pixel_values_pass_through(self):
        assert point_to_pixel_f((42.5, 17.25), 128, 88) == (42.5, 17.25)

    def test_no_rounding(self):
        fx, fy = point_to_pixel_f((0.52, 0.14), 128, 88)
        assert abs(fx - 66.56) < 1e-6 and abs(fy - 12.32) < 1e-6


class TestStrokeFeather:
    @pytest.mark.parametrize("width", [2.0, 3.0, 4.0, 6.0])
    def test_mass_is_width_plus_feather(self, width):
        """cov = clip(half + 0.5 - d) sampled at integer centers: the
        discrete column mass equals the stroke width for a line on a
        pixel row (the ramp samples sum to the analytic area)."""
        img = np.zeros((32, 32, 4), np.uint8)
        img[..., 3] = 255            # opaque black: RGB encodes coverage
        draw_line(img, (4, 16), (28, 16), (255, 255, 255, 255),
                  width_px=width, cap="butt")
        col = img[:, 16, 0].astype(np.float64) / 255.0
        assert abs(col.sum() - width) < 0.05

    def test_symmetric_profile(self):
        img = np.zeros((33, 32, 4), np.uint8)
        img[..., 3] = 255
        draw_line(img, (4, 16), (28, 16), (255, 255, 255, 255),
                  width_px=3.0, cap="butt")
        col = img[:, 16, 0].astype(np.int32)
        # line centered on row 16: profile symmetric about that row
        for k in range(1, 12):
            assert col[16 - k] == col[16 + k]


class TestDashSegments:
    def test_phase_carries_across_vertices(self):
        pts = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]
        segs = dash_segments(pts, [6, 4])
        # first dash 0-6, gap 6-10, second dash starts at corner
        assert len(segs) >= 2
        (s0, e0) = segs[0]
        assert s0 == (0.0, 0.0) and e0 == (6.0, 0.0)
        (s1, e1) = segs[1]
        assert s1 == (10.0, 0.0) and e1 == (10.0, 6.0)

    def test_total_on_length(self):
        pts = [(0.0, 0.0), (100.0, 0.0)]
        segs = dash_segments(pts, [7, 3])
        on = sum(abs(e[0] - s[0]) for s, e in segs)
        assert abs(on - 70.0) < 1e-6

    def test_no_pattern_returns_segments(self):
        pts = [(0.0, 0.0), (5.0, 0.0), (5.0, 5.0)]
        segs = dash_segments(pts, None)
        assert len(segs) == 2

    def test_single_value_pattern(self):
        segs = dash_segments([(0.0, 0.0), (20.0, 0.0)], [5])
        on = sum(abs(e[0] - s[0]) for s, e in segs)
        assert abs(on - 10.0) < 1e-6


class TestBlendRegionLinear:
    def test_full_coverage_premultiplied(self):
        img = np.full((4, 4, 4), 100, np.uint8)
        cov = np.ones((4, 4), np.float32)
        blend_region_linear(img, cov, (1.0, 0.5, 0.0), 0.8)
        # out = c*a^2 + b*(1-a)
        exp_r = 1.0 * 0.64 + (100 / 255) * 0.2
        assert abs(img[2, 2, 0] / 255.0 - exp_r) < 2 / 255
        exp_g = 0.5 * 0.64 + (100 / 255) * 0.2
        assert abs(img[2, 2, 1] / 255.0 - exp_g) < 2 / 255

    def test_zero_coverage_untouched(self):
        img = np.full((4, 4, 4), 77, np.uint8)
        blend_region_linear(img, np.zeros((4, 4), np.float32),
                            (1.0, 1.0, 1.0), 1.0)
        assert (img[..., :3] == 77).all()

    def test_output_in_range(self):
        img = np.full((4, 4, 4), 250, np.uint8)
        cov = np.full((4, 4), 1.0, np.float32)
        blend_region_linear(img, cov, (1.5, 1.5, 1.5), 1.0)
        assert img[..., :3].max() <= 255
