# Tests: label engine — SDF atlas, shaping, rendering, collision,
# declutter solvers (greedy vs optimal quality invariant), planning.

import numpy as np
import pytest

from forge3d_tpu.labels import (CollisionGrid, RTree, bake_msdf_atlas,
                                declutter_annealing, declutter_greedy,
                                declutter_optimal, draw_text_rgba,
                                line_label_candidates, plan_labels,
                                point_label_candidates, render_label_overlay,
                                text_shape)


@pytest.fixture(scope="module")
def atlas():
    return bake_msdf_atlas("".join(chr(c) for c in range(32, 127)), px=32)


# ---------------------------------------------------------------------------
# atlas


def test_atlas_deterministic(atlas):
    a2 = bake_msdf_atlas("".join(chr(c) for c in range(32, 127)), px=32)
    assert atlas.fingerprint == a2.fingerprint


def test_atlas_glyph_metrics(atlas):
    g = atlas.glyphs["A"]
    assert g.w > 0 and g.h > 0
    assert g.advance > 0
    # sdf positive somewhere inside the glyph region
    patch = atlas.image[g.y:g.y + g.h, g.x:g.x + g.w]
    assert patch.max() > 1.0
    assert patch.min() < -1.0


def test_sdf_correctness():
    from forge3d_tpu.labels.atlas import signed_distance_field
    mask = np.zeros((21, 21), bool)
    mask[8:13, 8:13] = True  # 5x5 square
    sdf = signed_distance_field(mask, clip=10.0)
    assert sdf[10, 10] == pytest.approx(3.0, abs=0.01)   # center: 3 px from edge
    assert sdf[10, 0] == pytest.approx(-8.0, abs=0.01)   # 8 px outside
    assert sdf[10, 12] == pytest.approx(1.0, abs=0.01)


# ---------------------------------------------------------------------------
# shaping


def test_shape_basic(atlas):
    run = text_shape("Hello", atlas=atlas)
    assert len(run.glyphs) == 5
    assert run.width > 0
    xs = [g.x for g in run.glyphs]
    assert xs == sorted(xs)
    assert run.direction == "ltr"


def test_shape_scaling(atlas):
    r1 = text_shape("Test", atlas=atlas, size=32)
    r2 = text_shape("Test", atlas=atlas, size=64)
    assert r2.width == pytest.approx(2 * r1.width, rel=1e-5)


def test_shape_tracking(atlas):
    r0 = text_shape("mm", atlas=atlas, tracking=0)
    r1 = text_shape("mm", atlas=atlas, tracking=200)
    assert r1.width > r0.width


def test_shape_multiline(atlas):
    r = text_shape("ab\ncd", atlas=atlas)
    assert r.height > atlas.line_height
    assert r.glyphs[2].y < r.glyphs[0].y  # second line lower


def test_shape_rtl():
    atlas = bake_msdf_atlas("abcابت ", px=24)
    run = text_shape("ابت", atlas=atlas)
    assert run.direction == "rtl"


# ---------------------------------------------------------------------------
# rendering


def test_draw_text_visible(atlas):
    img = np.zeros((64, 256, 4), np.uint8)
    draw_text_rgba(img, "Hi!", 10, 40, atlas=atlas, size=32,
                   color=(255, 0, 0, 255))
    assert img[..., 0].max() > 200       # red text present
    assert img[..., 1].max() < 100       # not green
    cov = (img[..., 3] > 0).mean()
    assert 0.005 < cov < 0.5


def test_draw_text_halo(atlas):
    img = np.zeros((64, 128, 4), np.uint8)
    draw_text_rgba(img, "O", 20, 45, atlas=atlas, size=40,
                   color=(255, 255, 255, 255), halo_color=(255, 0, 0, 255),
                   halo_width=3.0)
    # halo ring: red pixels that are not white
    red = (img[..., 0] > 150) & (img[..., 1] < 80)
    white = (img[..., 0] > 200) & (img[..., 1] > 200)
    assert red.sum() > 10
    assert white.sum() > 10


def test_draw_text_rotation(atlas):
    img_h = np.zeros((128, 128, 4), np.uint8)
    img_v = np.zeros((128, 128, 4), np.uint8)
    draw_text_rgba(img_h, "IIIIIIII", 20, 70, atlas=atlas, size=30)
    draw_text_rgba(img_v, "IIIIIIII", 20, 70, atlas=atlas, size=30,
                   rotation_deg=90)
    ys_h, xs_h = np.nonzero(img_h[..., 3])
    ys_v, xs_v = np.nonzero(img_v[..., 3])
    assert np.ptp(xs_h) > np.ptp(ys_h)   # horizontal extent dominates
    assert np.ptp(ys_v) > np.ptp(xs_v)   # rotated: vertical dominates


# ---------------------------------------------------------------------------
# collision


def test_collision_grid():
    g = CollisionGrid(512, 512, cell=64)
    g.insert((10, 10, 50, 30))
    g.insert((400, 400, 460, 420))
    assert g.collides((40, 20, 80, 40))
    assert not g.collides((100, 100, 140, 120))
    assert g.query((0, 0, 512, 512)) == [0, 1]


def test_rtree_matches_bruteforce():
    rng = np.random.default_rng(11)
    boxes = []
    for _ in range(300):
        x, y = rng.uniform(0, 1000, 2)
        w, h = rng.uniform(5, 60, 2)
        boxes.append((x, y, x + w, y + h))
    tree = RTree(boxes)
    for _ in range(30):
        qx, qy = rng.uniform(0, 1000, 2)
        q = (qx, qy, qx + 80, qy + 50)
        brute = sorted(i for i, b in enumerate(boxes)
                       if not (q[2] < b[0] or b[2] < q[0]
                               or q[3] < b[1] or b[3] < q[1]))
        assert tree.query(q) == brute


# ---------------------------------------------------------------------------
# declutter


def _cluster_case():
    # 4 mutually-overlapping boxes with one high-priority winner, plus a
    # disjoint pair that both fit
    boxes = [(0, 0, 10, 10), (5, 5, 15, 15), (2, 2, 12, 12), (8, 0, 18, 10),
             (100, 100, 110, 110), (120, 100, 130, 110)]
    pri = [5.0, 1.0, 1.0, 1.0, 2.0, 2.0]
    return boxes, pri


def test_greedy_picks_winner():
    boxes, pri = _cluster_case()
    r = declutter_greedy(boxes, pri)
    assert 0 in r.chosen and 4 in r.chosen and 5 in r.chosen
    assert r.total_priority == pytest.approx(9.0)


def test_optimal_beats_or_matches_greedy():
    # adversarial: greedy takes the big middle box; optimal takes the two
    # smaller ones on either side
    boxes = [(0, 0, 30, 10), (0, 0, 14, 10), (16, 0, 30, 10)]
    pri = [3.0, 2.0, 2.0]
    g = declutter_greedy(boxes, pri)
    o = declutter_optimal(boxes, pri)
    assert g.total_priority == pytest.approx(3.0)
    assert o.total_priority == pytest.approx(4.0)
    assert o.rationale["optimal"] is True
    assert o.chosen == [1, 2]


def test_annealing_feasible_and_good():
    boxes, pri = _cluster_case()
    r = declutter_annealing(boxes, pri, seed=3, iterations=2000)
    # feasibility: no two chosen overlap
    from forge3d_tpu.labels.collision import boxes_overlap
    for i in r.chosen:
        for j in r.chosen:
            if i < j:
                assert not boxes_overlap(boxes[i], boxes[j])
    assert r.total_priority >= 8.0  # at least near-greedy quality


def test_same_label_exclusive():
    boxes = [(0, 0, 10, 10), (50, 50, 60, 60)]
    r = declutter_optimal(boxes, [1.0, 1.0], labels=[7, 7])
    assert len(r.chosen) == 1


def test_random_optimal_dominates():
    rng = np.random.default_rng(5)
    boxes = []
    for _ in range(40):
        x, y = rng.uniform(0, 200, 2)
        w, h = rng.uniform(10, 50, 2)
        boxes.append((x, y, x + w, y + h))
    pri = list(rng.uniform(0.5, 3.0, 40))
    g = declutter_greedy(boxes, pri)
    o = declutter_optimal(boxes, pri)
    a = declutter_annealing(boxes, pri, seed=1)
    assert o.total_priority >= g.total_priority - 1e-9
    assert o.total_priority >= a.total_priority - 1e-9


# ---------------------------------------------------------------------------
# planning


def test_point_candidates(atlas):
    cands = point_label_candidates(1, "Summit", 100, 100, atlas=atlas)
    assert len(cands) == 8
    pris = [c.priority for c in cands]
    assert pris == sorted(pris, reverse=True)
    assert all(c.width > 0 and c.height > 0 for c in cands)


def test_line_candidates(atlas):
    line = [(0, 0), (400, 0), (400, 300)]
    cands = line_label_candidates(2, "River", line, atlas=atlas, spacing=150)
    assert len(cands) >= 2
    assert any(abs(c.rotation_deg) > 45 for c in cands)   # vertical leg
    assert any(abs(c.rotation_deg) < 45 for c in cands)   # horizontal leg


def test_plan_labels_end_to_end(atlas):
    cands = []
    # 5 anchors in a tight cluster -> some must drop; 2 far away -> placed
    for i, (x, y) in enumerate([(100, 100), (105, 102), (98, 104),
                                (102, 98), (100, 106), (400, 400), (600, 200)]):
        cands += point_label_candidates(i, f"Town{i}", x, y,
                                        priority=1.0 + 0.1 * i, atlas=atlas)
    plan = plan_labels(cands, frame_size=(800, 600), algorithm="optimal")
    placed_ids = {p.label_id for p in plan.placements}
    assert 5 in placed_ids and 6 in placed_ids
    assert len(plan.placements) + len(plan.dropped) == 7
    # overlay renders
    ov = render_label_overlay(800, 600, plan.placements, atlas=atlas)
    assert ov.shape == (600, 800, 4)
    assert (ov[..., 3] > 0).sum() > 50


def test_project_anchors_depth_occlusion():
    from forge3d_tpu.labels.plan import project_anchors
    # orthographic-ish projection matrix: identity clip
    vp = np.eye(4)
    pts = np.array([[0.0, 0.0, 0.5], [0.5, 0.5, 0.9], [2.0, 0.0, 0.5]])
    depth = np.full((100, 100), 0.7, np.float32)
    res = project_anchors(pts, vp, 100, 100, depth)
    assert res[0]["visible"] is True       # depth 0.5 < 0.7
    assert res[1]["visible"] is False      # behind scene depth
    assert res[2]["visible"] is False      # outside clip


def test_curved_text_follows_path():
    """TRUE curved labels: glyphs rotate to the local path tangent."""
    import numpy as np

    from forge3d_tpu.labels.render import draw_text_along_path

    H, W = 96, 192
    img = np.zeros((H, W, 4), np.uint8)
    # half-circle arc
    t = np.linspace(np.pi, 0, 64)
    path = np.stack([96 + 70 * np.cos(t), 80 - 50 * np.sin(t)], 1)
    draw_text_along_path(img, "CURVED", path, size=16.0,
                         color=(255, 255, 255, 255))
    ys, xs = np.nonzero(img[..., 3] > 64)
    assert len(xs) > 50
    # glyphs advance along the rising arc
    assert xs.max() - xs.min() > 40
    # glyphs sit near the arc
    d = np.hypot(xs[:, None] - path[None, :, 0],
                 ys[:, None] - path[None, :, 1]).min(axis=1)
    # baseline sits on the path; ink extends up to ~cap height + curvature
    assert float(d.max()) < 26.0


def test_curved_text_flips_upright_for_rtl_paths():
    import numpy as np

    from forge3d_tpu.labels.render import draw_text_along_path

    img1 = np.zeros((48, 128, 4), np.uint8)
    img2 = np.zeros((48, 128, 4), np.uint8)
    fwd = np.array([[10.0, 24.0], [118.0, 24.0]])
    draw_text_along_path(img1, "AB", fwd, size=14.0)
    draw_text_along_path(img2, "AB", fwd[::-1], size=14.0)
    # both render ink; the flipped path still produces upright text
    assert (img1[..., 3] > 0).any() and (img2[..., 3] > 0).any()
