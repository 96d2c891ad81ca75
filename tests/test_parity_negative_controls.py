# Negative controls for the reference-parity ratchet gates (the
# reference guards its golden gates the same way:
# tests/test_recipe_goldens.py:24-33 rejects a corrupted render).
#
# These tests prove the ratchet mechanics would actually catch a gross
# regression: a visibly-corrupted variant of each committed golden must
# score BELOW the committed floor minus slack, for a sample of recipes
# spanning the score range. No renders needed — pure gate mechanics.

import json
from pathlib import Path

import numpy as np
import pytest

from forge3d_tpu.io.image import png_to_numpy
from forge3d_tpu.utils.metrics import ssim

ROOT = Path(__file__).parent
REF_GOLDENS = Path("/root/reference/tests/golden/recipes")
FAM_ROOT = Path("/root/reference/tests/golden")

RECIPE_BOARD = ROOT / "goldens" / "reference_parity.json"
FAMILY_BOARD = ROOT / "goldens" / "reference_family_parity.json"
RATCHET_SLACK = 0.02

SAMPLE_RECIPES = [
    "mapscene_terrain_raster",       # best on the board
    "mapscene_auto_water",
    "mapscene_thematic_choropleth",
    "mapscene_screen_space_contact",  # worst on the board
]
SAMPLE_FAMILY = {
    "adjudication_raster_reference": FAM_ROOT / "adjudication"
    / "raster_reference.png",
    "terrain_pbr": FAM_ROOT / "terrain" / "terrain_pbr.png",
    "hybrid_mini_dem_reference": FAM_ROOT / "hybrid_terrain"
    / "mini_dem_reference.png",
}


def _corrupt(img01):
    """A gross, render-bug-shaped corruption: shift 8px + invert a band."""
    bad = np.roll(img01, 8, axis=1).copy()
    h = bad.shape[0]
    bad[h // 4: h // 2] = 1.0 - bad[h // 4: h // 2]
    return bad


@pytest.mark.parametrize("scene_id", SAMPLE_RECIPES)
def test_recipe_ratchet_rejects_corruption(scene_id):
    if not RECIPE_BOARD.exists():
        pytest.skip("no committed recipe board")
    board = json.loads(RECIPE_BOARD.read_text())["recipes"]
    if scene_id not in board:
        pytest.skip(f"no committed entry for {scene_id}")
    golden = REF_GOLDENS / f"{scene_id}.png"
    if not golden.exists():
        pytest.skip("reference golden unavailable")
    raw = png_to_numpy(golden)
    peak = 65535.0 if raw.dtype == np.uint16 else 255.0
    ref = raw.astype(np.float32)[..., :3] / peak
    s_bad = float(ssim(ref, _corrupt(ref)))
    floor = board[scene_id]["ssim"] - RATCHET_SLACK
    assert s_bad < floor, (
        f"gate too loose: corrupted render scores {s_bad:.4f} "
        f">= floor {floor:.4f}")


@pytest.mark.parametrize("name", sorted(SAMPLE_FAMILY))
def test_family_ratchet_rejects_corruption(name):
    if not FAMILY_BOARD.exists():
        pytest.skip("no committed family board")
    board = json.loads(FAMILY_BOARD.read_text())["entries"]
    if name not in board:
        pytest.skip(f"no committed entry for {name}")
    golden = SAMPLE_FAMILY[name]
    if not golden.exists():
        pytest.skip("reference golden unavailable")
    ref = png_to_numpy(golden).astype(np.float32)[..., :3] / 255.0
    s_bad = float(ssim(ref, _corrupt(ref)))
    floor = board[name]["ssim"] - RATCHET_SLACK
    assert s_bad < floor


def test_identity_scores_above_every_floor():
    """The golden itself must pass its own gate (sanity: floors are not
    above 1.0 and the metric is reflexive)."""
    board = json.loads(RECIPE_BOARD.read_text())["recipes"]
    for scene_id, entry in board.items():
        golden = REF_GOLDENS / f"{scene_id}.png"
        if not golden.exists():
            continue
        raw = png_to_numpy(golden)
        peak = 65535.0 if raw.dtype == np.uint16 else 255.0
        ref = raw.astype(np.float32)[..., :3] / peak
        assert float(ssim(ref, ref)) > entry["ssim"] - 1e-6


def test_committed_floors_are_reasonable():
    """Every committed recipe floor sits in (0.5, 1.0] — a corrupted
    baseline (e.g. all-zeros committed by accident) would trip this."""
    board = json.loads(RECIPE_BOARD.read_text())["recipes"]
    assert len(board) >= 22
    for scene_id, entry in board.items():
        assert 0.5 < entry["ssim"] <= 1.0, scene_id
        assert 0.0 <= entry["mean_abs_255"] < 30.0, scene_id
