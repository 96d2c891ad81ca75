# MapScene 3D content layers: Buildings, PointCloud, Tiles3D, Labels —
# wired into SceneRecipe -> compile -> render with terrain-depth
# compositing (reference: python/forge3d/map_scene.py LabelLayer :3679,
# PointCloudLayer :3922, BuildingLayer :3943, Tiles3DLayer :4054).

import json
import struct

import numpy as np
import pytest

from forge3d_tpu.mapscene import (
    BuildingLayer,
    LabelLayer,
    MapScene,
    OrbitCamera,
    OutputSpec,
    PointCloudLayer,
    SceneRecipe,
    TerrainSource,
    Tiles3DLayer,
)


def _dem(n=33):
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    return 3.0 * np.sin(x * 0.3) * np.cos(y * 0.25)


def _recipe(layers, n=33, size=(96, 64)):
    return SceneRecipe(
        terrain=TerrainSource(dem=_dem(n)),
        camera=OrbitCamera(phi_deg=225.0, theta_deg=40.0),
        output=OutputSpec(size_px=size),
        layers=layers,
    )


def _render_base(n=33, size=(96, 64)):
    return MapScene(_recipe([], n, size)).render()


def test_building_layer_renders_and_occludes():
    fp = [np.array([[10.0, 10.0], [22.0, 10.0], [22.0, 22.0], [10.0, 22.0]])]
    scene = MapScene(_recipe([BuildingLayer(footprints=fp, heights=[14.0],
                                            color=(0.8, 0.2, 0.2))]))
    frame = scene.render()
    base = _render_base()
    diff = (frame.rgba[..., :3].astype(int)
            - base.rgba[..., :3].astype(int))
    changed = (np.abs(diff).sum(-1) > 12).mean()
    assert 0.005 < changed < 0.6, f"building changed {changed:.3f} of pixels"
    # the building is reddish where drawn
    red_px = (frame.rgba[..., 0].astype(int)
              > frame.rgba[..., 1].astype(int) + 25).sum()
    assert red_px > 20


def test_building_layer_validation():
    scene = MapScene(_recipe([BuildingLayer()]))
    rep = scene.validate()
    assert any(d.code == "layer.buildings" for d in rep.diagnostics)


def test_pointcloud_layer_positions():
    pts = np.stack([
        np.linspace(6, 26, 40),
        np.full(40, 12.0),
        np.linspace(6, 26, 40),
    ], axis=1)
    lay = PointCloudLayer(positions=pts, color=(0.1, 0.9, 0.1), point_size=3)
    frame = MapScene(_recipe([lay])).render()
    base = _render_base()
    diff = np.abs(frame.rgba[..., :3].astype(int)
                  - base.rgba[..., :3].astype(int)).sum(-1)
    assert (diff > 12).sum() > 10


def _pad4(b, pad=b" "):
    return b + pad * ((4 - len(b) % 4) % 4)


def _write_pnts(path, positions, colors=None):
    positions = np.asarray(positions, "<f4")
    pos_b = positions.tobytes()
    ft = {"POINTS_LENGTH": len(positions), "POSITION": {"byteOffset": 0}}
    body = pos_b
    if colors is not None:
        ft["RGB"] = {"byteOffset": len(pos_b)}
        body += np.asarray(colors, np.uint8).tobytes()
    ftj = _pad4(json.dumps(ft, separators=(",", ":")).encode())
    ftb = _pad4(body, b"\x00")
    total = 28 + len(ftj) + len(ftb)
    path.write_bytes(b"pnts" + struct.pack("<IIIIII", 1, total, len(ftj),
                                           len(ftb), 0, 0) + ftj + ftb)


def test_tiles3d_layer_pnts(tmp_path):
    pts = np.stack([
        np.linspace(8, 24, 25),
        np.full(25, 10.0),
        np.linspace(8, 24, 25),
    ], axis=1)
    _write_pnts(tmp_path / "points.pnts", pts,
                np.full((25, 3), 255, np.uint8))
    tileset = {
        "asset": {"version": "1.1"},
        "geometricError": 64,
        "root": {
            "boundingVolume": {"sphere": [16, 10, 16, 30]},
            "geometricError": 0,
            "refine": "ADD",
            "content": {"uri": "points.pnts"},
        },
    }
    (tmp_path / "tileset.json").write_text(json.dumps(tileset))
    lay = Tiles3DLayer(tileset_path=str(tmp_path / "tileset.json"),
                       point_size=3)
    frame = MapScene(_recipe([lay])).render()
    base = _render_base()
    diff = np.abs(frame.rgba[..., :3].astype(int)
                  - base.rgba[..., :3].astype(int)).sum(-1)
    assert (diff > 12).sum() > 10


def test_label_layer_draws_and_occludes():
    labels = [
        {"text": "Summit", "position": (16.0, 16.0), "priority": 2.0},
        {"text": "Camp", "position": (8.0, 24.0)},
    ]
    frame = MapScene(_recipe([LabelLayer(labels=labels)],
                             size=(128, 96))).render()
    base = _render_base(size=(128, 96))
    diff = np.abs(frame.rgba[..., :3].astype(int)
                  - base.rgba[..., :3].astype(int)).sum(-1)
    assert (diff > 30).sum() > 40, "label glyphs not visible"

    # an anchor buried far below the terrain must be occluded away
    hidden = [{"text": "Hidden", "position": (16.0, -200.0, 16.0)}]
    f2 = MapScene(_recipe([LabelLayer(labels=hidden)],
                          size=(128, 96))).render()
    d2 = np.abs(f2.rgba[..., :3].astype(int)
                - base.rgba[..., :3].astype(int)).sum(-1)
    assert (d2 > 30).sum() == 0


def test_label_layer_max_visible_declutters():
    rng = np.random.default_rng(0)
    labels = [{"text": f"L{i}", "position": (float(rng.uniform(8, 24)),
                                             float(rng.uniform(8, 24)))}
              for i in range(30)]
    lay = LabelLayer(labels=labels, max_visible=5)
    frame = MapScene(_recipe([lay], size=(128, 96))).render()
    assert frame.rgba.shape == (96, 128, 4)


def test_combined_layers_render():
    fp = [np.array([[12.0, 12.0], [20.0, 12.0], [20.0, 20.0], [12.0, 20.0]])]
    pts = np.stack([np.linspace(4, 28, 20), np.full(20, 9.0),
                    np.full(20, 26.0)], axis=1)
    layers = [
        BuildingLayer(footprints=fp, heights=[10.0]),
        PointCloudLayer(positions=pts, point_size=2),
        LabelLayer(labels=[{"text": "Town", "position": (16.0, 16.0)}]),
    ]
    frame = MapScene(_recipe(layers, size=(128, 96))).render()
    assert frame.rgba.shape == (96, 128, 4)
    assert np.isfinite(frame.rgba.astype(float)).all()
