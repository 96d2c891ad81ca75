# Per-command IPC contract (reference: src/viewer/ipc/protocol/request.rs
# 78 variants, SURVEY A.5): every wire command must dispatch (never
# "unknown cmd") and respond with a structured {"ok": ...} JSON object —
# hostile or empty payloads produce {"ok": False, "error": ...}, never an
# unhandled exception or a hang.

import json
import re

import numpy as np
import pytest

from forge3d_tpu.viewer.server import ViewerServer

#: the reference's full request-variant list (SURVEY A.5)
VARIANTS = """AddCallout AddCurvedLabel AddLabel AddLineLabel AddVectorOverlay
ApplySceneVariant CamLookat ClearLabels ClearPointCloud ClearSelection
ClearTerrainScatter Close GetActiveSceneVariant GetLassoState GetOitMode
GetStats GetTaaStatus GetTerrainParams GetTerrainVolumetricsReport
ListOverlays ListReviewLayers ListSceneVariants ListVectorOverlays LitIbl
LitSun LoadBundle LoadGltf LoadLabelAtlas LoadObj LoadOverlay
LoadPointCloud LoadTerrain PickAt PollPendingBundleLoad
PollPendingBundleSave PollPickEvents RemoveCallout RemoveLabel
RemoveOverlay RemoveVectorOverlay SaveBundle SetDeclutterAlgorithm SetFov
SetGlobalOverlayOpacity SetGlobalVectorOverlayOpacity SetLabelTypography
SetLabelZoom SetLabelsEnabled SetLassoMode SetMaxVisibleLabels
SetObservation SetOitEnabled SetOverlayOpacity SetOverlayPreserveColors
SetOverlaySolid SetOverlayVisible SetOverlaysEnabled SetPointCloudParams
SetReviewLayerVisible SetSceneReviewState SetTaaEnabled SetTaaParams
SetTerrain SetTerrainCamera SetTerrainPbr SetTerrainScatter SetTerrainSun
SetTransform SetVectorOverlayOpacity SetVectorOverlayVisible
SetVectorOverlaysEnabled SetZScale Snapshot UpdateLabels""".split()


def snake(name: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


@pytest.fixture(scope="module")
def server():
    s = ViewerServer(port=0)
    yield s
    try:
        s.handle_json(json.dumps({"cmd": "close"}))
    except Exception:
        pass


@pytest.mark.parametrize("variant", VARIANTS)
def test_variant_dispatches_and_responds_structured(server, variant):
    cmd = snake(variant)
    if cmd in ("close", "snapshot"):
        pytest.skip("lifecycle/render commands exercised separately")
    resp = server.handle_json(json.dumps({"cmd": cmd}))
    assert isinstance(resp, dict) and "ok" in resp
    if not resp["ok"]:
        err = resp.get("error", "")
        assert "unknown cmd" not in err, f"{cmd} not wired"


def test_unknown_cmd_is_reported(server):
    resp = server.handle_json(json.dumps({"cmd": "does_not_exist"}))
    assert resp == {"ok": False, "error": "unknown cmd: does_not_exist"}


def test_bad_json_is_reported(server):
    resp = server.handle_json("{not json")
    assert resp["ok"] is False and "bad json" in resp["error"]


def test_missing_cmd_is_reported(server):
    resp = server.handle_json(json.dumps({"nope": 1}))
    assert resp == {"ok": False, "error": "missing cmd"}


def test_non_string_cmd_is_reported(server):
    resp = server.handle_json(json.dumps({"cmd": 7}))
    assert resp == {"ok": False, "error": "missing cmd"}


def test_set_then_get_roundtrip(server):
    assert server.handle_json(json.dumps(
        {"cmd": "set_z_scale", "value": 2.5}))["ok"]
    params = server.handle_json(json.dumps({"cmd": "get_terrain_params"}))
    assert params["ok"]
    assert params["params"]["z_scale"] == 2.5


def test_terrain_load_and_stats(server, tmp_path):
    from forge3d_tpu.gis.geotiff import write_raster

    dem = (np.outer(np.linspace(0, 1, 16, dtype=np.float32),
                    np.linspace(0, 1, 16, dtype=np.float32)))
    path = str(tmp_path / "dem.tif")
    write_raster(path, dem)
    r = server.handle_json(json.dumps({"cmd": "load_terrain",
                                       "path": path}))
    assert r["ok"], r
    stats = server.handle_json(json.dumps({"cmd": "get_stats"}))
    assert stats["ok"]


def test_hostile_payload_types_never_crash(server):
    hostile = [
        {"cmd": "set_fov", "fov_y_deg": "NaN-string"},
        {"cmd": "set_z_scale", "z_scale": None},
        {"cmd": "cam_lookat", "eye": [1, 2], "target": "x"},
        {"cmd": "set_terrain_sun", "azimuth_deg": [1, 2, 3]},
        {"cmd": "add_label", "text": 42},
        {"cmd": "load_obj", "path": "/nonexistent/x.obj"},
        {"cmd": "load_point_cloud", "path": "/dev/null"},
        {"cmd": "pick_at", "x": -5, "y": 1e9},
    ]
    for req in hostile:
        resp = server.handle_json(json.dumps(req))
        assert isinstance(resp, dict) and "ok" in resp
