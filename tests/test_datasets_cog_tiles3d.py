# Tests: datasets registry, COG range reader (file + HTTP), 3D Tiles.

import json
import struct
import threading

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# datasets


def test_fetch_dem_deterministic(tmp_path, monkeypatch):
    monkeypatch.setenv("FORGE3D_DATA_DIR", str(tmp_path))
    from forge3d_tpu.datasets import dataset_names, fetch_dem

    assert "rainier" in dataset_names()
    dem1, info1 = fetch_dem("rainier", size=128)
    dem2, info2 = fetch_dem("rainier", size=128)
    np.testing.assert_array_equal(dem1, dem2)
    assert info1["cached"] is False and info2["cached"] is True
    assert dem1.shape == (128, 128)
    # a volcano: peak well above the rim
    assert dem1.max() > dem1.mean() + 800


def test_fetch_dem_corrupt_cache_regenerates(tmp_path, monkeypatch):
    monkeypatch.setenv("FORGE3D_DATA_DIR", str(tmp_path))
    from forge3d_tpu.datasets import fetch_dem

    dem1, info1 = fetch_dem("dunes", size=64)
    p = tmp_path / "dunes_64.tif"
    p.write_bytes(p.read_bytes()[:-20] + b"\0" * 20)
    dem2, info2 = fetch_dem("dunes", size=64)
    assert info2["cached"] is False
    np.testing.assert_array_equal(dem1, dem2)


def test_unknown_dataset():
    from forge3d_tpu.datasets import dataset_info

    with pytest.raises(KeyError):
        dataset_info("atlantis")


def test_mini_dem():
    from forge3d_tpu.datasets import mini_dem

    dem = mini_dem()
    assert dem.shape == (129, 129)
    assert np.isfinite(dem).all()


# ---------------------------------------------------------------------------
# COG range reader


@pytest.fixture()
def sample_tif(tmp_path):
    from forge3d_tpu.gis.geotiff import write_raster

    rng = np.random.default_rng(0)
    arr = (100 + 50 * np.sin(np.arange(300)[:, None] * 0.1)
           + rng.normal(0, 1, (300, 250))).astype(np.float32)
    p = tmp_path / "dem.tif"
    write_raster(p, arr, compress="deflate")
    return p, arr


def test_cog_file_window(sample_tif):
    from forge3d_tpu.gis.cog import CogReader

    p, arr = sample_tif
    r = CogReader(str(p))
    assert (r.height, r.width) == arr.shape
    win = r.read_window(40, 100, 60, 80)
    np.testing.assert_allclose(win, arr[100:180, 40:100], atol=1e-6)
    st = r.stats()
    # windowed read must NOT fetch the whole file
    assert st["bytes_fetched"] < p.stat().st_size
    r.close()


def test_cog_window_bounds(sample_tif):
    from forge3d_tpu.gis.cog import CogError, CogReader

    p, arr = sample_tif
    r = CogReader(str(p))
    with pytest.raises(CogError):
        r.read_window(200, 0, 100, 10)
    r.close()


def test_cog_http_range(sample_tif):
    import functools
    import http.server
    import socketserver

    from forge3d_tpu.gis.cog import read_cog

    p, arr = sample_tif

    class RangeHandler(http.server.SimpleHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            data = p.read_bytes()
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                start, end = rng[6:].split("-")
                start, end = int(start), int(end)
                chunk = data[start:end + 1]
                self.send_response(206)
                self.send_header("Content-Range",
                                 f"bytes {start}-{end}/{len(data)}")
                self.send_header("Content-Length", str(len(chunk)))
                self.end_headers()
                self.wfile.write(chunk)
            else:
                self.send_response(200)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

    with socketserver.TCPServer(("127.0.0.1", 0), RangeHandler) as httpd:
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            win = read_cog(f"http://127.0.0.1:{port}/dem.tif",
                           (10, 20, 50, 40))
            np.testing.assert_allclose(win, arr[20:60, 10:60], atol=1e-6)
        finally:
            httpd.shutdown()


def test_cog_http_no_range_fallback(sample_tif):
    import http.server
    import socketserver

    from forge3d_tpu.gis.cog import CogReader

    p, arr = sample_tif

    class NoRangeHandler(http.server.SimpleHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            data = p.read_bytes()
            self.send_response(200)       # ignores Range
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    with socketserver.TCPServer(("127.0.0.1", 0), NoRangeHandler) as httpd:
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            r = CogReader(f"http://127.0.0.1:{port}/dem.tif")
            win = r.read_window(0, 0, 20, 20)
            np.testing.assert_allclose(win, arr[:20, :20], atol=1e-6)
            assert r.stats()["range_supported"] is False
        finally:
            httpd.shutdown()


def test_cog_corrupt_fails_closed(tmp_path, sample_tif):
    from forge3d_tpu.gis.cog import CogError, CogReader

    p, arr = sample_tif
    raw = bytearray(p.read_bytes())
    raw[len(raw) // 2:] = b"\0" * (len(raw) - len(raw) // 2)  # zero the tail
    bad = tmp_path / "bad.tif"
    bad.write_bytes(bytes(raw))
    r = CogReader(str(bad))
    with pytest.raises((CogError, Exception)):
        r.read_window(0, 200, 250, 100)


# ---------------------------------------------------------------------------
# 3D Tiles


def _tileset_doc():
    return {
        "asset": {"version": "1.1"},
        "geometricError": 500,
        "root": {
            "boundingVolume": {"sphere": [0, 0, 0, 100]},
            "geometricError": 200,
            "refine": "REPLACE",
            "content": {"uri": "root.b3dm"},
            "children": [
                {"boundingVolume": {"sphere": [-50, 0, 0, 50]},
                 "geometricError": 20,
                 "content": {"uri": "left.b3dm"},
                 "children": [
                     {"boundingVolume": {"sphere": [-50, 0, 0, 25]},
                      "geometricError": 0,
                      "content": {"uri": "left_hi.b3dm"}}]},
                {"boundingVolume": {"sphere": [50, 0, 0, 50]},
                 "geometricError": 20,
                 "content": {"uri": "right.b3dm"}},
            ],
        },
    }


def test_tileset_traversal(tmp_path):
    from forge3d_tpu.tiles3d import load_tileset, select_tiles

    p = tmp_path / "tileset.json"
    p.write_text(json.dumps(_tileset_doc()))
    ts = load_tileset(p)
    assert ts.root.geometric_error == 200
    assert len(ts.root.children) == 2

    # far away: root only
    far = select_tiles(ts, (0, 0, 1e6), sse_threshold=16)
    assert [t.content_uri for t in far] == ["root.b3dm"]
    # close to the left child: refine into children; the near-left leaf
    # refines deeper than the right
    near = select_tiles(ts, (-60, 0, 120), sse_threshold=16)
    uris = [t.content_uri for t in near]
    assert "left_hi.b3dm" in uris
    assert "right.b3dm" in uris
    assert "root.b3dm" not in uris   # REPLACE refinement drops the parent


def test_decode_pnts():
    from forge3d_tpu.tiles3d import decode_pnts

    n = 10
    pos = np.arange(n * 3, dtype="<f4").reshape(n, 3)
    rgb = np.full((n, 3), 200, np.uint8)
    ftj = json.dumps({"POINTS_LENGTH": n,
                      "POSITION": {"byteOffset": 0},
                      "RGB": {"byteOffset": n * 12},
                      "RTC_CENTER": [100.0, 0.0, 0.0]}).encode()
    pad = (8 - len(ftj) % 8) % 8
    ftj += b" " * pad
    ftb = pos.tobytes() + rgb.tobytes()
    total = 28 + len(ftj) + len(ftb)
    blob = (b"pnts" + struct.pack("<6I", 1, total, len(ftj), len(ftb), 0, 0)
            + ftj + ftb)
    out = decode_pnts(blob)
    assert out["count"] == n
    np.testing.assert_allclose(out["positions"][:, 0],
                               pos[:, 0] + 100.0, atol=1e-5)
    np.testing.assert_allclose(out["colors"], 200 / 255.0, atol=1e-6)


def test_decode_b3dm(tmp_path):
    from forge3d_tpu.tiles3d import decode_b3dm

    # build a minimal GLB
    posd = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], "<f4")
    gltf = {"asset": {"version": "2.0"},
            "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
            "accessors": [{"bufferView": 0, "componentType": 5126,
                           "count": 3, "type": "VEC3"}],
            "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": 36}],
            "buffers": [{"byteLength": 36}]}
    js = json.dumps(gltf).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    binc = posd.tobytes()
    glb = (struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + 8 + len(binc))
           + struct.pack("<II", len(js), 0x4E4F534A) + js
           + struct.pack("<II", len(binc), 0x004E4942) + binc)
    ftj = json.dumps({"BATCH_LENGTH": 0}).encode()
    ftj += b" " * ((8 - len(ftj) % 8) % 8)
    total = 28 + len(ftj) + len(glb)
    blob = (b"b3dm" + struct.pack("<6I", 1, total, len(ftj), 0, 0, 0)
            + ftj + glb)
    out = decode_b3dm(blob)
    assert len(out["meshes"]) == 1
    np.testing.assert_allclose(out["meshes"][0].vertices, posd, atol=1e-6)


def test_bad_magic():
    from forge3d_tpu.tiles3d import Tiles3dError, decode_pnts

    with pytest.raises(Tiles3dError):
        decode_pnts(b"nope" + b"\0" * 100)
