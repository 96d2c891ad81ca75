# Compressed-LAS point codec (codec/laz.py + native/laz.cpp) and the
# COPC-layout container: round-trip exactness, compression, fail-closed
# behavior (corruption, foreign LASzip versions), and the
# copc_read_node_points seam.

import struct

import numpy as np
import pytest

from forge3d_tpu.codec.laz import (
    LazCodecError,
    build_laz_vlr_payload,
    compress_point_records,
    decompress_point_records,
    parse_laz_vlr_payload,
)
from forge3d_tpu.pointcloud import (
    LazUnsupported,
    copc_hierarchy,
    copc_read_node_points,
    read_las_points,
    read_point_file,
    write_copc,
    write_las,
)


def _cloud(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    pos = np.stack([
        100.0 + np.cumsum(rng.normal(0.3, 0.1, n)),
        200.0 + np.cumsum(rng.normal(0.0, 0.2, n)),
        50.0 + 10.0 * np.sin(t * 0.01) + rng.normal(0, 0.05, n),
    ], axis=1)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    inten = rng.uniform(0, 1, n).astype(np.float32)
    cls = rng.integers(0, 10, n).astype(np.uint8)
    return pos, cols, inten, cls


@pytest.mark.parametrize("fmt,rsize", [(0, 20), (1, 28), (2, 26), (3, 34)])
def test_record_roundtrip_exact(fmt, rsize):
    rng = np.random.default_rng(fmt)
    n = 3000
    raw = rng.integers(0, 256, (n, rsize), dtype=np.uint8)
    # make coordinates walk smoothly so the test also exercises the
    # predictive paths (random bytes stress the escape paths)
    xyz = (np.cumsum(rng.integers(-20, 22, (n, 3)), axis=0)
           + 100000).astype("<i4")
    raw[:, :12] = xyz.view(np.uint8)
    blob = compress_point_records(raw.tobytes(), n, fmt, chunk_size=1000)
    back = decompress_point_records(blob, n, fmt, chunk_size=1000)
    assert back == raw.tobytes()


def test_compression_beats_raw_on_coherent_data():
    pos, cols, inten, cls = _cloud(20000)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        las = write_las(d + "/a.las", pos, colors=cols, intensity=inten,
                        classification=cls, compress=False)
        laz = write_las(d + "/a.laz", pos, colors=cols, intensity=inten,
                        classification=cls, compress=True)
    assert laz["compressed"] and not las["compressed"]
    assert laz["bytes"] < las["bytes"] * 0.7, (laz["bytes"], las["bytes"])


def test_write_read_laz_roundtrip(tmp_path):
    pos, cols, inten, cls = _cloud(8000)
    write_las(tmp_path / "c.laz", pos, colors=cols, intensity=inten,
              classification=cls, compress=True)
    buf = read_point_file(tmp_path / "c.laz")
    assert buf.count == 8000
    # positions quantized to the 1mm scale grid
    assert np.abs(buf.positions - pos).max() < 0.002
    assert np.abs(buf.colors - cols).max() < 2 / 255
    assert (buf.classification == cls).all()
    assert np.abs(buf.intensity - inten).max() < 1e-3


def test_corrupt_stream_fails_closed(tmp_path):
    pos, cols, _, _ = _cloud(4000)
    write_las(tmp_path / "c.laz", pos, colors=cols, compress=True)
    data = bytearray((tmp_path / "c.laz").read_bytes())
    data[600] ^= 0xFF  # flip a bit inside the compressed stream
    (tmp_path / "bad.laz").write_bytes(bytes(data))
    with pytest.raises(LazUnsupported):
        read_point_file(tmp_path / "bad.laz")


def test_foreign_laszip_versions_fail_closed(tmp_path):
    pos, _, _, _ = _cloud(1000)
    write_las(tmp_path / "c.laz", pos, compress=True)
    data = bytearray((tmp_path / "c.laz").read_bytes())
    # rewrite the LAZ VLR item versions to genuine LASzip v2
    payload_off = 227 + 54
    n_items_off = payload_off + 32
    (n_items,) = struct.unpack_from("<H", data, n_items_off)
    for i in range(n_items):
        struct.pack_into("<H", data, n_items_off + 2 + 6 * i + 4, 2)
    (tmp_path / "foreign.laz").write_bytes(bytes(data))
    with pytest.raises(LazUnsupported, match="fail-closed|LASzip"):
        read_point_file(tmp_path / "foreign.laz")


def test_vlr_payload_roundtrip():
    payload = build_laz_vlr_payload(3, chunk_size=12345)
    meta = parse_laz_vlr_payload(payload)
    assert meta["compressor"] == 2
    assert meta["chunk_size"] == 12345
    assert [i["type"] for i in meta["items"]] == [6, 7, 8]
    assert not meta["foreign"]


def test_copc_container_roundtrip(tmp_path):
    pos, cols, _, _ = _cloud(30000, seed=3)
    out = write_copc(tmp_path / "c.copc.laz", pos, colors=cols,
                     leaf_size=4096, max_depth=4)
    assert out["nodes"] >= 2
    hier = copc_hierarchy(tmp_path / "c.copc.laz")
    assert "0-0-0-0" in hier and len(hier) == out["nodes"]

    root = copc_read_node_points(tmp_path / "c.copc.laz", "0-0-0-0")
    assert 0 < root.count <= 4096
    # every stored node decodes, and together they cover all points
    total = 0
    for key in hier:
        buf = copc_read_node_points(tmp_path / "c.copc.laz", key)
        total += buf.count
        assert np.isfinite(buf.positions).all()
    assert total == 30000

    with pytest.raises(Exception, match="not present"):
        copc_read_node_points(tmp_path / "c.copc.laz", "9-9-9-9")


def test_copc_trailer_missing_fails_closed(tmp_path):
    pos, _, _, _ = _cloud(2000)
    write_copc(tmp_path / "c.copc.laz", pos)
    data = (tmp_path / "c.copc.laz").read_bytes()[:-4]  # strip trailer
    (tmp_path / "broken.laz").write_bytes(data)
    with pytest.raises(LazUnsupported):
        copc_hierarchy(tmp_path / "broken.laz")
