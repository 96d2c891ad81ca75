# Tests: EXR / Radiance HDR / KTX2 formats.

import struct

import numpy as np
import pytest

from forge3d_tpu.io.formats import (FormatError, exr_to_numpy, numpy_to_exr,
                                    read_hdr, read_ktx2, write_hdr)


def test_exr_float_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 100, (24, 31, 3)).astype(np.float32)
    p = tmp_path / "t.exr"
    numpy_to_exr(p, img)
    back, names = exr_to_numpy(p)
    assert names == ("R", "G", "B")
    np.testing.assert_array_equal(back, img)     # FLOAT is lossless


def test_exr_half_and_alpha(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 8, (10, 12, 4)).astype(np.float32)
    p = tmp_path / "h.exr"
    numpy_to_exr(p, img, half=True)
    back, names = exr_to_numpy(p)
    assert names == ("R", "G", "B", "A")
    assert np.abs(back - img).max() < 8 * 2 ** -10  # half precision


def test_exr_single_channel(tmp_path):
    depth = np.linspace(0, 50, 64, dtype=np.float32).reshape(8, 8)
    p = tmp_path / "z.exr"
    numpy_to_exr(p, depth, channel_names=("Z",))
    back, names = exr_to_numpy(p)
    assert names == ("Z",)
    np.testing.assert_array_equal(back, depth)


def test_exr_rejects_garbage(tmp_path):
    p = tmp_path / "bad.exr"
    p.write_bytes(b"not an exr at all")
    with pytest.raises(FormatError):
        exr_to_numpy(p)


def test_hdr_roundtrip_quantization_bound(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 50, (16, 20, 3)).astype(np.float32)
    p = tmp_path / "t.hdr"
    write_hdr(p, img)
    back = read_hdr(p)
    # RGBE: shared exponent => abs error bounded by max-channel / 256
    bound = img.max(-1, keepdims=True) / 128.0 + 1e-6
    assert (np.abs(back - img) <= bound).all()


def test_hdr_dynamic_range(tmp_path):
    img = np.array([[[1e-4, 1e-4, 1e-4], [1e4, 1e4, 1e4]]], np.float32)
    p = tmp_path / "dr.hdr"
    write_hdr(p, img)
    back = read_hdr(p)
    assert back[0, 0, 0] == pytest.approx(1e-4, rel=0.02)
    assert back[0, 1, 0] == pytest.approx(1e4, rel=0.02)


def test_ktx2_parse(tmp_path):
    # hand-build a minimal KTX2: R8G8B8A8_UNORM 4x4, 1 level
    w = h = 4
    pixel = np.arange(w * h * 4, dtype=np.uint8)
    ident = bytes([0xAB, 0x4B, 0x54, 0x58, 0x20, 0x32, 0x30, 0xBB,
                   0x0D, 0x0A, 0x1A, 0x0A])
    header = struct.pack("<9I", 37, 1, w, h, 0, 0, 1, 1, 0)
    header += struct.pack("<2I", 0, 0)          # dfd offset/len (none)
    header += struct.pack("<2I", 0, 0)          # kvd
    header += struct.pack("<2Q", 0, 0)          # sgd
    data_off = 12 + len(header) + 24            # + level index
    level_index = struct.pack("<3Q", data_off, len(pixel.tobytes()),
                              len(pixel.tobytes()))
    p = tmp_path / "t.ktx2"
    p.write_bytes(ident + header + level_index + pixel.tobytes())
    out = read_ktx2(p)
    assert out["vk_format"] == 37
    assert out["width"] == 4 and out["levels"] == 1
    assert out["images"][0].shape == (4, 4, 4)
    np.testing.assert_array_equal(out["images"][0].ravel(), pixel)


def test_ktx2_supercompression_fails_closed(tmp_path):
    ident = bytes([0xAB, 0x4B, 0x54, 0x58, 0x20, 0x32, 0x30, 0xBB,
                   0x0D, 0x0A, 0x1A, 0x0A])
    header = struct.pack("<9I", 37, 1, 4, 4, 0, 0, 1, 1, 1)  # scheme=1
    p = tmp_path / "z.ktx2"
    p.write_bytes(ident + header + b"\0" * 64)
    with pytest.raises(FormatError):
        read_ktx2(p)


def test_ktx2_zstd_supercompression(tmp_path):
    """KHR scheme 2 (zstd): levels inflate to the indexed byte length."""
    import zstandard

    w = h = 4
    pixel = np.arange(w * h * 4, dtype=np.uint8)
    payload = zstandard.ZstdCompressor().compress(pixel.tobytes())
    ident = bytes([0xAB, 0x4B, 0x54, 0x58, 0x20, 0x32, 0x30, 0xBB,
                   0x0D, 0x0A, 0x1A, 0x0A])
    header = struct.pack("<9I", 37, 1, w, h, 0, 0, 1, 1, 2)   # scheme=2
    header += struct.pack("<2I", 0, 0)
    header += struct.pack("<2I", 0, 0)
    header += struct.pack("<2Q", 0, 0)
    data_off = 12 + len(header) + 24
    level_index = struct.pack("<3Q", data_off, len(payload),
                              len(pixel.tobytes()))
    p = tmp_path / "tz.ktx2"
    p.write_bytes(ident + header + level_index + payload)
    out = read_ktx2(p)
    assert out["images"][0].shape == (4, 4, 4)
    np.testing.assert_array_equal(out["images"][0].ravel(), pixel)


def test_ktx2_zstd_truncated_fails_closed(tmp_path):
    """A zstd level whose inflated size mismatches the index must raise."""
    import zstandard

    pixel = np.zeros(4 * 4 * 4, np.uint8)
    payload = zstandard.ZstdCompressor().compress(pixel.tobytes())
    ident = bytes([0xAB, 0x4B, 0x54, 0x58, 0x20, 0x32, 0x30, 0xBB,
                   0x0D, 0x0A, 0x1A, 0x0A])
    header = struct.pack("<9I", 37, 1, 4, 4, 0, 0, 1, 1, 2)
    header += struct.pack("<2I", 0, 0) + struct.pack("<2I", 0, 0)
    header += struct.pack("<2Q", 0, 0)
    data_off = 12 + len(header) + 24
    level_index = struct.pack("<3Q", data_off, len(payload),
                              len(pixel.tobytes()) + 7)   # wrong ulength
    p = tmp_path / "bad.ktx2"
    p.write_bytes(ident + header + level_index + payload)
    with pytest.raises(FormatError):
        read_ktx2(p)
