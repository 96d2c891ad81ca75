# Tests: F3DZ codec — error bound, determinism, fail-closed decode, ratio.

import numpy as np
import pytest

from forge3d_tpu.codec import (F3dzError, compress_dem, decompress_dem,
                               f3dz_info, verify_dem)


def _dem(n=300, m=211, seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:n, 0:m].astype(np.float32)
    dem = (800 * np.sin(x * 0.01) * np.cos(y * 0.013)
           + 90 * np.sin(x * 0.07 + 1) + rng.normal(0, 2.0, (n, m)))
    return dem.astype(np.float32)


def test_roundtrip_error_bound():
    dem = _dem()
    for max_err in (0.01, 0.1, 1.0):
        blob = compress_dem(dem, max_err)
        rec = decompress_dem(blob)
        assert rec.shape == dem.shape
        assert np.abs(rec - dem).max() <= max_err + 1e-6


def test_deterministic_bytes():
    dem = _dem(seed=4)
    assert compress_dem(dem, 0.1) == compress_dem(dem.copy(), 0.1)


def test_compression_ratio_smooth_terrain():
    dem = _dem()
    rep = verify_dem(compress_dem(dem, 0.1), dem)
    assert rep["ok"]
    assert rep["compression_ratio"] > 3.0   # smooth DEM compresses well
    assert rep["max_abs_error"] <= 0.1 + 1e-6


def test_multi_tile():
    dem = _dem(n=600, m=530, seed=2)  # spans multiple 256-tiles
    blob = compress_dem(dem, 0.05)
    rec = decompress_dem(blob)
    assert np.abs(rec - dem).max() <= 0.05 + 1e-6


def test_info():
    dem = _dem(64, 48)
    blob = compress_dem(dem, 0.25)
    info = f3dz_info(blob)
    assert info["width"] == 48 and info["height"] == 64
    assert info["max_error"] == pytest.approx(0.25)


def test_fail_closed_corruption():
    dem = _dem(128, 128)
    blob = bytearray(compress_dem(dem, 0.1))
    blob[len(blob) // 2] ^= 0xFF   # flip a payload byte -> CRC mismatch
    with pytest.raises(F3dzError):
        decompress_dem(bytes(blob))


def test_fail_closed_truncation():
    dem = _dem(128, 128)
    blob = compress_dem(dem, 0.1)
    with pytest.raises(F3dzError):
        decompress_dem(blob[: len(blob) - 10])
    with pytest.raises(F3dzError):
        decompress_dem(b"not an f3dz stream")


def test_refuses_nan():
    dem = _dem(32, 32)
    dem[3, 3] = np.nan
    with pytest.raises(F3dzError):
        compress_dem(dem, 0.1)


def test_refuses_bad_error():
    with pytest.raises(F3dzError):
        compress_dem(_dem(16, 16), 0.0)


def test_extreme_values():
    # large dynamic range with escape tokens
    rng = np.random.default_rng(9)
    dem = rng.uniform(-8000, 8000, (100, 100)).astype(np.float32)
    blob = compress_dem(dem, 0.5)
    rec = decompress_dem(blob)
    assert np.abs(rec - dem).max() <= 0.5 + 1e-5


def test_flat_dem():
    dem = np.full((200, 200), 123.25, np.float32)
    blob = compress_dem(dem, 0.01)
    assert len(blob) < 2000   # near-zero entropy
    rec = decompress_dem(blob)
    assert np.abs(rec - dem).max() <= 0.01 + 1e-6


# ---------------------------------------------------------------------------
# BC texture codecs


def _ssim(a, b):
    from tests._ssim import ssim  # type: ignore
    return ssim(a, b)


def test_bc7_roundtrip_fidelity():
    from forge3d_tpu.codec.bc import decode_bc7, encode_bc7_rgba8
    rng = np.random.default_rng(0)
    # smooth-ish natural image: gradients + low-freq noise
    y, x = np.mgrid[0:64, 0:96].astype(np.float32)
    img = np.stack([
        128 + 100 * np.sin(x * 0.05),
        128 + 100 * np.cos(y * 0.07),
        80 + 60 * np.sin((x + y) * 0.04),
        np.full_like(x, 255)], -1)
    img = np.clip(img + rng.normal(0, 4, img.shape), 0, 255).astype(np.uint8)
    blocks = encode_bc7_rgba8(img)
    assert len(blocks) == (96 // 4) * (64 // 4) * 16
    dec = decode_bc7(blocks, 96, 64)
    err = np.abs(dec.astype(np.int32) - img.astype(np.int32))
    assert err.mean() < 3.0
    assert err.max() < 40


def test_bc7_deterministic():
    from forge3d_tpu.codec.bc import encode_bc7_rgba8
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 32, 4), np.uint8)
    assert encode_bc7_rgba8(img) == encode_bc7_rgba8(img.copy())


def test_bc5_normal_fidelity():
    from forge3d_tpu.codec.bc import decode_bc5, encode_bc5_rg8
    # realistic smooth normal map derived from a heightfield
    y, x = np.mgrid[0:48, 0:48].astype(np.float32)
    h = 10 * np.sin(x * 0.09) * np.cos(y * 0.08) + 3 * np.sin(x * 0.17)
    gx = np.gradient(h, axis=1)
    gy = np.gradient(h, axis=0)
    n = np.stack([-gx, -gy, np.ones_like(h)], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    rg = ((n[..., :2] * 0.5 + 0.5) * 255 + 0.5).astype(np.uint8)
    dec = decode_bc5(encode_bc5_rg8(rg), 48, 48)
    xy = dec.astype(np.float32) / 255.0 * 2 - 1
    z = np.sqrt(np.clip(1 - xy[..., 0] ** 2 - xy[..., 1] ** 2, 0, 1))
    recon = np.concatenate([xy, z[..., None]], -1)
    recon /= np.linalg.norm(recon, axis=-1, keepdims=True)
    dot = np.clip((recon * n).sum(-1), -1, 1)
    ang = np.degrees(np.arccos(dot))
    assert ang.mean() < 1.0, ang.mean()
    assert ang.max() < 4.0, ang.max()


def test_bc5_flat_exact():
    from forge3d_tpu.codec.bc import decode_bc5, encode_bc5_rg8
    img = np.full((8, 8, 2), 177, np.uint8)
    dec = decode_bc5(encode_bc5_rg8(img), 8, 8)
    np.testing.assert_array_equal(dec, img)


def test_f3dz_second_lane_byte_identity():
    """Independent Python decode lane must agree with the native decoder
    BYTE-IDENTICALLY (the reference's CPU/GPU byte-identity evidence,
    src/codec/f3dz/mod.rs:1-12 + benches/f3dz_bench.rs)."""
    import numpy as np

    from forge3d_tpu.codec import compress_dem, decompress_dem
    from forge3d_tpu.codec.f3dz_pylane import decompress_dem_pylane

    rng = np.random.default_rng(9)
    corpora = [
        rng.normal(0, 50, (130, 97)).astype(np.float32),
        (np.outer(np.linspace(0, 900, 300), np.ones(280))
         + rng.normal(0, 5, (300, 280))).astype(np.float32),
        np.zeros((64, 64), np.float32),
    ]
    for heights in corpora:
        blob = compress_dem(heights, max_error=0.02)
        a = decompress_dem(blob)
        b = decompress_dem_pylane(blob)
        assert a.tobytes() == b.tobytes(), "decode lanes diverge"


def test_f3dz_second_lane_fails_closed():
    import numpy as np
    import pytest as _pytest

    from forge3d_tpu.codec import F3dzError, compress_dem
    from forge3d_tpu.codec.f3dz_pylane import decompress_dem_pylane

    blob = bytearray(compress_dem(
        np.random.default_rng(1).normal(0, 10, (80, 80)).astype(np.float32),
        max_error=0.1))
    blob[60] ^= 0xFF
    with _pytest.raises(F3dzError):
        decompress_dem_pylane(bytes(blob))
