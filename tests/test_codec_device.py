# F3DZ three-lane byte-identity: C++ native, pure-Python, on-device jax
# (VERDICT r2 item 8; reference proves CPU/GPU page identity in
# benches/f3dz_bench.rs + src/shaders/f3dz_decode.wgsl).

import numpy as np
import pytest

from forge3d_tpu.codec.f3dz import compress_dem, decompress_dem
from forge3d_tpu.codec.f3dz_device import decompress_dem_device
from forge3d_tpu.codec.f3dz_pylane import decompress_dem_pylane


def _corpus():
    rng = np.random.default_rng(11)
    out = {}
    y, x = np.mgrid[0:64, 0:64].astype(np.float32)
    out["smooth"] = 120.0 * np.sin(x * 0.1) * np.cos(y * 0.08)
    out["noisy"] = (40.0 * np.sin(x * 0.05)
                    + 6.0 * rng.standard_normal((64, 64))).astype(np.float32)
    out["flat"] = np.full((64, 64), 7.25, np.float32)
    cliff = np.zeros((128, 128), np.float32)
    cliff[:, 64:] = 500.0
    cliff += rng.standard_normal((128, 128)).astype(np.float32)
    out["cliff"] = cliff
    out["spikes"] = np.where(rng.random((64, 64)) < 0.01,
                             9000.0, 10.0).astype(np.float32)
    return out


@pytest.mark.parametrize("name", sorted(_corpus()))
def test_f3dz_three_lane_byte_identity(name):
    heights = _corpus()[name]
    blob = compress_dem(heights, max_error=0.05)
    a = decompress_dem(blob)            # C++ lane
    b = decompress_dem_pylane(blob)     # independent Python lane
    c = decompress_dem_device(blob)     # on-device jax lane
    assert a.dtype == b.dtype == c.dtype == np.float32
    assert np.array_equal(a, b), "C++ vs Python lane mismatch"
    assert np.array_equal(
        np.asarray(a).view(np.uint32), np.asarray(c).view(np.uint32)), \
        "device lane not byte-identical"
    assert float(np.abs(a - heights).max()) <= 0.05 + 1e-6


def test_f3dz_device_fail_closed_on_corruption():
    heights = _corpus()["smooth"]
    blob = bytearray(compress_dem(heights, max_error=0.1))
    blob[60] ^= 0xFF   # flip a byte inside the first tile record
    from forge3d_tpu.codec.f3dz import F3dzError

    with pytest.raises(F3dzError):
        decompress_dem_device(bytes(blob))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
