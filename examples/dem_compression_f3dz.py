# examples/dem_compression_f3dz.py — error-bounded DEM compression with
# the native F3DZ codec (COMPENDIUM parity).
#
# Reference analogue: src/codec/f3dz (MED prediction + rANS entropy
# coding, paged, CRC, fail-closed) — here the C++ codec under
# forge3d_tpu/codec/native with the same contract, cross-checked by the
# second (pure NumPy) decode lane.
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import forge3d_tpu as f3d  # noqa: E402


def main() -> None:
    n = 512
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    rng = np.random.default_rng(11)
    dem = (900.0 + 220.0 * np.sin(x * 0.015) * np.cos(y * 0.012)
           + 6.0 * rng.standard_normal((n, n))).astype(np.float32)

    for max_err in (1.0, 0.1, 0.01):
        blob = f3d.compress_dem(dem, max_error=max_err)
        back = f3d.decompress_dem(blob)
        err = float(np.abs(back - dem).max())
        ratio = dem.nbytes / len(blob)
        ok = f3d.verify_dem(blob, dem)
        print(f"max_error={max_err:>5}: {len(blob) / 1024:8.1f} KiB "
              f"({ratio:5.2f}x), worst error {err:.4g}, "
              f"verify ok={ok['ok']}")
        assert err <= max_err

    # corrupt one byte: decode fails closed
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 0xFF
    try:
        f3d.decompress_dem(bytes(bad))
        print("ERROR: corrupt bundle decoded")
    except Exception as e:
        print(f"corrupt page refused as expected: {type(e).__name__}")


if __name__ == "__main__":
    main()
