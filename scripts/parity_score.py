#!/usr/bin/env python
# scripts/parity_score.py — render the parity recipes and score them
# against /root/reference/tests/golden/recipes; optionally dump
# side-by-side images to /tmp/parity for inspection.
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import tests.test_reference_golden_parity as P  # noqa: E402
from forge3d_tpu.mapscene import MapScene  # noqa: E402
from forge3d_tpu.io.image import png_to_numpy, numpy_to_png  # noqa: E402
from forge3d_tpu.utils.metrics import ssim  # noqa: E402


def main():
    only = sys.argv[1:] or None
    dump = Path("/tmp/parity")
    dump.mkdir(exist_ok=True)
    for scene_id, recipe in sorted(P._recipes().items()):
        if only and not any(k in scene_id for k in only):
            continue
        golden = P.REF_GOLDENS / f"{scene_id}.png"
        if not golden.exists():
            print(f"{scene_id}: no golden")
            continue
        raw = png_to_numpy(golden)
        peak = 65535.0 if raw.dtype == np.uint16 else 255.0
        ref = raw.astype(np.float32)[..., :3] / peak
        frame = MapScene(recipe).render()
        got = frame.rgba[..., :3].astype(np.float32) / 255.0
        if got.shape != ref.shape:
            print(f"{scene_id}: size mismatch {got.shape} vs {ref.shape}")
            continue
        s = float(ssim(ref, got))
        mad = float(np.abs(ref - got).mean() * 255.0)
        print(f"{scene_id}: ssim {s:.4f}  mean|d| {mad:.2f}")
        f = max(1, 512 // max(ref.shape[1], 1))
        pair = np.concatenate([
            (ref * 255).astype(np.uint8),
            np.full((ref.shape[0], 2, 3), 255, np.uint8),
            (got * 255).astype(np.uint8)], axis=1)
        big = np.repeat(np.repeat(pair, f, 0), f, 1)
        numpy_to_png(dump / f"{scene_id}.png",
                     np.concatenate([big, np.full(big.shape[:2] + (1,), 255,
                                                  np.uint8)], -1))


if __name__ == "__main__":
    main()
