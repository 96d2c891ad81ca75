#!/usr/bin/env python3
"""Render parity recipes and write ours / reference / diff panels for visual
diagnosis (round-3 fidelity work). Usage:

    JAX_PLATFORMS=cpu python scripts/recipe_diag.py [recipe ...]

Writes /tmp/diag/<recipe>_panel.png (3-wide: ours | golden | 4x abs diff)
and prints SSIM + mean|d| per recipe.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    import test_reference_golden_parity as harness
    from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
    from forge3d_tpu.mapscene import MapScene
    from forge3d_tpu.utils.metrics import ssim

    os.makedirs("/tmp/diag", exist_ok=True)
    recipes = harness._recipes()
    names = sys.argv[1:] or sorted(recipes)
    for name in names:
        if name not in recipes:
            print(f"{name}: unknown recipe")
            continue
        golden = harness.REF_GOLDENS / f"{name}.png"
        if not golden.exists():
            print(f"{name}: no golden")
            continue
        raw = png_to_numpy(golden)
        peak = 65535.0 if raw.dtype == np.uint16 else 255.0
        ref = raw.astype(np.float32)[..., :3] / peak
        frame = MapScene(recipes[name]).render()
        got = frame.rgba[..., :3].astype(np.float32) / 255.0
        if got.shape != ref.shape:
            print(f"{name}: size mismatch {got.shape} vs {ref.shape}")
            continue
        s = float(ssim(ref, got))
        mad = float(np.abs(ref - got).mean() * 255.0)
        diff = np.clip(np.abs(ref - got) * 4.0, 0, 1)
        sep = np.ones((ref.shape[0], 2, 3), np.float32)
        panel = np.concatenate([got, sep, ref, sep, diff], axis=1)
        out = f"/tmp/diag/{name}_panel.png"
        numpy_to_png(out, (panel * 255 + 0.5).astype(np.uint8))
        print(f"{name}: ssim={s:.4f} mad={mad:.2f} -> {out}")


if __name__ == "__main__":
    main()
