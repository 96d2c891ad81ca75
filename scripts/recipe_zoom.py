#!/usr/bin/env python3
"""Write 4x nearest-neighbor upscales of ours vs golden for one recipe."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def up(img, k=4):
    return np.repeat(np.repeat(img, k, axis=0), k, axis=1)


def main():
    import test_reference_golden_parity as harness
    from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
    from forge3d_tpu.mapscene import MapScene

    name = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    os.makedirs("/tmp/diag", exist_ok=True)
    raw = png_to_numpy(harness.REF_GOLDENS / f"{name}.png")
    peak = 65535.0 if raw.dtype == np.uint16 else 255.0
    ref = (raw.astype(np.float32)[..., :3] / peak * 255).astype(np.uint8)
    numpy_to_png(f"/tmp/diag/{name}_golden.png", up(ref, k))
    recipes = harness._recipes()
    frame = MapScene(recipes[name]).render()
    numpy_to_png(f"/tmp/diag/{name}_ours.png", up(frame.rgba[..., :3], k))
    print("wrote", f"/tmp/diag/{name}_{{golden,ours}}.png")


if __name__ == "__main__":
    main()
