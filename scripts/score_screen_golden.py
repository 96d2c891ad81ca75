"""Score the behavior-exact screen-mode replica against the reference's
terrain golden family. Iteration driver for forge3d_tpu/terrain/screen_golden.

Usage: python scripts/score_screen_golden.py [scene ...]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim
from forge3d_tpu.terrain import screen_golden as sg

GOLD = Path("/root/reference/tests/golden/terrain")
OUT = Path("/tmp/screen_golden")
OUT.mkdir(exist_ok=True)


def run(name):
    t0 = time.time()
    img = sg.render_family_scene(name)
    dt = time.time() - t0
    gold = png_to_numpy(GOLD / f"{name}.png")
    s = ssim(gold[..., :3].astype(np.float32) / 255,
             img[..., :3].astype(np.float32) / 255)
    mad = float(np.abs(gold[..., :3].astype(np.float32)
                       - img[..., :3].astype(np.float32)).mean())
    numpy_to_png(OUT / f"{name}_got.png", img)
    diff = np.abs(gold[..., :3].astype(np.int16)
                  - img[..., :3].astype(np.int16)).astype(np.uint8)
    numpy_to_png(OUT / f"{name}_diff.png", diff)
    print(f"{name}: ssim={s:.4f} mad={mad:.3f} ({dt:.1f}s)")
    return s


if __name__ == "__main__":
    names = sys.argv[1:] or list(sg.FAMILY_SCENES)
    for n in names:
        run(n)
