# examples/picking_and_selection.py — terrain picking + lasso selection.
#
# Reference analogue: examples/pointcloud_viewer_interactive.py +
# src/picking/ (pick-ID queries, heightfield ray query, lasso selection).
# Headless: picks the terrain under a few screen points, then lassoes a
# region of scattered points and reports the selection.
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from forge3d_tpu.camera import PinholeCamera  # noqa: E402
from forge3d_tpu.ops.pyramid import build_pyramid  # noqa: E402
from forge3d_tpu.ops.traversal import scene_from_pyramid  # noqa: E402
from forge3d_tpu.picking import (Selection, lasso_select,  # noqa: E402
                                 pick_terrain)


def main() -> None:
    n = 65
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = (8.0 * np.sin(x * 0.12) * np.cos(y * 0.1)).astype(np.float32)
    pyr = build_pyramid(dem)
    scene, static = scene_from_pyramid(pyr, origin_xz=(0.0, 0.0),
                                       spacing_xz=(1.0, 1.0))
    W, H = 160, 120
    cam = PinholeCamera.from_lookat((32.0, 20.0, 80.0), (32.0, 0.0, 32.0),
                                    fov_y_deg=45.0, aspect=W / H)
    for sx, sy in ((80, 60), (40, 90), (120, 30)):
        r = pick_terrain(scene, static, cam, W, H, sx, sy)
        if r.hit:
            print(f"pick ({sx},{sy}): world {tuple(round(v, 2) for v in r.world)} "
                  f"cell {r.cell} height {r.height:.2f}")
        else:
            print(f"pick ({sx},{sy}): miss (sky)")

    # lasso selection over scattered points
    rng = np.random.default_rng(3)
    pts = rng.uniform(10, 54, size=(200, 2))
    lasso = [(20.0, 20.0), (44.0, 18.0), (46.0, 44.0), (18.0, 42.0)]
    mask = lasso_select(pts, lasso)
    sel = Selection()
    sel.add(np.nonzero(mask)[0])
    print(f"lasso selected {len(sel.ids)} / {len(pts)} points")


if __name__ == "__main__":
    main()
