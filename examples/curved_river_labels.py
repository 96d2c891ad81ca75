# examples/curved_river_labels.py — curved label text following a river
# polyline over a terrain map.
#
# Reference analogue: curved/line labels of src/labels/ (fuji_labels_demo,
# label_api_truth_basic) — per-glyph placement along the path tangent.
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from forge3d_tpu.labels.render import draw_text_along_path  # noqa: E402
from forge3d_tpu.mapscene import (MapScene, OrbitCamera,  # noqa: E402
                                  OutputSpec, SceneRecipe, TerrainSource,
                                  VectorOverlayLayer)

OUT = pathlib.Path(__file__).parent / "out"
OUT.mkdir(exist_ok=True)


def main() -> None:
    x = np.linspace(0, 1, 16).astype(np.float32)
    xx, yy = np.meshgrid(x, x)
    dem = (0.3 * np.sin(xx * 6) * np.cos(yy * 5) + yy).astype(np.float32)
    W, H = 384, 256
    # river: a sine through world space
    t = np.linspace(0.2, 6.8, 48)
    river = np.stack([t, 3.2 + 1.6 * np.sin(t * 0.9)], 1) * 0.5
    rec = SceneRecipe(
        terrain=TerrainSource(dem=dem, spacing=(1.0, 1.0), z_scale=1.0),
        camera=OrbitCamera(phi_deg=30, theta_deg=55, fov_y_deg=45),
        colormap="viridis", output=OutputSpec(size_px=(W, H)),
        layers=[VectorOverlayLayer(kind="lines", coordinates=river,
                                   color=(0.4, 0.7, 1.0), width=4)],
        camera_mode="screen")
    ms = MapScene(rec)
    frame = ms.render()
    rgba = frame.rgba.copy()
    # project the river to screen and set the label on the same path
    plan = ms.compile_plan()
    path_px = ms._project(plan, river, 0.0)
    draw_text_along_path(rgba, "RIO GRANDE", path_px, size=18.0, offset=60.0,
                         color=(255, 255, 255, 255),
                         halo_color=(10, 30, 60, 230), halo_width=2.0)
    from forge3d_tpu.io.image import numpy_to_png

    p = OUT / "curved_river_labels.png"
    numpy_to_png(p, rgba)
    print(f"curved river label -> {p}")


if __name__ == "__main__":
    main()
