# examples/thematic_choropleth.py — quantile choropleth with a Mapbox GL
# match expression driving fill colors.
#
# Reference analogue: the mapscene_thematic_choropleth recipe golden
# (tests/test_recipe_goldens.py:508) + style_expressions evaluation.
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from forge3d_tpu.mapscene import (MapScene, OrbitCamera,  # noqa: E402
                                  OutputSpec, SceneRecipe, TerrainSource,
                                  VectorOverlayLayer)
from forge3d_tpu.style import evaluate_expression, parse_color  # noqa: E402
from forge3d_tpu.thematic import classify_values  # noqa: E402

OUT = pathlib.Path(__file__).parent / "out"
OUT.mkdir(exist_ok=True)


def main() -> None:
    values = np.array([12.0, 28.0, 57.0, 83.0, 41.0, 66.0], np.float32)
    bins, breaks = classify_values(values, scheme="quantile", k=4)
    classes = np.asarray(bins) + 1          # 1-based classes
    fill_expr = ["match", ["get", "class"],
                 1, "#edf8fb", 2, "#b2e2e2", 3, "#66c2a4", "#238b45"]

    dem = np.zeros((8, 8), np.float32)
    layers = []
    for idx, cls in enumerate(classes.tolist()):
        x0 = 0.3 + (idx % 3) * 1.0
        z0 = 0.4 + (idx // 3) * 1.4
        ring = np.array([[x0, z0], [x0 + 0.8, z0],
                         [x0 + 0.8, z0 + 1.0], [x0, z0 + 1.0]])
        color = parse_color(evaluate_expression(
            fill_expr, {"class": int(cls)}))
        layers.append(VectorOverlayLayer(
            kind="polygons", coordinates=[ring], color=color[:3],
            opacity=0.85))
    rec = SceneRecipe(
        terrain=TerrainSource(dem=dem, spacing=(1.0, 1.0), z_scale=1.0),
        camera=OrbitCamera(phi_deg=30.0, theta_deg=55.0, fov_y_deg=45.0),
        colormap="viridis", output=OutputSpec(size_px=(200, 140)),
        layers=layers, camera_mode="screen")
    frame = MapScene(rec).render()
    from forge3d_tpu.io.image import numpy_to_png

    p = OUT / "thematic_choropleth.png"
    numpy_to_png(p, frame.rgba)
    print(f"classified {len(values)} values, breaks {breaks} -> {p}")


if __name__ == "__main__":
    main()
