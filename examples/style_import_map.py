# examples/style_import_map.py — Mapbox GL style sheet driving vector
# overlay paint (colors, widths, dashes, expressions).
#
# Reference analogue: examples/luxembourg_rail_overlay.py +
# sample_style.json (style spec import -> styled vector layers).
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from forge3d_tpu.mapscene import (MapScene, OrbitCamera,  # noqa: E402
                                  OutputSpec, SceneRecipe, TerrainSource,
                                  VectorOverlayLayer)
from forge3d_tpu.style import load_style  # noqa: E402

OUT = pathlib.Path(__file__).parent / "out"
OUT.mkdir(exist_ok=True)

STYLE = {
    "version": 8,
    "name": "transport",
    "layers": [
        {"id": "rail", "type": "line",
         "filter": ["==", ["get", "kind"], "rail"],
         "paint": {"line-color": "#d97706",
                   "line-width": ["match", ["get", "gauge"],
                                  "narrow", 2, 4],
                   "line-dasharray": [6, 3]}},
        {"id": "river", "type": "line",
         "filter": ["==", ["get", "kind"], "river"],
         "paint": {"line-color": "rgba(56, 132, 220, 0.9)",
                   "line-width": 5}},
        {"id": "park", "type": "fill",
         "filter": ["==", ["get", "kind"], "park"],
         "paint": {"fill-color": "#22c55e", "fill-opacity": 0.5}},
    ],
}

FEATURES = [
    {"kind": "rail", "gauge": "standard",
     "coords": [[0.4, 0.6], [2.6, 1.4], [5.4, 1.1], [6.8, 2.2]]},
    {"kind": "rail", "gauge": "narrow",
     "coords": [[1.0, 3.0], [3.2, 3.3], [5.8, 2.6]]},
    {"kind": "river",
     "coords": [[0.2, 5.2], [2.0, 4.4], [4.2, 4.8], [6.9, 4.0]]},
    {"kind": "park",
     "coords": [[2.2, 5.2], [4.0, 5.2], [4.0, 6.6], [2.2, 6.6]]},
]


def main() -> None:
    style = load_style(STYLE)
    dem = np.zeros((8, 8), np.float32)
    layers = []
    for feat in FEATURES:
        for sl in style.layers_for(feat, zoom=10.0):
            # the screen window shows world [0, 3.5]^2 (bottom-left
            # quadrant at 2x) — scale the layout in
            coords = np.asarray(feat["coords"]) * 0.5
            if sl.type == "fill":
                color = sl.paint_value("fill-color", feat)
                opacity = float(sl.paint_value("fill-opacity", feat) or 1)
                layers.append(VectorOverlayLayer(
                    kind="polygons", coordinates=[coords],
                    color=tuple(color[:3]), opacity=opacity))
            else:
                color = sl.paint_value("line-color", feat)
                width = float(sl.paint_value("line-width", feat) or 2)
                dash = sl.paint_value("line-dasharray", feat)
                layers.append(VectorOverlayLayer(
                    kind="lines", coordinates=coords,
                    color=tuple(color[:3]), width=width,
                    dash_array=list(dash) if dash else None))
    rec = SceneRecipe(
        terrain=TerrainSource(dem=dem, spacing=(1.0, 1.0), z_scale=1.0),
        camera=OrbitCamera(phi_deg=30.0, theta_deg=55.0, fov_y_deg=45.0),
        colormap="viridis", output=OutputSpec(size_px=(220, 160)),
        layers=layers, camera_mode="screen")
    frame = MapScene(rec).render()
    from forge3d_tpu.io.image import numpy_to_png

    p = OUT / "style_import_map.png"
    numpy_to_png(p, frame.rgba)
    print(f"styled {len(layers)} layers from the sheet -> {p}")


if __name__ == "__main__":
    main()
