# Screen camera mode: the reference's default MapScene framing — the DEM
# fills the frame orthographically (terrain_pbr_pom.wgsl vs_main screen
# branch) and the camera only drives lighting. Composes vector overlays,
# labels and full map furniture.
#
# Run: python examples/screen_mode_map.py [out.png]

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from forge3d_tpu.mapscene import (LabelLayer, MapFurniture, MapScene,
                                  OrbitCamera, OutputSpec, SceneRecipe,
                                  TerrainSource, VectorOverlayLayer)


def main(out_path="examples/out/screen_mode_map.png"):
    n = 129
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = (30.0 * np.sin(xx * 0.05) * np.cos(yy * 0.04)
           + 8.0 * np.sin(xx * 0.17)).astype(np.float32)
    route = np.stack([np.linspace(10, 118, 32),
                      64 + 30 * np.sin(np.linspace(0, 3.0, 32))], axis=1)
    recipe = SceneRecipe(
        terrain=TerrainSource(dem=dem, spacing=(30.0, 30.0), z_scale=1.0),
        camera=OrbitCamera(phi_deg=135.0, theta_deg=30.0),
        colormap="terrain",
        camera_mode="screen",
        layers=[
            VectorOverlayLayer(kind="lines", coordinates=route * 30.0,
                               color=(0.95, 0.3, 0.2), width=3),
            LabelLayer(labels=[
                {"text": "Summit", "position": (40.0 * 30, 28.0 * 30)},
                {"text": "Pass", "position": (90.0 * 30, 80.0 * 30)},
            ]),
        ],
        furniture=MapFurniture(legend=True, scale_bar=True,
                               north_arrow=True, title="Screen-Mode Map",
                               graticule_spacing=900.0),
        output=OutputSpec(size_px=(640, 480)),
    )
    frame = MapScene(recipe).render()
    import os

    os.makedirs("examples/out", exist_ok=True)
    from forge3d_tpu.io.image import numpy_to_png

    numpy_to_png(out_path, frame.rgba)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
