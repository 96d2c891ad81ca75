# examples/osm_city_map.py — OSM building footprints -> extruded city map.
#
# Reference analogue: examples/osm_city_demo.py (OSM buildings imported
# and rendered over terrain). Here a small OSM-style GeoJSON of building
# footprints with height tags parses through buildings.parse_osm_buildings
# and renders as a MapScene BuildingLayer with per-feature materials.
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from forge3d_tpu.buildings import parse_osm_buildings  # noqa: E402
from forge3d_tpu.mapscene import (BuildingLayer, MapScene,  # noqa: E402
                                  OrbitCamera, OutputSpec, SceneRecipe,
                                  TerrainSource)

OUT = pathlib.Path(__file__).parent / "out"
OUT.mkdir(exist_ok=True)

OSM = {
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature",
         "properties": {"building": "yes", "height": "18",
                        "building:material": "brick"},
         "geometry": {"type": "Polygon", "coordinates": [[
             [0.0006, 0.0002], [0.0014, 0.0002], [0.0014, 0.0010],
             [0.0006, 0.0010], [0.0006, 0.0002]]]}},
        {"type": "Feature",
         "properties": {"building": "yes", "building:levels": "8"},
         "geometry": {"type": "Polygon", "coordinates": [[
             [0.0018, 0.0012], [0.0026, 0.0012], [0.0026, 0.0022],
             [0.0018, 0.0022], [0.0018, 0.0012]]]}},
        {"type": "Feature",
         "properties": {"building": "yes", "height": "9"},
         "geometry": {"type": "Polygon", "coordinates": [[
             [0.0004, 0.0016], [0.0011, 0.0016], [0.0011, 0.0024],
             [0.0004, 0.0024], [0.0004, 0.0016]]]}},
    ],
}


def main() -> None:
    parsed = parse_osm_buildings(OSM, origin=(0.0, 0.0))
    footprints = [np.asarray(b.footprint) for b in parsed]
    heights = [b.height for b in parsed]
    span = max(float(np.concatenate(footprints).max()), 1.0)
    # normalize into a gentle 8x8 valley DEM's world
    dem = np.zeros((8, 8), np.float32)
    scale = 6.0 / span
    rec = SceneRecipe(
        terrain=TerrainSource(dem=dem, spacing=(1.0, 1.0), z_scale=1.0),
        camera=OrbitCamera(phi_deg=30.0, theta_deg=50.0, fov_y_deg=45.0),
        colormap="viridis",
        output=OutputSpec(size_px=(160, 120)),
        layers=[BuildingLayer(
            footprints=[fp * scale for fp in footprints],
            heights=[h * scale for h in heights],
            materials=["brick", "concrete", "stone"],
            roof_types=["gabled", "flat", "hipped"])],
        camera_mode="screen",
    )
    frame = MapScene(rec).render()
    p = OUT / "osm_city_map.png"
    from forge3d_tpu.io.image import numpy_to_png

    numpy_to_png(p, frame.rgba)
    print(f"parsed {len(parsed)} OSM buildings -> {p}")


if __name__ == "__main__":
    main()
