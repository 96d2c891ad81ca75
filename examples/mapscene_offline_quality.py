#!/usr/bin/env python
# examples/mapscene_offline_quality.py — print-quality map: Hosek-Wilkie
# sky IBL, water, fog, supersampling, full furniture, plus an exact
# vector overlay computed with the boolean-overlay engine (the
# reference's mapscene_offline_quality.py workflow).
#
# Usage: python examples/mapscene_offline_quality.py [out.png]

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(out_path="mapscene_offline_quality.png"):
    from forge3d_tpu.datasets import dem_spacing, fetch_dem
    from forge3d_tpu.geometry.overlay import boolean_overlay
    from forge3d_tpu.mapscene import (LabelLayer, MapFurniture, MapScene,
                                      OrbitCamera, OutputSpec, SceneRecipe,
                                      TerrainSource, VectorOverlayLayer)

    dem, info = fetch_dem("rainier", size=257)
    sx, sz = dem_spacing(info)
    span = (dem.shape[1] - 1) * sx

    # a "protected area" = union of two exactly-adjacent parcels
    q = span / 8
    parcel_a = [[2 * q, 2 * q], [4 * q, 2 * q], [4 * q, 4 * q], [2 * q, 4 * q]]
    parcel_b = [[4 * q, 2 * q], [6 * q, 2 * q], [6 * q, 4 * q], [4 * q, 4 * q]]
    merged = boolean_overlay([parcel_a], [parcel_b], "union")

    rec = SceneRecipe(
        terrain=TerrainSource(dem=dem, spacing=(sx, sz)),
        camera=OrbitCamera(phi_deg=235, theta_deg=38),
        colormap="terrain",
        water_level=float(np.percentile(dem, 8)),
        fog_density=0.00002,
        output=OutputSpec(size_px=(960, 640), samples=4),
        layers=[
            VectorOverlayLayer(kind="polygons", coordinates=merged,
                               color=(0.85, 0.3, 0.15), opacity=0.35),
            LabelLayer(labels=[
                {"text": "Protected Area",
                 "position": (4 * q, 3 * q), "size": 16},
            ]),
        ],
        furniture=MapFurniture(legend=True, scale_bar=True,
                               north_arrow=True,
                               title="Rainier Analogue",
                               subtitle="offline quality demo",
                               graticule_spacing=span / 6),
        name="offline_quality",
    )
    cert = {}
    MapScene(rec).render(path=out_path, certificate=cert)
    print(f"wrote {out_path}; certificate digest {cert.get('digest', '')[:16]}...")


if __name__ == "__main__":
    main(*sys.argv[1:2])
