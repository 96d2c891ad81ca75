#!/usr/bin/env python
# examples/copc_pointcloud_map.py — build a COPC-layout compressed point
# cloud, stream one octree node, and composite the full cloud over a
# terrain map (the reference's mapscene_copc_points workflow; ref
# src/pointcloud/ + python/forge3d/map_scene.py PointCloudLayer).
#
# Usage: python examples/copc_pointcloud_map.py [out.png]

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(out_path="copc_pointcloud_map.png"):
    from forge3d_tpu.mapscene import (MapScene, OrbitCamera, OutputSpec,
                                      PointCloudLayer, SceneRecipe,
                                      TerrainSource)
    from forge3d_tpu.pointcloud import copc_hierarchy, copc_read_node_points, write_copc

    n = 129
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = 8.0 * np.sin(xx * 0.1) * np.cos(yy * 0.08)

    # synthesize a "lidar" cloud hugging the terrain + some canopy
    rng = np.random.default_rng(12)
    m = 60000
    px = rng.uniform(8, n - 9, m)
    pz = rng.uniform(8, n - 9, m)
    ground = 8.0 * np.sin(px * 0.1) * np.cos(pz * 0.08)
    canopy = rng.uniform(0, 1, m) < 0.25
    py = ground + np.where(canopy, rng.uniform(3, 9, m),
                           rng.uniform(0.0, 0.3, m))
    cols = np.where(canopy[:, None],
                    np.array([[0.15, 0.5, 0.2]]),
                    np.array([[0.55, 0.5, 0.4]]))

    with tempfile.TemporaryDirectory() as d:
        copc = Path(d) / "cloud.copc.laz"
        info = write_copc(copc, np.stack([px, py, pz], 1), colors=cols)
        print(f"COPC: {info['count']} points in {info['nodes']} nodes")
        root = copc_read_node_points(copc, "0-0-0-0")
        print(f"root node: {root.count} points "
              f"(keys: {sorted(copc_hierarchy(copc))[:4]}...)")

        rec = SceneRecipe(
            terrain=TerrainSource(dem=dem),
            camera=OrbitCamera(phi_deg=230, theta_deg=35),
            output=OutputSpec(size_px=(640, 400)),
            layers=[PointCloudLayer(path=str(copc), point_size=2)],
        )
        MapScene(rec).render(path=out_path)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
