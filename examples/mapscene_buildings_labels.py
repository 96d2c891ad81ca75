#!/usr/bin/env python
# examples/mapscene_buildings_labels.py — extruded buildings + decluttered
# labels composited over a rendered terrain (the reference's
# mapscene_buildings_labels.py workflow).

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(out_path="mapscene_buildings_labels.png"):
    import forge3d_tpu as f3d
    from forge3d_tpu.buildings import Building, buildings_to_mesh
    from forge3d_tpu.labels import (bake_msdf_atlas, plan_labels,
                                    point_label_candidates,
                                    render_label_overlay)
    from forge3d_tpu.pt.hybrid import build_hybrid_scene, hybrid_render

    n = 65
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = 2.0 * np.sin(x * 0.15) * np.cos(y * 0.12)

    rng = np.random.default_rng(4)
    buildings = []
    for i in range(14):
        cx, cz = rng.uniform(14, 50, 2)
        w, d = rng.uniform(1.5, 4.0, 2)
        buildings.append(Building(
            footprint=np.array([[cx - w, cz - d], [cx + w, cz - d],
                                [cx + w, cz + d], [cx - w, cz + d]]),
            height=float(rng.uniform(3, 14)), base=2.5, id=f"b{i}"))
    mesh = buildings_to_mesh(buildings)

    scene = build_hybrid_scene(heightmap=dem, mesh_vertices=mesh.vertices,
                               mesh_indices=mesh.indices)
    W, H = 640, 420
    out = hybrid_render(W, H, scene,
                        {"origin": (32, 38, 95), "look_at": (32, 2, 30)},
                        sun={"azimuth": 120, "elevation": 40, "intensity": 3.5})
    frame = out["rgba"]

    atlas = bake_msdf_atlas(px=48)
    cands = []
    for i, name in enumerate(["Civic Center", "Old Town", "Harbor Gate",
                              "North Market"]):
        px_, py_ = 120 + i * 130, 140 + (i % 2) * 90
        cands += point_label_candidates(i, name, px_, py_, size=16,
                                        priority=1.0 + 0.1 * i, atlas=atlas)
    plan = plan_labels(cands, frame_size=(W, H), algorithm="optimal")
    ov = render_label_overlay(W, H, plan.placements, atlas=atlas)
    a = ov[..., 3:4].astype(np.float32) / 255.0
    frame = frame.copy()
    frame[..., :3] = (frame[..., :3] * (1 - a)
                      + ov[..., :3] * a).astype(np.uint8)
    f3d.numpy_to_png(out_path, frame)
    print(f"wrote {out_path}: {len(buildings)} buildings, "
          f"{len(plan.placements)} labels placed")


if __name__ == "__main__":
    main()
