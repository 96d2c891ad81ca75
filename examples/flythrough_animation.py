#!/usr/bin/env python
# examples/flythrough_animation.py — camera-rig flythrough over a fetched
# DEM rendered with the sweep path tracer, one PNG per keyframe (the
# reference's flythrough/camera-animation examples; ref examples/ +
# src/animation/).
#
# Usage: python examples/flythrough_animation.py [out_dir] [n_frames]

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(out_dir="flythrough", n_frames=8):
    import forge3d_tpu as f3d
    from forge3d_tpu.camera_rigs import OrbitRig
    from forge3d_tpu.datasets import dem_spacing, fetch_dem
    from forge3d_tpu.pt.terrain_ref import TerrainRefDesc
    from forge3d_tpu.pt.terrain_sweep import render_terrain_sweep

    dem, info = fetch_dem("alps_ridge", size=257)
    sx, sz = dem_spacing(info)
    span = (dem.shape[1] - 1) * sx
    out = Path(out_dir)
    out.mkdir(exist_ok=True)

    rig = OrbitRig(target=(span / 2, float(dem.mean()) * 1.0, span / 2),
                   radius=span * 1.05, phi_start_deg=200.0,
                   phi_end_deg=300.0, theta_deg=30.0, ease=True)
    for i in range(int(n_frames)):
        t = i / max(int(n_frames) - 1, 1)
        cam = rig.frame(t)
        desc = TerrainRefDesc(
            heights=dem, spacing=(sx, sz),
            cam_origin=cam.origin, cam_look_at=cam.look_at,
            fov_y_deg=cam.fov_y_deg, width=480, height=270,
            spp=2, seed=7 + i)
        frame = render_terrain_sweep(desc, frames=8)
        f3d.numpy_to_png(out / f"frame_{i:03d}.png", frame["rgba"])
        print(f"frame {i + 1}/{n_frames}", flush=True)
    print(f"wrote {n_frames} frames to {out}/")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(args[0] if args else "flythrough",
         int(args[1]) if len(args) > 1 else 8)
