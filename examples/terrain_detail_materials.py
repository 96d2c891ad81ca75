# Forward-shading material depth: triplanar-sampled procedural detail,
# RNM detail normals with distance fade, POM parallax, snow/rock layers.
# Reference behavior: terrain_pbr_pom.wgsl material stack (:653-2660).
#
# Run: python examples/terrain_detail_materials.py [out.png]

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from forge3d_tpu.io.image import numpy_to_png
from forge3d_tpu.terrain.params import (DetailSettings,
                                        MaterialLayerSettings,
                                        make_terrain_params)
from forge3d_tpu.terrain.renderer import TerrainRenderer


def main(out_path="examples/out/terrain_detail_materials.png"):
    n = 257
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    rng = np.random.default_rng(3)
    dem = (35.0 * np.sin(xx * 0.03) * np.cos(yy * 0.025)
           + 9.0 * np.sin(xx * 0.11) * np.cos(yy * 0.09)
           + 1.5 * rng.standard_normal((n, n))).astype(np.float32)

    p = make_terrain_params(size_px=(960, 540), cam_theta_deg=28.0,
                            cam_phi_deg=40.0, cam_radius=360.0)
    p.detail = DetailSettings(enabled=True, strength=0.7, scale=40.0)
    p.triplanar.enabled = True
    p.triplanar.blend_sharpness = 4.0
    p.pom.enabled = True
    p.pom.scale = 0.6
    p.material_layers = MaterialLayerSettings(
        enabled=True, snow_height=0.72, snow_blend=0.1,
        rock_slope_deg=42.0)
    frame = TerrainRenderer().render_terrain_pbr_pom(params=p, heightmap=dem)
    import os

    os.makedirs("examples/out", exist_ok=True)
    numpy_to_png(out_path, frame.rgba)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
