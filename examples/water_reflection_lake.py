# Water with TRUE planar reflections: the reflected view ray is traced
# against the terrain again (no screen-space approximation).
# Reference behavior: terrain_pbr_pom.wgsl:852-941 water reflection
# sample/Fresnel/blend.
#
# Run: python examples/water_reflection_lake.py [out.png]

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from forge3d_tpu.io.image import numpy_to_png
from forge3d_tpu.terrain.params import (ReflectionSettings, WaterSettings,
                                        make_terrain_params)
from forge3d_tpu.terrain.renderer import TerrainRenderer


def main(out_path="examples/out/water_reflection_lake.png"):
    n = 257
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    # a ridge across the back of a lake basin
    dem = (40.0 * np.exp(-((yy - 40.0) / 40.0) ** 2)
           + 6.0 * np.sin(xx * 0.08) * np.cos(yy * 0.06)).astype(np.float32)

    p = make_terrain_params(size_px=(960, 540), cam_theta_deg=14.0,
                            cam_phi_deg=0.0, cam_radius=420.0,
                            cam_target=(128.0, 10.0, 110.0))
    p.water = WaterSettings(enabled=True, level=2.0)
    p.reflection = ReflectionSettings(enabled=True, intensity=0.9)
    frame = TerrainRenderer().render_terrain_pbr_pom(params=p, heightmap=dem)
    import os

    os.makedirs("examples/out", exist_ok=True)
    numpy_to_png(out_path, frame.rgba)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
