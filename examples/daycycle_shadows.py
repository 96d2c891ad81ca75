# examples/daycycle_shadows.py — a day of sun positions from the solar
# ephemeris driving terrain shadow renders.
#
# Reference analogue: examples/helsinki_transit_daycycle.py /
# osm_city_daycycle.py (NOAA solar calculator positions the sun per
# frame; src/lighting/ephemeris.rs).
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import forge3d_tpu as f3d  # noqa: E402
from forge3d_tpu.sky import sun_position_at  # noqa: E402
from forge3d_tpu.io.image import numpy_to_png  # noqa: E402

OUT = pathlib.Path(__file__).parent / "out"
OUT.mkdir(exist_ok=True)


def main() -> None:
    n = 65
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = (10.0 * np.sin(x * 0.09) * np.cos(y * 0.07)).astype(np.float32)
    cam = dict(origin=(32.0, 26.0, 88.0), look_at=(32.0, 0.0, 32.0),
               fov_y=45.0)
    lat, lon = 46.85, -121.76          # Mount Rainier
    jd0 = 2460855.5                    # 2025-06-29 00:00 UTC
    hours = [16.0, 20.0, 24.0]        # morning / noon / evening local-ish
    for h in hours:
        az, el = sun_position_at(jd0 + h / 24.0, lat, lon)
        if el <= 2.0:
            print(f"hour {h}: sun below horizon (el {el:.1f}), skipping")
            continue
        out = f3d.hybrid_render_terrain_reference(
            dem, 96, 72, cam, spp=1, seed=5, traversal="sweep",
            sun_azimuth_deg=float(az), sun_elevation_deg=float(el))
        p = OUT / f"daycycle_h{int(h):02d}.png"
        numpy_to_png(p, out["rgba"])
        print(f"hour {h}: sun az {az:.1f} el {el:.1f} -> {p.name}")


if __name__ == "__main__":
    main()
