#!/usr/bin/env python
# examples/night_sky_over_terrain.py — SIDERA night sky composited above a
# dusk terrain silhouette (the reference's astro night golden scene).

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(out_path="night_sky.png"):
    import forge3d_tpu as f3d
    from forge3d_tpu.astro import julian_date, render_night_sky

    W, H = 640, 400
    jd = julian_date(2026, 8, 16, 7, 30)   # pre-dawn UTC
    sky = render_night_sky(W, H, jd, 46.85, -121.76,
                           azimuth_deg=200.0, altitude_deg=30.0,
                           fov_deg=75.0)

    # terrain silhouette along the bottom
    xs = np.arange(W)
    ridge = (H - 60 - 45 * np.sin(xs * 0.013)
             - 25 * np.sin(xs * 0.047 + 2)).astype(int)
    frame = sky.copy()
    for x in range(W):
        frame[ridge[x]:, x, :3] = (8, 10, 14)
    f3d.numpy_to_png(out_path, frame)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
