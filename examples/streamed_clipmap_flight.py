# examples/streamed_clipmap_flight.py — camera flight over an
# out-of-core DEM through the async height-tile streamer + clipmap.
#
# Reference analogue: clipmap streaming + height_loader prefetch
# (swiss/bosnia terrain viewers stream height tiles around the camera).
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from forge3d_tpu.terrain.clipmap import Clipmap, ClipmapConfig  # noqa: E402
from forge3d_tpu.terrain.streaming import HeightTileLoader  # noqa: E402


def procedural_world(tx, tz, lod):
    """An unbounded procedural world: each 128px tile is synthesized on
    demand (stands in for COG/GeoTIFF windows)."""
    n = 128
    step = 1 << lod
    z0, x0 = tz * n * step, tx * n * step
    zz, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    X = x0 + xx * step
    Z = z0 + zz * step
    return (120.0 * np.sin(X * 0.004) * np.cos(Z * 0.003)
            + 25.0 * np.sin(X * 0.021) * np.cos(Z * 0.017)).astype(
                np.float32)


def main() -> None:
    loader = HeightTileLoader(procedural_world, tile_px=128,
                              budget_bytes=8 << 20, workers=4)
    cm = Clipmap(loader.window, ClipmapConfig(levels=4, size=65))
    # fly along a path; prefetch ahead of the camera each step
    path = [(t * 400.0, 1500.0 + t * 250.0) for t in range(6)]
    for i, (x, z) in enumerate(path):
        loader.prefetch_around(x + 400.0, z + 250.0, radius_tiles=1)
        cm.center_on(x, z)
        h = float(np.asarray(cm.sample(x, z)))
        st = loader.stats
        print(f"step {i}: cam=({x:7.0f},{z:7.0f}) h={h:8.2f}  "
              f"tiles loaded={st.loaded} hit={st.hits} "
              f"evicted={st.evicted} resident={st.resident_bytes // 1024}KiB")
    loader.drain(timeout=30)
    assert loader.stats.resident_bytes <= 8 << 20
    loader.close()
    print("flight complete within the residency budget")


if __name__ == "__main__":
    main()
