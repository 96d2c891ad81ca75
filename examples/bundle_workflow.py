# examples/bundle_workflow.py — portable .forge3d scene bundles.
#
# Reference analogue: src/bundle/ + viewer save/load_bundle IPC
# (mapscene_p1_assets_bundle_showcase.py): pack a scene (DEM + recipe +
# assets) into one portable file with a manifest, reload it elsewhere,
# re-render identically.
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from forge3d_tpu import bundle  # noqa: E402
from forge3d_tpu.mapscene import (MapScene, OrbitCamera,  # noqa: E402
                                  OutputSpec, SceneRecipe, TerrainSource)

OUT = pathlib.Path(__file__).parent / "out"
OUT.mkdir(exist_ok=True)


def main() -> None:
    x = np.linspace(0, 1, 16).astype(np.float32)
    xx, yy = np.meshgrid(x, x)
    dem = (0.4 * np.sin(xx * 7) + yy).astype(np.float32)

    path = OUT / "scene.forge3d"
    bundle.save_bundle(path, terrain=dem,
                       state={"colormap": "viridis", "size": [160, 120],
                              "phi_deg": 30.0})
    info = bundle.bundle_manifest(path)
    print(f"bundle manifest: {sorted(info['entries'])}")

    loaded = bundle.load_bundle(path)
    dem2 = loaded["terrain"]
    cfg = loaded["state"]
    assert np.array_equal(dem, dem2)
    rec = SceneRecipe(
        terrain=TerrainSource(dem=dem2, spacing=(1.0, 1.0), z_scale=1.0),
        camera=OrbitCamera(phi_deg=cfg["phi_deg"], theta_deg=50,
                           fov_y_deg=45),
        colormap=cfg["colormap"],
        output=OutputSpec(size_px=tuple(cfg["size"])),
        camera_mode="screen")
    p = OUT / "bundle_rerender.png"
    MapScene(rec).render(p)
    print(f"re-rendered from bundle -> {p}")


if __name__ == "__main__":
    main()
