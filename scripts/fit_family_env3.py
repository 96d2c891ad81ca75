#!/usr/bin/env python3
"""Refit the terrain-family shading with the TRUE world slope scale
(z_scale 1.45 over terrain_span 2.8 across 96 texels => dh/dx ~ 49.7x)
plus optional test-HDR env ambient."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import itertools

import numpy as np

import importlib.util
spec = importlib.util.spec_from_file_location(
    "fam", os.path.join(os.path.dirname(__file__), "..", "tests",
                        "test_reference_family_goldens.py"))
fam = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fam)

from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim

NAMES = ["terrain_pbr", "terrain_water", "terrain_atmosphere",
         "terrain_low_sun_sky", "terrain_pom", "terrain_water_reflection"]
ELEV = {"terrain_pbr": 24.0, "terrain_water": 18.0,
        "terrain_atmosphere": 12.0, "terrain_low_sun_sky": 5.0,
        "terrain_pom": 22.0, "terrain_water_reflection": 15.0}
AZ = {"terrain_low_sun_sky": 118.0}
SIZE = {"terrain_pom": (256, 160), "terrain_water_reflection": (256, 160)}
WMASK = {"terrain_water", "terrain_water_reflection"}
MAT = {"terrain_pom"}


def test_env(w=8, h=4):
    x = np.arange(w) / max(w - 1, 1)
    y = np.arange(h) / max(h - 1, 1)
    env = np.zeros((h, w, 3), np.float32)
    env[..., 0] = x[None, :] * (255 / 256)
    env[..., 1] = y[:, None] * (255 / 256)
    env[..., 2] = 128 / 256
    return env


def render_entry(name, inten, ambi, zs):
    kw = dict(size_px=SIZE.get(name, (192, 128)),
              azimuth=AZ.get(name, 135.0), elevation=ELEV[name],
              intensity=inten, ambient=ambi)
    if name in WMASK:
        kw["water_mask"] = fam._terrain_family_water_mask()
    if name in MAT:
        kw["intensity"] = 0.3
        kw["ambient"] = 0.3

    # inline _screen_render with z-scale override
    from forge3d_tpu.mapscene import (MapScene, OrbitCamera, OutputSpec,
                                      SceneRecipe, TerrainSource)
    from forge3d_tpu.terrain.params import LightSettings

    rec = SceneRecipe(
        terrain=TerrainSource(dem=fam._terrain_family_heightmap(),
                              spacing=(1.0, 1.0), z_scale=zs),
        camera=OrbitCamera(phi_deg=35.0, theta_deg=45.0, fov_y_deg=45.0),
        colormap=fam._terrain_family_colormap(),
        lighting=LightSettings(azimuth_deg=float(kw["azimuth"]),
                               elevation_deg=float(kw["elevation"]),
                               intensity=float(kw["intensity"]),
                               color=(1.0, 0.95, 0.9),
                               ambient=float(kw["ambient"]),
                               ambient_color=(1.0, 1.0, 1.0)),
        output=OutputSpec(size_px=kw["size_px"]),
        camera_mode="screen",
    )
    if name in WMASK:
        rec.water_mask = kw["water_mask"]
    if name in MAT:
        rec.albedo_mode = "material"
        rec.material_color = getattr(
            fam, "_POM_MATERIAL", (0.55, 0.52, 0.48))
    saved = MapScene._SCREEN_PROFILE
    MapScene._SCREEN_PROFILE = fam._FAMILY_PROFILE
    try:
        return MapScene(rec).render().rgba
    finally:
        MapScene._SCREEN_PROFILE = saved


def main():
    golds = {n: png_to_numpy(fam.FAMILY_GOLDENS[n]["golden"])
             .astype(np.float32)[..., :3] / 255.0 for n in NAMES}
    base_prof = dict(fam._FAMILY_PROFILE)
    env = test_env()

    def score(inten, ambi, zs, env_cfg):
        fam._FAMILY_PROFILE.clear()
        fam._FAMILY_PROFILE.update(base_prof)
        if env_cfg is not None:
            fam._FAMILY_PROFILE["env_amb"] = dict(env_cfg, map=env)
        out = {}
        for n in NAMES:
            got = np.asarray(render_entry(n, inten, ambi, zs))
            got = got[..., :3].astype(np.float32) / 255.0
            if got.shape != golds[n].shape:
                out[n] = 0.0
                continue
            out[n] = float(ssim(golds[n], got))
        return out

    base = score(0.0, 0.9967, 1.0, None)
    print("baseline:", {k: round(v, 4) for k, v in base.items()},
          round(sum(base.values()) / len(base), 4), flush=True)

    best = (sum(base.values()), None)
    for zs, inten, ambi in itertools.product(
            (12.0, 25.0, 50.0), (0.1, 0.25, 0.45), (0.35, 0.6, 0.9)):
        for env_on in (None, {"zscale": zs, "rot": 0.0, "nearest": True}):
            s = score(inten, ambi, zs, env_on)
            tot = sum(s.values())
            if tot > best[0]:
                best = (tot, (inten, ambi, zs, env_on))
                print((inten, ambi, zs, bool(env_on)),
                      {k: round(v, 4) for k, v in s.items()},
                      round(tot / len(s), 4), "*", flush=True)
    print("BEST", best[1])


if __name__ == "__main__":
    main()
