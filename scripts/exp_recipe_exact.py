"""Experiment: render the mapscene recipe board with the behavior-exact
screen-mode replica as the terrain base (true reference recipe parameters:
rainier preset, sun 135/25 @ 1.15, IBL 0.3 on the 2x2 constant env,
terrain colormap stops, mix 0.5, camera 800/35/45) and compare per-recipe
SSIM against the committed fitted-model scores.

Usage: python scripts/exp_recipe_exact.py [scene ...]
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

import test_reference_golden_parity as T  # noqa: E402
from forge3d_tpu.io.image import png_to_numpy  # noqa: E402
from forge3d_tpu.mapscene import MapScene  # noqa: E402
from forge3d_tpu.terrain import screen_golden as sg  # noqa: E402
from forge3d_tpu.utils.metrics import ssim  # noqa: E402

TERRAIN_STOPS = [(0.0, "#00aa00"), (0.3, "#80ff00"), (0.5, "#ffff00"),
                 (0.7, "#ff8000"), (0.9, "#ff0000"), (1.0, "#800000")]
MAPSCENE_ENV = np.full((2, 2, 3), 0.0, np.float32)
MAPSCENE_ENV[:] = np.array([180.0, 190.0, 205.0], np.float32) / 256.0

#: per-scene true reference params (test_recipe_goldens.py)
OVERRIDES = {
    "mapscene_material_maps": dict(albedo_mode="material",
                                   colormap_strength=0.0),
    "mapscene_clipmap_large_region": dict(z_scale=1.2),
}

_orig = MapScene._render_screen_terrain


def exact_terrain(self, plan):
    r = self.recipe
    p = plan["params"]
    W, H = p.size_px
    dem = np.asarray(r.terrain.dem, np.float32)
    lo = float(np.nanmin(dem))
    hi = float(np.nanmax(dem))
    if lo == hi:
        hi = lo + 1.0
    span = float(max(dem.shape))
    kw = dict(size_px=(W, H), terrain_span=span, z_scale=1.35,
              exposure=1.0, light_azimuth_deg=135.0,
              light_elevation_deg=25.0, sun_intensity=1.15,
              sun_color=(1.0, 0.95, 0.9), ibl_intensity=0.3,
              cam_radius=800.0, cam_phi_deg=35.0, cam_theta_deg=45.0,
              fov_y_deg=45.0, albedo_mode="mix", colormap_strength=0.5,
              domain=(lo, hi), hdr_rgb=MAPSCENE_ENV)
    kw.update(OVERRIDES.get(getattr(self, "_exp_scene_id", ""), {}))
    lut = sg.build_lut_from_stops(TERRAIN_STOPS)
    img = sg.render_screen_scene(dem, lut, **kw)
    rgb = img[..., :3].astype(np.float32)

    # cloud shadows still composite at the mapscene level
    cl = getattr(r, "clouds", None)
    if cl and cl.get("enabled") and cl.get("shadows_enabled", True):
        scale = {"low": 2.0, "medium": 3.0, "high": 4.5,
                 "ultra": 6.0}.get(str(cl.get("quality", "medium")), 3.0)
        ox = float(cl.get("shadow_offset_x", 0.0))
        oy = float(cl.get("shadow_offset_y", 0.0))
        ys2, xs2 = np.mgrid[0:H, 0:W].astype(np.float32)
        cu = xs2 / max(1.0, W - 1.0) + ox
        cv = ys2 / max(1.0, H - 1.0) + oy
        field = (0.55 * np.sin((cu * scale + cv * 0.7) * 2 * np.pi)
                 + 0.30 * np.sin((cu * 1.7 - cv * scale) * 2 * np.pi + 0.6)
                 + 0.15 * np.sin((cu * 5.1 + cv * 4.3) * 2 * np.pi + 1.7))
        field = (field - field.min()) / max(
            float(field.max() - field.min()), 1e-6)
        cutoff = 1.0 - float(cl.get("coverage", 0.5))
        cloud = np.clip((field - cutoff)
                        / max(0.05, float(cl.get("density", 0.5))), 0.0, 1.0)
        rgb = rgb * (1.0 - cloud
                     * float(cl.get("shadow_strength", 0.35)))[..., None]
    out = np.empty((H, W, 4), np.uint8)
    out[..., :3] = np.clip(rgb, 0, 255).astype(np.uint8)
    out[..., 3] = 255
    return out


def main():
    names = sys.argv[1:] or sorted(T._recipes())
    board = json.loads((Path("tests/goldens/reference_parity.json"))
                       .read_text())["recipes"]
    recipes = T._recipes()
    results = {}
    for name in names:
        rec = recipes[name]
        golden = T.REF_GOLDENS / f"{name}.png"
        if not golden.exists():
            continue
        raw = png_to_numpy(golden)
        peak = 65535.0 if raw.dtype == np.uint16 else 255.0
        ref = raw.astype(np.float32)[..., :3] / peak
        t0 = time.time()
        MapScene._render_screen_terrain = exact_terrain
        MapScene._exp_scene_id = name
        try:
            got = MapScene(rec).render().rgba[..., :3].astype(np.float32) / 255.0
        except Exception as e:
            print(f"{name}: EXACT-FAIL {type(e).__name__}: {e}", flush=True)
            MapScene._render_screen_terrain = _orig
            continue
        finally:
            MapScene._render_screen_terrain = _orig
        if got.shape != ref.shape:
            print(f"{name}: shape mismatch", flush=True)
            continue
        s = float(ssim(ref, got))
        old = board.get(name, {}).get("ssim", 0.0)
        mark = "  <<<" if s > old + 0.003 else ""
        print(f"{name}: exact={s:.4f} fitted={old:.4f} "
              f"({time.time()-t0:.0f}s){mark}", flush=True)
        results[name] = (s, old)
    ups = sum(1 for s, o in results.values() if s > o)
    print(f"improved: {ups}/{len(results)}")


if __name__ == "__main__":
    main()
