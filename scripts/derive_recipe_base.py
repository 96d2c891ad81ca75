# Derive-not-fit experiment (round 4): render the reference recipe BASE
# scene through the engine screen pipeline with parameters DERIVED from
# the reference source (no fitted constants):
#   - preset resolution: map_scene.py:4383-4405 (_apply_mapscene_lighting_preset)
#   - params build:      map_scene.py:1160-1262 (_build_mapscene_terrain_params)
#   - camera:            presets.py rainier_showcase camera radius_scale 2.4
#     * diagonal 8 (map_scene.py:541-554) = 19.2; az 135 / el 45 / fov 55
#   - sun: direction (0.64,0.42,-0.64) -> az 135 / el 24.894
#     intensity = recipe.lighting.intensity = 1.15 (map_scene.py:4330-4336)
#   - ibl: minimal 2x2 HDR (map_scene.py:599-606), intensity 0.3
#   - colormap: terrain_demo.DEFAULT_COLORMAP_STOPS rescaled to domain
#   - albedo mix 0.5, z_scale (exaggeration) 1.35, exposure 1.0
import math
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from forge3d_tpu.terrain import screen as eng
from forge3d_tpu.io.image import png_to_numpy
from forge3d_tpu.utils.metrics import ssim

GOLD = "/root/reference/tests/golden/recipes"

TERRAIN_STOPS = [
    (0.0, "#00aa00"), (0.3, "#80ff00"), (0.5, "#ffff00"),
    (0.7, "#ff8000"), (0.9, "#ff0000"), (1.0, "#800000")]


def ref_heightmap(size=8):
    x = np.linspace(0.0, 1.0, size, dtype=np.float32)
    y = np.linspace(0.0, 1.0, size, dtype=np.float32)
    xx, yy = np.meshgrid(x, y)
    return (0.25 * xx + 0.75 * yy).astype(np.float32)


def minimal_hdr_rgb():
    # map_scene._write_minimal_hdr: 2x2, RGBE bytes (180, 190, 205, 128)
    rgb = np.array([180.0, 190.0, 205.0], np.float32) / 256.0
    return np.broadcast_to(rgb, (2, 2, 3)).copy()


def render_base(w, h, **over):
    hm = ref_heightmap()
    lut = eng.build_lut_from_stops(TERRAIN_STOPS)
    sun_el = math.degrees(math.asin(0.42 / math.sqrt(
        0.64 ** 2 + 0.42 ** 2 + 0.64 ** 2)))
    kw = dict(
        size_px=(max(64, w), max(64, h)),
        terrain_span=8.0, z_scale=1.35, exposure=1.0,
        light_azimuth_deg=135.0, light_elevation_deg=sun_el,
        sun_intensity=1.15, sun_color=(1.0, 0.95, 0.9),
        ibl_intensity=0.3, hdr_rgb=minimal_hdr_rgb(),
        cam_radius=8.0 * 2.4, cam_phi_deg=135.0, cam_theta_deg=45.0,
        fov_y_deg=55.0, clip=(0.1, 6000.0),
        albedo_mode="mix", colormap_strength=0.5,
        hue_variation_strength=0.08, domain=(0.0, 1.0))
    kw.update(over)
    img = eng.render_screen_scene(hm, lut, **kw)
    # _frame_to_rgba nearest resize to the output size (map_scene.py:303-316)
    if img.shape[:2] != (h, w):
        sh, sw = img.shape[:2]
        sy = np.clip(np.arange(h) * sh // h, 0, sh - 1)
        sx = np.clip(np.arange(w) * sw // w, 0, sw - 1)
        img = img[sy[:, None], sx[None, :]]
    return img


def score(name, img):
    raw = png_to_numpy(f"{GOLD}/{name}.png")
    peak = 65535.0 if raw.dtype == np.uint16 else 255.0
    ref = raw.astype(np.float32)[..., :3] / peak
    got = img[..., :3].astype(np.float32) / 255.0
    if got.shape != ref.shape:
        print(f"{name}: size mismatch {got.shape} vs {ref.shape}")
        return
    s = float(ssim(ref, got))
    mad = float(np.abs(ref - got).mean() * 255.0)
    print(f"{name}: ssim={s:.4f} mean|d|={mad:.3f}")
    return ref, got


if __name__ == "__main__":
    img = render_base(96, 64)
    score("mapscene_offline_aovs", img)
    img16 = render_base(80, 48)
    score("mapscene_png16_color", img16)
