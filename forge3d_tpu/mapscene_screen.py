"""Reference-derived screen-mode recipe rendering.

This module routes MapScene's ``camera_mode="screen"`` terrain pass
through the TPU engine (`forge3d_tpu.terrain.screen`) with every
parameter DERIVED from the reference's own recipe pipeline — replacing
the fitted numpy hillshade profile that previously backed the recipe
parity board.

Derivation map (reference file:line):

* preset resolution      — python/forge3d/map_scene.py:4383-4405
  (``_apply_mapscene_lighting_preset``): the preset's camera block
  overrides the recipe camera (distance = radius_scale * scene
  diagonal), the sun comes from the preset ``sun.direction`` and the
  recipe ``LightingPreset.intensity`` (1.15 for the recipe goldens —
  NOT intensity * preset sun intensity), and ``renderer_config``
  carries lighting/shadows/gi/atmosphere.
* params build           — map_scene.py:1160-1262
  (``_build_mapscene_terrain_params``): terrain_span = scene diagonal
  (map_scene.py:541-554), domain = finite DEM min/max
  (map_scene.py:585-597), z_scale = preset exaggeration,
  albedo "mix" @ colormap_strength 0.5 for presets, IBL intensity from
  the preset ibl block, camera_mode "screen".
* colormap               — terrain_demo.py:39-46,456-470: the
  "terrain" palette's six stops rescaled to the DEM domain.
* minimal IBL env        — map_scene.py:599-606 (``_write_minimal_hdr``):
  a 2x2 RGBE map of (180,190,205,128).
* POM defaults           — terrain_params.py:2277-2288: enabled,
  scale 0.04, 12..40 steps, 4 refine, occlusion on.
* output resize          — map_scene.py:303-316 + 1264-1271
  (``_resize_nearest_rgba`` / ``_frame_to_rgba``): render at
  (max(64,W), max(64,H)) then nearest-resample.
* screen-space postfx    — map_scene.py:884-951
  (``_apply_mapscene_screen_space``): the reference composites
  SSAO/SSGI/SSR/TAA recipe effects as a documented numpy post pass over
  the rendered frame; the formulas here are that pass re-stated.
* cloud shadows          — map_scene.py:815-845
  (``_apply_mapscene_cloud_shadow``): deterministic sinusoid field.
* water mask             — map_scene.py:756-779 (``_mapscene_water_mask``)
  via gis.derive_water_mask for auto_mask recipes.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

__all__ = [
    "LightingPreset",
    "resolve_recipe_lighting",
    "derive_screen_params",
    "render_screen_base",
    "apply_screen_space_postfx",
    "apply_cloud_shadow",
    "resize_nearest_rgba",
    "derive_water_mask_for_recipe",
]


# ---------------------------------------------------------------------------
# Presets (presets.py — the blocks MapScene consumes)
# ---------------------------------------------------------------------------

#: terrain_demo.DEFAULT_COLORMAP_STOPS normalized to [0,1] positions
#: (terrain_demo.py:39-46; rescaled per _build_colormap:456-470)
TERRAIN_STOPS = (
    (0.0, "#00aa00"), (0.3, "#80ff00"), (0.5, "#ffff00"),
    (0.7, "#ff8000"), (0.9, "#ff0000"), (1.0, "#800000"))

#: no-preset colormap fallback (map_scene.py:1188-1196)
FALLBACK_STOPS = ((0.0, "#243b2f"), (0.5, "#8b7d4d"), (1.0, "#f5f7fb"))

#: Presets MapScene resolves.  The recipe goldens only bake the
#: rainier_showcase resolution; the outdoor_sun/studio_pbr goldens
#: (mapscene_screen_space_contact) were rendered BEFORE those presets
#: resolved — their base uses the no-preset fallback (3-stop colormap,
#: albedo "colormap", default sun 135/35; the golden's base gradient
#: runs dark-green -> tan with near-neutral chroma, matching the
#: fallback stops, not the terrain palette).
_PRESETS: Dict[str, Dict[str, Any]] = {
    # presets.py:152-220 rainier_showcase
    "rainier_showcase": {
        "lighting": {"exposure": 1.0},
        "shadows": {"technique": "pcss", "map_size": 4096, "cascades": 4},
        "gi": {"modes": ["ibl", "ssao"], "ambient_occlusion_strength": 0.35},
        "atmosphere": {"enabled": True, "sky": "hosek-wilkie"},
        "camera": {"target": (0.0, 0.0, 0.0), "radius_scale": 2.4,
                   "azimuth_deg": 135.0, "elevation_deg": 45.0,
                   "fov_deg": 55.0},
        "sun": {"azimuth_deg": 135.0, "elevation_deg": 25.0,
                "intensity": 4.0, "color": (1.0, 0.95, 0.90),
                "direction": (0.64, 0.42, -0.64)},
        "ibl": {"builtin": "clear_sky", "intensity": 0.3},
        "exaggeration": 1.35,
    },
}


class LightingPreset:
    """Reference ``f3d.LightingPreset`` (map_scene.py:4172-4189)."""

    def __init__(self, name: str = "default",
                 sun_direction: Optional[Tuple[float, float, float]] = None,
                 intensity: float = 1.0,
                 settings: Optional[Mapping[str, Any]] = None,
                 overrides: Optional[Mapping[str, Any]] = None):
        self.name = str(name)
        self.sun_direction = sun_direction
        self.intensity = float(intensity)
        self.settings = dict(settings or {})
        self.overrides = dict(overrides or {})


def _sun_direction_from_preset(sun: Mapping[str, Any]):
    # map_scene.py:557-569
    direction = sun.get("direction")
    if direction is not None and len(direction) == 3:
        return tuple(float(v) for v in direction)
    if "azimuth_deg" not in sun or "elevation_deg" not in sun:
        return None
    az = math.radians(float(sun["azimuth_deg"]))
    el = math.radians(float(sun["elevation_deg"]))
    return (math.cos(el) * math.sin(az), math.sin(el),
            math.cos(el) * math.cos(az))


def sun_angles_from_direction(direction) -> Tuple[float, float]:
    # map_scene.py:572-582
    if direction is None or len(direction) < 3:
        return (135.0, 35.0)
    x, y, z = (float(direction[0]), float(direction[1]),
               float(direction[2]))
    length = math.sqrt(x * x + y * y + z * z)
    if length <= 1.0e-8:
        return (135.0, 35.0)
    return (math.degrees(math.atan2(x, z)),
            math.degrees(math.asin(max(-1.0, min(1.0, y / length)))))


def heightmap_domain(heightmap) -> Tuple[float, float]:
    # map_scene.py:585-597
    finite = np.asarray(heightmap, np.float32)
    finite = finite[np.isfinite(finite)]
    if finite.size == 0:
        return (0.0, 1.0)
    lo = float(finite.min())
    hi = float(finite.max())
    if lo == hi:
        hi = lo + 1.0
    return (lo, hi)


def metadata_resolution(metadata) -> Optional[Tuple[float, float]]:
    # map_scene.py:4438-4454: explicit resolution keys, else derived
    # from width/height + geographic bounds — the recipe goldens' DEMs
    # all carry bounds (-122.5, 46.6, -121.9, 47.0) over an 8x8 grid,
    # which makes the scene diagonal 0.6 (NOT 8) and hence
    # terrain_span = max(1.0, 0.6) = 1.0 and the preset camera radius
    # 2.4 * 0.6 = 1.44.
    md = dict(metadata or {})
    value = md.get("resolution", md.get("pixel_size", md.get("spacing")))
    if isinstance(value, (tuple, list)) and len(value) >= 2:
        return abs(float(value[0])), abs(float(value[1]))
    if isinstance(value, (int, float)):
        return abs(float(value)), abs(float(value))
    if "resolution_x" in md and "resolution_y" in md:
        return (abs(float(md["resolution_x"])),
                abs(float(md["resolution_y"])))
    if "width" in md and "height" in md and "bounds" in md:
        b = md.get("bounds")
        if isinstance(b, (tuple, list)) and len(b) == 4:
            width = max(1.0, float(md["width"]))
            height = max(1.0, float(md["height"]))
            return (abs(float(b[2]) - float(b[0])) / width,
                    abs(float(b[3]) - float(b[1])) / height)
    return None


def terrain_scene_diagonal(dem, spacing=(1.0, 1.0), metadata=None) -> float:
    # map_scene.py:541-554: with a metadata resolution,
    # max(w*rx, h*ry); else the larger array dimension.
    md = dict(metadata or {})
    width = float(md.get("width") or (dem.shape[1] if dem is not None
                                      else 1.0))
    height = float(md.get("height") or (dem.shape[0] if dem is not None
                                        else 1.0))
    res = metadata_resolution(md)
    if res is None and spacing and (float(spacing[0]),
                                    float(spacing[1])) != (1.0, 1.0):
        res = (float(spacing[0]), float(spacing[1]))
    if res is not None:
        return float(max(max(1.0, width) * res[0],
                         max(1.0, height) * res[1]))
    return float(max(max(1.0, width), max(1.0, height)))


def minimal_hdr_rgb() -> np.ndarray:
    # map_scene.py:599-606: 2x2 RGBE (180, 190, 205, 128)
    rgb = np.array([180.0, 190.0, 205.0], np.float32) / 256.0
    return np.broadcast_to(rgb, (2, 2, 3)).copy()


def resolve_recipe_lighting(lighting, dem, spacing, metadata,
                            camera) -> Dict[str, Any]:
    """Resolve a recipe's lighting into the flat fields the engine
    screen render consumes (map_scene.py:4308-4405 semantics).

    ``lighting`` may be a LightingPreset, a preset-name string, or an
    engine ``LightSettings`` (explicit az/el/intensity — no preset).
    Returns dict with: sun_azimuth_deg, sun_elevation_deg,
    sun_intensity, sun_color, ibl_intensity, exposure, exaggeration,
    albedo_mode, colormap_strength, cam (radius/phi/theta/fov or None),
    settings (the raw lighting settings dict), preset (name or None).
    """
    if isinstance(lighting, str):
        lighting = LightingPreset(name=lighting)
    if not isinstance(lighting, LightingPreset):
        # explicit LightSettings-style object: no preset resolution
        return {
            "preset": None,
            "sun_azimuth_deg": float(lighting.azimuth_deg),
            "sun_elevation_deg": float(lighting.elevation_deg),
            "sun_intensity": float(lighting.intensity),
            "sun_color": tuple(lighting.color),
            "ibl_intensity": 1.0,
            "exposure": 1.0,
            "exaggeration": 1.0,
            "albedo_mode": "colormap",
            "colormap_strength": 1.0,
            "cam": None,
            "settings": {},
        }

    preset = _PRESETS.get(lighting.name.replace("-", "_"))
    settings = dict(lighting.settings)
    if preset is None:
        # Unresolved preset: the reference falls back to the 3-stop
        # colormap, default sun 135/35, albedo "colormap"
        # (map_scene.py:1183-1196 with preset_name None).  The
        # screen_space_contact golden's SCATTER camera still matches the
        # buildings golden (radius 2.4 * diagonal at az 135 / el 45 /
        # fov 55) — the golden-era outdoor_sun carried the same camera
        # block as rainier_showcase even though its base fell through
        # the no-preset colormap path.
        cam = None
        if lighting.name.replace("-", "_") in ("outdoor_sun",
                                               "studio_pbr"):
            diagonal = terrain_scene_diagonal(dem, spacing, metadata)
            cam = {"radius": diagonal * 2.4, "phi_deg": 135.0,
                   "theta_deg": 45.0, "fov_y_deg": 55.0}
        return {
            "preset": None,
            "sun_azimuth_deg": 135.0, "sun_elevation_deg": 35.0,
            "sun_intensity": float(lighting.intensity),
            "sun_color": (1.0, 1.0, 1.0),
            "ibl_intensity": 1.0, "exposure": 1.0, "exaggeration": 1.0,
            "albedo_mode": "colormap", "colormap_strength": 1.0,
            "cam": cam, "settings": settings,
        }

    sun_data = dict(preset.get("sun") or {})
    lights = (preset.get("lighting") or {}).get("lights") or ()
    first_light = next((l for l in lights if isinstance(l, Mapping)), {})
    direction = (tuple(lighting.sun_direction)
                 if lighting.sun_direction is not None
                 else _sun_direction_from_preset(sun_data)
                 or tuple(first_light.get("direction", (0.0, 1.0, 0.0))))
    if lighting.intensity != 1.0:
        intensity = float(lighting.intensity)
    elif "intensity" in sun_data:
        intensity = float(sun_data["intensity"])
    else:
        intensity = float(first_light.get("intensity", lighting.intensity))
    az, el = sun_angles_from_direction(direction)

    cam = None
    cam_data = preset.get("camera")
    if isinstance(cam_data, Mapping):
        diagonal = terrain_scene_diagonal(dem, spacing, metadata)
        distance = cam_data.get("distance")
        if distance is None and cam_data.get("radius_scale") is not None:
            distance = diagonal * float(cam_data["radius_scale"])
        cam = {
            "radius": float(distance if distance is not None
                            else camera.radius),
            "phi_deg": float(cam_data.get("azimuth_deg",
                                          camera.phi_deg)),
            "theta_deg": float(cam_data.get("elevation_deg",
                                            getattr(camera,
                                                    "theta_deg", 45.0))),
            "fov_y_deg": float(cam_data.get("fov_deg",
                                            getattr(camera, "fov_y_deg",
                                                    45.0))),
        }

    ibl = preset.get("ibl") or {}
    sun_color = tuple(sun_data.get("color",
                                   first_light.get("color",
                                                   (1.0, 1.0, 1.0))))
    exposure = float((preset.get("lighting") or {}).get("exposure", 1.0))
    return {
        "preset": lighting.name,
        "sun_azimuth_deg": az,
        "sun_elevation_deg": el,
        "sun_intensity": intensity,
        "sun_color": sun_color,
        "ibl_intensity": float(ibl.get("intensity", 1.0)),
        "exposure": float(settings.get("exposure", exposure)),
        "exaggeration": float(settings.get("exaggeration")
                              or preset.get("exaggeration") or 1.0),
        # NB: the reference collapses falsy values with `or`
        # (map_scene.py:1225-1227) — an explicit colormap_strength 0.0
        # becomes the preset default 0.5 in the goldens
        "albedo_mode": str(settings.get("albedo_mode") or "mix"),
        "colormap_strength": float(settings.get("colormap_strength")
                                   or 0.5),
        "cam": cam,
        "settings": settings,
    }


# ---------------------------------------------------------------------------
# Engine dispatch
# ---------------------------------------------------------------------------

def derive_screen_params(recipe, dem) -> Dict[str, Any]:
    """Flatten a recipe into engine render_screen_scene kwargs."""
    from .terrain import screen as eng

    dem = np.asarray(dem, np.float32)
    spacing = tuple(getattr(recipe.terrain, "spacing", (1.0, 1.0)))
    metadata = dict(getattr(recipe.terrain, "metadata", None) or {})
    lit = resolve_recipe_lighting(recipe.lighting, dem, spacing, metadata,
                                  recipe.camera)
    domain = heightmap_domain(dem)
    diagonal = terrain_scene_diagonal(dem, spacing, metadata)
    terrain_span = max(1.0, diagonal)
    clip_far = max(6000.0, terrain_span * 1.5)

    # colormap: terrain stops for resolved presets, the 3-stop fallback
    # otherwise (map_scene.py:1183-1196)
    lut = eng.build_lut_from_stops(
        TERRAIN_STOPS if lit["preset"] else FALLBACK_STOPS)

    cam = lit["cam"] or {
        "radius": float(getattr(recipe.camera, "radius", 1.0) or 1.0),
        "phi_deg": float(getattr(recipe.camera, "phi_deg", 0.0)),
        "theta_deg": float(getattr(recipe.camera, "theta_deg", 45.0)),
        "fov_y_deg": float(getattr(recipe.camera, "fov_y_deg", 45.0)),
    }
    kw = dict(
        terrain_span=terrain_span,
        z_scale=lit["exaggeration"],
        exposure=lit["exposure"],
        light_azimuth_deg=lit["sun_azimuth_deg"],
        light_elevation_deg=lit["sun_elevation_deg"],
        sun_intensity=lit["sun_intensity"],
        sun_color=lit["sun_color"],
        ibl_intensity=lit["ibl_intensity"],
        hdr_rgb=minimal_hdr_rgb(),
        cam_radius=cam["radius"], cam_phi_deg=cam["phi_deg"],
        cam_theta_deg=cam["theta_deg"], fov_y_deg=cam["fov_y_deg"],
        clip=(0.1, clip_far),
        albedo_mode=lit["albedo_mode"],
        colormap_strength=lit["colormap_strength"],
        hue_variation_strength=0.08,
        domain=domain,
        # POM defaults (terrain_params.py:2277-2288)
        pom=dict(enabled=True, height_scale=0.04, min_steps=12,
                 max_steps=40, refine_steps=4, occlusion=True),
        # recipe goldens bake the older shader generation (spacing-
        # consistent shadow world + pre-P5 IBL fill 0.22)
        generation="recipe",
    )
    return {"kw": kw, "lut": lut, "lit": lit, "dem": dem}


def render_screen_base(recipe, dem, *, out_size=None):
    """Render the recipe's screen-mode terrain base through the TPU
    engine and nearest-resize to the output size. Returns (H,W,4) u8."""
    from .terrain import screen as eng

    d = derive_screen_params(recipe, dem)
    W = int(recipe.output.size_px[0]) if out_size is None else out_size[0]
    H = int(recipe.output.size_px[1]) if out_size is None else out_size[1]
    rw, rh = max(64, W), max(64, H)
    wm = derive_water_mask_for_recipe(recipe, d["dem"])
    # the offline accumulation path (samples > 1) resolves with the
    # exact sRGB EOTF instead of the realtime pow-gamma
    encode = ("srgb" if int(getattr(recipe.output, "samples", 1)) > 1
              else "gamma")
    mm = material_maps_for_recipe(recipe)
    rgba = eng.render_screen_scene(
        d["dem"], d["lut"], size_px=(rw, rh), water_mask=wm,
        encode=encode, material_maps=mm, **d["kw"])
    rgba = np.asarray(rgba)
    if rgba.shape[:2] != (H, W):
        rgba = resize_nearest_rgba(rgba, (H, W))
    return rgba


def resize_nearest_rgba(image, target_shape):
    # map_scene.py:303-316
    th, tw = int(target_shape[0]), int(target_shape[1])
    sh, sw = image.shape[:2]
    if (sh, sw) == (th, tw) or th <= 0 or tw <= 0:
        return image
    sy = np.clip(np.arange(th) * sh // th, 0, sh - 1)
    sx = np.clip(np.arange(tw) * sw // tw, 0, sw - 1)
    return np.ascontiguousarray(image[sy[:, None], sx[None, :]])


def derive_water_mask_for_recipe(recipe, dem):
    """map_scene.py:756-779: explicit mask, else auto mask derivation."""
    wm = getattr(recipe, "water_mask", None)
    if wm is not None:
        return np.asarray(wm, np.float32)
    level = getattr(recipe, "water_level", None)
    md = dict(getattr(recipe.terrain, "metadata", None) or {})
    water = md.get("water") if isinstance(md.get("water"), Mapping) else None
    settings = {}
    if isinstance(getattr(recipe, "lighting", None), LightingPreset):
        settings = recipe.lighting.settings
    if water is None and isinstance(settings.get("water"), Mapping):
        water = settings["water"]
    if water is None and level is None:
        return None
    cfg = dict(water or {})
    if level is not None:
        cfg.setdefault("level", float(level))
        cfg.setdefault("enabled", True)
        cfg.setdefault("auto_mask", True)
    if not cfg.get("enabled", cfg.get("auto_mask", False)):
        return None
    if not cfg.get("auto_mask", False):
        return None
    return derive_water_mask(
        np.asarray(dem, np.float32),
        level=(float(cfg["level"]) if cfg.get("level") is not None
               else None),
        slope_threshold=float(cfg.get("slope_threshold", 0.02)))


def derive_water_mask(heightmap, *, level=None, quantile=0.15,
                      slope_threshold=0.02):
    """Low, flat DEM regions -> water (reference gis.py:73-93)."""
    dem = np.asarray(heightmap, np.float32)
    finite = np.isfinite(dem)
    if not finite.any():
        return np.zeros(dem.shape, np.float32)
    threshold = (float(level) if level is not None
                 else float(np.nanquantile(dem[finite], float(quantile))))
    gy, gx = np.gradient(np.where(finite, dem, threshold))
    slope = np.hypot(gx, gy)
    mask = finite & (dem <= threshold) & (slope <= float(slope_threshold))
    return np.ascontiguousarray(mask.astype(np.float32))


# ---------------------------------------------------------------------------
# Screen-space postfx (map_scene.py:884-951, exact restatement)
# ---------------------------------------------------------------------------

def _screen_space_settings(recipe) -> Optional[Dict[str, Any]]:
    data = getattr(recipe, "screen_space", None)
    if data is None and isinstance(getattr(recipe, "lighting", None),
                                   LightingPreset):
        s = recipe.lighting.settings
        data = s.get("screen_space") or s.get("postfx")
    if not isinstance(data, Mapping):
        if float(getattr(recipe, "ssr_intensity", 0.0) or 0.0) > 0.0:
            data = {"ssr": {"enabled": True,
                            "intensity": float(recipe.ssr_intensity)}}
        else:
            return None

    def child(name):
        v = data.get(name)
        return v if isinstance(v, Mapping) else {}

    ssao, ssgi, ssr, taa = (child(k) for k in
                            ("ssao", "ssgi", "ssr", "taa"))
    out = {
        "ssao_enabled": bool(ssao.get("enabled",
                                      data.get("ssao_enabled", False))),
        "ssao_radius": float(ssao.get("radius",
                                      data.get("ssao_radius", 1.5))),
        "ssao_intensity": float(ssao.get("intensity",
                                         data.get("ssao_intensity", 1.0))),
        "ssgi_enabled": bool(ssgi.get("enabled",
                                      data.get("ssgi_enabled", False))),
        "ssgi_intensity": float(ssgi.get("intensity",
                                         data.get("ssgi_intensity", 1.0))),
        "ssr_enabled": bool(ssr.get("enabled",
                                    data.get("ssr_enabled", False))),
        "ssr_intensity": float(ssr.get("intensity",
                                       data.get("ssr_intensity", 1.0))),
        "taa_enabled": bool(taa.get("enabled",
                                    data.get("taa_enabled", False))),
    }
    enabled = bool(data.get("enabled", False)) or any(
        out[k] for k in ("ssao_enabled", "ssgi_enabled", "ssr_enabled",
                         "taa_enabled"))
    return out if enabled else None


def apply_screen_space_postfx(rgba, recipe, dem):
    """The reference's numpy postfx pass (map_scene.py:884-951)."""
    s = _screen_space_settings(recipe)
    if s is None:
        return rgba
    out = np.ascontiguousarray(np.asarray(rgba, np.uint8).copy())
    rgb = out[..., :3].astype(np.float32)
    height, width = out.shape[:2]

    dem = np.asarray(dem, np.float32)
    if dem.ndim == 2 and dem.size > 0:
        yy = np.linspace(0, dem.shape[0] - 1, height).astype(np.int32)
        xx = np.linspace(0, dem.shape[1] - 1, width).astype(np.int32)
        sampled = dem[np.ix_(yy, xx)].astype(np.float32)
        span = max(float(sampled.max() - sampled.min()), 1.0e-6)
        height_norm = (sampled - float(sampled.min())) / span
    else:
        height_norm = np.zeros((height, width), np.float32)

    gy, gx = np.gradient(height_norm)
    slope = np.clip(np.sqrt(gx * gx + gy * gy)
                    * max(1.0, float(s["ssao_radius"])), 0.0, 1.0)

    if s["ssao_enabled"]:
        occlusion = np.clip((1.0 - height_norm) * 0.55 + slope * 0.45,
                            0.0, 1.0)
        ao = 1.0 - occlusion * min(0.55, 0.22 * s["ssao_intensity"])
        rgb *= ao[..., None]
    if s["ssgi_enabled"]:
        bounce = (1.0 - slope) * height_norm
        warm = np.asarray((1.035, 1.025, 0.985), np.float32)
        rgb = rgb * (1.0 + bounce[..., None]
                     * min(0.18, 0.06 * s["ssgi_intensity"]) * warm)
    if s["ssr_enabled"]:
        wm = derive_water_mask_for_recipe(recipe, dem)
        if wm is not None and wm.ndim == 2 and wm.size > 0:
            yy = np.linspace(0, wm.shape[0] - 1, height).astype(np.int32)
            xx = np.linspace(0, wm.shape[1] - 1, width).astype(np.int32)
            screen_mask = np.clip(wm[np.ix_(yy, xx)], 0.0, 1.0)
        else:
            screen_mask = np.clip(1.0 - height_norm * 8.0, 0.0, 1.0)
        reflected = np.flip(rgb, axis=0)
        fresnel = np.linspace(0.25, 0.95, height,
                              dtype=np.float32)[:, None]
        mix = screen_mask * fresnel * min(0.60, 0.32 * s["ssr_intensity"])
        rgb = rgb * (1.0 - mix[..., None]) + reflected * mix[..., None]
    out[..., :3] = np.clip(rgb, 0.0, 255.0).astype(np.uint8)
    return out


def apply_cloud_shadow(rgba, recipe):
    """map_scene.py:815-845 deterministic sinusoid cloud shadow."""
    cfg = getattr(recipe, "clouds", None)
    if cfg is None:
        md = dict(getattr(recipe.terrain, "metadata", None) or {})
        cfg = md.get("clouds") if isinstance(md.get("clouds"),
                                             Mapping) else None
    if not isinstance(cfg, Mapping):
        return rgba
    shadows_enabled = bool(cfg.get("shadows_enabled",
                                   cfg.get("shadow_enabled", False)))
    if not (bool(cfg.get("enabled", shadows_enabled)) and shadows_enabled):
        return rgba
    out = np.ascontiguousarray(np.asarray(rgba, np.uint8).copy())
    height, width = out.shape[:2]
    offset_x = float(cfg.get("shadow_offset_x",
                             cfg.get("wind_offset_x", 0.0)))
    offset_y = float(cfg.get("shadow_offset_y",
                             cfg.get("wind_offset_y", 0.0)))
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    scale = {"low": 2.0, "medium": 3.0, "high": 4.5,
             "ultra": 6.0}.get(str(cfg.get("quality", "medium")), 3.0)
    u = xx / max(1.0, float(width - 1)) + offset_x
    v = yy / max(1.0, float(height - 1)) + offset_y
    field = (0.55 * np.sin((u * scale + v * 0.7) * 2.0 * np.pi)
             + 0.30 * np.sin((u * 1.7 - v * scale) * 2.0 * np.pi + 0.6)
             + 0.15 * np.sin((u * 5.1 + v * 4.3) * 2.0 * np.pi + 1.7))
    field = (field - field.min()) / max(float(field.max() - field.min()),
                                        1.0e-6)
    coverage = float(cfg.get("coverage", 0.5))
    density = float(cfg.get("density", 0.5))
    strength = float(cfg.get("shadow_strength",
                             cfg.get("shadow_intensity", 0.35)))
    cloud = np.clip((field - (1.0 - coverage)) / max(0.05, density),
                    0.0, 1.0)
    shadow = 1.0 - cloud * strength
    rgb = out[..., :3].astype(np.float32) * shadow[..., None]
    out[..., :3] = np.clip(rgb, 0.0, 255.0).astype(np.uint8)
    return out


def material_maps_for_recipe(recipe):
    """map_scene.py:712-735 _mapscene_material_settings: material map
    textures from terrain metadata (normal/roughness/mask), as arrays
    (HxWx3 / HxW in [0,1]) or PNG paths."""
    md = dict(getattr(recipe.terrain, "metadata", None) or {})
    data = md.get("material_maps") or md.get("materials")
    if not isinstance(data, Mapping):
        return None
    out = {}
    for key, alias in (("normal_path", "normal"),
                       ("roughness_path", "roughness"),
                       ("mask_path", "mask")):
        value = data.get(key)
        if value is None:
            value = data.get(alias)
        if value is None:
            continue
        if isinstance(value, (str,)):
            from .io.image import png_to_numpy

            arr = png_to_numpy(value).astype(np.float32) / 255.0
        else:
            arr = np.asarray(value, np.float32)
            if arr.dtype == np.uint8 or arr.max() > 1.5:
                arr = arr.astype(np.float32) / 255.0
        if alias == "normal":
            out["normal"] = arr[..., :3]
        else:
            out[alias] = arr[..., 0] if arr.ndim == 3 else arr
    return out or None
