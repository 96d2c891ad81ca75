# Reference-golden parity: the NON-recipe golden families (VERDICT r2 item 3).
#
# The reference gates pixels for five more golden families beyond the
# mapscene recipes:
#   - tests/golden/hybrid_terrain/mini_dem_reference.png
#     (test_hybrid_terrain_pt.py:805-843 — the north-star PT path)
#   - tests/golden/presets/rainier_showcase_mapscene.png
#     (test_preset_visual_parity.py:129-156)
#   - tests/golden/terrain/*.png (test_terrain_visual_goldens.py,
#     test_terrain_tv10_goldens.py — screen-mode PBR renders)
#   - tests/golden/adjudication/{pt,raster}_reference.png
#     (test_adjudication_gate.py — the built-in analytic scene)
#
# Same ratchet mechanics as tests/test_reference_golden_parity.py: scores
# are tracked in a committed scoreboard; the 0.995-SSIM reference gate is
# the end goal. Update with:
#   FORGE3D_UPDATE_FAMILY_PARITY=1 python -m pytest tests/test_reference_family_goldens.py

import json
import os
from pathlib import Path

import numpy as np
import pytest

from forge3d_tpu import colormaps
from forge3d_tpu.utils.metrics import ssim

GOLDEN_ROOT = Path("/root/reference/tests/golden")
SCOREBOARD = Path(__file__).parent / "goldens" / "reference_family_parity.json"
RATCHET_SLACK = 0.02


def _register_stops(name, stops):
    """Colormap1D.from_stops equivalent: piecewise-linear sRGB LUT."""
    pos = np.array([s[0] for s in stops], np.float64)
    cols = np.array([[int(s[1][i:i + 2], 16) / 255.0 for i in (1, 3, 5)]
                     for s in stops], np.float64)
    t = np.linspace(0, 1, 256)
    lut = np.stack([np.interp(t, pos, cols[:, c]) for c in range(3)], -1)
    try:
        colormaps.register(name, lut.astype(np.float32))
    except Exception:
        pass
    return name


def _terrain_family_colormap():
    return _register_stops("ref_terrain_family_stops", [
        (0.0, "#18391f"), (0.38, "#4e7c35"), (0.65, "#8f7a4a"),
        (0.82, "#b8ac88"), (1.0, "#f2f4f7")])


def _terrain_family_heightmap(size=96):
    x = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    y = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    xx, yy = np.meshgrid(x, y)
    ridge = 0.52 * np.exp(-((xx + 0.25) ** 2 * 6.5 + (yy - 0.12) ** 2 * 10.0))
    basin = -0.18 * np.exp(-((xx - 0.05) ** 2 * 20.0 + (yy + 0.05) ** 2 * 24.0))
    spur = 0.22 * np.exp(-((xx - 0.42) ** 2 * 28.0 + (yy + 0.22) ** 2 * 18.0))
    slope = 0.25 * (1.0 - yy) + 0.10 * xx
    hm = ridge + basin + spur + slope
    hm -= hm.min()
    hm /= max(float(hm.max()), 1e-6)
    return hm.astype(np.float32)


def _preset_heightmap(size=128):
    x = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    y = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    xx, yy = np.meshgrid(x, y)
    peak = 700.0 * np.exp(-4.0 * (xx * xx + yy * yy))
    ridges = 90.0 * np.sin(10.0 * xx) * np.cos(8.0 * yy)
    return (1200.0 + peak + ridges).astype(np.float32)


def _render_hybrid_mini_dem():
    """North-star PT entry: the reference renders this golden with its
    ReSTIR-reuse sun estimator (hybrid_terrain_traversal.wgsl:455-462
    reuse_w through the temporal+spatial chain), which brightens penumbra
    and grazing regions by up to ~2x vs plain sun NEE. The sweep engine
    matches the restir=False estimator bit-for-bit in the mean (0.1751 vs
    0.1750 on this scene), so this entry drives the per-ray DDA engine
    with restir=True to match the golden's estimator. Scene per
    test_hybrid_terrain_pt.py:30-80 (mini_dem[::2,::2], SPAN 100,
    RELIEF 20, sun 225/35 @ 2.5 warm-white, env 0.35)."""
    from forge3d_tpu.pt.terrain_ref import (TerrainRefDesc,
                                            render_terrain_reference)

    dem = np.load(
        "/root/reference/python/forge3d/data/mini_dem.npy")[::2, ::2]
    dem = dem.astype(np.float32)
    dem -= dem.min()
    dem /= max(float(dem.max()), 1e-6)
    half = 50.0
    spacing = 100.0 / (dem.shape[1] - 1)
    desc = TerrainRefDesc(
        heights=dem, width=256, height=256,
        # the reference centers the DEM at the origin; our terrain world
        # starts at 0, so the locked camera translates by +half
        cam_origin=(half, 35.0, half + 90.0),
        cam_look_at=(half, 5.0, half),
        cam_up=(0.0, 1.0, 0.0), fov_y_deg=45.0, exposure=1.0,
        spacing=(spacing, spacing), exaggeration=20.0,
        albedo=(0.55, 0.52, 0.48), sun_azimuth_deg=225.0,
        sun_elevation_deg=35.0, sun_intensity=2.5,
        sun_color=(1.0, 0.97, 0.92), env_map=None, env_intensity=0.35,
        # the golden's accumulation schedule (test_hybrid_terrain_pt.py:
        # 47-79: spp=1, 32..512 frames at variance 1e-3) is load-bearing:
        # the ReSTIR reuse weight RAMPS over frames, so the accumulated
        # mean depends on the frame count — an 8spp x 24-frame shortcut
        # under-weights the sun by ~6% in lit regions (round-5 diagnosis)
        spp=1, max_frames=512, min_frames=32, variance_threshold=1e-3,
        seed=7, restir=True, shadows_enabled=True, traversal="dda")
    return render_terrain_reference(desc)["rgba"]


def _register_lut(name, lut_rgb):
    try:
        colormaps.register(name, np.asarray(lut_rgb, np.float32))
    except Exception:
        pass
    return name


def _engine_screen_render(dem, *, colormap, water_mask=None, **scene_kw):
    """Render a reference screen-mode scene through the PRODUCT path:
    TerrainRenderer(camera_mode="screen") -> jitted screen pipeline
    (forge3d_tpu/terrain/screen.py). scene_kw uses the replica scene
    schema (screen_golden.FAMILY_SCENES keys) and is mapped onto
    TerrainRenderParams groups — the same mapping MapScene performs."""
    from forge3d_tpu.terrain.params import make_terrain_params
    from forge3d_tpu.terrain.renderer import IBL, TerrainRenderer
    from forge3d_tpu.terrain.screen import blit_resolve

    kw = dict(scene_kw)
    size_px = kw.pop("size_px", (192, 128))
    render_scale = float(kw.pop("render_scale", 1.0))
    hdr = kw.pop("hdr_rgb", None)
    mats = kw.pop("materials", None)
    pom = kw.pop("pom", None)
    sky = kw.pop("sky", None)
    refl = kw.pop("reflection", None)
    groups = {}
    if mats is not None:
        groups["material_layers"] = dict(mats, enabled=True)
    if pom is not None:
        pd = dict(pom)
        pd.pop("mode", None)
        groups["pom"] = dict(
            enabled=bool(pd.pop("enabled", True)),
            scale=float(pd.pop("height_scale", 0.0)), **pd)
    if sky is not None:
        groups["sky"] = dict(sky)
    if refl is not None:
        groups["reflection"] = dict(refl)
    p = make_terrain_params(
        size_px=size_px, render_scale=render_scale,
        terrain_span=float(kw.pop("terrain_span", 2.8)),
        z_scale=float(kw.pop("z_scale", 1.45)),
        exposure=float(kw.pop("exposure", 1.0)),
        camera_mode="screen",
        cam_radius=float(kw.pop("cam_radius", 5.0)),
        cam_phi_deg=float(kw.pop("cam_phi_deg", 138.0)),
        cam_theta_deg=float(kw.pop("cam_theta_deg", 63.0)),
        fov_y_deg=float(kw.pop("fov_y_deg", 54.0)),
        clip=tuple(kw.pop("clip", (0.1, 6000.0))),
        colormap=colormap,
        albedo_mode=str(kw.pop("albedo_mode", "colormap")),
        colormap_strength=float(kw.pop("colormap_strength", 1.0)),
        hue_variation_strength=float(kw.pop("hue_variation_strength",
                                            0.08)),
        domain=tuple(kw.pop("domain", (0.0, 1.0))),
        light=dict(azimuth_deg=float(kw.pop("light_azimuth_deg", 135.0)),
                   elevation_deg=float(kw.pop("light_elevation_deg", 24.0)),
                   intensity=float(kw.pop("sun_intensity", 2.4)),
                   color=tuple(kw.pop("sun_color", (1.0, 1.0, 1.0)))),
        ibl=dict(enabled=True,
                 intensity=float(kw.pop("ibl_intensity", 1.0)),
                 env_map=hdr),
        **groups,
    )
    assert not kw, f"unmapped scene keys: {sorted(kw)}"
    frame = TerrainRenderer().render_terrain_pbr_pom(
        params=p, heightmap=np.asarray(dem, np.float32),
        env_maps=IBL(env_map=hdr) if hdr is not None else None,
        water_mask=water_mask)
    rgba = frame.rgba
    if rgba.shape[:2] != (size_px[1], size_px[0]):
        rgba = blit_resolve(rgba, size_px[0], size_px[1])
    return rgba


def _render_preset_rainier():
    """rainier_showcase preset scene through the engine screen path
    (test_preset_visual_parity.py:31-56,129-156 reference): synthetic
    128^2 peak+ridges DEM, preset camera radius_scale 2.4 / az 135 /
    el 45 / fov 55, preset sun az 135 / el 25 @ 4.0 (1,0.95,0.9),
    IBL 0.3 on the deterministic 2x2 clear-sky env
    (map_scene._write_minimal_hdr), terrain colormap stops rescaled to
    the DEM domain, albedo mix 0.5, exaggeration 1.35."""
    from forge3d_tpu.terrain import screen as eng

    dem = _preset_heightmap()
    lo, hi = float(dem.min()), float(dem.max())
    stops = [(0.0, "#00aa00"), (0.3, "#80ff00"), (0.5, "#ffff00"),
             (0.7, "#ff8000"), (0.9, "#ff0000"), (1.0, "#800000")]
    lut = eng.build_lut_from_stops(stops)
    env = np.full((2, 2, 3), 0.0, np.float32)
    env[:] = np.array([180.0, 190.0, 205.0], np.float32) / 256.0
    return _engine_screen_render(
        dem, colormap=_register_lut("ref_rainier_stops", lut),
        size_px=(128, 128), terrain_span=128.0, z_scale=1.35,
        exposure=1.0, light_azimuth_deg=135.0,
        # sun elevation decoded from the preset direction
        # (0.64, 0.42, -0.64) -> asin(0.42/|d|) = 24.893
        light_elevation_deg=24.893,
        sun_intensity=4.0, sun_color=(1.0, 0.95, 0.9), ibl_intensity=0.3,
        cam_radius=128 * 2.4, cam_phi_deg=135.0, cam_theta_deg=45.0,
        fov_y_deg=55.0, albedo_mode="mix", colormap_strength=0.5,
        domain=(lo, hi), hdr_rgb=env, hue_variation_strength=0.08,
        # MapScene renders with the POM defaults on
        # (terrain_params.py:2277-2288); at this non-unit domain the
        # raw-height march saturates to the full parallax shift and the
        # 0.65-clamped occlusion (screen.py occlusion clamp)
        pom=dict(enabled=True, height_scale=0.04, min_steps=12,
                 max_steps=40, refine_steps=4, occlusion=True))


def _terrain_family_water_mask(size=96):
    """The reference's lake+inlet ellipse mask
    (test_terrain_visual_goldens._build_water_mask)."""
    x = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    y = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    xx, yy = np.meshgrid(x, y)
    lake = ((xx + 0.02) / 0.55) ** 2 + ((yy + 0.18) / 0.28) ** 2 <= 1.0
    inlet = ((xx - 0.34) / 0.22) ** 2 + ((yy + 0.10) / 0.18) ** 2 <= 1.0
    return np.where(lake | inlet, 1.0, 0.0).astype(np.float32)


def _screen_golden_entry(name):
    """Engine entry for a terrain-golden-family scene: the scene config DB
    (screen_golden.FAMILY_SCENES — the reference test suite's scene
    parameters) rendered through TerrainRenderer's camera_mode="screen"
    jitted pipeline. The numpy replica in screen_golden stays as the
    test oracle (tests/test_screen_engine.py pins engine == oracle)."""
    def run():
        from forge3d_tpu.terrain import screen as eng
        from forge3d_tpu.terrain import screen_golden as sg

        kw = dict(sg.FAMILY_SCENES[name])
        wm = sg.family_water_mask() if kw.pop("water_mask", False) else None
        kw.setdefault("size_px", (192, 128))
        hm = {"family": sg.family_heightmap,
              "tv10": sg.tv10_heightmap}[kw.pop("heightmap", "family")]()
        lut = eng.build_lut_from_stops(kw.pop("stops", sg.FAMILY_STOPS))
        blue = kw.pop("hdr_blue", 128)
        kw.setdefault("hdr_rgb", eng.decode_test_hdr(blue=blue))
        return _engine_screen_render(
            hm, colormap=_register_lut(f"ref_family_{name}", lut),
            water_mask=wm, **kw)
    return run


FAMILY_GOLDENS = {
    "hybrid_mini_dem_reference": {
        "golden": GOLDEN_ROOT / "hybrid_terrain" / "mini_dem_reference.png",
        "render": _render_hybrid_mini_dem,
    },
    "preset_rainier_showcase_mapscene": {
        "golden": GOLDEN_ROOT / "presets" / "rainier_showcase_mapscene.png",
        "render": _render_preset_rainier,
    },
    # terrain_pbr/water/atmosphere/low_sun_sky render through the
    # behavior-exact screen-mode replica (forge3d_tpu/terrain/screen_golden
    # re-derives the reference's shade_main/PCSS/IBL/sky pipeline stage by
    # stage); the remaining family entries still use the fitted profiles.
    "terrain_pbr": {
        "golden": GOLDEN_ROOT / "terrain" / "terrain_pbr.png",
        "render": _screen_golden_entry("terrain_pbr"),
    },
    "terrain_water": {
        "golden": GOLDEN_ROOT / "terrain" / "terrain_water.png",
        "render": _screen_golden_entry("terrain_water"),
    },
    "terrain_atmosphere": {
        "golden": GOLDEN_ROOT / "terrain" / "terrain_atmosphere.png",
        "render": _screen_golden_entry("terrain_atmosphere"),
    },
    "terrain_low_sun_sky": {
        "golden": GOLDEN_ROOT / "terrain" / "terrain_low_sun_sky.png",
        "render": _screen_golden_entry("terrain_low_sun_sky"),
    },
    "terrain_pom": {
        "golden": GOLDEN_ROOT / "terrain" / "terrain_pom.png",
        "render": _screen_golden_entry("terrain_pom"),
    },
    "terrain_water_reflection": {
        "golden": GOLDEN_ROOT / "terrain" / "terrain_water_reflection.png",
        "render": _screen_golden_entry("terrain_water_reflection"),
    },
    "terrain_tv10_zero_sss": {
        "golden": GOLDEN_ROOT / "terrain" / "terrain_tv10_zero_sss.png",
        "render": _screen_golden_entry("terrain_tv10_zero_sss"),
    },
    "terrain_tv10_scene_a_sss": {
        "golden": GOLDEN_ROOT / "terrain" / "terrain_tv10_scene_a_sss.png",
        "render": _screen_golden_entry("terrain_tv10_scene_a_sss"),
    },
    "terrain_tv10_scene_b_sss": {
        "golden": GOLDEN_ROOT / "terrain" / "terrain_tv10_scene_b_sss.png",
        "render": _screen_golden_entry("terrain_tv10_scene_b_sss"),
    },
}


def _adjudication_entry(kind):
    def run():
        from forge3d_tpu.pt.adjudication import render_adjudication_builtin

        pt_rgba, raster_rgba, _meta = render_adjudication_builtin(
            512, 512, spp=64)
        return pt_rgba if kind == "pt" else raster_rgba
    return run


FAMILY_GOLDENS["adjudication_pt_reference"] = {
    "golden": GOLDEN_ROOT / "adjudication" / "pt_reference.png",
    "render": _adjudication_entry("pt"),
}
FAMILY_GOLDENS["adjudication_raster_reference"] = {
    "golden": GOLDEN_ROOT / "adjudication" / "raster_reference.png",
    "render": _adjudication_entry("raster"),
}


def _scoreboard():
    if SCOREBOARD.exists():
        return json.loads(SCOREBOARD.read_text())
    return {"target": {"ssim": 0.995, "mean_abs_255": 2.0}, "entries": {}}


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(FAMILY_GOLDENS))
def test_reference_family_golden(name):
    spec = FAMILY_GOLDENS[name]
    if not spec["golden"].exists():
        pytest.skip(f"reference golden missing: {spec['golden']}")
    from forge3d_tpu.io.image import png_to_numpy

    gold = png_to_numpy(spec["golden"]).astype(np.float32)[..., :3] / 255.0
    got = np.asarray(spec["render"]())[..., :3].astype(np.float32) / 255.0
    if got.shape != gold.shape:
        pytest.fail(f"size mismatch {got.shape} vs {gold.shape}")
    s = float(ssim(gold, got))
    mad = float(np.abs(gold - got).mean() * 255.0)
    board = _scoreboard()
    if os.environ.get("FORGE3D_UPDATE_FAMILY_PARITY") == "1":
        board["entries"][name] = {"ssim": round(s, 4),
                                  "mean_abs_255": round(mad, 3)}
        SCOREBOARD.parent.mkdir(exist_ok=True)
        SCOREBOARD.write_text(json.dumps(board, indent=1, sort_keys=True))
        return
    committed = board["entries"].get(name)
    if committed is None:
        pytest.skip(f"no committed family-parity entry for {name}")
    assert s >= committed["ssim"] - RATCHET_SLACK, (
        f"{name}: SSIM regressed to {s:.4f} "
        f"(committed {committed['ssim']:.4f})")


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-p", "no:cacheprovider"])
