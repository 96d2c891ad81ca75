# tests/_golden_scenes.py
# Canonical scene registry for the golden-image gates. Each entry renders
# deterministically on the CPU test backend (conftest pins it) and is
# small enough to run in CI. Mirrors the reference's recipe-golden corpus
# (tests/golden/recipes/, SURVEY §4).

import numpy as np


def _dem(n=49, seed=3):
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    rng = np.random.default_rng(seed)
    return (5.0 * np.sin(x * 0.22) * np.cos(y * 0.19)
            + rng.normal(0, 0.2, (n, n))).astype(np.float32)


def render_terrain_pt():
    import forge3d_tpu as f3d

    out = f3d.hybrid_render_terrain_reference(
        _dem(), 96, 72, {"origin": (24, 18, 70), "look_at": (24, 0, 24)},
        spp=2, min_frames=4, max_frames=8, variance_threshold=1e9, seed=11)
    return out["rgba"]


def render_scene_colormap():
    from forge3d_tpu.scene import Scene

    sc = Scene(96, 72, grid=49, colormap="viridis")
    sc.set_height_from_r32f(_dem())
    sc.set_camera_look_at((1.8, 1.4, 1.8), (0, 0, 0), (0, 1, 0),
                          45, 0.1, 100)
    return sc.render_rgba()


def render_megakernel_spheres():
    from forge3d_tpu.pt.megakernel import pt_render_gpu

    scene = [
        {"center": (0, 1, 0), "radius": 1.0, "albedo": (0.8, 0.2, 0.2),
         "roughness": 0.3},
        {"center": (2.2, 0.7, -1), "radius": 0.7,
         "albedo": (0.2, 0.4, 0.8), "metallic": 1.0, "roughness": 0.15},
        {"center": (-2.0, 0.5, 0.5), "radius": 0.5,
         "albedo": (0.9, 0.8, 0.3), "roughness": 0.6},
    ]
    return pt_render_gpu(96, 72, scene, {"origin": (0, 1.5, 5.5)})


def render_mesh_box():
    import forge3d_tpu as f3d
    from forge3d_tpu.geometry import primitive_mesh, weld_mesh

    m = weld_mesh(primitive_mesh("box"))
    return f3d.pt_render_gpu_mesh(
        96, 72, m.vertices, m.indices,
        {"origin": (1.2, 1.0, 2.2), "look_at": (0, 0, 0)})["rgba"]


def render_night_sky():
    from forge3d_tpu.astro import julian_date, render_night_sky

    return render_night_sky(96, 72, julian_date(2026, 3, 1, 5),
                            46.85, -121.76, azimuth_deg=180,
                            altitude_deg=35)


GOLDEN_SCENES = {
    "terrain_pt": render_terrain_pt,
    "scene_colormap": render_scene_colormap,
    "megakernel_spheres": render_megakernel_spheres,
    "mesh_box": render_mesh_box,
    "night_sky": render_night_sky,
}


def render_mapscene_buildings():
    from forge3d_tpu.mapscene import (BuildingLayer, MapScene, OrbitCamera,
                                      OutputSpec, SceneRecipe, TerrainSource)

    fps = [np.array([[14.0, 14.0], [22.0, 14.0], [22.0, 22.0], [14.0, 22.0]]),
           np.array([[28.0, 20.0], [34.0, 22.0], [32.0, 28.0], [26.0, 26.0]])]
    rec = SceneRecipe(
        terrain=TerrainSource(dem=_dem()),
        camera=OrbitCamera(phi_deg=225, theta_deg=35),
        output=OutputSpec(size_px=(96, 72)),
        layers=[BuildingLayer(footprints=fps, heights=[8.0, 12.0],
                              color=(0.75, 0.55, 0.45))],
    )
    return MapScene(rec).render().rgba


def render_mapscene_labels():
    from forge3d_tpu.mapscene import (LabelLayer, MapScene, OrbitCamera,
                                      OutputSpec, SceneRecipe, TerrainSource)

    rec = SceneRecipe(
        terrain=TerrainSource(dem=_dem()),
        camera=OrbitCamera(phi_deg=225, theta_deg=40),
        output=OutputSpec(size_px=(128, 96)),
        layers=[LabelLayer(labels=[
            {"text": "Summit", "position": (24.0, 20.0), "priority": 2.0},
            {"text": "Valley", "position": (12.0, 34.0)},
        ])],
    )
    return MapScene(rec).render().rgba


def render_label_arabic_joining():
    # Arabic text shapes with joining forms before rasterization
    # (ref: tests' Arabic-joining recipe golden)
    from forge3d_tpu.labels.render import draw_text_rgba

    img = np.full((48, 192, 4), (30, 34, 40, 255), np.uint8)
    draw_text_rgba(img, "مرحبا", 30.0, 30.0,
                   size=18, color=(255, 255, 255, 255),
                   halo_color=(0, 0, 0, 255), halo_width=2.0)
    return img


def render_terrain_water():
    from forge3d_tpu.terrain.params import WaterSettings, make_terrain_params
    from forge3d_tpu.terrain.renderer import TerrainRenderer

    dem = _dem() - 2.0  # sink the valleys below the water level
    p = make_terrain_params(size_px=(96, 72))
    p.water = WaterSettings(enabled=True, level=-1.0)
    return TerrainRenderer().render_terrain_pbr_pom(
        params=p, heightmap=dem).rgba


def render_smoke_overlay():
    from forge3d_tpu.smoke import SmokeDomain, SmokeEmitter

    dom = SmokeDomain(24, 24, 24)
    em = SmokeEmitter(center=(12.0, 4.0, 12.0), radius=3.0)
    for _ in range(6):
        dom.step(emitters=[em])
    return dom.render_rgba(96, 72)


def render_sweep_terrain():
    import forge3d_tpu as f3d

    out = f3d.hybrid_render_terrain_reference(
        _dem(65, seed=5), 96, 72,
        {"origin": (32, 22, 85), "look_at": (32, 0, 32)},
        spp=2, seed=9, traversal="sweep")
    return out["rgba"]


def render_aov_normal():
    from forge3d_tpu.terrain.params import make_terrain_params
    from forge3d_tpu.terrain.renderer import TerrainRenderer

    _, aov = TerrainRenderer().render_with_aov(
        params=make_terrain_params(size_px=(96, 72)), heightmap=_dem())
    n = np.asarray(aov["normal"], np.float32)
    return (np.clip(n * 0.5 + 0.5, 0, 1) * 255).astype(np.uint8)


GOLDEN_SCENES.update({
    "mapscene_buildings": render_mapscene_buildings,
    "mapscene_labels": render_mapscene_labels,
    "label_arabic_joining": render_label_arabic_joining,
    "terrain_water": render_terrain_water,
    "smoke_overlay": render_smoke_overlay,
    "sweep_terrain": render_sweep_terrain,
    "aov_normal": render_aov_normal,
})
