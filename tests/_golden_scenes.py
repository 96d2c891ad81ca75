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
