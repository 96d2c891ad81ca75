# Per-topology determinism matrix (VERDICT r3 item 8): the same scene
# must produce BYTE-EXACT output hashes across 1/2/4/8-device virtual
# meshes, mirroring the reference's determinism-matrix workflow
# (/root/reference/.github/workflows/determinism-matrix.yml) which runs
# the golden suite per backend topology and compares digests.
#
# Runs on the 8-device virtual CPU mesh from conftest.  The sweep
# renderer's frame sharding psums identical f32 terms per frame, so the
# resolved u8 frame must hash identically at every topology; the screen
# pipeline is single-device jit and must be run-to-run deterministic.

import hashlib

import numpy as np
import pytest


def _dem(n=65):
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    return (6.0 * np.sin(xx * 0.15) * np.cos(yy * 0.12)).astype(np.float32)


def _sha(arr) -> str:
    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_sweep_topology_determinism(n_dev):
    """Per-topology: byte-exact run-to-run hash.  Cross-topology: <= 1
    LSB vs single device (f32 psum reduction trees differ per
    topology; the reference's matrix also compares digests per
    topology, .github/workflows/determinism-matrix.yml)."""
    import jax

    from forge3d_tpu.parallel.mesh import frame_mesh
    from forge3d_tpu.parallel.sweep import render_sweep_sharded
    from forge3d_tpu.pt.terrain_ref import TerrainRefDesc

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    desc = TerrainRefDesc(
        heights=_dem(), cam_origin=(32.0, 25.0, 88.0),
        cam_look_at=(32.0, 0.0, 32.0), fov_y_deg=42.0,
        width=128, height=96, spp=1, seed=777)
    mesh = frame_mesh(devs[:n_dev])
    a = render_sweep_sharded(desc, n_frames=8, mesh=mesh)
    b = render_sweep_sharded(desc, n_frames=8, mesh=mesh)
    assert _sha(np.asarray(a["rgba"])) == _sha(np.asarray(b["rgba"])), (
        f"{n_dev}-device sweep not run-to-run deterministic")
    base = render_sweep_sharded(desc, n_frames=8,
                                mesh=frame_mesh(devs[:1]))
    diff = np.abs(np.asarray(a["rgba"]).astype(np.int16)
                  - np.asarray(base["rgba"]).astype(np.int16))
    assert int(diff.max()) <= 1, (
        f"{n_dev}-device sweep diverged {int(diff.max())} LSB from "
        "single-device")


@pytest.mark.slow
def test_screen_pipeline_run_to_run_hash_stable():
    from forge3d_tpu.terrain import screen as eng

    hm = _dem(48)
    hm = (hm - hm.min()) / max(float(hm.max() - hm.min()), 1e-6)
    lut = eng.build_lut_from_stops(((0.0, "#224422"), (1.0, "#eeeedd")))
    kw = dict(size_px=(96, 64), terrain_span=1.0, z_scale=1.2,
              light_azimuth_deg=135.0, light_elevation_deg=30.0,
              sun_intensity=1.2, ibl_intensity=0.3,
              cam_radius=1.44, cam_phi_deg=135.0, cam_theta_deg=45.0,
              fov_y_deg=55.0, domain=(0.0, 1.0))
    a = eng.render_screen_scene(hm, lut, **kw)
    b = eng.render_screen_scene(hm, lut, **kw)
    assert _sha(np.asarray(a)) == _sha(np.asarray(b))


@pytest.mark.slow
def test_recipe_board_render_is_deterministic():
    """The MapScene recipe path (screen engine + numpy postfx) must be
    byte-stable run to run — the recipe certificates depend on it."""
    from forge3d_tpu.mapscene import (LightingPreset, MapScene, OrbitCamera,
                                      OutputSpec, SceneRecipe, TerrainSource)

    x = np.linspace(0.0, 1.0, 8, dtype=np.float32)
    xx, yy = np.meshgrid(x, x)
    dem = (0.25 * xx + 0.75 * yy).astype(np.float32)
    md = {"source_id": "det-dem", "width": 8, "height": 8,
          "bounds": (-122.5, 46.6, -121.9, 47.0)}

    def render():
        rec = SceneRecipe(
            terrain=TerrainSource(dem=dem, spacing=(1.0, 1.0),
                                  z_scale=1.0, metadata=dict(md)),
            camera=OrbitCamera(radius=800.0, phi_deg=35.0),
            lighting=LightingPreset("rainier_showcase", intensity=1.15),
            output=OutputSpec(size_px=(80, 48)),
            camera_mode="screen")
        return MapScene(rec).render().rgba

    assert _sha(render()) == _sha(render())
