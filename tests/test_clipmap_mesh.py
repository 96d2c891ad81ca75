# Tests for the reference-layout clipmap mesh
# (forge3d_tpu/terrain/clipmap_mesh.py) and the mapscene clipmap camera
# mode. Layout contract: src/terrain/clipmap/{level,ring,vertex}.rs.

import numpy as np
import pytest

from forge3d_tpu.terrain.clipmap_mesh import (ClipmapConfig,
                                              build_clipmap_mesh,
                                              clipmap_vertex_heights)


@pytest.fixture(scope="module")
def mesh():
    cfg = ClipmapConfig(4, 32, 32, 10.0, 0.3)
    return build_clipmap_mesh(cfg, (0.0, 0.0), 32.0)


def test_camera_mode_parsing():
    cfg = ClipmapConfig.from_camera_mode("clipmap:4:32:32:10:0.3")
    assert cfg == ClipmapConfig(4, 32, 32, 10.0, 0.3)
    assert ClipmapConfig.from_camera_mode("clipmap").ring_count == 4


def test_ring_bounds_follow_doubling_series(mesh):
    # extent 32: base_cell = 32/256; center half 2; ring outers 6/14/30/62
    pos, uv, morph, tri = mesh
    live = morph[:, 0] >= 0.0   # exclude skirts (twins of ring verts)
    for r, outer in ((0, 6.0), (1, 14.0), (2, 30.0), (3, 62.0)):
        ring = live & (morph[:, 1] == float(r))
        # center block is ring 0 too; take the max radius
        assert np.abs(pos[ring]).max() == pytest.approx(outer)
    assert np.abs(pos).max() == pytest.approx(62.0)


def test_uvs_clamp_to_dem_extent(mesh):
    pos, uv, morph, tri = mesh
    assert uv.min() >= 0.0 and uv.max() <= 1.0
    # interior positions map linearly: uv = (pos + 16) / 32
    inner = np.abs(pos).max(axis=1) <= 16.0
    expect = np.clip((pos[inner] + 16.0) / 32.0, 0.0, 1.0)
    assert np.allclose(uv[inner], expect, atol=1e-5)


def test_skirts_are_flagged_twins(mesh):
    pos, uv, morph, tri = mesh
    skirts = morph[:, 0] < 0.0
    assert skirts.any()
    # every skirt vertex shares its position with a live ring vertex
    live = set(map(tuple, np.round(pos[~skirts], 5)))
    for p in map(tuple, np.round(pos[skirts][:64], 5)):
        assert p in live


def test_morph_weights_in_unit_range(mesh):
    pos, uv, morph, tri = mesh
    live = morph[:, 0] >= 0.0
    assert morph[live, 0].min() >= 0.0
    assert morph[live, 0].max() <= 1.0


def test_triangles_reference_valid_vertices(mesh):
    pos, uv, morph, tri = mesh
    assert tri.min() >= 0 and tri.max() < len(pos)


def test_geomorph_heights_blend_fine_to_coarse():
    rng = np.random.default_rng(0)
    dem = rng.uniform(0, 1, (32, 32)).astype(np.float32)
    cfg = ClipmapConfig(4, 32, 32, 10.0, 0.3)
    pos, uv, morph, tri = build_clipmap_mesh(cfg, (0.0, 0.0), 32.0)
    hv = clipmap_vertex_heights(dem, uv, morph, 32)
    # zero-morph vertices sample the fine field exactly
    zero = (morph[:, 0] == 0.0)
    u = uv[zero, 0] * 31
    v = uv[zero, 1] * 31
    on_lattice = (np.abs(u - np.round(u)) < 1e-5) & \
        (np.abs(v - np.round(v)) < 1e-5)
    ui = np.round(u[on_lattice]).astype(int)
    vi = np.round(v[on_lattice]).astype(int)
    assert np.allclose(hv[zero][on_lattice], dem[vi, ui], atol=1e-5)
    assert np.isfinite(hv).all()


def test_mapscene_clipmap_mode_renders():
    from forge3d_tpu.mapscene import (MapScene, OrbitCamera, OutputSpec,
                                      SceneRecipe, TerrainSource)

    x = np.linspace(-1, 1, 32, dtype=np.float32)
    xx, yy = np.meshgrid(x, x)
    dem = (0.3 * np.sin(xx * 3) * np.cos(yy * 2)).astype(np.float32)
    rec = SceneRecipe(
        terrain=TerrainSource(dem=dem, spacing=(1.0, 1.0), z_scale=10.0),
        camera=OrbitCamera(target=(0.0, 0.0, 0.0), radius=76.8,
                           phi_deg=135.0, theta_deg=45.0, fov_y_deg=55.0),
        output=OutputSpec(size_px=(64, 40)),
        camera_mode="clipmap:4:32:32:10:0.3",
    )
    frame = MapScene(rec).render()
    assert frame.rgba.shape == (40, 64, 4)
    assert frame.metadata["camera_mode"] == "clipmap"
    # both terrain and the clear-color sky must be present
    bg = (frame.rgba[..., :3] == (25, 25, 38)).all(-1)
    assert 0.05 < bg.mean() < 0.95
