# Tests for the scatter-placement building compositor and the
# behavior-exact screen-space postfx (reference map_scene.py:884-951).
import copy

import numpy as np
import pytest

import tests.test_reference_golden_parity as P
from forge3d_tpu.mapscene import MapScene


@pytest.fixture(scope="module")
def buildings_recipe():
    return P._recipes()["mapscene_buildings"]


@pytest.fixture(scope="module")
def base_and_render(buildings_recipe):
    rec2 = copy.deepcopy(buildings_recipe)
    rec2.layers = []
    base = MapScene(rec2).render().rgba
    full = MapScene(buildings_recipe).render().rgba
    return base, full


def test_buildings_render_deterministic(buildings_recipe):
    a = MapScene(buildings_recipe).render().rgba
    b = MapScene(copy.deepcopy(buildings_recipe)).render().rgba
    assert np.array_equal(a, b)


def test_buildings_overwrite_is_localized(base_and_render):
    base, full = base_and_render
    changed = (np.abs(full[..., :3].astype(int)
                      - base[..., :3].astype(int)).max(-1) > 0)
    frac = changed.mean()
    # buildings + shadows cover a minority of the frame
    assert 0.05 < frac < 0.75


def test_building_mesh_tris_roof_normals_up(buildings_recipe):
    ms = MapScene(buildings_recipe)
    sc = np.array([[-0.4, -0.4], [0.4, -0.4], [0.4, 0.4], [-0.4, 0.4]])
    for roof in ("gabled", "hipped", "pyramidal"):
        tris, norms, cols = ms._building_mesh_tris(sc, 0.6, roof, np.ones(3))
        # roof triangles come last; every roof normal points up
        n_roof = {"gabled": 6, "hipped": 6, "pyramidal": 4}[roof]
        for nrm in norms[-n_roof:]:
            assert nrm[1] >= 0.0
        # wall normals are horizontal unit vectors (caps occupy 0..3)
        for nrm in norms[4:4 + 8]:
            assert abs(np.hypot(nrm[0], nrm[2]) - 1.0) < 1e-6


def test_roof_triangles_reference_layout(buildings_recipe):
    ms = MapScene(buildings_recipe)
    fp = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 1.0], [0.0, 1.0]])
    # hipped ridge at the 0.3/0.7 lerp of the long axis
    tris = ms._roof_triangles(fp, 0.5, "hipped")
    ridge_x = sorted({round(float(v[0]), 6) for tri in tris for v in tri
                      if v[1] > 0.5})
    assert ridge_x == [0.6, 1.4]
    assert ms._roof_triangles(fp, 0.5, "flat") == []


def test_screen_space_ssr_flips_water(buildings_recipe):
    # SSR blends the vertically flipped frame into the water mask region
    rec = copy.deepcopy(P._recipes()["mapscene_auto_water"])
    base = MapScene(copy.deepcopy(rec)).render().rgba
    rec.ssr_intensity = 0.85
    out = MapScene(rec).render().rgba
    d = np.abs(out[..., :3].astype(int) - base[..., :3].astype(int)).max(-1)
    assert (d > 0).any()
    # rows without water stay identical
    water_rows = (d > 0).any(axis=1)
    assert not water_rows.all()


def test_screen_space_ssao_darkens_only(buildings_recipe):
    rec = copy.deepcopy(P._recipes()["mapscene_terrain_raster"])
    base = MapScene(copy.deepcopy(rec)).render().rgba
    rec.screen_space = {"ssao": {"enabled": True, "radius": 2.0,
                                 "intensity": 1.2}}
    out = MapScene(rec).render().rgba
    assert (out[..., :3].astype(int) <= base[..., :3].astype(int) + 1).all()
    assert (out[..., :3].astype(int) < base[..., :3].astype(int)).any()


def test_screen_space_ssgi_brightens_only(buildings_recipe):
    rec = copy.deepcopy(P._recipes()["mapscene_terrain_raster"])
    base = MapScene(copy.deepcopy(rec)).render().rgba
    rec.screen_space = {"ssgi": {"enabled": True, "intensity": 1.0}}
    out = MapScene(rec).render().rgba
    assert (out[..., :3].astype(int) >= base[..., :3].astype(int) - 1).all()
