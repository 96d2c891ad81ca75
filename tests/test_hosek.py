# Hosek-Wilkie RGB sky: cooked radiances must match the reference's own
# unit-test oracle values (src/terrain/hosek_sky.rs tests), and the baked
# env map must drive the terrain renderer's IBL path.

import numpy as np
import pytest

from forge3d_tpu.sky import (
    hosek_environment_map,
    hosek_radiance,
    make_hosek_sky,
)


@pytest.mark.parametrize("elev,expected", [
    (5.0, [4.7384243, 4.948955, 4.363799]),
    (30.0, [7.7493615, 11.054964, 15.104219]),
    (75.0, [7.530953, 11.732584, 18.974882]),
])
def test_cooked_radiance_matches_reference_oracle(elev, expected):
    sky = make_hosek_sky(0.0, elev, turbidity=3.0, ground_albedo=0.3)
    got = np.asarray(sky.radiances)
    assert np.allclose(got, expected, atol=1e-3), got


def test_radiance_field_properties():
    sky = make_hosek_sky(315.0, 40.0)
    # circumsolar brightening: directions near the sun are brighter than
    # the opposite horizon-height direction
    s = np.asarray(sky.sun_dir)
    near = hosek_radiance(sky, *(float(c) for c in s))
    far = hosek_radiance(sky, -float(s[0]), float(s[1]), -float(s[2]))
    assert float(near[2]) > float(far[2])
    # all-sky positivity and finiteness
    env = hosek_environment_map(315.0, 40.0, width=64, height=32)
    assert np.isfinite(env).all() and (env > 0).all()


def test_turbidity_shifts_spectrum():
    clear = make_hosek_sky(0.0, 45.0, turbidity=1.5)
    hazy = make_hosek_sky(0.0, 45.0, turbidity=9.0)
    # hazier skies are relatively less blue at the zenith
    cr, cg, cb = (float(v) for v in hosek_radiance(clear, 0.0, 1.0, 0.0))
    hr, hg, hb = (float(v) for v in hosek_radiance(hazy, 0.0, 1.0, 0.0))
    assert cb / max(cr, 1e-6) > hb / max(hr, 1e-6)


def test_renderer_ibl_uses_hosek_bake():
    from forge3d_tpu.terrain.params import make_terrain_params
    from forge3d_tpu.terrain.renderer import TerrainRenderer

    n = 33
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = 3.0 * np.sin(x * 0.3) * np.cos(y * 0.25)
    p = make_terrain_params(size_px=(64, 48))
    p.ibl.enabled = True
    p.ibl.intensity = 0.2
    frame_hosek = TerrainRenderer().render_terrain_pbr_pom(
        params=p, heightmap=dem)
    p2 = make_terrain_params(size_px=(64, 48))
    p2.ibl.enabled = True
    p2.ibl.intensity = 0.2
    p2.ibl.sky_model = "gradient"
    frame_grad = TerrainRenderer().render_terrain_pbr_pom(
        params=p2, heightmap=dem)
    d = np.abs(frame_hosek.rgba[..., :3].astype(int)
               - frame_grad.rgba[..., :3].astype(int))
    assert d.max() > 5, "hosek bake did not change the IBL render"
    assert np.isfinite(frame_hosek.rgba.astype(float)).all()
