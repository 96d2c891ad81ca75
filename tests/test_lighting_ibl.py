# Tests: lighting stack (typed lights, R2 sequence) + IBL pipeline.

import numpy as np
import pytest

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# lights


def test_light_validation():
    from forge3d_tpu.lighting import Light

    Light(type="spot", inner_cone_deg=10, outer_cone_deg=20)
    with pytest.raises(ValueError):
        Light(type="laser")
    with pytest.raises(ValueError):
        Light(type="spot", inner_cone_deg=40, outer_cone_deg=20)
    with pytest.raises(ValueError):
        Light(intensity=-1)


def test_r2_sequence():
    from forge3d_tpu.lighting import r2_sequence

    s = r2_sequence(512)
    assert s.shape == (512, 2)
    assert s.min() >= 0 and s.max() < 1
    # low discrepancy: mean near center, decent stratification
    assert np.abs(s.mean(0) - 0.5).max() < 0.05
    # frames differ deterministically
    s2 = r2_sequence(512, frame=1)
    assert not np.array_equal(s, s2)
    np.testing.assert_array_equal(s2, r2_sequence(512, frame=1))


def test_eval_lights_directional_point_spot():
    from forge3d_tpu.lighting import Light, LightBuffer, eval_lights

    lights = LightBuffer.from_lights([
        Light(type="directional", direction=(0, -1, 0), intensity=2.0),
        Light(type="point", position=(0, 5, 0), intensity=25.0),
        Light(type="spot", position=(10, 5, 0), direction=(0, -1, 0),
              intensity=25.0, inner_cone_deg=15, outer_cone_deg=25),
    ])
    p = np.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0], [50.0, 0.0, 0.0]],
                 np.float32)
    n = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (3, 1))
    out = np.asarray(eval_lights(lights, p, n))
    # under the point light: directional 2 + point 25/25 = 3
    assert out[0, 0] == pytest.approx(3.0, rel=1e-4)
    # under the spot: directional + point falloff + spot contribution
    assert out[1, 0] > out[2, 0]
    # far away: directional only remains significant
    assert out[2, 0] == pytest.approx(2.0, abs=0.1)


def test_eval_lights_area_jitter():
    from forge3d_tpu.lighting import Light, LightBuffer, eval_lights, r2_sequence

    lights = LightBuffer.from_lights([
        Light(type="rect", position=(0, 4, 0), extent=(2, 2),
              intensity=16.0)])
    p = np.zeros((64, 3), np.float32)
    n = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (64, 1))
    u = r2_sequence(64)
    out = np.asarray(eval_lights(lights, p, n, u=u))
    # jittered samples vary but average near the unjittered center value
    center = np.asarray(eval_lights(lights, p[:1], n[:1]))
    assert out.std() > 0
    assert out.mean() == pytest.approx(float(center.mean()), rel=0.25)


# ---------------------------------------------------------------------------
# IBL


def _env():
    # sky-like gradient + a bright "sun" disc
    h, w = 32, 64
    y = np.linspace(0, np.pi, h)[:, None]
    env = np.zeros((h, w, 3), np.float32)
    env[..., 2] = 0.5 + 0.5 * np.cos(y)          # blue brighter at zenith
    env[..., 0] = 0.2
    env[..., 1] = 0.3
    env[4:7, 10:13] = (20.0, 18.0, 15.0)         # sun blob
    return env


def test_equirect_sampling_and_cubemap():
    from forge3d_tpu.ops.ibl import equirect_to_cubemap, sample_equirect

    env = _env()
    up = sample_equirect(jnp.asarray(env), jnp.asarray([[0.0, 1.0, 0.0]]))
    down = sample_equirect(jnp.asarray(env), jnp.asarray([[0.0, -1.0, 0.0]]))
    assert float(up[0, 2]) > float(down[0, 2])   # zenith bluer
    cube = equirect_to_cubemap(env, 16)
    assert cube.shape == (6, 16, 16, 3)
    # +Y face (index 2) is brighter in blue than -Y (index 3)
    assert float(cube[2, ..., 2].mean()) > float(cube[3, ..., 2].mean())


def test_prefilter_blurs_with_roughness():
    from forge3d_tpu.ops.ibl import prefilter_environment

    mips = prefilter_environment(_env(), base_size=16, mips=3, samples=32)
    assert len(mips) == 3
    # the sun hotspot's peak energy spreads out with roughness
    peak0 = float(jnp.max(mips[0][..., 0]))
    peak2 = float(jnp.max(mips[2][..., 0]))
    assert peak2 < peak0
    # total energy roughly conserved (within sampling noise)
    m0 = float(jnp.mean(mips[0][..., 0]))
    m2 = float(jnp.mean(mips[2][..., 0]))
    assert m2 == pytest.approx(m0, rel=0.5)


def test_brdf_lut_properties():
    from forge3d_tpu.ops.ibl import brdf_lut

    lut = np.asarray(brdf_lut(16, 64))
    assert lut.shape == (16, 16, 2)
    assert np.isfinite(lut).all()
    assert lut.min() >= 0 and lut[..., 0].max() <= 1.5
    # scale (A) dominates bias (B) at low roughness, grazing Fresnel bias
    # grows with roughness
    assert lut[8, 2, 0] > lut[8, 2, 1]


def test_irradiance_smooth():
    from forge3d_tpu.ops.ibl import irradiance_map

    irr = np.asarray(irradiance_map(_env(), size=8, samples=64))
    assert irr.shape == (8, 16, 3)
    # cosine convolution kills high frequency: no hotspot survives
    assert irr.max() < _env().max() / 2
    assert np.isfinite(irr).all()


def test_bake_ibl_tiers():
    from forge3d_tpu.ops.ibl import bake_ibl

    maps = bake_ibl(_env(), quality="low")
    assert maps.cubemap.shape[0] == 6
    assert len(maps.specular_mips) == 3
    assert maps.brdf.shape[-1] == 2
    with pytest.raises(ValueError):
        bake_ibl(_env(), quality="ultra")
