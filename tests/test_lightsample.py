# Multi-light NEE (ops/lightsample.py): alias-table correctness and
# analytic/numeric oracles for the typed-light estimator integrated into
# the terrain PT (ref: src/path_tracing/alias_table.rs + importance.rs).

import numpy as np
import pytest

from forge3d_tpu.lighting import Light
from forge3d_tpu.ops.lightsample import (
    alias_sample,
    alias_table_build,
    light_power_weights,
)


def test_alias_table_distribution():
    import jax.numpy as jnp

    w = np.array([1.0, 3.0, 0.5, 5.5])
    t = alias_table_build(w)
    assert np.allclose(np.asarray(t.pdf), w / w.sum())
    u = jnp.asarray((np.arange(200000) + 0.5) / 200000.0)
    idx, pdf = alias_sample(t, u)
    idx = np.asarray(idx)
    freq = np.bincount(idx, minlength=4) / idx.size
    assert np.allclose(freq, w / w.sum(), atol=2e-3), freq
    assert np.allclose(np.asarray(pdf), (w / w.sum())[idx])


def test_alias_table_degenerate():
    t = alias_table_build([0.0, 0.0])
    assert np.allclose(np.asarray(t.pdf), [0.5, 0.5])
    with pytest.raises(ValueError):
        alias_table_build([])
    with pytest.raises(ValueError):
        alias_table_build([-1.0, 2.0])


def test_light_power_weights_scale_with_area():
    from forge3d_tpu.lighting import LightBuffer

    lights = LightBuffer.from_lights([
        Light(type="rect", position=(0, 5, 0), extent=(1.0, 1.0)),
        Light(type="rect", position=(0, 5, 0), extent=(2.0, 2.0)),
    ])
    w = light_power_weights(lights)
    assert w[1] / w[0] == pytest.approx(4.0)


def _flat_scene_render(lights, frames=48, spp=4):
    from forge3d_tpu.pt.terrain_ref import (TerrainRefDesc,
                                            render_terrain_reference)

    dem = np.zeros((33, 33), np.float32)
    desc = TerrainRefDesc(
        heights=dem, albedo=(1.0, 1.0, 1.0),
        cam_origin=(16.0, 12.0, 30.0), cam_look_at=(16.0, 0.0, 16.0),
        fov_y_deg=40.0, width=64, height=48,
        sun_intensity=0.0, env_intensity=1e-7,
        spp=spp, min_frames=frames, max_frames=frames,
        variance_threshold=1e9, restir=False,
        lights=tuple(lights))
    return render_terrain_reference(desc)


def _center_hdr(out):
    d = out["depth"]
    hdr = out["hdr"]
    # pixel whose hit lands nearest the look_at point (16, 0, 16)
    return hdr[np.isfinite(d)].reshape(-1, 3), out


@pytest.mark.slow
def test_point_light_inverse_square():
    h = 6.0
    out = _flat_scene_render(
        [Light(type="point", position=(16.0, h, 16.0), intensity=20.0)])
    # analytic at the point directly below: E = I * cos(0) / h^2
    want = 20.0 / h ** 2
    hdr = out["hdr"]
    # find the pixel rendering world (16, 0, 16): brightest region center
    iy, ix = np.unravel_index(np.nanargmax(hdr[..., 0]), hdr.shape[:2])
    got = float(hdr[iy, ix, 0])
    assert got == pytest.approx(want, rel=0.08), (got, want)


@pytest.mark.slow
def test_rect_area_light_matches_numeric_integral():
    h, a, b = 5.0, 2.0, 3.0
    out = _flat_scene_render(
        [Light(type="rect", position=(16.0, h, 16.0), intensity=4.0,
               extent=(a, b))], frames=96)
    # numeric oracle: E = integral over rect of L cos_r cos_e / r^2 dA at
    # the surface point directly below the center
    xs = np.linspace(-a, a, 400)
    zs = np.linspace(-b, b, 400)
    X, Z = np.meshgrid(xs, zs)
    r2 = X * X + Z * Z + h * h
    integrand = 4.0 * (h / np.sqrt(r2)) * (h / np.sqrt(r2)) / r2
    E = integrand.mean() * (2 * a) * (2 * b)
    hdr = out["hdr"]
    iy, ix = np.unravel_index(np.nanargmax(hdr[..., 0]), hdr.shape[:2])
    got = float(hdr[iy, ix, 0])
    assert got == pytest.approx(E, rel=0.1), (got, E)


@pytest.mark.slow
def test_area_light_occlusion():
    """A wall between the surface and the light must shadow it."""
    from forge3d_tpu.pt.terrain_ref import (TerrainRefDesc,
                                            render_terrain_reference)

    def render(with_wall):
        dem = np.zeros((33, 33), np.float32)
        if with_wall:
            dem[:, 20] = 12.0  # wall between the camera-side ground and
            # the light east of it
        desc = TerrainRefDesc(
            heights=dem, albedo=(1.0, 1.0, 1.0),
            cam_origin=(10.0, 14.0, 28.0), cam_look_at=(10.0, 0.0, 16.0),
            fov_y_deg=45.0, width=64, height=48,
            sun_intensity=0.0, env_intensity=1e-7,
            spp=4, min_frames=24, max_frames=24, variance_threshold=1e9,
            restir=False,
            lights=(Light(type="point", position=(26.0, 4.0, 16.0),
                          intensity=200.0),))
        out = render_terrain_reference(desc)
        hdr = out["hdr"][..., 0]
        return hdr[np.isfinite(out["depth"])]

    open_lit = render(with_wall=False)
    walled = render(with_wall=True)
    assert np.median(open_lit) > 0.05, float(np.median(open_lit))
    # the wall blocks the light from the visible ground
    assert np.median(walled) < np.median(open_lit) * 0.05, (
        float(np.median(walled)), float(np.median(open_lit)))


def test_sweep_refuses_typed_lights():
    """traversal='sweep' integrates sun+env only; typed lights must be
    refused, not silently dropped (fail-closed contract)."""
    import numpy as np

    from forge3d_tpu.errors import RenderError
    from forge3d_tpu.pt.terrain_ref import (TerrainRefDesc,
                                            render_terrain_reference)

    desc = TerrainRefDesc(
        heights=np.zeros((17, 17), np.float32), width=32, height=24,
        traversal="sweep",
        lights=(Light(type="point", position=(8.0, 5.0, 8.0)),))
    with pytest.raises(RenderError, match="typed lights"):
        render_terrain_reference(desc)
