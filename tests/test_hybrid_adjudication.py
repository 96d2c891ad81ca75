# Tests: hybrid tracer (SDF+mesh+terrain), traversal modes, adjudication
# pair, image metrics.

import numpy as np
import pytest

from forge3d_tpu.ops.sdf import SdfSceneBuilder
from forge3d_tpu.pt.hybrid import (build_hybrid_scene, hybrid_render,
                                   render_adjudication_pair)
from forge3d_tpu.utils.metrics import (delta_e2000, image_metrics,
                                       mean_abs_error, ssim)


def _scene():
    n = 33
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = 2.0 * np.sin(x * 0.3) * np.cos(y * 0.3)
    # floating box mesh above the terrain
    from forge3d_tpu.geometry import primitive_mesh

    box = primitive_mesh("box", size=(6, 6, 6))
    box.vertices += np.array([16.0, 8.0, 16.0], np.float32)
    b = SdfSceneBuilder()
    b.add_sphere((24.0, 6.0, 10.0), 3.0)
    sdf = b.build()
    return build_hybrid_scene(heightmap=dem,
                              mesh_vertices=box.vertices,
                              mesh_indices=box.indices,
                              sdf_scene=sdf)


CAM = {"origin": (16.0, 18.0, 52.0), "look_at": (16.0, 2.0, 16.0)}


def test_hybrid_all_kinds_visible():
    hs = _scene()
    out = hybrid_render(128, 96, hs, CAM, mode="hybrid",
                        aovs=("kind", "visibility", "depth"))
    kinds = out["kind"][out["visibility"] > 0]
    present = set(np.unique(kinds).tolist())
    assert {0, 1, 2} <= present          # terrain + mesh + sdf all hit
    assert out["rgba"].shape == (96, 128, 4)


def test_traversal_modes():
    hs = _scene()
    for mode, expect_kind in (("terrain_only", 0), ("mesh_only", 1),
                              ("sdf_only", 2)):
        out = hybrid_render(96, 64, hs, CAM, mode=mode,
                            aovs=("kind", "visibility"))
        kinds = set(np.unique(out["kind"][out["visibility"] > 0]).tolist())
        assert kinds == {expect_kind}, (mode, kinds)
    with pytest.raises(ValueError):
        hybrid_render(32, 32, hs, CAM, mode="warp")


def test_hybrid_shadows():
    # the floating box must cast a shadow onto the terrain below it
    hs = _scene()
    sun = {"azimuth": 0.0, "elevation": 88.0, "intensity": 5.0}
    out = hybrid_render(96, 96, hs, CAM, mode="hybrid", sun=sun,
                        aovs=("kind", "visibility"))
    no_box = build_hybrid_scene(
        heightmap=2.0 * np.sin(np.arange(33)[None, :] * 0.3)
        * np.cos(np.arange(33)[:, None] * 0.3).astype(np.float32))
    out2 = hybrid_render(96, 96, no_box, CAM, mode="hybrid", sun=sun)
    # with the box present, total terrain luminance is lower (shadow)
    terr = out["kind"] == 0
    lum1 = out["rgba"][..., :3].astype(int).sum(-1)
    lum2 = out2["rgba"][..., :3].astype(int).sum(-1)
    assert lum1[terr].mean() < lum2[terr].mean() - 1


def test_metrics_module():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    assert ssim(img, img) == pytest.approx(1.0)
    assert mean_abs_error(img, img) == 0.0
    noisy = np.clip(img.astype(int)
                    + rng.integers(-8, 8, img.shape), 0, 255).astype(np.uint8)
    s = ssim(img, noisy)
    assert 0.5 < s < 1.0
    de = delta_e2000(img, noisy)
    assert de.shape == (64, 64)
    assert 0 < de.mean() < 10
    m = image_metrics(img, noisy)
    assert set(m) == {"ssim", "mean_abs", "delta_e_mean", "delta_e_max"}


def test_adjudication_pair():
    n = 33
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = 3.0 * np.sin(x * 0.25) * np.cos(y * 0.2)
    pair = render_adjudication_pair(dem, 96, 72, spp=2, max_frames=16,
                                    variance_threshold=1e9)
    assert pair["pt"].shape == (72, 96, 4)
    assert pair["raster"].shape == (72, 96, 4)
    m = pair["metrics"]
    # exposure-normalized structural agreement between the two pipelines
    assert m["ssim"] > 0.6, m
    assert m["mean_abs"] < 0.15, m
    assert m["pt_mean"] > 10 and m["raster_mean"] > 10
