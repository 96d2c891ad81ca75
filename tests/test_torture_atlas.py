# TERMINUS-style torture atlas (reference: tests/_torture.py +
# test_torture_atlas.py — behavior, not code): data-only descriptors map
# hostile inputs onto the public API. Every case must either complete
# within the watchdog or raise a TYPED error — never hang, never crash
# the process, never return a wrong-shaped/silent result.

import signal
import threading
from contextlib import contextmanager

import numpy as np
import pytest

import forge3d_tpu as f3d
from forge3d_tpu.errors import RenderError

WATCHDOG_SECONDS = 120.0


@contextmanager
def watchdog(seconds=WATCHDOG_SECONDS):
    """Fail the test (don't hang the suite) if a case stalls."""
    timed_out = []

    def fire():
        timed_out.append(True)

    t = threading.Timer(seconds, fire)
    t.start()
    try:
        yield
    finally:
        t.cancel()
    if timed_out:
        pytest.fail(f"torture case exceeded {seconds}s watchdog")


def _dem(n=16):
    x = np.linspace(0, 1, n, dtype=np.float32)
    return (x[None, :] * 0.5 + x[:, None] * 0.5).astype(np.float32)


def _cam():
    return {"origin": (8.0, 10.0, 24.0), "look_at": (8.0, 0.0, 8.0),
            "up": (0.0, 1.0, 0.0), "fov_y": 45.0, "exposure": 1.0}


# ---------------------------------------------------------------------------
# Terrain PT refusal paths
# ---------------------------------------------------------------------------

def test_nan_dem_refused():
    dem = _dem()
    dem[3, 3] = np.nan
    with watchdog(), pytest.raises((RenderError, ValueError)):
        f3d.hybrid_render_terrain_reference(dem, 16, 16, _cam(), spp=1,
                                            max_frames=2, min_frames=1,
                                            variance_threshold=1.0)


def test_inf_dem_refused():
    dem = _dem()
    dem[0, 0] = np.inf
    with watchdog(), pytest.raises((RenderError, ValueError)):
        f3d.hybrid_render_terrain_reference(dem, 16, 16, _cam(), spp=1,
                                            max_frames=2, min_frames=1,
                                            variance_threshold=1.0)


@pytest.mark.parametrize("w,h", [(0, 16), (16, 0), (-4, 16)])
def test_nonpositive_size_refused(w, h):
    with watchdog(), pytest.raises((RenderError, ValueError)):
        f3d.hybrid_render_terrain_reference(_dem(), w, h, _cam(), spp=1,
                                            max_frames=2, min_frames=1,
                                            variance_threshold=1.0)


def test_bad_camera_refused():
    cam = _cam()
    cam["origin"] = (np.nan, 1.0, 2.0)
    with watchdog(), pytest.raises((RenderError, ValueError)):
        f3d.hybrid_render_terrain_reference(_dem(), 16, 16, cam, spp=1,
                                            max_frames=2, min_frames=1,
                                            variance_threshold=1.0)


def test_degenerate_camera_refused():
    cam = _cam()
    cam["look_at"] = cam["origin"]
    with watchdog(), pytest.raises((RenderError, ValueError)):
        f3d.hybrid_render_terrain_reference(_dem(), 16, 16, cam, spp=1,
                                            max_frames=2, min_frames=1,
                                            variance_threshold=1.0)


@pytest.mark.parametrize("field,value", [
    ("sun_azimuth_deg", float("nan")),
    ("sun_elevation_deg", float("inf")),
    ("spp", 0),
    ("exaggeration", float("nan")),
])
def test_bad_scalar_params_refused(field, value):
    kw = dict(spp=1, max_frames=2, min_frames=1, variance_threshold=1.0)
    kw[field] = value
    with watchdog(), pytest.raises((RenderError, ValueError, TypeError)):
        f3d.hybrid_render_terrain_reference(_dem(), 16, 16, _cam(), **kw)


def test_1d_heightmap_refused():
    with watchdog(), pytest.raises((RenderError, ValueError)):
        f3d.hybrid_render_terrain_reference(
            np.zeros(64, np.float32), 16, 16, _cam(), spp=1,
            max_frames=2, min_frames=1, variance_threshold=1.0)


def test_mesh_args_must_pair():
    with watchdog(), pytest.raises(ValueError):
        f3d.hybrid_render_terrain_reference(
            _dem(), 16, 16, _cam(), mesh_vertices=np.zeros((3, 3)),
            spp=1, max_frames=2, min_frames=1, variance_threshold=1.0)


# ---------------------------------------------------------------------------
# Image IO refusal paths
# ---------------------------------------------------------------------------

def test_corrupt_png_refused(tmp_path):
    p = tmp_path / "bad.png"
    p.write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    with watchdog(), pytest.raises(Exception):
        f3d.png_to_numpy(p)


def test_truncated_png_refused(tmp_path):
    good = tmp_path / "good.png"
    f3d.numpy_to_png(good, np.zeros((8, 8, 4), np.uint8))
    data = good.read_bytes()
    bad = tmp_path / "trunc.png"
    bad.write_bytes(data[: len(data) // 2])
    with watchdog(), pytest.raises(Exception):
        f3d.png_to_numpy(bad)


def test_wrong_dtype_png_write_refused(tmp_path):
    with watchdog(), pytest.raises(Exception):
        f3d.numpy_to_png(tmp_path / "f64.png",
                         np.zeros((4, 4, 3), np.complex64))


# ---------------------------------------------------------------------------
# MapScene refusal / robustness
# ---------------------------------------------------------------------------

def test_mapscene_empty_dem_refused():
    from forge3d_tpu.mapscene import (MapScene, OrbitCamera, OutputSpec,
                                      SceneRecipe, TerrainSource)

    with watchdog(), pytest.raises(Exception):
        rec = SceneRecipe(
            terrain=TerrainSource(dem=np.zeros((0, 0), np.float32),
                                  spacing=(1.0, 1.0), z_scale=1.0),
            camera=OrbitCamera(), colormap="viridis",
            output=OutputSpec(size_px=(32, 24)))
        MapScene(rec).render()


def test_oversized_label_batch_is_bounded():
    """A pathological label count must not hang declutter (the reference
    bounds its solvers; greedy path here must stay under the watchdog)."""
    from forge3d_tpu.labels.declutter import declutter_greedy

    n = 5000
    rng = np.random.default_rng(0)
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 500, n)
    boxes[:, 1] = rng.uniform(0, 500, n)
    boxes[:, 2] = boxes[:, 0] + 30
    boxes[:, 3] = boxes[:, 1] + 12
    with watchdog(60):
        result = declutter_greedy(list(map(tuple, boxes)),
                                  np.arange(n, dtype=np.float32))
    chosen = result.chosen
    assert len(chosen) > 0
    # kept labels must be pairwise non-overlapping
    kept = boxes[np.asarray(chosen)]
    for i in range(min(len(kept), 200)):
        a = kept[i]
        others = kept[i + 1:i + 50]
        overlap = ((a[0] < others[:, 2]) & (others[:, 0] < a[2])
                   & (a[1] < others[:, 3]) & (others[:, 1] < a[3]))
        assert not overlap.any()


# ---------------------------------------------------------------------------
# Codec refusal paths
# ---------------------------------------------------------------------------

def test_f3dz_truncated_stream_fail_closed():
    from forge3d_tpu import codec

    dem = (_dem(32) * 1000).astype(np.float32)
    blob = codec.compress_dem(dem, max_error=0.1)
    with watchdog(), pytest.raises(Exception):
        codec.decompress_dem(bytes(blob)[:-7])


def test_f3dz_garbage_stream_fail_closed():
    from forge3d_tpu import codec

    with watchdog(), pytest.raises(Exception):
        codec.decompress_dem(b"not-an-f3dz-stream-at-all" * 4)


def test_exr_garbage_fail_closed(tmp_path):
    from forge3d_tpu.io import formats

    p = tmp_path / "bad.exr"
    p.write_bytes(b"\x76\x2f\x31\x01" + b"\xff" * 100)
    with watchdog(), pytest.raises(Exception):
        formats.read_exr(p)
