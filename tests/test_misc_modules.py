# Tests: guiding cache, alignment reports, recipe manifests, widgets,
# kernel contracts (PROBATUM).

import numpy as np
import pytest

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# guiding


def test_octa_roundtrip():
    from forge3d_tpu.guiding import octa_decode, octa_encode

    rng = np.random.default_rng(0)
    d = rng.normal(size=(200, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    res = 16
    bins = octa_encode(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                       jnp.asarray(d[:, 2]), res)
    back = np.asarray(octa_decode(bins, res))
    dots = (back * d).sum(1)
    assert dots.min() > 0.97          # bin-center within ~14 deg


def test_guiding_learns_direction():
    from forge3d_tpu.guiding import GuidingCache

    cache = GuidingCache.create((0, 0), (100, 100), cells=4, octa_res=8)
    # record strong radiance toward +y at one cell
    n = 500
    px = np.full(n, 10.0)
    pz = np.full(n, 10.0)
    cache = cache.record(px, pz, np.zeros(n), np.ones(n), np.zeros(n),
                         np.full(n, 5.0))
    u1 = np.linspace(0.01, 0.99, 64)
    u2 = np.full(64, 0.5)
    dx, dy, dz, pdf = cache.sample(np.full(64, 10.0), np.full(64, 10.0),
                                   u1, u2)
    # most samples point up
    assert float(np.mean(np.asarray(dy) > 0.5)) > 0.8
    assert np.asarray(pdf).min() > 0
    st = cache.stats()
    assert st["total_energy"] > 2000


# ---------------------------------------------------------------------------
# alignment


def test_alignment_report():
    from forge3d_tpu.alignment import LayerGrid, alignment_report

    ref = LayerGrid("dem", "EPSG:32610", (10.0, 0, 500000, 0, -10.0, 5200000),
                    (100, 100))
    good = LayerGrid("mask", "EPSG:32610",
                     (10.0, 0, 500100, 0, -10.0, 5199900), (80, 80))
    rep = alignment_report([ref, good])
    assert rep["ok"], rep
    bad_crs = LayerGrid("roads", "EPSG:4326",
                        (10.0, 0, 500000, 0, -10.0, 5200000), (100, 100))
    rep2 = alignment_report([ref, bad_crs])
    assert not rep2["ok"]
    assert rep2["issues"][0]["kind"] == "crs_mismatch"
    phase = LayerGrid("ortho", "EPSG:32610",
                      (10.0, 0, 500003.7, 0, -10.0, 5200000), (100, 100))
    rep3 = alignment_report([ref, phase])
    kinds = [i["kind"] for i in rep3["issues"]]
    assert "grid_phase" in kinds
    far = LayerGrid("other", "EPSG:32610",
                    (10.0, 0, 900000, 0, -10.0, 5200000), (100, 100))
    rep4 = alignment_report([ref, far])
    assert not rep4["ok"]


# ---------------------------------------------------------------------------
# recipe manifest


def test_manifest_roundtrip(tmp_path):
    from forge3d_tpu.recipe_manifest import (build_manifest, load_manifest,
                                             save_manifest, verify_manifest)

    recipe = {"terrain": np.arange(16, dtype=np.float32).reshape(4, 4),
              "camera": {"radius": 120.0, "phi": 225},
              "layers": [{"kind": "vector", "name": "rivers"}]}
    m = build_manifest(recipe, outputs={"png": "out.png"})
    assert verify_manifest(m)
    assert m["recipe"]["terrain"]["__ndarray__"]
    p = tmp_path / "manifest.json"
    save_manifest(p, m)
    m2 = load_manifest(p)
    assert verify_manifest(m2)
    # identical recipes -> identical digests (golden bookkeeping contract)
    m3 = build_manifest({"terrain": np.arange(16, dtype=np.float32).reshape(4, 4),
                         "camera": {"radius": 120.0, "phi": 225},
                         "layers": [{"kind": "vector", "name": "rivers"}]})
    assert m3["recipe"] == m["recipe"]
    m2["recipe"]["camera"]["radius"] = 130.0
    assert not verify_manifest(m2)


# ---------------------------------------------------------------------------
# widgets (headless path)


def test_terrain_widget_headless(tmp_path):
    from forge3d_tpu.widgets import TerrainWidget, png_data_uri

    calls = []

    def render_fn(az, el, phi, theta):
        calls.append((az, el, phi, theta))
        img = np.zeros((16, 16, 4), np.uint8)
        img[..., 0] = int(az) % 255
        img[..., 3] = 255
        return img

    w = TerrainWidget(render_fn)
    frame = w.render(azimuth=90)
    assert frame[0, 0, 0] == 90
    w.snapshot(tmp_path / "w.png")
    assert (tmp_path / "w.png").exists()
    uri = png_data_uri(frame)
    assert uri.startswith("data:image/png;base64,")


# ---------------------------------------------------------------------------
# kernel contracts


def test_kernel_contracts():
    from forge3d_tpu.verify import (KernelContractError, ValueContract,
                                    check_kernel, register_kernel,
                                    shader_report, validate_output)

    register_kernel("unit_test_kernel",
                    ValueContract("out", 0.0, 1.0))
    validate_output("unit_test_kernel", "out", np.array([0.0, 0.5, 1.0]))
    with pytest.raises(KernelContractError):
        validate_output("unit_test_kernel", "out", np.array([2.0]))
    with pytest.raises(KernelContractError):
        validate_output("unit_test_kernel", "out", np.array([np.nan]))
    with pytest.raises(KernelContractError):
        validate_output("nope", "out", np.array([0.0]))

    out = check_kernel("unit_test_kernel", lambda: np.array([0.25]))
    assert out[0] == 0.25

    rep = shader_report()
    assert "unit_test_kernel" in rep["kernels"]
    assert rep["kernels"]["unit_test_kernel"]["checks_run"] >= 2
    # built-in ledger entries exist
    assert "terrain_reference" in rep["kernels"]


def test_shader_report_fails_closed_on_unproven():
    from forge3d_tpu.verify import (ValueContract, register_kernel,
                                    shader_report)

    register_kernel("never_run_kernel", ValueContract("out", 0, 1))
    rep = shader_report()
    assert rep["ok"] is False          # unproven kernel present
    assert not rep["kernels"]["never_run_kernel"]["proven"]


# ---------------------------------------------------------------------------
# sky (Preetham analytic daylight)


def test_sky_model():
    from forge3d_tpu.sky import make_sky, sky_environment_map, sky_radiance

    sky = make_sky(135, 35, turbidity=3.0)
    r, g, b = sky_radiance(sky, jnp.float32(0.0), jnp.float32(1.0),
                           jnp.float32(0.0))
    # clear-sky zenith is blue
    assert float(b) > float(r)
    rs, gs, bs = sky_radiance(sky, sky.sun_dir[0], sky.sun_dir[1],
                              sky.sun_dir[2])
    # circumsolar brighter than zenith
    assert float(rs) + float(gs) + float(bs) > float(r) + float(g) + float(b)
    env = sky_environment_map(sky, 64, 32)
    assert env.shape == (32, 64, 3)
    assert np.isfinite(env).all() and env.min() >= 0


def test_sun_position_ephemeris():
    from forge3d_tpu.astro import julian_date
    from forge3d_tpu.sky import sun_position_at

    # Seattle, June solstice, ~solar noon (20:00 UT): el ~ 90-47.6+23.4
    az, alt = sun_position_at(julian_date(2026, 6, 21, 20), 47.6, -122.3)
    assert alt == pytest.approx(65.8, abs=1.0)
    assert 150 < az < 210
    # midnight: below horizon
    _, alt2 = sun_position_at(julian_date(2026, 6, 21, 9), 47.6, -122.3)
    assert alt2 < 0


# ---------------------------------------------------------------------------
# thematic mapping


def test_classify_schemes():
    from forge3d_tpu.thematic import classify_values

    rng = np.random.default_rng(0)
    v = rng.normal(100, 20, 500)
    for scheme in ("equal_interval", "quantile", "natural_breaks",
                   "std_mean"):
        idx, breaks = classify_values(v, scheme=scheme, k=5)
        assert len(breaks) == 4
        assert idx.min() >= 0 and idx.max() <= 4
        assert sorted(breaks) == breaks
    # quantile bins are balanced
    idx, _ = classify_values(v, scheme="quantile", k=5)
    counts = np.bincount(idx, minlength=5)
    assert counts.min() > 60
    with pytest.raises(ValueError):
        classify_values(v, scheme="vibes")


def test_apply_thematic():
    from forge3d_tpu.thematic import ThematicStyle, apply_thematic

    feats = [{"type": "Feature", "properties": {"pop": p},
              "geometry": None} for p in [10, 20, 30, 40, 50, None]]
    out = apply_thematic(feats, ThematicStyle(attribute="pop", k=3,
                                              scheme="equal_interval"))
    classes = [f["properties"]["__class"] for f in out["features"]]
    assert classes[0] == 0 and classes[4] == 2 and classes[5] == -1
    assert len(out["legend"]) == 3
    assert out["features"][5]["properties"]["__fill"] == (128, 128, 128, 255)


# ---------------------------------------------------------------------------
# CSM-equivalent shadow state + BRDF harness


def test_csm_state_and_cascades():
    from forge3d_tpu.shadows import (cascade_splits, configure_csm,
                                     get_csm_cascade_info,
                                     set_csm_bias_params, set_csm_enabled,
                                     set_csm_light_direction,
                                     set_csm_pcf_kernel)

    configure_csm(cascade_count=4, near=0.5, far=500.0)
    set_csm_light_direction(-1.0, -2.0, -0.5)
    set_csm_pcf_kernel(5)
    set_csm_bias_params(1e-3, 2e-3)
    info = get_csm_cascade_info()
    assert info["count"] == 4 and len(info["splits"]) == 4
    # splits monotone, last == far
    assert info["splits"] == sorted(info["splits"])
    assert info["splits"][-1] == pytest.approx(500.0, rel=1e-6)
    assert np.isclose(np.linalg.norm(info["light_direction"]), 1.0)
    with pytest.raises(ValueError):
        set_csm_pcf_kernel(4)
    with pytest.raises(ValueError):
        cascade_splits(10, 1, 4)
    set_csm_enabled(True)


def test_csm_peter_panning_probe():
    from forge3d_tpu.shadows import (set_csm_bias_params,
                                     validate_csm_peter_panning)

    y, x = np.mgrid[0:33, 0:33].astype(np.float32)
    dem = 5.0 * np.sin(x * 0.3) * np.cos(y * 0.3)
    set_csm_bias_params(1e-3, 2e-3)
    rep = validate_csm_peter_panning(dem, samples=64)
    assert 0.0 <= rep["occluded_fraction"] <= 1.0
    assert not rep["peter_panning_detected"] or \
        rep["occluded_fraction"] < 0.01


def test_brdf_tile_and_debug_pattern():
    from forge3d_tpu.brdf import (render_brdf_tile,
                                  render_brdf_tile_overrides,
                                  render_debug_pattern_frame)

    tile = render_brdf_tile(tile_px=32, rows=2, cols=3)
    assert tile.shape == (64, 96, 4)
    # roughness sweep changes pixels across columns
    assert not np.array_equal(tile[:32, :32], tile[:32, 64:96])
    t2 = render_brdf_tile_overrides({"rows": 2, "cols": 3, "tile_px": 32})
    np.testing.assert_array_equal(tile, t2)
    with pytest.raises(ValueError):
        render_brdf_tile_overrides({"volume": 11})

    pat = render_debug_pattern_frame(64, 48)
    assert pat.shape == (48, 64, 4)
    np.testing.assert_array_equal(pat,
                                  render_debug_pattern_frame(64, 48))
    with pytest.raises(ValueError):
        render_debug_pattern_frame(8, 8, kind="noise")


# ---------------------------------------------------------------------------
# forge3d compat shim + bench harness


def test_forge3d_shim():
    import forge3d as f3d
    import forge3d_tpu

    assert f3d.__version__ == forge3d_tpu.__version__
    assert f3d.hybrid_render_terrain_reference is \
        forge3d_tpu.hybrid_render_terrain_reference
    assert f3d.Scene is forge3d_tpu.Scene
    import forge3d.gis
    import forge3d.labels

    assert forge3d.gis is forge3d_tpu.gis


def test_bench_harness():
    from forge3d_tpu.bench import benchmark_op, run_benchmark

    rec = benchmark_op(lambda: sum(range(1000)), iters=5, name="noop")
    assert rec["op"] == "noop" and rec["iters"] == 5
    assert rec["p50_ms"] <= rec["p95_ms"] <= rec["max_ms"] + 1e-9
    assert "memory" in rec
    out = run_benchmark("numpy_to_png", 16, 16, iterations=2, warmup=0)
    assert out["op"] == "numpy_to_png" and out["pixels"] == 256
    assert out["stats"]["p50_ms"] <= out["stats"]["p95_ms"] + 1e-9
    assert out["throughput"]["fps"] > 0
    with pytest.raises(ValueError):
        run_benchmark("warp_speed", 8, 8)


# ---------------------------------------------------------------------------
# interactive session


def test_interactive_session():
    from forge3d_tpu.interactive import InteractiveSession

    y, x = np.mgrid[0:17, 0:17].astype(np.float32)
    dem = 2.0 * np.sin(x * 0.4) * np.cos(y * 0.4)
    s = InteractiveSession(dem, width=64, height=48)
    f1 = s.refine()
    assert f1.shape == (48, 64, 4)
    q1 = s.quality
    f2 = s.refine()
    assert s.renders == 2
    # camera change restarts the quality ladder
    s.set_camera(origin=(8, 12, 30))
    assert s.quality == InteractiveSession.LADDER[0]
    f3 = s.frame()
    assert f3.shape == f1.shape
# appended to tests/test_misc_modules.py


def test_scene_graph_hierarchy_and_traversal():
    """SceneGraph: world transforms compose through the hierarchy, dirty
    propagation invalidates descendants, reparent guards cycles."""
    import numpy as np
    import pytest

    from forge3d_tpu.scenegraph import SceneGraph
    from forge3d_tpu.transforms import rotate_y, translate

    g = SceneGraph()
    g.add("city", local=translate(100.0, 0.0, 0.0))
    g.add("block", parent="city", local=rotate_y(90.0))
    g.add("house", parent="block", local=translate(1.0, 0.0, 0.0),
          payload={"kind": "mesh"})

    p = g.transform_points("house", [[0.0, 0.0, 0.0]])[0]
    # rotate_y(90): +x -> -z; then city translate +100x
    np.testing.assert_allclose(p, [100.0, 0.0, -1.0], atol=1e-9)

    # dirty propagation: moving the city moves the house
    g["city"].set_local(translate(0.0, 0.0, 50.0))
    p2 = g.transform_points("house", [[0.0, 0.0, 0.0]])[0]
    np.testing.assert_allclose(p2, [0.0, 0.0, 49.0], atol=1e-9)

    assert [n.name for n in g.walk()] == ["city", "block", "house"]
    flat = g.flatten()
    assert len(flat) == 1 and flat[0][0].name == "house"

    with pytest.raises(ValueError):
        g.reparent("city", "house")        # cycle
    g.reparent("house", "root")
    p3 = g.transform_points("house", [[0.0, 0.0, 0.0]])[0]
    np.testing.assert_allclose(p3, [1.0, 0.0, 0.0], atol=1e-9)

    g.remove("city")
    assert "block" not in g and "city" not in g


def test_multipolygonz_to_obj_roundtrip(tmp_path):
    """Reference converters parity (multipolygonz_to_obj.rs): fan
    triangulation + OBJ write."""
    import numpy as np

    from forge3d_tpu.converters import multipolygonz_to_mesh, \
        multipolygonz_to_obj
    from forge3d_tpu.io.mesh import load_obj

    quad = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]],
                    np.float32)
    tri = np.array([[2, 1, 0], [3, 1, 0], [2.5, 1, 1]], np.float32)
    mesh = multipolygonz_to_mesh([quad, tri])
    assert len(mesh.indices) == 3          # 2 fan tris + 1
    p = tmp_path / "out.obj"
    multipolygonz_to_obj(p, [quad, tri])
    back = load_obj(p)
    assert len(back.vertices) == 7
    assert len(back.indices.reshape(-1, 3)) == 3
