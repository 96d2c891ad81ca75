# ANAMNESIS content-addressed render cache.
import numpy as np
import pytest

from forge3d_tpu.assurance.anamnesis import (
    CacheReport,
    ContentStore,
    cached_render,
    engine_fingerprint,
    open_store,
    pass_key,
    render_sequence,
)


class TestKeys:
    def test_key_depends_on_all_inputs(self):
        a = np.arange(12, dtype=np.float32).reshape(3, 4)
        k1 = pass_key("p", arr=a, x=1)
        k2 = pass_key("p", arr=a, x=2)
        k3 = pass_key("p", arr=a + 1, x=1)
        k4 = pass_key("q", arr=a, x=1)
        assert len({k1, k2, k3, k4}) == 4

    def test_key_stable_across_dict_order(self):
        assert pass_key("p", a=1, b=2) == pass_key("p", b=2, a=1)

    def test_key_includes_engine_fingerprint(self):
        assert "forge3d_tpu" in engine_fingerprint()

    def test_dtype_and_shape_distinguish(self):
        a = np.zeros(4, np.float32)
        assert pass_key("p", x=a) != pass_key("p", x=a.astype(np.float64))
        assert pass_key("p", x=a) != pass_key("p", x=a.reshape(2, 2))


class TestContentStore:
    def test_put_get_roundtrip(self, tmp_path):
        s = ContentStore(tmp_path / "cache")
        key = pass_key("t", v=1)
        arr = np.random.default_rng(0).random((8, 8, 4)).astype(np.float32)
        s.put(key, {"rgba": arr}, meta={"w": 8})
        got = s.get(key)
        assert got is not None
        arrays, meta = got
        np.testing.assert_array_equal(arrays["rgba"], arr)
        assert meta == {"w": 8}
        assert s.stats()["entries"] == 1
        assert s.report.hits == 1 and s.report.stores == 1

    def test_miss(self, tmp_path):
        s = ContentStore(tmp_path / "c")
        assert s.get(pass_key("t", v=99)) is None
        assert s.report.misses == 1

    def test_lru_eviction(self, tmp_path):
        s = ContentStore(tmp_path / "c", capacity_bytes=1)
        big = np.zeros((64, 64), np.float32)
        k1 = pass_key("t", v=1)
        k2 = pass_key("t", v=2)
        s.put(k1, {"a": big})
        s.put(k2, {"a": big})
        assert s.report.evictions >= 1

    def test_invalid_key_rejected(self, tmp_path):
        s = ContentStore(tmp_path / "c")
        with pytest.raises(ValueError):
            s.put("../escape", {"a": np.zeros(1)})

    def test_clear(self, tmp_path):
        s = ContentStore(tmp_path / "c")
        s.put(pass_key("t", v=1), {"a": np.zeros(4)})
        s.clear()
        assert s.stats()["entries"] == 0


class TestCachedRender:
    def test_second_call_restores(self, tmp_path):
        calls = []

        def render():
            calls.append(1)
            return {"rgba": np.full((4, 4), 7, np.uint8)}

        out1, hit1 = cached_render(str(tmp_path / "c"), "p", {"x": 1}, render)
        store = open_store(str(tmp_path / "c"))
        out2, hit2 = cached_render(store, "p", {"x": 1}, render)
        assert not hit1 and hit2
        assert len(calls) == 1
        np.testing.assert_array_equal(out1["rgba"], out2["rgba"])

    def test_no_cache_passthrough(self):
        out, hit = cached_render(None, "p", {"x": 1},
                                 lambda: {"a": np.zeros(2)})
        assert not hit

    def test_render_sequence(self, tmp_path):
        count = []

        def rf(i, inputs):
            count.append(i)
            return {"v": np.full(2, i, np.int32)}

        frames = [{"t": i * 0.1} for i in range(3)]
        s = ContentStore(tmp_path / "c")
        out1 = render_sequence(s, frames, rf)
        out2 = render_sequence(s, frames, rf)
        assert len(count) == 3  # second pass fully cached
        assert all(np.array_equal(a["v"], b["v"]) for a, b in zip(out1, out2))


class TestRendererIntegration:
    def test_terrain_render_cache_hit_identical(self, tmp_path):
        from forge3d_tpu.terrain import TerrainRenderer, make_terrain_params

        y, x = np.mgrid[0:33, 0:33].astype(np.float32)
        dem = (3 * np.sin(x * 0.3) * np.cos(y * 0.2)).astype(np.float32)
        p = make_terrain_params(size_px=(48, 32), cam_radius=60,
                                cam_target=(16, 0, 16))
        r = TerrainRenderer()
        cache = str(tmp_path / "rc")
        f1 = r.render_terrain_pbr_pom(params=p, heightmap=dem, cache=cache)
        assert f1.metadata["anamnesis_hit"] is False
        f2 = r.render_terrain_pbr_pom(params=p, heightmap=dem, cache=cache)
        assert f2.metadata["anamnesis_hit"] is True
        np.testing.assert_array_equal(f1.rgba, f2.rgba)
        # different params -> miss
        p2 = make_terrain_params(size_px=(48, 32), cam_radius=61,
                                 cam_target=(16, 0, 16))
        f3 = r.render_terrain_pbr_pom(params=p2, heightmap=dem, cache=cache)
        assert f3.metadata["anamnesis_hit"] is False
