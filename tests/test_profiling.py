# Tracing/profiling seams (SURVEY §5 aux: jax.profiler traces +
# per-pass timing with forced-readback sync + certificate evidence).

import numpy as np

from forge3d_tpu import profiling


def test_timer_scopes_and_report():
    t = profiling.Timer(sync=False)
    with t.scope("a"):
        sum(range(1000))
    with t.scope("b"):
        sum(range(1000))
    assert set(t.timings_ms) == {"a", "b"}
    assert "total:" in t.report()


def test_timer_records_to_certificate():
    from forge3d_tpu.assurance.certificate import begin_render_capture

    cap = begin_render_capture("profiling-test")
    t = profiling.Timer(sync=False)
    with t.scope("main"):
        pass
    t.record_to_certificate(cap)
    cap.finish()
    assert any(p["name"] == "main" for p in cap.passes)


def test_profile_report_excludes_compile():
    import jax.numpy as jnp
    import jax

    f = jax.jit(lambda x: (x * 2.0).sum())
    rep = profiling.profile_report(lambda: float(f(jnp.ones(64))),
                                   repeats=3)
    assert rep["min_ms"] <= rep["p50_ms"] <= rep["max_ms"]
    assert rep["result"] == 128.0


def test_trace_writes_profile_dir(tmp_path):
    import jax.numpy as jnp

    with profiling.trace(tmp_path):
        with profiling.annotate("traced-add"):
            _ = jnp.ones(8) + 1.0
    # a plugins/profile/<ts>/ tree appears
    found = list(tmp_path.rglob("*.xplane.pb")) + \
        list(tmp_path.rglob("*.trace.json.gz"))
    assert found, "no profiler artifacts written"
