# Bench + memory-telemetry contract (mirrors the reference's
# tests/test_bench_diagnostics.py:16-177): the bench record shape, the
# mapscene gpu-timings surfacing, the VT comparison delta, and the memory
# budget/completeness reports.
import numpy as np
import pytest

from forge3d_tpu.bench import run_benchmark, run_vt_frame_time_comparison
from forge3d_tpu.diagnostics import (
    memory_budget_validation_report,
    memory_tracking_completeness_report,
)


def test_benchmark_result_includes_memory_and_timing_sections():
    result = run_benchmark("numpy_to_png", 4, 4, iterations=1, warmup=0)

    assert "memory" in result
    assert set(result["memory"]) == {"before", "after", "delta", "tracking"}
    assert "host_visible_bytes" in result["memory"]["after"]
    assert "budget_policy" in result["memory"]["after"]
    assert result["memory"]["tracking"]["expected_bytes"] == 4 * 4 * 4
    assert result["memory"]["tracking"]["status"] in {
        "supported", "underdeveloped"}

    assert "gpu_timings" in result
    assert result["gpu_timings"]["terrain_main_pass_ms"] is None
    assert result["gpu_timings"]["vt_upload_avg_ms"] is None
    assert result["gpu_timings"]["offline_accumulation_ms"] is None
    assert result["gpu_timings"]["available"] is False


def test_benchmark_stats_and_throughput_shape():
    result = run_benchmark("numpy_to_png", 8, 8, iterations=3, warmup=1)
    s = result["stats"]
    assert set(s) == {"min_ms", "p50_ms", "mean_ms", "p95_ms", "max_ms",
                      "std_ms"}
    assert s["min_ms"] <= s["p50_ms"] <= s["p95_ms"] <= s["max_ms"] + 1e-9
    assert result["throughput"]["fps"] > 0
    assert result["throughput"]["mpix_per_s"] > 0
    assert result["env"]["status"]


def test_mapscene_benchmark_surfaces_vt_upload_timing(monkeypatch):
    import forge3d_tpu.bench as bench

    def fake_op(width, height, vt_active=False):
        def run():
            pass

        def metadata():
            return {
                "material_vt_stats": {
                    "avg_upload_ms": 1.25,
                    "feedback_requests": 4.0,
                },
                "terrain_main_pass_ms": 2.5,
                "offline_accumulation_ms": 7.0,
            }

        return run, metadata

    monkeypatch.setattr(bench, "_op_mapscene_terrain_png",
                        lambda w, h, vt_active=False: fake_op(w, h))

    result = run_benchmark("mapscene_terrain_png", 16, 16, iterations=1,
                           warmup=0)
    assert result["gpu_timings"]["available"] is True
    assert result["gpu_timings"]["vt_upload_avg_ms"] == 1.25
    assert result["gpu_timings"]["terrain_main_pass_ms"] == 2.5
    assert result["gpu_timings"]["offline_accumulation_ms"] == 7.0


def test_mapscene_benchmark_real_metadata(tmp_path):
    """The REAL MapScene surfaces last_render_metadata with a measured
    terrain_main_pass_ms (no monkeypatching)."""
    result = run_benchmark("mapscene_terrain_png", 48, 32, iterations=1,
                           warmup=0)
    assert result["gpu_timings"]["available"] is True
    assert result["gpu_timings"]["terrain_main_pass_ms"] > 0.0


def test_screen_pipeline_op_reports_main_pass_timing():
    result = run_benchmark("screen_terrain_rgba", 64, 48, iterations=1,
                           warmup=0)
    assert result["op"] == "screen_terrain_rgba"
    assert result["gpu_timings"]["available"] is True
    assert result["gpu_timings"]["terrain_main_pass_ms"] > 0.0


def test_vt_frame_time_comparison_reports_delta(monkeypatch):
    import forge3d_tpu.bench as bench

    def fake_run_benchmark(op, width, height, *, iterations=100, warmup=10,
                           **_kwargs):
        mean = 10.0 if op == "mapscene_terrain_png" else 12.5
        return {
            "op": op,
            "width": width,
            "height": height,
            "iterations": iterations,
            "warmup": warmup,
            "stats": {"mean_ms": mean},
            "gpu_timings": {
                "available": op == "mapscene_terrain_vt_png",
                "vt_upload_avg_ms":
                    0.5 if op == "mapscene_terrain_vt_png" else None,
            },
        }

    monkeypatch.setattr(bench, "run_benchmark", fake_run_benchmark)
    result = bench.run_vt_frame_time_comparison(32, 24, iterations=3,
                                                warmup=1)
    assert result["baseline"]["op"] == "mapscene_terrain_png"
    assert result["vt_active"]["op"] == "mapscene_terrain_vt_png"
    assert result["delta_ms"] == 2.5
    assert result["delta_pct"] == 25.0
    assert result["vt_upload_avg_ms"] == 0.5
    assert result["vt_gpu_timings_available"] is True


def test_memory_budget_validation_report_contains_policy_details():
    report = memory_budget_validation_report(
        {
            "host_visible_bytes": 2048,
            "limit_bytes": 1024,
            "within_budget": False,
            "budget_policy": "warn",
            "buffer_bytes": 2048,
            "texture_bytes": 0,
        }
    )
    data = report.to_dict()
    assert data["status"] == "warning"
    assert data["diagnostics"][0]["code"] == "estimated_gpu_memory"
    assert data["diagnostics"][0]["details"]["budget_policy"] == "warn"


def test_memory_tracking_completeness_report_marks_coverage():
    report = memory_tracking_completeness_report(
        1000, {"host_visible_bytes": 980}, min_coverage=0.95)
    data = report.to_dict()
    assert data["status"] == "ok"
    assert data["supported_features"][
        "memory.tracking_completeness"] == "supported"
    details = data["diagnostics"][0]["details"]
    assert details["coverage_ratio"] == 0.98


def test_memory_tracking_completeness_report_warns_when_undertracked():
    report = memory_tracking_completeness_report(
        1000, {"host_visible_bytes": 500}, min_coverage=0.95)
    data = report.to_dict()
    assert data["status"] == "warning"
    assert data["supported_features"][
        "memory.tracking_completeness"] == "underdeveloped"
    assert data["diagnostics"][0]["code"] == "memory_tracking_completeness"


def test_benchmark_memory_tracking_uses_peak_total_bytes():
    import forge3d_tpu.bench as bench

    tracking = bench._memory_tracking_snapshot(
        64, 64, {"total_bytes": 0, "peak_total_bytes": 64 * 64 * 4})
    assert tracking["tracked_bytes"] == 64 * 64 * 4
    assert tracking["coverage_ratio"] == 1.0
    assert tracking["status"] == "supported"


def test_bench_unknown_op_and_cli_contract():
    with pytest.raises(ValueError, match="unknown op"):
        run_benchmark("warp_speed", 8, 8)
    from forge3d_tpu.cli import bench_main

    rc = bench_main(["--op", "numpy_to_png", "--width", "8",
                     "--height", "8", "--iterations", "1", "--warmup", "0"])
    assert rc == 0
