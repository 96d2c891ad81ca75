# forge3d_tpu/cli.py
# Command-line entry points (reference parity: the interactive_viewer
# console script and the forge3d-vtpack offline packer binary,
# src/bin/interactive_viewer.rs, src/bin/forge3d-vtpack.rs:1-26).

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def viewer_main(argv=None) -> int:
    """forge3d-viewer: headless JSON-IPC viewer server."""
    from .viewer.server import main

    return main(argv)


def vtpack_main(argv=None) -> int:
    """forge3d-vtpack: pack a DEM + material rasters into a virtual
    texture store."""
    import numpy as np

    from .terrain.vt import PAGE_SIZE, vt_pack

    ap = argparse.ArgumentParser(prog="forge3d-vtpack")
    ap.add_argument("dem", help="input DEM (GeoTIFF/npy)")
    ap.add_argument("out", help="output .f3dvt store")
    ap.add_argument("--levels", type=int, default=3)
    args = ap.parse_args(argv)

    from .gis.dem import read_gridded_dataset

    dem, _ = read_gridded_dataset(args.dem)
    dem = np.asarray(dem, np.float32)
    pages = {}
    level_src = dem
    for level in range(args.levels):
        H, W = level_src.shape
        for py in range(0, max(H // PAGE_SIZE, 1)):
            for px in range(0, max(W // PAGE_SIZE, 1)):
                tile = level_src[py * PAGE_SIZE:(py + 1) * PAGE_SIZE,
                                 px * PAGE_SIZE:(px + 1) * PAGE_SIZE]
                if tile.shape != (PAGE_SIZE, PAGE_SIZE):
                    pad = np.pad(tile, ((0, PAGE_SIZE - tile.shape[0]),
                                        (0, PAGE_SIZE - tile.shape[1])),
                                 mode="edge")
                    tile = pad
                pages[("height", level, px, py)] = tile
        level_src = level_src[::2, ::2]
        if min(level_src.shape) < 2:
            break
    manifest = vt_pack(args.out, pages)
    print(json.dumps({"store": args.out,
                      "pages": len(manifest["entries"]),
                      "page_size": PAGE_SIZE}))
    return 0


def bench_main(argv=None) -> int:
    """forge3d-bench: run the per-op benchmark harness (reference CLI
    contract: one op per invocation, --width/--height required)."""
    from .bench import BENCH_OPS, run_benchmark

    ap = argparse.ArgumentParser(prog="forge3d-bench")
    ap.add_argument("--op", required=True, choices=sorted(BENCH_OPS))
    ap.add_argument("--width", type=int, required=True)
    ap.add_argument("--height", type=int, required=True)
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--grid", type=int, default=16)
    ap.add_argument("--colormap", type=str, default="viridis")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args(argv)
    rec = run_benchmark(args.op, args.width, args.height,
                        iterations=args.iterations, warmup=args.warmup,
                        grid=args.grid, colormap=args.colormap,
                        seed=args.seed)
    print(json.dumps(rec))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(rec, fh, indent=2)
    return 0


if __name__ == "__main__":  # python -m forge3d_tpu.cli <cmd>
    cmds = {"viewer": viewer_main, "vtpack": vtpack_main,
            "bench": bench_main}
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        print(f"usage: python -m forge3d_tpu.cli {{{'|'.join(cmds)}}} ...",
              file=sys.stderr)
        sys.exit(2)
    sys.exit(cmds[sys.argv[1]](sys.argv[2:]))
