#!/usr/bin/env python
# examples/vt_out_of_core.py — out-of-core virtual texturing: pack a
# paged albedo store far larger than the residency budget, render with
# VT resolve, and report the TESSELLA evidence stats (the reference's
# virtual-texturing workflow; ref src/terrain/vt/ +
# scripts/tessella_evidence_thresholds.py).
#
# Usage: python examples/vt_out_of_core.py [out.png]

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(out_path="vt_out_of_core.png"):
    import forge3d_tpu as f3d
    from forge3d_tpu.terrain.params import make_terrain_params
    from forge3d_tpu.terrain.renderer import MaterialSet, TerrainRenderer
    from forge3d_tpu.terrain.vt import PAGE_SIZE, VTStore, vt_pack

    n = 129
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = 6.0 * np.sin(xx * 0.12) * np.cos(yy * 0.1)

    # pack a 3-level albedo pyramid (16x16 + 8x8 + 4x4 pages of 128^2)
    def page(level, x, y):
        i = np.arange(PAGE_SIZE)
        gx, gy = np.meshgrid(i, i)
        hue = (x * 53 + y * 31 + level * 97) % 255
        r = ((gx // 16 + gy // 16) % 2) * 90 + 70
        g = np.full_like(r, 80 + hue // 3)
        b = np.full_like(r, 190 - 40 * level)
        return np.stack([r, g, b, np.full_like(r, 255)], -1).astype(np.uint8)

    pages = {("albedo", lv, x, y): page(lv, x, y)
             for lv, cnt in ((0, 16), (1, 8), (2, 4))
             for y in range(cnt) for x in range(cnt)}

    with tempfile.TemporaryDirectory() as d:
        store_path = Path(d) / "albedo.f3dvt"
        vt_pack(store_path, pages)
        budget = 32 * PAGE_SIZE * PAGE_SIZE * 3 * 4
        store = VTStore(store_path, budget_bytes=budget)
        ms = MaterialSet(vt_store=store, vt_budget_bytes=budget)
        p = make_terrain_params(size_px=(640, 400))
        p.light.intensity = 1.3
        r = TerrainRenderer()
        frame = r.render_terrain_pbr_pom(material_set=ms, params=p,
                                         heightmap=dem)
        st = r.last_vt_stats
        f3d.numpy_to_png(out_path, frame.rgba)
        print(f"wrote {out_path}")
        print(f"logical texels:   {st['logical_texels']:,}")
        print(f"resident bytes:   {st['resident_bytes']:,} "
              f"(budget {st['budget_bytes']:,})")
        print(f"fallback texels:  {st['fallback_texels_frame']:.0f}")
        print(f"render timings:   {r.last_gpu_timings}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
