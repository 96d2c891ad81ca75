# forge3d_tpu/alignment.py
# CRS alignment reports: validate that raster/vector layers share a
# consistent grid before composition (reference seam:
# python/forge3d/alignment.py — MapScene blocks on misaligned inputs).

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["LayerGrid", "alignment_report", "AlignmentIssue"]


@dataclass(frozen=True)
class LayerGrid:
    name: str
    crs: Optional[str]
    transform: Tuple[float, ...]     # rasterio affine (a,b,c,d,e,f)
    shape: Tuple[int, int]

    @property
    def bounds(self) -> Tuple[float, float, float, float]:
        a, b, c, d, e, f = self.transform
        h, w = self.shape
        xs = [c, c + a * w + b * h]
        ys = [f, f + d * w + e * h]
        return (min(xs), min(ys), max(xs), max(ys))

    @property
    def resolution(self) -> Tuple[float, float]:
        a, b, c, d, e, f = self.transform
        return (abs(a), abs(e))


@dataclass
class AlignmentIssue:
    severity: str        # error | warning
    layer: str
    kind: str
    detail: str


def alignment_report(layers: Sequence[LayerGrid], *,
                     resolution_rtol: float = 1e-6,
                     bounds_overlap_min: float = 0.5) -> dict:
    """Check CRS equality, resolution match, grid-origin phase and bounds
    overlap across layers; returns {ok, issues, reference}."""
    issues: List[AlignmentIssue] = []
    if not layers:
        return {"ok": True, "issues": [], "reference": None}
    ref = layers[0]
    for lyr in layers[1:]:
        if (lyr.crs or "").upper() != (ref.crs or "").upper():
            issues.append(AlignmentIssue(
                "error", lyr.name, "crs_mismatch",
                f"{lyr.crs!r} != reference {ref.crs!r}"))
            continue
        rr = ref.resolution
        lr = lyr.resolution
        if not (np.isclose(rr[0], lr[0], rtol=resolution_rtol)
                and np.isclose(rr[1], lr[1], rtol=resolution_rtol)):
            issues.append(AlignmentIssue(
                "warning", lyr.name, "resolution_mismatch",
                f"{lr} vs reference {rr}"))
        # grid phase: origins must differ by an integer number of pixels
        dx = (lyr.transform[2] - ref.transform[2]) / max(rr[0], 1e-30)
        dy = (lyr.transform[5] - ref.transform[5]) / max(rr[1], 1e-30)
        if abs(dx - round(dx)) > 1e-3 or abs(dy - round(dy)) > 1e-3:
            issues.append(AlignmentIssue(
                "warning", lyr.name, "grid_phase",
                f"subpixel origin offset ({dx:.4f}, {dy:.4f}) px"))
        # overlap
        b0 = ref.bounds
        b1 = lyr.bounds
        ix = max(0.0, min(b0[2], b1[2]) - max(b0[0], b1[0]))
        iy = max(0.0, min(b0[3], b1[3]) - max(b0[1], b1[1]))
        a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
        frac = (ix * iy) / a1 if a1 > 0 else 0.0
        if frac < bounds_overlap_min:
            issues.append(AlignmentIssue(
                "error", lyr.name, "insufficient_overlap",
                f"only {frac:.1%} of layer inside reference bounds"))
    ok = not any(i.severity == "error" for i in issues)
    return {"ok": ok,
            "issues": [i.__dict__ for i in issues],
            "reference": ref.name}
