# forge3d_tpu/thematic.py
# Thematic mapping: choropleth classification + color assignment for
# vector/raster layers (reference seams: src/gis/thematic.rs +
# python/forge3d/thematic.py — classify values into bins by a scheme and
# map to a colormap ramp).

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["classify", "classify_values", "ThematicStyle",
           "apply_thematic", "choropleth_colors"]

_SCHEMES = ("equal_interval", "quantile", "natural_breaks", "std_mean")


def classify(values, *, scheme: str = "quantile", k: int = 5,
             nodata: Optional[float] = None, right: bool = False) -> dict:
    """Classify numeric values into 1-based class IDs, reserving 0 for
    nodata — the reference's structured contract
    (python/forge3d/thematic.py:classify): dict with scheme/k/bins/
    classes/class_table/valid_count/nodata_count; jenks forces
    right-closed intervals."""
    array = np.asarray(values)
    vals = array.astype(np.float64, copy=False)
    valid_mask = np.isfinite(vals)
    if nodata is not None:
        valid_mask &= vals != float(nodata)
    valid = vals[valid_mask]
    k = int(k)
    if k < 2:
        raise ValueError("k must be at least 2")
    if valid.size == 0:
        raise ValueError("empty thematic input: no finite valid values")
    if k > valid.size:
        raise ValueError("k must not exceed the number of valid values")
    scheme = str(scheme).strip().lower().replace("-", "_")
    if scheme == "equal_interval":
        lo, hi = float(valid.min()), float(valid.max())
        if lo == hi:
            raise ValueError(
                "equal_interval requires at least two distinct values")
        bins = np.linspace(lo, hi, k + 1, dtype=np.float64)[1:-1]
    elif scheme == "quantile":
        qs = np.linspace(0.0, 1.0, k + 1, dtype=np.float64)[1:-1]
        bins = np.quantile(valid, qs).astype(np.float64)
        if np.unique(bins).size != bins.size:
            raise ValueError("quantile produced duplicate bins; reduce k "
                             "or provide more varied values")
    elif scheme in ("jenks", "natural_breaks"):
        # exact O(n^2 k) Fisher-Jenks on sorted data (matches the
        # reference's dynamic program; our k-means variant stays
        # available via classify_values)
        bins = _fisher_jenks_bins(valid, k)
        scheme = "jenks"
        right = True
    else:
        raise ValueError(
            "scheme must be one of: equal_interval, quantile, jenks")
    classes = np.zeros(array.shape, dtype=np.uint16)
    classes[valid_mask] = (np.digitize(valid, bins, right=right)
                           .astype(np.uint16) + 1)
    table = [{
        "class_id": cid,
        "left": None if cid == 1 else float(bins[cid - 2]),
        "right": None if cid == k else float(bins[cid - 1]),
        "count": int(np.count_nonzero(classes == cid)),
    } for cid in range(1, k + 1)]
    return {
        "scheme": scheme, "k": k, "bins": bins, "classes": classes,
        "class_table": table, "valid_count": int(valid.size),
        "nodata_count": int(array.size - valid.size),
    }


def _fisher_jenks_bins(valid: np.ndarray, k: int) -> np.ndarray:
    """Exact Fisher-Jenks optimal 1D classification (dynamic program
    over sorted data, minimizing within-class variance)."""
    data = np.sort(valid.astype(np.float64))
    n = data.size
    lower = np.zeros((n + 1, k + 1), np.int32)
    variance = np.full((n + 1, k + 1), np.inf)
    variance[1, 1:] = 0.0
    lower[1, 1:] = 1
    for end in range(2, n + 1):
        s_v = s_sq = w = 0.0
        best = np.full(k + 1, np.inf)
        arg = np.zeros(k + 1, np.int32)
        for start_offset in range(1, end + 1):
            start = end - start_offset + 1
            value = data[start - 1]
            s_v += value
            s_sq += value * value
            w += 1.0
            cost = s_sq - (s_v * s_v) / w
            if start > 1:
                for classes in range(2, k + 1):
                    cand = cost + variance[start - 1, classes - 1]
                    if cand < best[classes]:
                        best[classes] = cand
                        arg[classes] = start
        variance[end, 1] = (s_sq - (s_v * s_v) / w)
        lower[end, 1] = 1
        for classes in range(2, k + 1):
            variance[end, classes] = best[classes]
            lower[end, classes] = arg[classes]
    breaks = []
    idx = n
    for classes in range(k, 1, -1):
        start = int(lower[idx, classes])
        breaks.append(float(data[start - 2]))
        idx = start - 1
    return np.asarray(sorted(breaks), np.float64)


def classify_values(values, *, scheme: str = "quantile", k: int = 5
                    ) -> Tuple[np.ndarray, List[float]]:
    """Classify values into k bins; returns (bin_index per value, breaks).

    Schemes: equal_interval | quantile | natural_breaks (Jenks via 1D
    k-means iteration) | std_mean (mean +/- n*sigma).
    """
    v = np.asarray(values, np.float64).ravel()
    finite = v[np.isfinite(v)]
    if finite.size == 0:
        raise ValueError("no finite values to classify")
    if k < 2:
        raise ValueError("k must be >= 2")
    lo, hi = float(finite.min()), float(finite.max())
    if scheme == "equal_interval":
        breaks = list(np.linspace(lo, hi, k + 1)[1:-1])
    elif scheme == "quantile":
        breaks = list(np.quantile(finite, np.linspace(0, 1, k + 1)[1:-1]))
    elif scheme == "natural_breaks":
        # 1D k-means (Jenks-style): deterministic init at quantiles
        centers = np.quantile(finite, (np.arange(k) + 0.5) / k)
        for _ in range(50):
            d = np.abs(finite[:, None] - centers[None, :])
            lab = d.argmin(1)
            new = np.array([finite[lab == i].mean() if (lab == i).any()
                            else centers[i] for i in range(k)])
            if np.allclose(new, centers):
                break
            centers = new
        centers.sort()
        breaks = list((centers[:-1] + centers[1:]) / 2)
    elif scheme == "std_mean":
        m, s = float(finite.mean()), float(finite.std())
        half = (k - 1) / 2
        breaks = [m + (i - half + 0.5) * s for i in range(k - 1)]
    else:
        raise ValueError(f"unknown scheme {scheme!r}; one of {_SCHEMES}")
    idx = np.digitize(v, breaks)
    idx = np.where(np.isfinite(v), idx, -1)
    return idx.astype(np.int32), [float(b) for b in breaks]


@dataclass
class ThematicStyle:
    attribute: str
    scheme: str = "quantile"
    k: int = 5
    colormap: str = "viridis"
    nodata_color: Tuple[int, int, int, int] = (128, 128, 128, 255)


def choropleth_colors(k: int, colormap: str = "viridis") -> np.ndarray:
    """k RGBA u8 colors sampled evenly from a registered colormap."""
    from .colormaps import get_lut

    lut = np.asarray(get_lut(colormap))
    pos = np.linspace(0, len(lut) - 1, k).astype(int)
    c = (np.clip(lut[pos], 0, 1) * 255 + 0.5).astype(np.uint8)
    if c.shape[1] == 3:
        c = np.concatenate([c, np.full((k, 1), 255, np.uint8)], 1)
    return c


def apply_thematic(features: Sequence[dict], style: ThematicStyle) -> dict:
    """Assign a fill color per feature from its attribute value
    (reference seam: thematic mapping driving MapScene vector layers).
    Returns {features: [...with properties.__fill], breaks, colors,
    legend: [(label, rgba)]}."""
    vals = []
    for f in features:
        p = f.get("properties") or {}
        try:
            vals.append(float(p.get(style.attribute)))
        except (TypeError, ValueError):
            vals.append(np.nan)
    idx, breaks = classify_values(vals, scheme=style.scheme, k=style.k)
    colors = choropleth_colors(style.k, style.colormap)
    out = []
    for f, i in zip(features, idx):
        c = style.nodata_color if i < 0 else tuple(int(x) for x in colors[i])
        g = dict(f)
        g["properties"] = {**(f.get("properties") or {}),
                           "__fill": c, "__class": int(i)}
        out.append(g)
    lo = [float(np.nanmin(np.asarray(vals, float)))]
    edges = lo + breaks + [float(np.nanmax(np.asarray(vals, float)))]
    legend = [(f"{edges[i]:.4g} – {edges[i+1]:.4g}",
               tuple(int(x) for x in colors[i])) for i in range(style.k)]
    return {"features": out, "breaks": breaks,
            "colors": colors, "legend": legend}
