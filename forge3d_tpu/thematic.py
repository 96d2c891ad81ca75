# forge3d_tpu/thematic.py
# Thematic mapping: choropleth classification + color assignment for
# vector/raster layers (reference seams: src/gis/thematic.rs +
# python/forge3d/thematic.py — classify values into bins by a scheme and
# map to a colormap ramp).

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["classify_values", "ThematicStyle", "apply_thematic",
           "choropleth_colors"]

_SCHEMES = ("equal_interval", "quantile", "natural_breaks", "std_mean")


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
