# True multi-channel signed distance fields for glyph atlases.
#
# Reference behavior being matched (not copied): src/labels/msdf/ bakes a
# 3-channel MSDF per glyph (edge segments split at corners, each edge
# assigned two of three channels, per-channel signed distance to the
# nearest same-colored edge); the text shader reconstructs coverage with
# `median3(sample.rgb)` so sharp corners survive bilinear atlas sampling
# that a single-channel SDF rounds off (src/shaders/text_overlay.wgsl,
# tests/test_msdf_fidelity.py gates).
#
# Pipeline (pure Python + numpy, fontTools for outlines):
#   1. glyph outline -> flattened closed polylines in atlas pixel space
#      (quadratic/cubic beziers subdivided uniformly);
#   2. corners detected by turning angle; contour split into edges;
#   3. edges colored cyclically with {yellow, cyan, magenta} two-channel
#      masks (msdfgen's "simple" coloring: adjacent edges share exactly
#      one channel, so the median stays exact along edges and resolves
#      corners);
#   4. per-channel unsigned distance = min over same-colored edges;
#      sign = even-odd winding of the full outline (nonzero fill matches
#      even-odd for TrueType glyphs as rendered by PIL for these fonts).

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = ["glyph_polylines", "color_edges", "msdf_glyph", "median3"]


def median3(r, g, b):
    """Channel-median MSDF decode (text_overlay.wgsl contract)."""
    return np.maximum(np.minimum(r, g), np.minimum(np.maximum(r, g), b))


# ---------------------------------------------------------------------------
# Outline extraction
# ---------------------------------------------------------------------------


def _flatten_quad(p0, p1, p2, n=8):
    t = np.linspace(0.0, 1.0, n + 1)[1:, None]
    return ((1 - t) ** 2 * p0 + 2 * (1 - t) * t * p1 + t ** 2 * p2)


def _flatten_cubic(p0, p1, p2, p3, n=12):
    t = np.linspace(0.0, 1.0, n + 1)[1:, None]
    return ((1 - t) ** 3 * p0 + 3 * (1 - t) ** 2 * t * p1
            + 3 * (1 - t) * t ** 2 * p2 + t ** 3 * p3)


def glyph_polylines(font_path: str, ch: str, px: int):
    """Closed outline polylines of `ch` in glyph pixel space (y-down,
    baseline at y=0 mapped later by the caller). Returns (polylines,
    advance_px, units_ascent_px, units_descent_px); polylines are float64
    (N, 2) arrays in FONT pixel units, y-UP."""
    from fontTools.pens.recordingPen import RecordingPen
    from fontTools.ttLib import TTFont

    font = TTFont(font_path, fontNumber=0, lazy=True)
    upm = font["head"].unitsPerEm
    scale = px / float(upm)
    cmap = font.getBestCmap()
    glyph_name = cmap.get(ord(ch))
    hmtx = font["hmtx"]
    asc = font["hhea"].ascent * scale
    desc = -font["hhea"].descent * scale
    if glyph_name is None:
        return [], 0.0, asc, desc
    adv = hmtx[glyph_name][0] * scale
    glyphset = font.getGlyphSet()
    pen = RecordingPen()
    glyphset[glyph_name].draw(pen)

    polylines: List[np.ndarray] = []
    cur: List[np.ndarray] = []
    start = None
    for op, args in pen.value:
        if op == "moveTo":
            if len(cur) > 1:
                polylines.append(np.array(cur))
            cur = [np.asarray(args[0], np.float64)]
            start = cur[0]
        elif op == "lineTo":
            cur.append(np.asarray(args[0], np.float64))
        elif op == "qCurveTo":
            # TrueType: implied on-curve midpoints between consecutive
            # off-curve points; final arg is on-curve (may be None for a
            # closed all-offcurve contour — rare; approximate by closing
            # to start)
            pts = [np.asarray(a, np.float64) if a is not None else start
                   for a in args]
            p0 = cur[-1]
            offs = pts[:-1]
            end = pts[-1]
            for i, off in enumerate(offs):
                nxt = offs[i + 1] if i + 1 < len(offs) else end
                mid = (off + nxt) / 2.0 if i + 1 < len(offs) else end
                cur.extend(_flatten_quad(p0, off, mid))
                p0 = mid
            if len(offs) == 0:
                cur.append(end)
        elif op == "curveTo":
            pts = [np.asarray(a, np.float64) for a in args]
            cur.extend(_flatten_cubic(cur[-1], pts[0], pts[1], pts[2]))
        elif op == "closePath" or op == "endPath":
            if len(cur) > 1:
                if not np.allclose(cur[0], cur[-1]):
                    cur.append(cur[0])
                polylines.append(np.array(cur))
            cur = []
    if len(cur) > 1:
        polylines.append(np.array(cur))
    return [p * scale for p in polylines], adv, asc, desc


# ---------------------------------------------------------------------------
# Edge splitting + coloring
# ---------------------------------------------------------------------------

_COLORS = (
    np.array([1.0, 1.0, 0.0]),   # yellow
    np.array([0.0, 1.0, 1.0]),   # cyan
    np.array([1.0, 0.0, 1.0]),   # magenta
)


def color_edges(poly: np.ndarray, corner_deg: float = 35.0):
    """Split a closed polyline at corners and assign two-channel colors.

    Returns a list of (segment_points (N,2), color (3,)) — msdfgen simple
    coloring: consecutive edges alternate so they share exactly one
    channel; a contour without corners is a single white edge (all
    channels), which degrades gracefully to plain SDF there.
    """
    pts = poly[:-1] if np.allclose(poly[0], poly[-1]) else poly
    n = len(pts)
    if n < 3:
        return [(poly, np.ones(3))]
    d = np.roll(pts, -1, axis=0) - pts
    ln = np.linalg.norm(d, axis=1)
    keep = ln > 1e-9
    pts = pts[keep]
    n = len(pts)
    if n < 3:
        return [(poly, np.ones(3))]
    d = np.roll(pts, -1, axis=0) - pts
    ln = np.maximum(np.linalg.norm(d, axis=1), 1e-12)
    t = d / ln[:, None]
    tp = np.roll(t, 1, axis=0)
    cosang = np.clip((t * tp).sum(1), -1.0, 1.0)
    cross = tp[:, 0] * t[:, 1] - tp[:, 1] * t[:, 0]
    ang = np.degrees(np.arctan2(np.abs(cross), cosang))
    corner_idx = np.nonzero(ang > corner_deg)[0]
    if len(corner_idx) == 0:
        ring = np.vstack([pts, pts[:1]])
        return [(ring, np.ones(3))]
    edges = []
    ci = list(corner_idx)
    for k in range(len(ci)):
        a = ci[k]
        b = ci[(k + 1) % len(ci)]
        if b > a:
            seg = pts[a:b + 1]
        else:
            seg = np.vstack([pts[a:], pts[:b + 1]])
        edges.append(seg)
    out = []
    for k, seg in enumerate(edges):
        if len(edges) == 1:
            # single corner (teardrop): split the lone edge in two colors
            h = max(len(seg) // 2, 1)
            out.append((seg[:h + 1], _COLORS[0]))
            out.append((seg[h:], _COLORS[1]))
        else:
            out.append((seg, _COLORS[k % 2 if k < len(edges) - 1 or
                                     len(edges) % 2 == 0 else 2]))
    return out


# ---------------------------------------------------------------------------
# Distance evaluation
# ---------------------------------------------------------------------------


def _dist_to_polyline(px_grid, py_grid, seg):
    """Unsigned distance from grid points to a polyline (S,2)."""
    a = seg[:-1]
    b = seg[1:]
    ab = b - a
    ab2 = np.maximum((ab * ab).sum(1), 1e-18)
    P = np.stack([px_grid.ravel(), py_grid.ravel()], 1)  # (N,2)
    best = np.full(P.shape[0], np.inf)
    # chunk over segments to bound memory
    for s0 in range(0, len(a), 64):
        aa = a[s0:s0 + 64]
        bb = ab[s0:s0 + 64]
        a2 = ab2[s0:s0 + 64]
        ap = P[:, None, :] - aa[None, :, :]
        t = np.clip((ap * bb[None, :, :]).sum(-1) / a2[None, :], 0.0, 1.0)
        proj = aa[None, :, :] + t[..., None] * bb[None, :, :]
        dd = np.linalg.norm(P[:, None, :] - proj, axis=-1).min(1)
        best = np.minimum(best, dd)
    return best.reshape(px_grid.shape)


def _inside_even_odd(px_grid, py_grid, polylines):
    """Even-odd winding test via horizontal ray casting."""
    inside = np.zeros(px_grid.shape, bool)
    for poly in polylines:
        a = poly[:-1]
        b = poly[1:]
        for s0 in range(0, len(a), 128):
            aa = a[s0:s0 + 128]
            bb = b[s0:s0 + 128]
            y0 = aa[:, 1][None, None, :]
            y1 = bb[:, 1][None, None, :]
            x0 = aa[:, 0][None, None, :]
            x1 = bb[:, 0][None, None, :]
            py = py_grid[..., None]
            px = px_grid[..., None]
            crosses = ((y0 <= py) != (y1 <= py))
            with np.errstate(divide="ignore", invalid="ignore"):
                xi = x0 + (py - y0) * (x1 - x0) / np.where(
                    y1 - y0 == 0, 1e-30, y1 - y0)
            hit = crosses & (xi > px)
            inside ^= (hit.sum(-1) % 2).astype(bool)
    return inside


def msdf_glyph(font_path: str, ch: str, px: int, *, padding: int = 6,
               sdf_range: float = 8.0, corner_deg: float = 35.0
               ) -> Optional[dict]:
    """Bake one glyph's 3-channel MSDF.

    Returns dict(image (H, W, 3) float32 signed pixel distances clipped to
    +-sdf_range, bearing (bx, by) in the single-channel atlas convention
    (bitmap offset from pen position; by measured from the baseline),
    advance) or None for empty glyphs.
    """
    polys, adv, asc, desc = glyph_polylines(font_path, ch, px)
    if not polys:
        return None
    allpts = np.vstack(polys)
    xmin, ymin = np.floor(allpts.min(0))
    xmax, ymax = np.ceil(allpts.max(0))
    W = int(xmax - xmin) + 2 * padding
    H = int(ymax - ymin) + 2 * padding
    if W <= 2 * padding or H <= 2 * padding:
        return None
    # pixel grid in font units (y-up); bitmap row 0 = top
    xs = xmin - padding + np.arange(W) + 0.5
    ys = ymax + padding - np.arange(H) - 0.5
    gx, gy = np.meshgrid(xs, ys)

    inside = _inside_even_odd(gx, gy, polys)
    sign = np.where(inside, 1.0, -1.0)

    chan = np.full((H, W, 3), np.inf)
    for poly in polys:
        for seg, color in color_edges(poly, corner_deg):
            if len(seg) < 2:
                continue
            d = _dist_to_polyline(gx, gy, seg)
            for c in range(3):
                if color[c] > 0.5:
                    chan[..., c] = np.minimum(chan[..., c], d)
    chan = np.where(np.isfinite(chan), chan, np.abs(sdf_range))
    out = np.clip(sign[..., None] * chan, -sdf_range, sdf_range)
    return {
        "image": out.astype(np.float32),
        "bearing": (float(xmin - padding), float(ymax + padding)),
        "advance": float(adv),
        "ascent": float(asc),
        "descent": float(desc),
    }
