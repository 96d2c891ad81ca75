# forge3d_tpu/labels/native_text.py — SDF-atlas label renderer matching the
# reference's native text overlay.
#
# Parity notes (reference behavior, not code): the reference renders
# MapScene labels through an MSDF atlas sampled by a screen-space quad
# shader (src/shaders/text_overlay.wgsl:56-92): sdf = median(rgb)-0.5,
# edge_width = fwidth(sdf)*smoothing, fill = smoothstep(-e, e, sdf), halo
# band = smoothstep(-(halo_px*e + e), -e, sdf) under the fill, colors mixed
# by fill weight and composited source-over. The default atlas is baked at
# 24 px with px_range 6 and padding 3 (python/forge3d/text_atlas.py); a
# label-declared custom atlas keeps its own bake size. This module bakes a
# true single-channel SDF per glyph from the same packaged-font outlines
# and evaluates the same shader math on the CPU.

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from .font import FontFace, ShapedText, _face, _flatten_contours, shape

_BAKE_SIZE = 32.0
_PX_RANGE = 8.0
_PADDING = 4
#: default edge smoothing: MapScene uploads the atlas with smoothing = 1.0
#: (reference map_scene.py:2376 set_native_text_atlas(..., 1.0); the shader
#: floor is max(U.smoothing, 0.1), text_overlay.wgsl:73)
_SMOOTHING = 1.0



# --- reference edge coloring (src/labels/msdf/edge.rs) ---------------------

_CYAN, _MAGENTA, _YELLOW = 0b110, 0b101, 0b011
_COLOR_CYCLE = (_CYAN, _MAGENTA, _YELLOW)
_CORNER_COS = float(np.cos(0.75))     # CORNER_ANGLE_RADIANS


def _sharp_corners(pts):
    """Indices of sharp corners on a closed ring (pts without the closing
    duplicate), edge.rs::sharp_corners: dot(incoming, outgoing) <
    cos(0.75)."""
    n = len(pts)
    if n < 2:
        return []
    prv = pts[(np.arange(n) + n - 1) % n]
    nxt = pts[(np.arange(n) + 1) % n]
    inc = pts - prv
    out = nxt - pts
    inc = inc / np.maximum(np.linalg.norm(inc, axis=1, keepdims=True), 1e-12)
    out = out / np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
    return np.nonzero((inc * out).sum(1) < _CORNER_COS)[0].tolist()


def _canonical_index(pts, candidates):
    """edge.rs::canonical_index — lexicographic min by (point, next)."""
    n = len(pts)
    best, bk = None, None
    for i in candidates:
        key = (float(pts[i][0]), float(pts[i][1]),
               float(pts[(i + 1) % n][0]), float(pts[(i + 1) % n][1]))
        if bk is None or key < bk:
            bk, best = key, i
    return 0 if best is None else int(best)


def _span_colors(count, phase):
    colors = [_COLOR_CYCLE[(phase + i) % 3] for i in range(count)]
    if count > 1 and colors[0] == colors[-1]:
        colors[-1] = next(c for c in _COLOR_CYCLE
                          if c != colors[0] and c != colors[-2])
    return colors


def _color_edges_with_phase(ring, phase):
    """(from (E,2), to (E,2), color (E,)) for one closed ring
    (edge.rs::color_edges_with_phase)."""
    pts = ring[:-1]
    count = len(pts)
    if count == 0:
        return None
    corners = _sharp_corners(pts)
    frm, to = ring[:-1], ring[1:]
    if not corners:
        return frm, to, np.full(count, 0b111, np.int32)
    start = _canonical_index(pts, corners)
    ncol = min(3, count) if len(corners) == 1 else len(corners)
    colors = _span_colors(ncol, phase)
    offs = (np.arange(count) + count - start) % count
    if len(corners) == 1:
        span = np.minimum(offs * len(colors) // count, len(colors) - 1)
    else:
        corner_offs = np.sort((np.asarray(corners) + count - start) % count)
        span = np.maximum(
            np.searchsorted(corner_offs, offs, side="right") - 1, 0)
    col = np.asarray(colors, np.int32)[span]
    return frm, to, col


def _color_contours(contours):
    """All edges of a glyph with the deterministic cross-contour phase
    (edge.rs::color_contours)."""
    order = sorted(
        range(len(contours)),
        key=lambda i: tuple(
            np.asarray(
                [contours[i][:-1][_canonical_index(
                    contours[i][:-1], range(len(contours[i]) - 1))],
                 contours[i][:-1][(_canonical_index(
                     contours[i][:-1], range(len(contours[i]) - 1)) + 1)
                     % (len(contours[i]) - 1)]],
                np.float64).ravel()))
    frms, tos, cols = [], [], []
    for phase, i in enumerate(order):
        got = _color_edges_with_phase(contours[i], phase % 3)
        if got is None:
            continue
        frms.append(got[0])
        tos.append(got[1])
        cols.append(got[2])
    if not frms:
        return None
    return (np.concatenate(frms, 0).astype(np.float32),
            np.concatenate(tos, 0).astype(np.float32),
            np.concatenate(cols, 0))


def _edge_field(A, B, col, px, py, inside):
    """Per-channel MSDF + scalar truth at points (atlas.rs::field):
    channel value = tangent-extended pseudo-distance of the |true|-nearest
    colored edge, magnitude signed by point-sampled containment; scalar =
    nearest |true| distance with the same sign."""
    P = np.stack([px, py], 1).astype(np.float32)
    n = P.shape[0]
    sign = np.where(inside, 1.0, -1.0).astype(np.float32)
    chan = np.empty((n, 3), np.float32)
    best_td = np.full((3, n), np.inf, np.float32)
    best_ps = np.zeros((3, n), np.float32)
    nearest = np.full(n, np.inf, np.float32)
    for s in range(0, len(A), 96):
        a = A[s:s + 96][None]          # (1,E,2)
        b = B[s:s + 96][None]
        c = col[s:s + 96]
        v = b - a
        L = np.maximum(np.sqrt((v * v).sum(-1)), 1e-12)
        dirn = v / L[..., None]
        rel = P[:, None, :] - a        # (n,E,2)
        proj = (rel * dirn).sum(-1)
        t = np.clip(proj / L, 0.0, 1.0)
        nearp = a + t[..., None] * v
        td = np.sqrt(((P[:, None, :] - nearp) ** 2).sum(-1))
        perp = dirn[..., 0] * rel[..., 1] - dirn[..., 1] * rel[..., 0]
        ps = np.where((proj < 0.0) | (proj > L), np.abs(perp), td)
        nearest = np.minimum(nearest, td.min(1))
        for ch in range(3):
            m = (c & (1 << ch)) != 0
            if not m.any():
                continue
            tdm = np.where(m[None, :], td, np.inf)
            idx = tdm.argmin(1)
            tmin = tdm[np.arange(n), idx]
            upd = tmin < best_td[ch]
            best_td[ch] = np.where(upd, tmin, best_td[ch])
            best_ps[ch] = np.where(upd, ps[np.arange(n), idx], best_ps[ch])
    for ch in range(3):
        has = np.isfinite(best_td[ch])
        chan[:, ch] = np.where(has, np.abs(best_ps[ch]), nearest) * sign
    return chan, nearest * sign


def _median3(a, b, c):
    """median(a, b, c) = max(min(a, b), min(max(a, b), c))
    (text_overlay.wgsl::median3, distance.rs::median)."""
    return np.maximum(np.minimum(a, b),
                      np.minimum(np.maximum(a, b), c))


def _segment_distance(contours, px, py):
    """Unsigned distance from each (px, py) to the nearest flattened
    outline segment."""
    best = np.full(px.shape, np.inf, np.float32)
    for c in contours:
        a, b = c[:-1], c[1:]
        for s in range(0, len(a), 128):
            ax = a[s:s + 128, 0][:, None]
            ay = a[s:s + 128, 1][:, None]
            bx = b[s:s + 128, 0][:, None]
            by = b[s:s + 128, 1][:, None]
            vx, vy = bx - ax, by - ay
            len2 = np.maximum(vx * vx + vy * vy, 1e-12)
            t = np.clip(((px[None] - ax) * vx + (py[None] - ay) * vy)
                        / len2, 0.0, 1.0)
            d2 = (px[None] - (ax + t * vx)) ** 2 \
                + (py[None] - (ay + t * vy)) ** 2
            best = np.minimum(best, d2.min(axis=0))
    return np.sqrt(best)


@lru_cache(maxsize=512)
def _glyph_sdf(font_path: str, glyph: str, bake_size: float,
               px_range: float, padding: int):
    """(sdf_normalized, x0, y0) — the reference atlas bake
    (src/labels/msdf/atlas.rs::bake_prepared): per-texel signed TRUE
    distance with the sign snapped to the 8x8-subsample pixel coverage
    (texels under 0.5 coverage are forced outside, +-1e-4), clamped to
    +-px_range, u8-quantized exactly as stored ((0.5 + d/px_range)*255
    + 0.5 floor), then decoded back to sample-0.5 units in [-0.5, 0.5].
    The bitmap spans the reference cell margin = padding +
    ceil(px_range) so halo falloff has the same room as the native
    quad. (x0, y0) is the bitmap origin relative to the pen/baseline in
    bake px (y-down)."""
    face = _face(font_path)
    scale = bake_size / face.upem
    contours = _flatten_contours(face, glyph, scale, 0.0, 0.0)
    if not contours:
        return None
    pts = np.concatenate(contours, 0)
    margin = int(padding) + int(np.ceil(px_range))
    x0 = int(np.floor(pts[:, 0].min())) - margin
    y0 = int(np.floor(pts[:, 1].min())) - margin
    x1 = int(np.ceil(pts[:, 0].max())) + margin
    y1 = int(np.ceil(pts[:, 1].max())) + margin
    w, h = x1 - x0, y1 - y0
    gy, gx = np.mgrid[0:h, 0:w]
    px = (gx + 0.5 + x0).astype(np.float32).ravel()
    py = (gy + 0.5 + y0).astype(np.float32).ravel()
    dist = _segment_distance(contours, px, py)
    from .font import _winding_inside

    inside = _winding_inside(contours, px, py)
    scalar = np.where(inside, dist, -dist)
    # 8x8 subsample coverage (atlas.rs::pixel_coverage)
    sub = ((np.arange(8) + 0.5) / 8.0).astype(np.float32)
    oy, ox = np.meshgrid(sub, sub, indexing="ij")
    cx = ((gx + x0).astype(np.float32).ravel()[:, None]
          + ox.ravel()[None, :]).ravel()
    cy = ((gy + y0).astype(np.float32).ravel()[:, None]
          + oy.ravel()[None, :]).ravel()
    cov = _winding_inside(contours, cx, cy).reshape(-1, 64) \
        .mean(axis=1).astype(np.float32)
    # median target: sign snapped to coverage >= 0.5 (atlas.rs:279-291)
    target = np.clip(scalar, -px_range, px_range)
    inside_cov = cov >= 0.5
    snapped = np.where((target >= 0.0) == inside_cov, target,
                       np.where(inside_cov, 1e-4, -1e-4))
    stored = np.floor(np.clip(0.5 + snapped / px_range, 0.0, 1.0)
                      * 255.0 + 0.5)
    sdf = (stored / 255.0 - 0.5).reshape(h, w).astype(np.float32)
    return sdf, float(x0), float(y0)


def _smoothstep(e0, e1, x):
    t = np.clip((x - e0) / np.maximum(e1 - e0, 1e-9), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def draw_native_label(image: np.ndarray, text: str,
                      anchor: Tuple[float, float], *,
                      color, halo, halo_width_px: float,
                      font_size: float,
                      bake_size: Optional[float] = None,
                      px_range: float = _PX_RANGE,
                      padding: int = _PADDING,
                      smoothing: Optional[float] = None,
                      font_chain: Optional[Sequence[str]] = None) -> None:
    """Draw one label with the native-overlay shader semantics. `anchor`
    is the baseline pen origin (the reference's label anchor). `color` /
    `halo` are RGBA in [0,1]."""
    bake = float(bake_size if bake_size is not None else
                 (font_size if font_size > _BAKE_SIZE else _BAKE_SIZE))
    shaped = shape(text, font_chain, bake)
    atlas_scale = float(font_size) / bake
    ih, iw = image.shape[:2]
    col = np.asarray(color, np.float32)
    hal = np.asarray(halo, np.float32)
    if col.size == 3:
        col = np.append(col, 1.0)
    if hal.size == 3:
        hal = np.append(hal, 1.0)
    if smoothing is None:
        smoothing = _SMOOTHING
    halo_px = max(float(halo_width_px), 0.0)
    for g in shaped.glyphs:
        got = _glyph_sdf(g.face.path, g.glyph, bake, px_range, int(padding))
        if got is None:
            continue
        sdf, bx0, by0 = got
        gh, gw = sdf.shape
        # quad placement in screen px
        qx = anchor[0] + (g.x + bx0) * atlas_scale
        qy = anchor[1] + (g.y + by0) * atlas_scale
        qw = gw * atlas_scale
        qh = gh * atlas_scale
        x0 = max(0, int(np.floor(qx)))
        y0 = max(0, int(np.floor(qy)))
        x1 = min(iw, int(np.ceil(qx + qw)))
        y1 = min(ih, int(np.ceil(qy + qh)))
        if x0 >= x1 or y0 >= y1:
            continue
        # sample over the window EXTENDED to 2x2 quad alignment in
        # absolute framebuffer coordinates, so the coarse-derivative
        # blocks below land exactly where the hardware's do
        ex0, ey0 = x0 - (x0 & 1), y0 - (y0 & 1)
        ex1, ey1 = x1 + ((x1 - ex0) & 1), y1 + ((y1 - ey0) & 1)
        yy, xx = np.mgrid[ey0:ey1, ex0:ex1]
        u = (xx + 0.5 - qx) / atlas_scale - 0.5
        v = (yy + 0.5 - qy) / atlas_scale - 0.5
        ui = np.clip(np.floor(u).astype(int), 0, gw - 2)
        vi = np.clip(np.floor(v).astype(int), 0, gh - 2)
        uf = np.clip(u - ui, 0.0, 1.0)
        vf = np.clip(v - vi, 0.0, 1.0)
        s = (sdf[vi, ui] * (1 - uf) * (1 - vf)
             + sdf[vi, ui + 1] * uf * (1 - vf)
             + sdf[vi + 1, ui] * (1 - uf) * vf
             + sdf[vi + 1, ui + 1] * uf * vf)
        # edge_width = max(fwidth(sdf) * max(smoothing, 0.1), 1e-6)
        # (text_overlay.wgsl:73): hardware fwidth = |dFdxCoarse| +
        # |dFdyCoarse|, CONSTANT over each 2x2 pixel quad (top-row /
        # left-column one-sided differences of the sampled sdf). The
        # quad granularity matters: boundary quads keep a full-size
        # edge_width for all four pixels, which is what gives the
        # native halos their soft 2px-quantized tails.
        sh, sw = s.shape
        sq = s.reshape(sh // 2, 2, sw // 2, 2)
        dx_ = sq[:, 0, :, 1] - sq[:, 0, :, 0]
        dy_ = sq[:, 1, :, 0] - sq[:, 0, :, 0]
        fw = np.repeat(np.repeat(np.abs(dx_) + np.abs(dy_), 2, 0), 2, 1)
        edge = np.maximum(fw * max(smoothing, 0.1), 1e-6)
        # crop the alignment apron back to the visible window
        cy0, cx0 = y0 - ey0, x0 - ex0
        s = s[cy0:cy0 + (y1 - y0), cx0:cx0 + (x1 - x0)]
        edge = edge[cy0:cy0 + (y1 - y0), cx0:cx0 + (x1 - x0)]
        fill = _smoothstep(-edge, edge, s)
        if halo_px > 0.0 and hal[3] > 0.0:
            halo_distance = halo_px * edge
            halo_a = _smoothstep(-(halo_distance + edge), -edge, s)
        else:
            halo_a = np.zeros_like(fill)
        halo_under = halo_a * (1.0 - fill)
        fill_a = np.clip(fill * col[3], 0.0, 1.0)
        halo_w = np.clip(halo_under * hal[3], 0.0, 1.0)
        local_a = np.clip(fill_a + halo_w * (1.0 - fill_a), 0.0, 1.0)
        weight = fill_a / np.maximum(fill_a + halo_w, 1e-6)
        rgb = (hal[None, None, :3] * (1 - weight[..., None])
               + col[None, None, :3] * weight[..., None])
        dst = image[y0:y1, x0:x1, :3].astype(np.float32) / 255.0
        out = dst * (1 - local_a[..., None]) + rgb * local_a[..., None]
        image[y0:y1, x0:x1, :3] = np.clip(
            out * 255.0 + 0.5, 0, 255).astype(np.uint8)
        a_dst = image[y0:y1, x0:x1, 3].astype(np.float32) / 255.0
        image[y0:y1, x0:x1, 3] = np.clip(
            (local_a + a_dst * (1 - local_a)) * 255.0 + 0.5, 0,
            255).astype(np.uint8)
