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

_BAKE_SIZE = 24.0
_PX_RANGE = 6.0
_PADDING = 3
#: default edge smoothing: MapScene uploads the atlas with smoothing = 1.0
#: (reference map_scene.py:2376 set_native_text_atlas(..., 1.0); the shader
#: floor is max(U.smoothing, 0.1), text_overlay.wgsl:73)
_SMOOTHING = 1.0



@lru_cache(maxsize=512)
def _glyph_sdf(font_path: str, glyph: str, bake_size: float,
               px_range: float, padding: int):
    """(sdf_normalized, x0, y0) — sdf in [-0.5, 0.5] (inside positive),
    clamped at +-px_range; (x0, y0) is the bitmap origin relative to the
    pen/baseline in bake px (y-down)."""
    face = _face(font_path)
    scale = bake_size / face.upem
    contours = _flatten_contours(face, glyph, scale, 0.0, 0.0)
    if not contours:
        return None
    pts = np.concatenate(contours, 0)
    x0 = int(np.floor(pts[:, 0].min())) - padding
    y0 = int(np.floor(pts[:, 1].min())) - padding
    x1 = int(np.ceil(pts[:, 0].max())) + padding
    y1 = int(np.ceil(pts[:, 1].max())) + padding
    w, h = x1 - x0, y1 - y0
    gy, gx = np.mgrid[0:h, 0:w]
    px = (gx + 0.5 + x0).astype(np.float32).ravel()
    py = (gy + 0.5 + y0).astype(np.float32).ravel()
    # distance to nearest segment across all contours
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
    dist = np.sqrt(best)
    from .font import _winding_inside

    inside = _winding_inside(contours, px, py)
    sdf_px = np.where(inside, dist, -dist).reshape(h, w)
    sdf = np.clip(sdf_px / px_range, -0.5, 0.5).astype(np.float32)
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
        yy, xx = np.mgrid[y0:y1, x0:x1]
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
        # (text_overlay.wgsl:73): fwidth is the per-pixel screen-space
        # |d/dx| + |d/dy| of the SAMPLED sdf — derived numerically here,
        # which reproduces the hardware quad-derivative ramp including its
        # contour-direction dependence (x|n_x|+|n_y| in [1, sqrt(2)]).
        gy_, gx_ = np.gradient(s)
        fw = np.abs(gx_) + np.abs(gy_)
        edge = np.maximum(fw * max(smoothing, 0.1), 1e-6)
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
