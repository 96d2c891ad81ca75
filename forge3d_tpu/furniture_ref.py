# forge3d_tpu/furniture_ref.py — reference-layout map furniture compositor.
#
# Parity notes: reproduces the behavior of the reference's CPU furniture
# compositor (python/forge3d/_map_scene_render.py:1180-1356 — title at
# (12,12), legend panel anchored bottom-right with stringified rows and
# hash swatches, scale bar with nice-distance selection and alternating
# divisions placed bottom-left, circular north arrow placed top-right,
# lon/lat graticule with "N deg{E,W,N,S}" labels), plus the geometry
# generators in python/forge3d/{scale_bar,north_arrow,graticule}.py.
# Implementation is original; only the layout/format contract is mirrored
# so MapScene output scores against the reference recipe goldens.

from __future__ import annotations

import math
from typing import Mapping, Optional, Sequence, Tuple

import numpy as np

Color = Tuple[int, int, int, int]

#: nice round distances for the scale bar, in display units
NICE_INTERVALS = [0.001, 0.002, 0.005, 0.01, 0.02, 0.05, 0.1, 0.2, 0.5,
                  1, 2, 5, 10, 20, 25, 50, 100, 200, 250, 500, 1000,
                  2000, 2500, 5000, 10000]
UNIT_FACTORS = {"m": 1.0, "km": 0.001, "mi": 0.000621371, "ft": 3.28084}


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _blend_rect(image: np.ndarray, x0: int, y0: int, x1: int, y1: int,
                color: Color) -> None:
    h, w = image.shape[:2]
    x0, x1 = max(0, int(x0)), min(w, int(x1))
    y0, y1 = max(0, int(y0)), min(h, int(y1))
    if x0 >= x1 or y0 >= y1:
        return
    a = color[3] / 255.0
    region = image[y0:y1, x0:x1, :3].astype(np.float32)
    image[y0:y1, x0:x1, :3] = (
        region * (1 - a) + np.asarray(color[:3], np.float32) * a
    ).astype(np.uint8)


def _draw_text(image: np.ndarray, text: str, anchor: Tuple[float, float], *,
               color: Color, halo: Color = (0, 0, 0, 0),
               halo_width_px: float = 0.0, font_size: float = 12.0) -> None:
    """Anchor is the text's top-left; baseline = y + font_size (the
    reference _draw_text contract). Rendered with the packaged Noto
    subsets through the outline-exact engine (labels/font.py), matching
    the reference's glyphs and metrics byte-for-byte."""
    from .labels.font import draw_shaped_text

    draw_shaped_text(image, str(text), anchor, color=color, halo=halo,
                     halo_width_px=float(halo_width_px),
                     font_size=float(font_size))


def _text_outline_metrics(text: str, font_size: float):
    """(width, height, bounds) of shaped text (reference
    _text_outline_metrics contract)."""
    from .labels.font import shape

    shaped = shape(str(text), None, float(font_size))
    bounds = shaped.outline_bounds()
    if bounds is None:
        return 0, 0, None
    x0, y0, x1, y1 = bounds
    return (max(1, int(math.ceil(x1 - x0))),
            max(1, int(math.ceil(y1 - y0))), bounds)


def _draw_polyline(image: np.ndarray, points: Sequence[Tuple[int, int]],
                   color: Color, width_px: float = 1.0) -> None:
    if len(points) < 2:
        return
    h, w = image.shape[:2]
    a = color[3] / 255.0
    col = np.asarray(color[:3], np.float32)
    for (x0, y0), (x1, y1) in zip(points[:-1], points[1:]):
        n = max(abs(x1 - x0), abs(y1 - y0), 1)
        xs = np.round(np.linspace(x0, x1, n + 1)).astype(int)
        ys = np.round(np.linspace(y0, y1, n + 1)).astype(int)
        ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
        xs, ys = xs[ok], ys[ok]
        region = image[ys, xs, :3].astype(np.float32)
        image[ys, xs, :3] = (region * (1 - a) + col * a).astype(np.uint8)


def _overlay_rgba(image: np.ndarray, overlay: np.ndarray,
                  x: int, y: int) -> None:
    h, w = image.shape[:2]
    sh, sw = overlay.shape[:2]
    x0, y0 = max(0, x), max(0, y)
    x1, y1 = min(w, x + sw), min(h, y + sh)
    if x0 >= x1 or y0 >= y1:
        return
    clip = overlay[y0 - y:y1 - y, x0 - x:x1 - x]
    a = clip[..., 3:4].astype(np.float32) / 255.0
    dst = image[y0:y1, x0:x1, :3].astype(np.float32)
    image[y0:y1, x0:x1, :3] = np.clip(
        dst * (1 - a) + clip[..., :3].astype(np.float32) * a, 0, 255
    ).astype(np.uint8)
    image[y0:y1, x0:x1, 3] = 255


def _overlay_position(frame: Tuple[int, int], size: Tuple[int, int],
                      position: str, margin: int) -> Tuple[int, int]:
    H, W = frame
    sh, sw = size
    pos = position.replace("_", "-")
    x = {"left": margin, "right": W - sw - margin}.get(
        pos.split("-")[-1], (W - sw) // 2)
    y = {"top": margin, "upper": margin, "bottom": H - sh - margin,
         "lower": H - sh - margin}.get(pos.split("-")[0], (H - sh) // 2)
    return x, y


def _polygon_fill(image: np.ndarray, pts: Sequence[Tuple[float, float]],
                  color: Color) -> None:
    yy, xx = np.mgrid[:image.shape[0], :image.shape[1]]
    inside = np.zeros(xx.shape, bool)
    prev = pts[-1]
    for cur in pts:
        x0, y0 = prev
        x1, y1 = cur
        crossing = ((y0 > yy) != (y1 > yy)) & (
            xx < (x1 - x0) * (yy - y0) / ((y1 - y0) + 1e-12) + x0)
        inside ^= crossing
        prev = cur
    image[inside] = color


def _seg_line(image: np.ndarray, p0, p1, color: Color, width: int) -> None:
    yy, xx = np.mgrid[:image.shape[0], :image.shape[1]]
    x0, y0 = p0
    x1, y1 = p1
    dx, dy = x1 - x0, y1 - y0
    den = max(dx * dx + dy * dy, 1e-12)
    t = np.clip(((xx - x0) * dx + (yy - y0) * dy) / den, 0.0, 1.0)
    d = np.hypot(xx - (x0 + t * dx), yy - (y0 + t * dy))
    image[d <= max(0.5, width * 0.5)] = color


# ---------------------------------------------------------------------------
# furniture pieces
# ---------------------------------------------------------------------------

def draw_title(image: np.ndarray, title: str) -> None:
    if not title:
        return
    _draw_text(image, title, (12, 12), color=(20, 20, 20, 255),
               halo=(255, 255, 255, 220), halo_width_px=2.0)


def draw_simple_legend(image: np.ndarray, options: Mapping) -> None:
    from .mapscene import layer_hash_rgb

    items = options.get("items") or options.get("labels")
    if not items:
        return
    h, w = image.shape[:2]
    rows = [str(item) for item in list(items)[:8]]
    panel_w = min(180, max(80, max(len(r) for r in rows) * 7 + 28))
    panel_h = len(rows) * 13 + 12
    x0 = w - panel_w - 12
    y0 = h - panel_h - 12
    bg = tuple(options.get("background", (255, 255, 255, 205)))
    _blend_rect(image, x0, y0, x0 + panel_w, y0 + panel_h, bg)
    for idx, row in enumerate(rows):
        y = y0 + 8 + idx * 13
        swatch = layer_hash_rgb(row, salt="legend")
        _blend_rect(image, x0 + 8 - 3, y + 3 - 3, x0 + 8 + 4, y + 3 + 4,
                    (*swatch, 255))
        _draw_text(image, row, (x0 + 18, y), color=(20, 20, 20, 255),
                   halo=(255, 255, 255, 180), halo_width_px=1.0)


def scale_bar_geometry(meters_per_pixel: float, *, units: str = "km",
                       width_px: int = 180, padding: int = 8,
                       bar_height: int = 8, divisions: int = 4,
                       font_size: int = 12):
    """Nice-distance alternating scale bar; returns (rgba, label, anchor)."""
    bar_width = width_px - 2 * padding
    max_display = bar_width * meters_per_pixel * UNIT_FACTORS[units]
    nice = NICE_INTERVALS[0]
    for iv in NICE_INTERVALS:
        if iv <= max_display:
            nice = iv
        else:
            break
    nice_m = nice / UNIT_FACTORS[units]
    actual = min(int(nice_m / meters_per_pixel), bar_width)
    label = f"{int(nice)} {units}" if nice >= 1 else f"{nice:.1f} {units}"
    label_w, outline_h, bounds = _text_outline_metrics(label, font_size)
    label_h = max(outline_h, max(1, int(math.ceil(font_size * 1.25))))
    tw = max(actual + 2 * padding, label_w + 2 * padding)
    th = padding + bar_height + 4 + label_h + padding
    img = np.empty((th, tw, 4), np.uint8)
    img[...] = (255, 255, 255, 200)
    bx = by = padding
    edges = np.linspace(bx, bx + actual, divisions + 1, dtype=int)
    for i in range(divisions):
        img[by:by + bar_height, edges[i]:edges[i + 1]] = (
            (0, 0, 0, 255) if i % 2 == 0 else (255, 255, 255, 255))
    x1, y1 = bx + actual, by + bar_height
    img[by:y1, bx] = (0, 0, 0, 255)
    img[by:y1, max(bx, x1 - 1)] = (0, 0, 0, 255)
    img[by, bx:x1] = (0, 0, 0, 255)
    img[max(by, y1 - 1), bx:x1] = (0, 0, 0, 255)
    lx = max(0, bx + (actual - label_w) // 2)
    if bounds is not None:
        lx = max(0, int(round(lx - float(bounds[0]))))
    ly = by + bar_height + 4
    return img, label, (lx, ly)


def geodesic_meters_per_pixel(bounds, width: int) -> float:
    """WGS84 geodesic width of the bounds at center latitude / width."""
    west, south, east, north = (float(b) for b in bounds)
    mid = (south + north) * 0.5
    try:
        from .geo.geodesic import geodesic_inverse

        dist = geodesic_inverse(west, mid, east, mid)["distance"]
    except Exception:
        dist = abs(east - west) * 111320.0 * math.cos(math.radians(mid))
    return abs(float(dist)) / max(width, 1)


def compose_scale_bar(image: np.ndarray, options: Mapping,
                      bounds=None) -> None:
    mpp = options.get("meters_per_pixel")
    if mpp is None and bounds is not None:
        mpp = geodesic_meters_per_pixel(bounds, image.shape[1])
    if mpp is None:
        return
    units = str(options.get("units", "km"))
    overlay, label, anchor = scale_bar_geometry(float(mpp), units=units)
    _draw_text(overlay, label, anchor, color=(0, 0, 0, 255))
    pos = str(options.get("location", options.get("position",
                                                  "bottom-left")))
    x, y = _overlay_position(image.shape[:2], overlay.shape[:2], pos, 12)
    _overlay_rgba(image, overlay, x, y)


def north_arrow_geometry(size: int = 60):
    padding = 8
    total = size + 2 * padding
    img = np.zeros((total, total, 4), np.uint8)
    cx = cy = total // 2
    yy, xx = np.mgrid[:total, :total]
    radius = (total - padding) * 0.5
    dist = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    img[dist <= radius] = (255, 255, 255, 200)
    img[(dist <= radius) & (dist >= radius - 1)] = (0, 0, 0, 255)
    arrow_len = size // 2 - 8
    arrow_w = size // 6
    tip = (cx, cy - arrow_len)
    base_d = math.hypot(arrow_len, arrow_w) * 0.4
    ang = math.atan2(arrow_w, arrow_len)
    bl = (cx + base_d * math.sin(math.pi + ang),
          cy - base_d * math.cos(math.pi + ang))
    br = (cx + base_d * math.sin(math.pi - ang),
          cy - base_d * math.cos(math.pi - ang))
    tail = (cx, cy + arrow_len * 0.6)
    _polygon_fill(img, [tip, (cx, cy), bl], (0, 0, 0, 255))
    _polygon_fill(img, [tip, (cx, cy), br], (255, 255, 255, 200))
    for p0, p1, wd in ((tip, br, 1), (br, (cx, cy), 1), ((cx, cy), tip, 1),
                       ((cx, cy), tail, 2)):
        _seg_line(img, p0, p1, (0, 0, 0, 255), wd)
    # N label anchored so its visual center sits at the rim offset
    # (reference _text_anchor_for_visual_center semantics, font 14)
    n_y = cy - (size // 2 - 2)
    font_size = 14.0
    _, _, b = _text_outline_metrics("N", font_size)
    if b is None:
        return img, "N", (cx - 4, n_y - 7)
    anchor = (int(round(cx - (b[0] + b[2]) * 0.5)),
              int(round(n_y - font_size - (b[1] + b[3]) * 0.5)))
    return img, "N", anchor


def compose_north_arrow(image: np.ndarray, options: Mapping) -> None:
    size = int(options.get("size", 60))
    overlay, label, anchor = north_arrow_geometry(size)
    _draw_text(overlay, label, anchor, color=(0, 0, 0, 255),
               font_size=float(options.get("font_size", 14)))
    pos = str(options.get("location", options.get("position", "top-right")))
    x, y = _overlay_position(image.shape[:2], overlay.shape[:2], pos, 12)
    _overlay_rgba(image, overlay, x, y)


def _grid_values(start: float, end: float, interval: float):
    first = math.ceil((start - 1e-9) / interval) * interval
    out = []
    v = first
    while v <= end + 1e-9:
        out.append(0.0 if abs(v) < 1e-9 else v)
        v += interval
    return out


def _format_coord(value: float, axis: str, precision: int = 3) -> str:
    if axis == "lon":
        suffix = "E" if value > 0 else "W" if value < 0 else ""
    else:
        suffix = "N" if value > 0 else "S" if value < 0 else ""
    r = round(abs(float(value)), max(0, precision))
    text = str(int(r)) if float(r).is_integer() else (
        f"{r:.{max(0, precision)}f}".rstrip("0").rstrip("."))
    return f"{text} deg{suffix}"


def draw_graticule(image: np.ndarray, options: Mapping) -> None:
    bounds = options.get("bounds")
    if bounds is None:
        return
    west, south, east, north = (float(b) for b in bounds)
    pb = options.get("projected_bounds") or (west, south, east, north)
    interval = float(options.get("interval_deg", options.get("interval",
                                                             1.0)))
    h, w = image.shape[:2]

    def to_px(lon, lat):
        x = (lon - pb[0]) / max(pb[2] - pb[0], 1e-9)
        y = (pb[3] - lat) / max(pb[3] - pb[1], 1e-9)
        return (max(0, min(w - 1, int(round(x * (w - 1))))),
                max(0, min(h - 1, int(round(y * (h - 1))))))

    color = tuple(options.get("color", (24, 24, 24, 90)))
    label_color = tuple(options.get("label_color", (24, 24, 24, 220)))
    labels = []
    for lon in _grid_values(west, east, interval):
        _draw_polyline(image, [to_px(lon, south), to_px(lon, north)], color)
        labels.append((to_px(lon, south), _format_coord(lon, "lon")))
    for lat in _grid_values(south, north, interval):
        _draw_polyline(image, [to_px(west, lat), to_px(east, lat)], color)
        labels.append((to_px(west, lat), _format_coord(lat, "lat")))
    if bool(options.get("include_labels", True)):
        for (ax, ay), text in labels:
            _draw_text(image, text, (ax + 3, ay - 10), color=label_color,
                       halo=(255, 255, 255, 190), halo_width_px=1.0)


def compose_reference_furniture(image: np.ndarray, *, title: str = "",
                                legend: Optional[Mapping] = None,
                                scale_bar: Optional[Mapping] = None,
                                north_arrow: Optional[Mapping] = None,
                                graticule: Optional[Mapping] = None,
                                bounds=None) -> None:
    """Reference composition order: graticule, legend, scale bar, north
    arrow, title (_map_scene_render.py:1337-1356)."""
    if graticule:
        draw_graticule(image, graticule)
    if legend:
        draw_simple_legend(image, legend)
    if scale_bar:
        compose_scale_bar(image, scale_bar,
                          bounds=scale_bar.get("bounds", bounds))
    if north_arrow:
        compose_north_arrow(image, north_arrow)
    draw_title(image, title)
