# forge3d_tpu/export.py
# Print-grade vector export: SVG and PDF overlay documents with projected
# labels and geometry.
#
# Parity notes (reference behavior, not code): /root/reference/src/export/
# {svg,svg_labels,projection}.rs export map overlays (polylines, polygons,
# markers, labels) as SVG and PDF for print composition, using the same
# screen-space projection as the renderer. Pure Python writers; the PDF is
# a minimal single-page document with path + text operators.

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["VectorDocument", "export_svg", "export_pdf"]


def _fmt(x: float) -> str:
    return f"{x:.3f}".rstrip("0").rstrip(".")


def _css_color(rgba) -> Tuple[str, float]:
    r, g, b = (int(round(255 * float(c))) for c in rgba[:3])
    a = float(rgba[3]) if len(rgba) > 3 else 1.0
    return f"#{r:02x}{g:02x}{b:02x}", a


@dataclass
class VectorDocument:
    """Accumulates overlay primitives in pixel coordinates (y down)."""

    width: float
    height: float
    background: Optional[tuple] = None
    _items: List[dict] = field(default_factory=list)

    def add_polyline(self, points: Sequence[Tuple[float, float]], *,
                     color=(0, 0, 0, 1), width: float = 1.0,
                     dash: Optional[Sequence[float]] = None) -> None:
        pts = [(float(x), float(y)) for x, y in points]
        if len(pts) < 2:
            raise ValueError("polyline needs >= 2 points")
        self._items.append({"kind": "polyline", "points": pts,
                            "color": tuple(color), "width": float(width),
                            "dash": list(dash) if dash else None})

    def add_polygon(self, exterior: Sequence[Tuple[float, float]], *,
                    holes: Sequence = (), fill=(0, 0, 0, 1),
                    stroke=None, stroke_width: float = 1.0) -> None:
        self._items.append({
            "kind": "polygon",
            "rings": [[(float(x), float(y)) for x, y in exterior]]
            + [[(float(x), float(y)) for x, y in h] for h in holes],
            "fill": tuple(fill),
            "stroke": tuple(stroke) if stroke else None,
            "stroke_width": float(stroke_width)})

    def add_marker(self, x: float, y: float, *, radius: float = 3.0,
                   color=(0, 0, 0, 1)) -> None:
        self._items.append({"kind": "marker", "x": float(x), "y": float(y),
                            "radius": float(radius), "color": tuple(color)})

    def add_text(self, text: str, x: float, y: float, *, size: float = 12.0,
                 color=(0, 0, 0, 1), anchor: str = "start",
                 rotation_deg: float = 0.0) -> None:
        if anchor not in ("start", "middle", "end"):
            raise ValueError("anchor must be start|middle|end")
        self._items.append({"kind": "text", "text": str(text), "x": float(x),
                            "y": float(y), "size": float(size),
                            "color": tuple(color), "anchor": anchor,
                            "rotation": float(rotation_deg)})


def export_svg(doc: VectorDocument, path) -> None:
    """Write the document as standalone SVG."""
    out = [f'<svg xmlns="http://www.w3.org/2000/svg" '
           f'width="{_fmt(doc.width)}" height="{_fmt(doc.height)}" '
           f'viewBox="0 0 {_fmt(doc.width)} {_fmt(doc.height)}">']
    if doc.background is not None:
        c, a = _css_color(doc.background)
        out.append(f'<rect width="100%" height="100%" fill="{c}" '
                   f'fill-opacity="{_fmt(a)}"/>')
    for it in doc._items:
        if it["kind"] == "polyline":
            pts = " ".join(f"{_fmt(x)},{_fmt(y)}" for x, y in it["points"])
            c, a = _css_color(it["color"])
            dash = (f' stroke-dasharray="{" ".join(map(_fmt, it["dash"]))}"'
                    if it["dash"] else "")
            out.append(f'<polyline points="{pts}" fill="none" stroke="{c}" '
                       f'stroke-opacity="{_fmt(a)}" '
                       f'stroke-width="{_fmt(it["width"])}"'
                       f' stroke-linejoin="round" stroke-linecap="round"'
                       f'{dash}/>')
        elif it["kind"] == "polygon":
            d = ""
            for ring in it["rings"]:
                d += "M" + " L".join(f"{_fmt(x)} {_fmt(y)}" for x, y in ring) + " Z "
            c, a = _css_color(it["fill"])
            stroke = ""
            if it["stroke"]:
                sc, sa = _css_color(it["stroke"])
                stroke = (f' stroke="{sc}" stroke-opacity="{_fmt(sa)}" '
                          f'stroke-width="{_fmt(it["stroke_width"])}"')
            out.append(f'<path d="{d.strip()}" fill="{c}" '
                       f'fill-opacity="{_fmt(a)}" fill-rule="evenodd"{stroke}/>')
        elif it["kind"] == "marker":
            c, a = _css_color(it["color"])
            out.append(f'<circle cx="{_fmt(it["x"])}" cy="{_fmt(it["y"])}" '
                       f'r="{_fmt(it["radius"])}" fill="{c}" '
                       f'fill-opacity="{_fmt(a)}"/>')
        elif it["kind"] == "text":
            c, a = _css_color(it["color"])
            anchor = {"start": "start", "middle": "middle",
                      "end": "end"}[it["anchor"]]
            rot = (f' transform="rotate({_fmt(-it["rotation"])} '
                   f'{_fmt(it["x"])} {_fmt(it["y"])})"'
                   if it["rotation"] else "")
            text = (it["text"].replace("&", "&amp;").replace("<", "&lt;")
                    .replace(">", "&gt;"))
            out.append(f'<text x="{_fmt(it["x"])}" y="{_fmt(it["y"])}" '
                       f'font-size="{_fmt(it["size"])}" fill="{c}" '
                       f'fill-opacity="{_fmt(a)}" text-anchor="{anchor}" '
                       f'font-family="DejaVu Sans, sans-serif"{rot}>'
                       f'{text}</text>')
    out.append("</svg>")
    with open(path, "w") as fh:
        fh.write("\n".join(out))


def export_pdf(doc: VectorDocument, path) -> None:
    """Write the document as a minimal single-page PDF (vector paths +
    Helvetica text; flate-compressed content stream)."""
    W, H = doc.width, doc.height

    def y(v):  # PDF origin is bottom-left
        return H - v

    ops: List[str] = []
    if doc.background is not None:
        r, g, b = doc.background[:3]
        ops.append(f"{_fmt(r)} {_fmt(g)} {_fmt(b)} rg "
                   f"0 0 {_fmt(W)} {_fmt(H)} re f")
    for it in doc._items:
        if it["kind"] == "polyline":
            r, g, b = it["color"][:3]
            ops.append(f"{_fmt(r)} {_fmt(g)} {_fmt(b)} RG "
                       f"{_fmt(it['width'])} w 1 j 1 J")
            if it["dash"]:
                ops.append(f"[{' '.join(map(_fmt, it['dash']))}] 0 d")
            (x0, y0), rest = it["points"][0], it["points"][1:]
            seg = [f"{_fmt(x0)} {_fmt(y(y0))} m"]
            seg += [f"{_fmt(x)} {_fmt(y(v))} l" for x, v in rest]
            ops.append(" ".join(seg) + " S")
            if it["dash"]:
                ops.append("[] 0 d")
        elif it["kind"] == "polygon":
            r, g, b = it["fill"][:3]
            path_ops = []
            for ring in it["rings"]:
                (x0, y0), rest = ring[0], ring[1:]
                path_ops.append(f"{_fmt(x0)} {_fmt(y(y0))} m")
                path_ops += [f"{_fmt(x)} {_fmt(y(v))} l" for x, v in rest]
                path_ops.append("h")
            ops.append(f"{_fmt(r)} {_fmt(g)} {_fmt(b)} rg "
                       + " ".join(path_ops) + " f*")
        elif it["kind"] == "marker":
            r, g, b = it["color"][:3]
            cx, cy, rad = it["x"], y(it["y"]), it["radius"]
            k = 0.5523 * rad
            ops.append(
                f"{_fmt(r)} {_fmt(g)} {_fmt(b)} rg "
                f"{_fmt(cx + rad)} {_fmt(cy)} m "
                f"{_fmt(cx + rad)} {_fmt(cy + k)} {_fmt(cx + k)} {_fmt(cy + rad)} {_fmt(cx)} {_fmt(cy + rad)} c "
                f"{_fmt(cx - k)} {_fmt(cy + rad)} {_fmt(cx - rad)} {_fmt(cy + k)} {_fmt(cx - rad)} {_fmt(cy)} c "
                f"{_fmt(cx - rad)} {_fmt(cy - k)} {_fmt(cx - k)} {_fmt(cy - rad)} {_fmt(cx)} {_fmt(cy - rad)} c "
                f"{_fmt(cx + k)} {_fmt(cy - rad)} {_fmt(cx + rad)} {_fmt(cy - k)} {_fmt(cx + rad)} {_fmt(cy)} c f")
        elif it["kind"] == "text":
            r, g, b = it["color"][:3]
            tx = it["x"]
            # crude anchor adjust: Helvetica ~0.5em average advance
            if it["anchor"] == "middle":
                tx -= 0.25 * it["size"] * len(it["text"])
            elif it["anchor"] == "end":
                tx -= 0.5 * it["size"] * len(it["text"])
            esc = (it["text"].replace("\\", r"\\").replace("(", r"\(")
                   .replace(")", r"\)"))
            ops.append(f"BT {_fmt(r)} {_fmt(g)} {_fmt(b)} rg /F1 "
                       f"{_fmt(it['size'])} Tf {_fmt(tx)} "
                       f"{_fmt(y(it['y']))} Td ({esc}) Tj ET")

    content = "\n".join(ops).encode("latin-1", "replace")
    compressed = zlib.compress(content)

    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [3 0 R] /Count 1 >>".encode(),
        (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_fmt(W)} {_fmt(H)}] "
         f"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>").encode(),
        (f"<< /Length {len(compressed)} /Filter /FlateDecode >>\nstream\n"
         ).encode() + compressed + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_off}\n%%EOF\n").encode()
    with open(path, "wb") as fh:
        fh.write(bytes(out))
