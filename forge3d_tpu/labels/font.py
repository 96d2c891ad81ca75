# forge3d_tpu/labels/font.py — outline-exact text engine over the packaged
# Noto subsets.
#
# Parity notes (reference behavior, not code): the reference shapes text in
# native Rust (src/labels/shape/{mod,arabic,bidi}.rs) and rasterizes shaped
# runs with an 8x8-subsample nonzero-winding rasterizer
# (src/labels/raster.rs:6-155, FLATTENING_TOLERANCE 0.125, SUBPIXELS 8,
# per-outline union), with advances normalized to q26.6 em units
# (src/labels/font/mod.rs:9-20) and outline bounds taken over positioned
# control points (src/labels/positioned.rs:330-364). Its Python seams are
# forge3d.text.shape / rasterize_shaped_run (python/forge3d/text.py) and the
# CPU furniture text path (_map_scene_render.py:695-827). This module
# implements the same observable contract in Python on fontTools: same
# packaged fonts, same scale/rounding rules, same rasterization semantics —
# so label and furniture pixels match the reference goldens.

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "FONT_DIR", "default_font_chain", "FontFace", "PositionedGlyph",
    "ShapedText", "shape", "rasterize_shaped_run", "draw_shaped_text",
]

FONT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "fonts")

_RUNTIME_CHAIN = (
    "NotoSansLatin-subset.ttf",
    "NotoSansArabic-subset.ttf",
    "NotoSansHebrew-subset.ttf",
    "NotoSansDevanagari-subset.ttf",
    "NotoSansSC-subset.ttf",
)


def default_font_chain() -> List[str]:
    """The packaged runtime font fallback chain (reference:
    _map_scene_render.py:695-708 `_text_font_chain`)."""
    return [os.path.join(FONT_DIR, name) for name in _RUNTIME_CHAIN]


def _q26_6(value: float, upem: int) -> int:
    """Normalize a font-unit value to q26.6 of an em, rounding half away
    from zero (reference: src/labels/font/mod.rs to_q26_6)."""
    num = int(value) * 64
    den = int(upem)
    q, r = divmod(abs(num), den)
    if 2 * r >= den:
        q += 1
    return q if num >= 0 else -q


# ---------------------------------------------------------------------------
# Arabic joining classes (Unicode ArabicShaping.txt, Arabic block subset).
# R = right-joining (joins only with the preceding letter), D = dual-joining,
# T = transparent (combining marks), everything else non-joining.
# ---------------------------------------------------------------------------

_ARABIC_R = frozenset(
    [0x0622, 0x0623, 0x0624, 0x0625, 0x0627, 0x0629, 0x062F, 0x0630,
     0x0631, 0x0632, 0x0648, 0x0649, 0x0671, 0x0672, 0x0673, 0x0675,
     0x0676, 0x0677, 0x0688, 0x0689, 0x068A, 0x068B, 0x068C, 0x068D,
     0x068E, 0x068F, 0x0690, 0x0691, 0x0692, 0x0693, 0x0694, 0x0695,
     0x0696, 0x0697, 0x0698, 0x0699, 0x06C0, 0x06C2, 0x06C3, 0x06C4,
     0x06C5, 0x06C6, 0x06C7, 0x06C8, 0x06C9, 0x06CA, 0x06CB, 0x06CD,
     0x06CF, 0x06D2, 0x06D3, 0x06D5])
_ARABIC_T = frozenset(
    list(range(0x064B, 0x0660)) + [0x0670] + list(range(0x06D6, 0x06DD))
    + list(range(0x06DF, 0x06E5)) + [0x06E7, 0x06E8]
    + list(range(0x06EA, 0x06EE)) + [0x0610, 0x0611, 0x0612, 0x0613,
                                     0x0614, 0x0615, 0x0616])


def _joining_class(cp: int) -> str:
    if cp in _ARABIC_T:
        return "T"
    if cp in _ARABIC_R:
        return "R"
    if 0x0620 <= cp <= 0x06FF or 0x0750 <= cp <= 0x077F:
        if cp in (0x0621, 0x0674):   # hamza, high hamza: non-joining
            return "U"
        return "D"
    return "U"


def arabic_features(text: str) -> List[Optional[str]]:
    """Per-character OpenType feature for Arabic joining (isol/init/medi/
    fina), None for non-Arabic. Computed in logical order per Unicode
    joining rules."""
    cps = [ord(c) for c in text]
    classes = [_joining_class(cp) for cp in cps]

    def prev_joins(i: int) -> bool:
        j = i - 1
        while j >= 0 and classes[j] == "T":
            j -= 1
        return j >= 0 and classes[j] == "D"

    def next_joins(i: int) -> bool:
        j = i + 1
        while j < len(cps) and classes[j] == "T":
            j += 1
        return j < len(cps) and classes[j] in ("D", "R")

    out: List[Optional[str]] = []
    for i, cls in enumerate(classes):
        if cls in ("U",) and not (0x0600 <= cps[i] <= 0x06FF):
            out.append(None)
            continue
        if cls == "T":
            out.append(None)
            continue
        if cls == "R":
            out.append("fina" if prev_joins(i) else "isol")
        elif cls == "D":
            p, n = prev_joins(i), next_joins(i)
            out.append("medi" if (p and n) else
                       "fina" if p else
                       "init" if n else "isol")
        else:
            out.append("isol" if 0x0600 <= cps[i] <= 0x06FF else None)
    return out


# ---------------------------------------------------------------------------
# Font face
# ---------------------------------------------------------------------------

class _SegmentPen:
    """fontTools point collector: flattens the pen protocol into quadratic
    segments (p0, ctrl_or_None, p1) plus the raw control-point list."""

    def __init__(self, glyph_set):
        self.glyph_set = glyph_set
        self.contours: List[List[Tuple]] = []
        self.points: List[Tuple[float, float]] = []
        self._cur: Optional[Tuple[float, float]] = None
        self._start: Optional[Tuple[float, float]] = None
        self._segments: List[Tuple] = []

    def moveTo(self, pt):
        self._flush()
        self._cur = self._start = pt
        self.points.append(pt)

    def lineTo(self, pt):
        self._segments.append((self._cur, None, pt))
        self.points.append(pt)
        self._cur = pt

    def qCurveTo(self, *pts):
        # TrueType: any number of off-curve points with implied on-curve
        # midpoints; final point is on-curve (or None for a closed
        # all-off-curve contour, not produced by these subsets).
        if pts[-1] is None:  # pragma: no cover
            pts = pts + (pts[0],)
        cur = self._cur
        offs = pts[:-1]
        for i, ctrl in enumerate(offs):
            self.points.append(ctrl)
            if i < len(offs) - 1:
                mid = ((ctrl[0] + offs[i + 1][0]) * 0.5,
                       (ctrl[1] + offs[i + 1][1]) * 0.5)
            else:
                mid = pts[-1]
            self._segments.append((cur, ctrl, mid))
            cur = mid
        self.points.append(pts[-1])
        self._cur = pts[-1]

    def curveTo(self, *pts):  # cubic (CFF) — split to quads is unnecessary;
        # keep exact cubic by storing 3-tuple with tuple ctrl pair
        self._segments.append((self._cur, (pts[0], pts[1]), pts[2]))
        self.points.extend(pts)
        self._cur = pts[2]

    def closePath(self):
        if self._cur != self._start and self._start is not None:
            self._segments.append((self._cur, None, self._start))
        self._flush()

    def endPath(self):
        self._flush()

    def addComponent(self, name, transform):
        import fontTools.pens.transformPen as tp

        pen = tp.TransformPen(self, transform)
        self.glyph_set[name].draw(pen)

    def _flush(self):
        if self._segments:
            self.contours.append(self._segments)
            self._segments = []
        self._cur = self._start = None


class FontFace:
    """One loaded TTF subset: metrics, cmap, outlines, GSUB joining subs."""

    def __init__(self, path: str):
        from fontTools.ttLib import TTFont

        self.path = path
        self.tt = TTFont(path, lazy=True)
        self.upem = int(self.tt["head"].unitsPerEm)
        hhea = self.tt["hhea"]
        self.ascent = float(hhea.ascent)
        self.descent = float(hhea.descent)
        self.cmap: Dict[int, str] = self.tt.getBestCmap() or {}
        self._hmtx = self.tt["hmtx"]
        self._glyph_set = self.tt.getGlyphSet()
        self._outline_cache: Dict[str, Tuple[list, list]] = {}
        self._gsub_single: Optional[Dict[str, Dict[str, str]]] = None

    def glyph_name(self, cp: int) -> Optional[str]:
        return self.cmap.get(cp)

    def advance_units(self, glyph: str) -> int:
        try:
            return int(self._hmtx[glyph][0])
        except KeyError:
            return 0

    def outline(self, glyph: str) -> Tuple[list, list]:
        """(contours, points) in font units; contours are lists of
        (p0, ctrl, p1) quadratic/linear segments."""
        got = self._outline_cache.get(glyph)
        if got is None:
            pen = _SegmentPen(self._glyph_set)
            try:
                self._glyph_set[glyph].draw(pen)
                pen._flush()
            except KeyError:
                pass
            got = (pen.contours, pen.points)
            self._outline_cache[glyph] = got
        return got

    # -- GSUB single substitutions per joining feature -----------------------

    def _load_gsub(self) -> Dict[str, Dict[str, str]]:
        if self._gsub_single is not None:
            return self._gsub_single
        table: Dict[str, Dict[str, str]] = {}
        try:
            gsub = self.tt["GSUB"].table
        except KeyError:
            self._gsub_single = {}
            return self._gsub_single
        feats = gsub.FeatureList.FeatureRecord if gsub.FeatureList else []
        lookups = gsub.LookupList.Lookup if gsub.LookupList else []
        for rec in feats:
            tag = rec.FeatureTag
            if tag not in ("ccmp", "isol", "init", "medi", "fina", "rlig"):
                continue
            mapping = table.setdefault(tag, {})
            for li in rec.Feature.LookupListIndex:
                if li >= len(lookups):
                    continue
                lookup = lookups[li]
                for sub in lookup.SubTable:
                    st = sub.ExtSubTable if lookup.LookupType == 7 else sub
                    if hasattr(st, "mapping"):
                        # single (1:1) or multiple (1:N) substitution;
                        # normalize to tuples of output glyphs
                        for k, v in st.mapping.items():
                            mapping[k] = ((v,) if isinstance(v, str)
                                          else tuple(v))
                    elif hasattr(st, "ligatures"):   # ligature substitution
                        lig = table.setdefault(tag + ":lig", {})
                        for first, items in st.ligatures.items():
                            for item in items:
                                key = (first,) + tuple(item.Component)
                                lig[key] = item.LigGlyph
        self._gsub_single = table
        return table

    def substitute(self, glyph: str, feature: str) -> Tuple[str, ...]:
        return self._load_gsub().get(feature, {}).get(glyph, (glyph,))

    def ligate(self, glyphs: List[str], feature: str = "rlig") -> List[str]:
        """Apply feature ligatures greedily in logical order."""
        ligs = self._load_gsub().get(feature + ":lig", {})
        if not ligs:
            return glyphs
        out: List[str] = []
        i = 0
        max_len = max(len(k) for k in ligs)
        while i < len(glyphs):
            hit = None
            for ln in range(min(max_len, len(glyphs) - i), 1, -1):
                key = tuple(glyphs[i:i + ln])
                if key in ligs:
                    hit = (ligs[key], ln)
                    break
            if hit:
                out.append(hit[0])
                i += hit[1]
            else:
                out.append(glyphs[i])
                i += 1
        return out


@lru_cache(maxsize=16)
def _face(path: str) -> FontFace:
    return FontFace(path)


# ---------------------------------------------------------------------------
# Shaping
# ---------------------------------------------------------------------------

@dataclass
class PositionedGlyph:
    face: FontFace
    glyph: str
    x: float          # pen x in px (baseline-relative, y-down raster space)
    y: float


@dataclass
class ShapedText:
    glyphs: List[PositionedGlyph]
    size: float
    text: str
    direction: str
    width: float      # total advance in px

    def outline_bounds(self) -> Optional[Tuple[float, float, float, float]]:
        """Bounds over positioned outline control points, y-down,
        baseline-origin (reference: positioned.rs outline_bounds)."""
        x0 = y0 = np.inf
        x1 = y1 = -np.inf
        seen = False
        for g in self.glyphs:
            _, points = g.face.outline(g.glyph)
            if not points:
                continue
            scale = self.size / g.face.upem
            pts = np.asarray(points, np.float32)
            xs = g.x + pts[:, 0] * scale
            ys = g.y - pts[:, 1] * scale
            x0 = min(x0, float(xs.min()))
            x1 = max(x1, float(xs.max()))
            y0 = min(y0, float(ys.min()))
            y1 = max(y1, float(ys.max()))
            seen = True
        if not seen:
            return None
        return (x0, y0, x1, y1)


def _is_rtl_char(ch: str) -> bool:
    import unicodedata

    return unicodedata.bidirectional(ch) in ("R", "AL")


def shape(text: str, font_chain: Optional[Sequence[str]] = None,
          size: float = 12.0) -> ShapedText:
    """Shape text into positioned glyphs through the packaged font chain.

    Joining scripts get GSUB init/medi/fina/isol substitutions + rlig
    ligatures from the font; character order follows UAX#9 (implicit
    levels: paragraph detection, weak/neutral resolution, L2 run
    reversal, L4 bracket mirroring — labels/bidi.py), with each base
    glyph and its attached marks reordered as one unit (rule L3, like
    the reference's glyph_groups)."""
    from .bidi import mirror_char, paragraph_level, resolve_levels, \
        visual_order

    chain = [str(p) for p in (font_chain or [])] + default_font_chain()
    faces = []
    for p in chain:
        try:
            faces.append(_face(p))
        except Exception:
            continue
    if not faces:
        raise FileNotFoundError("no usable fonts in chain")

    text = str(text)
    feats = arabic_features(text)
    base_level = paragraph_level(text)
    levels = resolve_levels(text, base_level)
    order = visual_order(text, base_level)

    # logical-order glyph resolution with font fallback; ccmp
    # decomposition then per-character joining-feature substitution
    # (marks have no feature coverage and pass through unchanged).
    # Glyphs remember their source character (cluster) so BiDi reorders
    # base+marks as indivisible units.
    logical: List[Tuple[FontFace, str, int]] = []
    for i, ch in enumerate(text):
        ch = mirror_char(ch, levels[i])
        cp = ord(ch)
        hit = None
        for face in faces:
            name = face.glyph_name(cp)
            if name is not None:
                hit = (face, name)
                break
        if hit is None:
            continue
        face, name = hit
        seq = face.substitute(name, "ccmp")
        if feats[i]:
            seq = tuple(s for g in seq
                        for s in face.substitute(g, feats[i]))
        logical.extend((face, g, i) for g in seq)

    # rlig ligatures within same-face runs (logical order); a ligature
    # keeps the cluster of its first component
    ligated: List[Tuple[FontFace, str, int]] = []
    i = 0
    while i < len(logical):
        face = logical[i][0]
        j = i
        while j < len(logical) and logical[j][0] is face:
            j += 1
        run = [g for _, g, _ in logical[i:j]]
        clusters = [c for _, _, c in logical[i:j]]
        out_run = face.ligate(run)
        # map output glyphs back to clusters (greedy: consumed components
        # collapse onto the first)
        ci = 0
        for g in out_run:
            ligated.append((face, g, clusters[min(ci, len(clusters) - 1)]))
            ci += max(1, len(run) - len(out_run) + 1) \
                if len(out_run) < len(run) and g not in run else 1
        i = j

    # group glyphs by source character, order groups visually (L2/L3),
    # then run the pen left -> right; zero-advance marks inherit the pen
    # position after their base, exactly like the sequential reference
    # positioning (positioned.rs:207-252)
    by_cluster: dict = {}
    for face, name, cl in ligated:
        by_cluster.setdefault(cl, []).append((face, name))
    glyphs: List[PositionedGlyph] = []
    pen = 0.0
    for ci in order:
        for face, name in by_cluster.get(ci, ()):
            glyphs.append(PositionedGlyph(face=face, glyph=name,
                                          x=pen, y=0.0))
            pen += _q26_6(face.advance_units(name), face.upem) * size / 64.0
    return ShapedText(glyphs=glyphs, size=float(size), text=text,
                      direction="rtl" if base_level else "ltr", width=pen)


# ---------------------------------------------------------------------------
# Rasterization — 8x8 subsample nonzero winding, per-glyph union
# ---------------------------------------------------------------------------

_SUBPIXELS = 8
_FLATTEN_TOL = 0.125


def _flatten_contours(face: FontFace, glyph: str, scale: float,
                      ox: float, oy: float) -> List[np.ndarray]:
    """Flattened closed contours in raster px (y-down), as (N,2) arrays."""
    contours, _ = face.outline(glyph)
    out = []
    for segs in contours:
        pts: List[Tuple[float, float]] = []
        for p0, ctrl, p1 in segs:
            a = (ox + p0[0] * scale, oy - p0[1] * scale)
            b = (ox + p1[0] * scale, oy - p1[1] * scale)
            if not pts:
                pts.append(a)
            if ctrl is None:
                pts.append(b)
            elif isinstance(ctrl[0], tuple):   # cubic
                c1 = (ox + ctrl[0][0] * scale, oy - ctrl[0][1] * scale)
                c2 = (ox + ctrl[1][0] * scale, oy - ctrl[1][1] * scale)
                dev = max(abs(c1[0] - a[0]) + abs(c1[1] - a[1]),
                          abs(c2[0] - b[0]) + abs(c2[1] - b[1]))
                n = max(2, int(np.ceil(np.sqrt(dev / _FLATTEN_TOL))))
                t = np.linspace(0.0, 1.0, n + 1)[1:]
                mt = 1 - t
                xs = (mt ** 3 * a[0] + 3 * mt * mt * t * c1[0]
                      + 3 * mt * t * t * c2[0] + t ** 3 * b[0])
                ys = (mt ** 3 * a[1] + 3 * mt * mt * t * c1[1]
                      + 3 * mt * t * t * c2[1] + t ** 3 * b[1])
                pts.extend(zip(xs.tolist(), ys.tolist()))
            else:                               # quadratic
                c = (ox + ctrl[0] * scale, oy - ctrl[1] * scale)
                # max deviation of a quad from its chord is |p0-2c+p1|/4
                dev = 0.25 * np.hypot(a[0] - 2 * c[0] + b[0],
                                      a[1] - 2 * c[1] + b[1])
                n = max(1, int(np.ceil(np.sqrt(dev / _FLATTEN_TOL))))
                t = np.linspace(0.0, 1.0, n + 1)[1:]
                mt = 1 - t
                xs = mt * mt * a[0] + 2 * mt * t * c[0] + t * t * b[0]
                ys = mt * mt * a[1] + 2 * mt * t * c[1] + t * t * b[1]
                pts.extend(zip(xs.tolist(), ys.tolist()))
        if len(pts) >= 3:
            if pts[0] != pts[-1]:
                pts.append(pts[0])
            out.append(np.asarray(pts, np.float32))
    return out


def _winding_inside(contours: List[np.ndarray], px: np.ndarray,
                    py: np.ndarray) -> np.ndarray:
    """Nonzero-winding containment for flat sample-point arrays."""
    winding = np.zeros(px.shape, np.int32)
    for c in contours:
        a = c[:-1]
        b = c[1:]
        # chunk edges to bound memory
        for s in range(0, len(a), 256):
            ax = a[s:s + 256, 0][:, None]
            ay = a[s:s + 256, 1][:, None]
            bx = b[s:s + 256, 0][:, None]
            by = b[s:s + 256, 1][:, None]
            pxf = px[None, :]
            pyf = py[None, :]
            cross = (bx - ax) * (pyf - ay) - (pxf - ax) * (by - ay)
            up = (ay <= pyf) & (by > pyf) & (cross > 0)
            dn = (ay > pyf) & (by <= pyf) & (cross < 0)
            winding += up.sum(0, dtype=np.int32)
            winding -= dn.sum(0, dtype=np.int32)
    return winding != 0


def rasterize_shaped_run(shaped: ShapedText, width: int, height: int, *,
                         origin: Tuple[float, float]) -> np.ndarray:
    """Coverage mask [0,1] float32: 8x8 subsamples per pixel, nonzero
    winding per glyph, union across glyphs (reference raster.rs
    semantics)."""
    width, height = int(width), int(height)
    mask_bits = None
    sub = (np.arange(_SUBPIXELS, dtype=np.float32) + 0.5) / _SUBPIXELS
    for g in shaped.glyphs:
        scale = shaped.size / g.face.upem
        contours = _flatten_contours(g.face, g.glyph, scale,
                                     origin[0] + g.x, origin[1] + g.y)
        if not contours:
            continue
        allpts = np.concatenate(contours, 0)
        x0 = max(0, int(np.floor(allpts[:, 0].min())))
        y0 = max(0, int(np.floor(allpts[:, 1].min())))
        x1 = min(width, int(np.ceil(allpts[:, 0].max())))
        y1 = min(height, int(np.ceil(allpts[:, 1].max())))
        if x0 >= x1 or y0 >= y1:
            continue
        gx = (np.arange(x0, x1, dtype=np.float32)[:, None]
              + sub[None, :]).reshape(-1)          # (W*8,)
        gy = (np.arange(y0, y1, dtype=np.float32)[:, None]
              + sub[None, :]).reshape(-1)          # (H*8,)
        px = np.broadcast_to(gx[None, :], (gy.size, gx.size)).reshape(-1)
        py = np.broadcast_to(gy[:, None], (gy.size, gx.size)).reshape(-1)
        inside = _winding_inside(contours, px, py)
        inside = inside.reshape(y1 - y0, _SUBPIXELS, x1 - x0, _SUBPIXELS)
        if mask_bits is None:
            mask_bits = np.zeros((height, _SUBPIXELS, width, _SUBPIXELS),
                                 np.bool_)
        mask_bits[y0:y1, :, x0:x1, :] |= inside
    if mask_bits is None:
        return np.zeros((height, width), np.float32)
    return mask_bits.mean(axis=(1, 3), dtype=np.float32)


def _expand_mask(mask: np.ndarray, radius: int) -> np.ndarray:
    """Disc-structuring max filter (reference _expanded_mask)."""
    if radius <= 0:
        return mask
    padded = np.pad(mask, radius)
    taps = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dx * dx + dy * dy <= radius * radius:
                taps.append(padded[radius + dy:radius + dy + mask.shape[0],
                                   radius + dx:radius + dx + mask.shape[1]])
    return np.maximum.reduce(taps)


def _composite_mask(image: np.ndarray, mask: np.ndarray, color) -> None:
    """Source-over composite of a coverage mask in premultiplied-free
    RGBA (reference _composite_text_mask semantics), in place."""
    cov = mask[..., None].astype(np.float32)
    src_a = cov * (float(color[3]) / 255.0)
    dst = image.astype(np.float32) / 255.0
    dst_a = dst[..., 3:4]
    out_a = src_a + dst_a * (1.0 - src_a)
    src_rgb = np.asarray(color[:3], np.float32).reshape(1, 1, 3) / 255.0
    num = src_rgb * src_a + dst[..., :3] * dst_a * (1.0 - src_a)
    out_rgb = np.divide(num, out_a, out=np.zeros_like(num),
                        where=out_a > 0.0)
    image[..., :3] = np.clip(out_rgb * 255.0 + 0.5, 0, 255).astype(np.uint8)
    image[..., 3] = np.clip(out_a[..., 0] * 255.0 + 0.5, 0,
                            255).astype(np.uint8)


def draw_shaped_text(image: np.ndarray, text: str,
                     anchor: Tuple[float, float], *,
                     color, halo=(0, 0, 0, 0), halo_width_px: float = 0.0,
                     font_size: float = 12.0,
                     font_chain: Optional[Sequence[str]] = None,
                     occlusion: Optional[np.ndarray] = None) -> None:
    """Draw text with the reference furniture contract: `anchor` is the
    glyph box top-left; baseline = anchor.y + font_size
    (_map_scene_render.py:783-825). Optional `occlusion` multiplies
    coverage per-pixel (full-image float map) for depth-occluded labels."""
    import math

    x, y = anchor
    shaped = shape(text, font_chain, float(font_size))
    bounds = shaped.outline_bounds()
    if bounds is None:
        return
    radius = max(0, int(round(float(halo_width_px))))
    padding = radius + 1
    baseline_x = float(x)
    baseline_y = float(y) + float(font_size)
    ih, iw = image.shape[:2]
    x0 = max(0, int(math.floor(baseline_x + bounds[0])) - padding)
    y0 = max(0, int(math.floor(baseline_y + bounds[1])) - padding)
    x1 = min(iw, int(math.ceil(baseline_x + bounds[2])) + padding)
    y1 = min(ih, int(math.ceil(baseline_y + bounds[3])) + padding)
    if x0 >= x1 or y0 >= y1:
        return
    mask = rasterize_shaped_run(shaped, x1 - x0, y1 - y0,
                                origin=(baseline_x - x0, baseline_y - y0))
    if occlusion is not None:
        mask = mask * occlusion[y0:y1, x0:x1]
    target = image[y0:y1, x0:x1]
    if len(halo) > 3 and halo[3] > 0 and radius > 0:
        _composite_mask(target, _expand_mask(mask, radius), halo)
    _composite_mask(target, mask, color)
