# forge3d_tpu/labels/shape.py
# Text shaping: glyph runs with kerning/tracking, multi-line, basic BiDi.
#
# Parity notes (reference behavior, not code): /root/reference/src/labels/
# {shape,unicode}/ shape text into positioned glyphs with kerning and
# tracking, including BiDi/Arabic. Python seam `text_shape_py`.
# Scope here: full LTR shaping with kern pairs + tracking; RTL segments are
# reordered per UAX#9 rule L2 at paragraph level (strong RTL chars) and
# Arabic presentation joining is applied via contextual form mapping.
# Complex scripts needing full GSUB are rendered in isolated forms.

from __future__ import annotations

import unicodedata
from dataclasses import dataclass
from typing import List, Optional

from .atlas import GlyphAtlas, bake_msdf_atlas

__all__ = ["ShapedGlyph", "ShapedRun", "text_shape"]


@dataclass
class ShapedGlyph:
    char: str
    x: float        # pen-relative glyph bitmap origin (left)
    y: float        # baseline-relative top of bitmap (positive up)
    advance: float


@dataclass
class ShapedRun:
    glyphs: List[ShapedGlyph]
    width: float
    height: float
    ascent: float
    descent: float
    text: str
    direction: str  # "ltr" | "rtl" | "mixed"


def _is_rtl(ch: str) -> bool:
    return unicodedata.bidirectional(ch) in ("R", "AL", "AN")


def _bidi_reorder(text: str) -> tuple:
    """Minimal UAX#9: split into directional segments; if the paragraph is
    RTL-dominant, reverse segment order and reverse RTL segment contents."""
    if not any(_is_rtl(c) for c in text):
        return text, "ltr"
    segs: List[List[str]] = []
    cur_dir: Optional[bool] = None
    for ch in text:
        d = _is_rtl(ch) if (ch.strip() and not ch.isdigit()) else cur_dir
        if d is None:
            d = True
        if cur_dir is None or d != cur_dir:
            segs.append([])
            cur_dir = d
        segs[-1].append(ch)
    rtl_chars = sum(1 for c in text if _is_rtl(c))
    dominant_rtl = rtl_chars * 2 >= len([c for c in text if c.strip()])
    out = []
    seq = list(segs)
    if dominant_rtl:
        seq = seq[::-1]
    for seg in seq:
        seg_text = "".join(seg)
        if seg and _is_rtl(seg[0]):
            out.append(seg_text[::-1])
        else:
            out.append(seg_text)
    return "".join(out), ("rtl" if dominant_rtl else "mixed")


# Arabic contextual forms (presentation forms B); minimal joining classes.
_ARABIC_FORMS = {
    # base: (isolated, final, initial, medial)
    "ا": ("ﺍ", "ﺎ", None, None),            # alef
    "ب": ("ﺏ", "ﺐ", "ﺑ", "ﺒ"),    # beh
    "ت": ("ﺕ", "ﺖ", "ﺗ", "ﺘ"),    # teh
    "ث": ("ﺙ", "ﺚ", "ﺛ", "ﺜ"),    # theh
    "ج": ("ﺝ", "ﺞ", "ﺟ", "ﺠ"),    # jeem
    "ح": ("ﺡ", "ﺢ", "ﺣ", "ﺤ"),    # hah
    "د": ("ﺩ", "ﺪ", None, None),            # dal
    "ر": ("ﺭ", "ﺮ", None, None),            # reh
    "س": ("ﺱ", "ﺲ", "ﺳ", "ﺴ"),    # seen
    "ل": ("ﻝ", "ﻞ", "ﻟ", "ﻠ"),    # lam
    "م": ("ﻡ", "ﻢ", "ﻣ", "ﻤ"),    # meem
    "ن": ("ﻥ", "ﻦ", "ﻧ", "ﻨ"),    # noon
    "ه": ("ﻩ", "ﻪ", "ﻫ", "ﻬ"),    # heh
    "و": ("ﻭ", "ﻮ", None, None),            # waw
    "ي": ("ﻱ", "ﻲ", "ﻳ", "ﻴ"),    # yeh
}


def _arabic_join(text: str) -> str:
    chars = list(text)
    out = []
    for i, ch in enumerate(chars):
        forms = _ARABIC_FORMS.get(ch)
        if forms is None:
            out.append(ch)
            continue
        prev_joins = (i > 0 and chars[i - 1] in _ARABIC_FORMS
                      and _ARABIC_FORMS[chars[i - 1]][2] is not None)
        next_joins = i + 1 < len(chars) and chars[i + 1] in _ARABIC_FORMS
        iso, fin, ini, med = forms
        if prev_joins and next_joins and med:
            out.append(med)
        elif prev_joins and fin:
            out.append(fin)
        elif next_joins and ini:
            out.append(ini)
        else:
            out.append(iso)
    return "".join(out)


_default_atlas: Optional[GlyphAtlas] = None


def _get_atlas(atlas: Optional[GlyphAtlas]) -> GlyphAtlas:
    global _default_atlas
    if atlas is not None:
        return atlas
    if _default_atlas is None:
        _default_atlas = bake_msdf_atlas()
    return _default_atlas


def text_shape(text: str, *, atlas: Optional[GlyphAtlas] = None,
               size: Optional[float] = None, tracking: float = 0.0,
               kerning: bool = True, line_spacing: float = 1.2) -> ShapedRun:
    """Shape text into positioned glyphs (reference seam: text_shape_py).

    `size` scales from the atlas base px; `tracking` adds constant
    inter-glyph space (in em/1000, like the reference's typography config).
    """
    atlas = _get_atlas(atlas)
    scale = (size / atlas.px) if size else 1.0
    track_px = tracking / 1000.0 * (size or atlas.px)

    if any("؀" <= c <= "ۿ" for c in text):
        text_j = _arabic_join(text)
    else:
        text_j = text
    visual, direction = _bidi_reorder(text_j)

    glyphs: List[ShapedGlyph] = []
    pen_x, pen_y = 0.0, 0.0
    width = 0.0
    lines = 1
    prev_ch: Optional[str] = None
    for ch in visual:
        if ch == "\n":
            width = max(width, pen_x)
            pen_x, prev_ch = 0.0, None
            pen_y -= atlas.line_height * scale * line_spacing
            lines += 1
            continue
        entry = atlas.glyph(ch)
        if entry is None:
            continue
        if kerning and prev_ch is not None:
            pen_x += atlas.kerning.get((prev_ch, ch), 0.0) * scale
        glyphs.append(ShapedGlyph(
            char=ch,
            x=pen_x + entry.bearing_x * scale,
            y=pen_y + entry.bearing_y * scale,
            advance=entry.advance * scale,
        ))
        pen_x += entry.advance * scale + track_px
        prev_ch = ch
    width = max(width, pen_x)
    return ShapedRun(
        glyphs=glyphs, width=width,
        height=lines * atlas.line_height * scale * (line_spacing if lines > 1 else 1.0),
        ascent=atlas.ascent * scale, descent=atlas.descent * scale,
        text=text, direction=direction,
    )
