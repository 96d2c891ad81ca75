# forge3d_tpu/labels/atlas.py
# Glyph SDF atlas: PIL raster -> exact euclidean distance transform ->
# shelf-packed atlas.
#
# Parity notes (reference behavior, not code): /root/reference/src/labels/
# {atlas,msdf,font}/ bake an MSDF atlas per font with per-glyph metrics and
# SHA-addressed caching; Python seam `bake_msdf_atlas_py` (SURVEY §A.7).
# Here the field is a single-channel signed distance (positive inside,
# pixels), which renders crisp text + halos at any scale via a smoothstep
# threshold — the property the reference uses MSDF for. Deterministic:
# same font file + charset + px -> byte-identical atlas.

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np

_DEFAULT_FONT_CANDIDATES = (
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
)

_ASCII = "".join(chr(c) for c in range(32, 127))


def default_font_path() -> str:
    import os

    for p in _DEFAULT_FONT_CANDIDATES:
        if os.path.exists(p):
            return p
    raise FileNotFoundError("no default TTF font found; pass font_path")


def _edt_1d(f: np.ndarray) -> np.ndarray:
    """Felzenszwalb-Huttenlocher 1D squared distance transform (vectorized
    over rows)."""
    n = f.shape[-1]
    out = np.empty_like(f)
    for r in range(f.shape[0]):
        d = f[r]
        v = np.zeros(n, np.int64)
        z = np.full(n + 1, np.inf)
        z[0] = -np.inf
        k = 0
        for q in range(1, n):
            if not np.isfinite(d[q]) and d[q] > 0:
                continue
            s = ((d[q] + q * q) - (d[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
            while s <= z[k]:
                k -= 1
                s = ((d[q] + q * q) - (d[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
            k += 1
            v[k] = q
            z[k] = s
            z[k + 1] = np.inf
        k = 0
        for q in range(n):
            while z[k + 1] < q:
                k += 1
            out[r, q] = (q - v[k]) ** 2 + d[v[k]]
    return out


def _edt2(mask: np.ndarray) -> np.ndarray:
    """Squared euclidean distance to the nearest True pixel."""
    INF = 1e18
    f = np.where(mask, 0.0, INF)
    f = _edt_1d(f.T).T
    f = _edt_1d(f)
    return f


def signed_distance_field(mask: np.ndarray, *, clip: float = 8.0) -> np.ndarray:
    """SDF in pixels: positive inside the glyph, negative outside; clipped
    to ±clip and normalized later by the atlas."""
    inside = _edt2(~mask)
    outside = _edt2(mask)
    sdf = np.sqrt(inside) - np.sqrt(outside)
    return np.clip(sdf, -clip, clip).astype(np.float32)


@dataclass
class GlyphEntry:
    """Atlas placement + metrics for one glyph (pixel units at base px)."""

    char: str
    x: int
    y: int
    w: int
    h: int
    bearing_x: float
    bearing_y: float   # distance from baseline up to bitmap top
    advance: float


@dataclass
class GlyphAtlas:
    image: np.ndarray                      # (H, W) float32 SDF, pixels
    glyphs: Dict[str, GlyphEntry]
    px: int                                # nominal font pixel size
    ascent: float
    descent: float
    line_height: float
    font_path: str
    sdf_range: float
    kerning: Dict[Tuple[str, str], float] = field(default_factory=dict)

    @property
    def fingerprint(self) -> str:
        h = hashlib.sha256()
        h.update(self.image.tobytes())
        h.update(repr(sorted(self.glyphs)).encode())
        return h.hexdigest()

    def glyph(self, ch: str) -> Optional[GlyphEntry]:
        return self.glyphs.get(ch) or self.glyphs.get("�") or self.glyphs.get("?")


def bake_msdf_atlas(charset: str = _ASCII, *, font_path: Optional[str] = None,
                    px: int = 48, padding: int = 6, sdf_range: float = 8.0,
                    atlas_width: int = 1024, channels: int = 1) -> GlyphAtlas:
    """Bake a signed-distance glyph atlas (reference seam:
    bake_msdf_atlas_py). Shelf-packed, deterministic row-major order.

    channels=1 bakes the raster-derived single-channel SDF; channels=3
    bakes a TRUE multi-channel MSDF from the font outlines
    (labels/msdf.py — corner-preserving under bilinear sampling, decoded
    with median3 like the reference's text_overlay shader)."""
    from PIL import Image, ImageDraw, ImageFont

    if channels == 3:
        return _bake_msdf3_atlas(charset, font_path=font_path, px=px,
                                 padding=padding, sdf_range=sdf_range,
                                 atlas_width=atlas_width)
    if channels != 1:
        raise ValueError("channels must be 1 (SDF) or 3 (MSDF)")

    font_path = font_path or default_font_path()
    font = ImageFont.truetype(font_path, px)
    ascent, descent = font.getmetrics()

    chars = sorted(set(charset) | {"?"})
    rasters = []
    for ch in chars:
        bbox = font.getbbox(ch)
        if bbox is None or bbox[2] <= bbox[0] or bbox[3] <= bbox[1]:
            adv = font.getlength(ch)
            rasters.append((ch, None, (0, 0), float(adv)))
            continue
        x0, y0, x1, y1 = bbox
        w, h = x1 - x0 + 2 * padding, y1 - y0 + 2 * padding
        img = Image.new("L", (w, h), 0)
        ImageDraw.Draw(img).text((padding - x0, padding - y0), ch,
                                 fill=255, font=font)
        mask = np.asarray(img) >= 128
        sdf = signed_distance_field(mask, clip=sdf_range)
        # bearing: bitmap origin relative to pen position; y measured from
        # baseline (PIL's bbox y is from the top of the ascent box)
        rasters.append((ch, sdf, (x0 - padding, ascent - y0 + padding),
                        float(font.getlength(ch))))

    # shelf packing in deterministic order
    x = y = shelf_h = 0
    placements = {}
    for ch, sdf, _, _ in rasters:
        if sdf is None:
            continue
        h, w = sdf.shape
        if x + w > atlas_width:
            y += shelf_h
            x = shelf_h = 0
        placements[ch] = (x, y)
        x += w
        shelf_h = max(shelf_h, h)
    height = y + shelf_h
    atlas = np.full((max(height, 1), atlas_width), -sdf_range, np.float32)
    glyphs: Dict[str, GlyphEntry] = {}
    for ch, sdf, (bx, by), adv in rasters:
        if sdf is None:
            glyphs[ch] = GlyphEntry(ch, 0, 0, 0, 0, 0.0, 0.0, adv)
            continue
        gx, gy = placements[ch]
        h, w = sdf.shape
        atlas[gy:gy + h, gx:gx + w] = sdf
        glyphs[ch] = GlyphEntry(ch, gx, gy, w, h, float(bx), float(by), adv)

    kerning = _kerning_table(font_path, px, chars)
    return GlyphAtlas(image=atlas, glyphs=glyphs, px=px, ascent=float(ascent),
                      descent=float(descent),
                      line_height=float(ascent + descent),
                      font_path=font_path, sdf_range=sdf_range,
                      kerning=kerning)


def _bake_msdf3_atlas(charset: str, *, font_path: Optional[str], px: int,
                      padding: int, sdf_range: float,
                      atlas_width: int) -> GlyphAtlas:
    """True 3-channel MSDF bake (outline-derived; labels/msdf.py)."""
    from .msdf import msdf_glyph

    font_path = font_path or default_font_path()
    chars = sorted(set(charset) | {"?"})
    rasters = []
    ascent = descent = 0.0
    for ch in chars:
        g = msdf_glyph(font_path, ch, px, padding=padding,
                       sdf_range=sdf_range)
        if g is None:
            from PIL import ImageFont

            adv = ImageFont.truetype(font_path, px).getlength(ch)
            rasters.append((ch, None, (0.0, 0.0), float(adv)))
            continue
        ascent = max(ascent, g["ascent"])
        descent = max(descent, g["descent"])
        rasters.append((ch, g["image"], g["bearing"], g["advance"]))

    x = y = shelf_h = 0
    placements = {}
    for ch, img, _, _ in rasters:
        if img is None:
            continue
        h, w = img.shape[:2]
        if x + w > atlas_width:
            y += shelf_h
            x = shelf_h = 0
        placements[ch] = (x, y)
        x += w
        shelf_h = max(shelf_h, h)
    height = y + shelf_h
    atlas = np.full((max(height, 1), atlas_width, 3), -sdf_range,
                    np.float32)
    glyphs: Dict[str, GlyphEntry] = {}
    for ch, img, (bx, by), adv in rasters:
        if img is None:
            glyphs[ch] = GlyphEntry(ch, 0, 0, 0, 0, 0.0, 0.0, adv)
            continue
        gx, gy = placements[ch]
        h, w = img.shape[:2]
        atlas[gy:gy + h, gx:gx + w] = img
        glyphs[ch] = GlyphEntry(ch, gx, gy, w, h, float(bx), float(by), adv)

    kerning = _kerning_table(font_path, px, chars)
    return GlyphAtlas(image=atlas, glyphs=glyphs, px=px,
                      ascent=float(ascent), descent=float(descent),
                      line_height=float(ascent + descent),
                      font_path=font_path, sdf_range=sdf_range,
                      kerning=kerning)


def _kerning_table(font_path: str, px: int,
                   chars) -> Dict[Tuple[str, str], float]:
    """Pair kerning in pixels from the font's kern/GPOS tables (fontTools);
    empty dict when absent."""
    try:
        from fontTools.ttLib import TTFont
    except ImportError:  # pragma: no cover
        return {}
    out: Dict[Tuple[str, str], float] = {}
    try:
        tt = TTFont(font_path, lazy=True)
        upem = tt["head"].unitsPerEm
        cmap = tt.getBestCmap()
        name_of = {ch: cmap.get(ord(ch)) for ch in chars}
        if "kern" in tt:
            scale = px / upem
            for table in tt["kern"].kernTables:
                pairs = getattr(table, "kernTable", {})
                wanted = {n for n in name_of.values() if n}
                for (l, r), v in pairs.items():
                    if l in wanted and r in wanted:
                        lc = [c for c, n in name_of.items() if n == l]
                        rc = [c for c, n in name_of.items() if n == r]
                        for a in lc:
                            for b in rc:
                                out[(a, b)] = v * scale
        tt.close()
    except Exception:  # noqa: BLE001 — kerning is best-effort
        return {}
    return out
