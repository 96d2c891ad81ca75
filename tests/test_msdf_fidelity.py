# MSDF fidelity suite (reference: tests/test_msdf_fidelity.py — gates,
# not code): the true 3-channel MSDF must reconstruct glyph coverage
# against a Pillow/FreeType oracle, beat the single-channel SDF on sharp
# corners under bilinear downsampling, and bake deterministically.

import numpy as np
import pytest

from forge3d_tpu.labels.atlas import bake_msdf_atlas
from forge3d_tpu.labels.msdf import median3, msdf_glyph

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
PX = 48


def _oracle(ch, shape, bearing, px=PX):
    from PIL import Image, ImageDraw, ImageFont

    f = ImageFont.truetype(FONT, px)
    asc, _ = f.getmetrics()
    bx, by = bearing
    img = Image.new("L", (shape[1], shape[0]), 0)
    ImageDraw.Draw(img).text((-bx, by - asc), ch, fill=255, font=f)
    return (np.asarray(img) >= 128).astype(np.float32)


def _iou(a, b):
    inter = float((a * b).sum())
    union = float(((a + b) > 0).sum())
    return inter / max(union, 1.0)


@pytest.mark.parametrize("ch,min_iou", [
    ("L", 0.995), ("A", 0.98), ("H", 0.99), ("T", 0.99),
    ("g", 0.94), ("Q", 0.95), ("&", 0.94),
])
def test_msdf_median_matches_freetype_oracle(ch, min_iou):
    g = msdf_glyph(FONT, ch, PX)
    med = median3(g["image"][..., 0], g["image"][..., 1],
                  g["image"][..., 2])
    cov = (med > 0).astype(np.float32)
    iou = _iou(cov, _oracle(ch, med.shape, g["bearing"]))
    assert iou >= min_iou, f"{ch}: IoU {iou:.4f}"


def test_msdf_channels_are_distinct():
    g = msdf_glyph(FONT, "L", PX)
    img = g["image"]
    assert img.shape[2] == 3
    assert np.abs(img[..., 0] - img[..., 1]).max() > 1.0
    assert np.abs(img[..., 1] - img[..., 2]).max() > 1.0


def _bilinear_downsample(a, factor):
    h, w = a.shape[:2]
    hh, ww = h // factor, w // factor
    a = a[: hh * factor, : ww * factor]
    if a.ndim == 3:
        return a.reshape(hh, factor, ww, factor, a.shape[2]).mean((1, 3))
    return a.reshape(hh, factor, ww, factor).mean((1, 3))


def _bilinear_upsample(a, factor):
    h, w = a.shape[:2]
    ys = (np.arange(h * factor, dtype=np.float32) + 0.5) / factor - 0.5
    xs = (np.arange(w * factor, dtype=np.float32) + 0.5) / factor - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    if a.ndim == 3:
        fy = fy[..., None]
        fx = fx[..., None]
    top = a[y0][:, x0] * (1 - fx) + a[y0][:, x1] * fx
    bot = a[y1][:, x0] * (1 - fx) + a[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


def test_msdf_beats_single_channel_sdf_on_corners():
    """Bake the fields at low resolution (the atlas), reconstruct
    coverage at 4x via bilinear sampling (the render path): the MSDF
    median keeps the 'L' corner that the single-channel SDF rounds off
    (the reference's single-channel ablation loses the corner)."""
    from forge3d_tpu.labels.atlas import signed_distance_field

    lo = msdf_glyph(FONT, "L", 12, padding=4, sdf_range=4.0)
    hi = msdf_glyph(FONT, "L", 48, padding=16, sdf_range=8.0)
    truth = (median3(hi["image"][..., 0], hi["image"][..., 1],
                     hi["image"][..., 2]) > 0).astype(np.float32)

    up = _bilinear_upsample(lo["image"], 4)
    cov_msdf = (median3(up[..., 0], up[..., 1], up[..., 2]) > 0)

    med_lo = median3(lo["image"][..., 0], lo["image"][..., 1],
                     lo["image"][..., 2])
    sdf1 = signed_distance_field(med_lo > 0, clip=4.0)
    cov_sdf = (_bilinear_upsample(sdf1, 4) > 0)

    # align shapes (the two bakes may differ by a pixel of padding)
    h = min(truth.shape[0], cov_msdf.shape[0], cov_sdf.shape[0])
    w = min(truth.shape[1], cov_msdf.shape[1], cov_sdf.shape[1])

    def err(c):
        return float(np.abs(c[:h, :w].astype(np.float32)
                            - truth[:h, :w]).sum())

    assert err(cov_msdf) <= err(cov_sdf)


def test_msdf_atlas_bake_deterministic_and_renders():
    a1 = bake_msdf_atlas("HI?", font_path=FONT, px=32, channels=3)
    a2 = bake_msdf_atlas("HI?", font_path=FONT, px=32, channels=3)
    assert a1.image.shape[2] == 3
    assert a1.fingerprint == a2.fingerprint
    assert a1.glyphs["H"].advance > 0

    from forge3d_tpu.labels.render import draw_text_rgba

    img = np.zeros((40, 120, 4), np.uint8)
    img[..., 3] = 255
    draw_text_rgba(img, "HI", 8, 30, atlas=a1, size=24,
                   color=(255, 255, 255, 255))
    assert img[..., :3].max() > 200  # glyphs actually drew


def test_msdf_rejects_bad_channels():
    with pytest.raises(ValueError):
        bake_msdf_atlas("A", font_path=FONT, channels=2)
