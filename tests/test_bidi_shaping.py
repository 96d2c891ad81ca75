# UAX#9 BiDi + shaping tests (VERDICT r2 item 9; reference:
# src/labels/shape/bidi*.rs conformance suites).

import numpy as np
import pytest

from forge3d_tpu.labels.bidi import (mirror_char, paragraph_level,
                                     resolve_levels, visual_order)
from forge3d_tpu.labels.font import arabic_features, shape


def test_paragraph_level_detection():
    assert paragraph_level("hello") == 0
    assert paragraph_level("مرحبا") == 1
    assert paragraph_level("123 مرحبا") == 1     # first strong is AL
    assert paragraph_level("... hello") == 0


def test_ltr_text_is_identity_order():
    assert visual_order("hello world") == list(range(11))


def test_pure_rtl_reverses():
    t = "مرحبا"
    assert visual_order(t) == [4, 3, 2, 1, 0]


def test_number_inside_rtl_stays_ltr():
    # W2/I2: European numbers after Arabic become AN at level base+1,
    # keeping their own left-to-right digit order
    t = "شارع 42"
    order = visual_order(t)
    i4, i2 = t.index("4"), t.index("2")
    assert order.index(i4) < order.index(i2), "digits must stay LTR"
    # the RTL word comes after (to the right of) the number visually
    assert order.index(t.index("ش")) > order.index(i2)


def test_rtl_word_inside_ltr_sentence():
    t = "go to دبي now"
    order = visual_order(t)
    a, b, c = t.index("د"), t.index("ب"), t.index("ي")
    # the Arabic letters reverse among themselves, the rest is identity
    assert order.index(c) < order.index(b) < order.index(a)
    assert order[:6] == [0, 1, 2, 3, 4, 5]


def test_weak_separator_between_numbers():
    # W4: "1.234" keeps digit order even in an RTL paragraph
    t = "م 1.234"
    lv = resolve_levels(t)
    digits = [i for i, ch in enumerate(t) if ch.isdigit() or ch == "."]
    assert len({lv[i] for i in digits}) == 1, "number run splits levels"


def test_bracket_mirroring_in_rtl():
    assert mirror_char("(", 1) == ")"
    assert mirror_char("(", 0) == "("
    s = shape("(م)", None, 12.0)
    names = [g.glyph for g in s.glyphs]
    assert names[0] == "parenleft" and names[-1] == "parenright"


def test_arabic_joining_features():
    # مرحبا: meem init, reh fina, hah init, beh medi, alef fina
    assert arabic_features("مرحبا") == ["init", "fina", "init", "medi",
                                        "fina"]
    # isolated single letter
    assert arabic_features("م") == ["isol"]


def test_arabic_shape_produces_contextual_glyphs():
    s = shape("مرحبا", None, 24.0)
    names = [g.glyph for g in s.glyphs]
    assert "uni0645.init" in names and "uni0631.fina" in names
    # visual order: alef (last logical letter) leftmost
    leftmost = min(s.glyphs, key=lambda g: g.x)
    assert leftmost.glyph.startswith("uni0627")


def test_marks_ride_their_base_under_reordering():
    # beh decomposes to a skeleton + dotbelow mark (ccmp); the mark must
    # stay adjacent to its base after BiDi reordering
    s = shape("مرحبا", None, 24.0)
    names = [g.glyph for g in s.glyphs]
    i_mark = names.index("dotbelowar")
    assert names[i_mark - 1] == "uni066E.medi"
    assert abs(s.glyphs[i_mark].x - (s.glyphs[i_mark - 1].x)) < 24.0


def test_shaped_run_rasterizes():
    from forge3d_tpu.labels.font import rasterize_shaped_run

    s = shape("شارع 42", None, 16.0)
    mask = rasterize_shaped_run(s, 120, 24, origin=(4.0, 18.0))
    assert mask.shape == (24, 120)
    assert (mask > 0).sum() > 50
    assert float(mask.max()) <= 1.0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
