# forge3d_tpu/labels/bidi.py — UAX#9 bidirectional ordering (implicit
# levels subset).
#
# Parity notes (reference behavior, not code): the reference implements
# the full UAX#9 pipeline in Rust (src/labels/shape/bidi*.rs, with
# BidiTest conformance suites). Labels and map furniture exercise the
# implicit-level core: paragraph level detection (P2/P3), weak-type
# resolution for numbers (W1-W7), neutral resolution (N1-N2), implicit
# levels (I1-I2), and the L2 level-run reversal — implemented here from
# the specification. Explicit embedding initiators (LRE/RLE/LRO/RLO/
# LRI/RLI/FSI + PDF/PDI, rules X1-X8) are treated as removed formatting
# characters (they are stripped like L1 requires for the label corpus);
# texts that need nested embeddings fall outside the supported surface
# and keep their implicit ordering.

from __future__ import annotations

import unicodedata
from typing import List, Sequence, Tuple

__all__ = ["paragraph_level", "resolve_levels", "visual_order", "mirror_char"]

_REMOVED = {"LRE", "RLE", "LRO", "RLO", "PDF", "LRI", "RLI", "FSI", "PDI"}


def paragraph_level(text: str) -> int:
    """P2/P3: level of the first strong character (L -> 0, R/AL -> 1)."""
    for ch in text:
        cls = unicodedata.bidirectional(ch)
        if cls == "L":
            return 0
        if cls in ("R", "AL"):
            return 1
    return 0


def resolve_levels(text: str, base: int | None = None) -> List[int]:
    """Resolved embedding level per character (implicit levels only)."""
    n = len(text)
    if base is None:
        base = paragraph_level(text)
    types = [unicodedata.bidirectional(ch) or "ON" for ch in text]
    # removed formatting characters take the level of the run they sit in
    # and never influence neighbors: treat as ON for resolution, they are
    # zero-width at rendering
    types = ["ON" if t in _REMOVED else t for t in types]
    levels = [base] * n

    # W1: NSM takes the type of the previous character (sos -> base dir)
    prev = "R" if base else "L"
    for i, t in enumerate(types):
        if t == "NSM":
            types[i] = prev
        prev = types[i]

    # W2: EN -> AN when the last strong type was AL
    strong = "R" if base else "L"
    for i, t in enumerate(types):
        if t in ("L", "R", "AL"):
            strong = t
        elif t == "EN" and strong == "AL":
            types[i] = "AN"

    # W3: AL -> R
    types = ["R" if t == "AL" else t for t in types]

    # W4: single ES between ENs -> EN; single CS between same numbers
    for i in range(1, n - 1):
        if types[i] == "ES" and types[i - 1] == "EN" \
                and types[i + 1] == "EN":
            types[i] = "EN"
        elif types[i] == "CS" and types[i - 1] == types[i + 1] \
                and types[i - 1] in ("EN", "AN"):
            types[i] = types[i - 1]

    # W5: ET runs adjacent to EN -> EN
    i = 0
    while i < n:
        if types[i] == "ET":
            j = i
            while j < n and types[j] == "ET":
                j += 1
            before = types[i - 1] if i > 0 else None
            after = types[j] if j < n else None
            if before == "EN" or after == "EN":
                for k in range(i, j):
                    types[k] = "EN"
            i = j
        else:
            i += 1

    # W6: remaining separators/terminators -> ON
    types = ["ON" if t in ("ES", "ET", "CS") else t for t in types]

    # W7: EN -> L when the last strong type was L
    strong = "R" if base else "L"
    for i, t in enumerate(types):
        if t in ("L", "R"):
            strong = t
        elif t == "EN" and strong == "L":
            types[i] = "L"

    # N1/N2: neutrals take surrounding strong direction, else base
    def strong_dir(t):
        if t == "L":
            return "L"
        if t in ("R", "EN", "AN"):
            return "R"
        return None

    i = 0
    while i < n:
        if types[i] in ("B", "S", "WS", "ON"):
            j = i
            while j < n and types[j] in ("B", "S", "WS", "ON"):
                j += 1
            before = strong_dir(types[i - 1]) if i > 0 else (
                "R" if base else "L")
            after = strong_dir(types[j]) if j < n else (
                "R" if base else "L")
            fill = before if before == after and before else (
                "R" if base else "L")
            for k in range(i, j):
                types[k] = fill
            i = j
        else:
            i += 1

    # I1/I2: implicit levels
    for i, t in enumerate(types):
        if base % 2 == 0:      # LTR paragraph
            if t == "R":
                levels[i] = 1
            elif t == "AN":
                levels[i] = 2
            elif t == "EN":
                levels[i] = 2
        else:                   # RTL paragraph
            if t == "L":
                levels[i] = base + 1
            elif t in ("EN", "AN"):
                levels[i] = base + 1
    return levels


def visual_order(text: str, base: int | None = None) -> List[int]:
    """L2: logical indices in visual (left-to-right) order."""
    if base is None:
        base = paragraph_level(text)
    levels = resolve_levels(text, base)
    order = list(range(len(text)))
    if not levels:
        return order
    max_level = max(levels)
    lowest_odd = min((lv for lv in levels if lv % 2), default=None)
    if lowest_odd is None:
        return order
    for level in range(max_level, lowest_odd - 1, -1):
        i = 0
        while i < len(order):
            if levels[order[i]] >= level:
                j = i
                while j < len(order) and levels[order[j]] >= level:
                    j += 1
                order[i:j] = order[i:j][::-1]
                i = j
            else:
                i += 1
    return order


def mirror_char(ch: str, level: int) -> str:
    """L4: mirrored form for characters in RTL runs (paired brackets)."""
    if level % 2 == 0:
        return ch
    return _MIRROR.get(ch, ch)


_MIRROR = {
    "(": ")", ")": "(", "[": "]", "]": "[", "{": "}", "}": "{",
    "<": ">", ">": "<", "«": "»", "»": "«", "‹": "›", "›": "‹",
    "⟨": "⟩", "⟩": "⟨", "≤": "≥", "≥": "≤",
}
