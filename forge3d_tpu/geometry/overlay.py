# forge3d_tpu/geometry/overlay.py
# Exact boolean overlay of polygons (EUCLIDEA parity).
#
# Reference behavior being matched (not copied):
#   /root/reference/src/geometry/exact/ + src/geometry/overlay/ — robust
#   predicates + snap-rounding boolean overlay so cartographic boolean ops
#   on adjacent/degenerate polygons are exact (shared edges vanish under
#   union, slivers cannot appear).
#
# Design: snap input coordinates to an integer grid (snap-rounding of the
# INPUT), then run an exact vertical (trapezoidal) decomposition overlay:
#   1. split every edge at every pairwise segment intersection, computed
#      exactly in rational arithmetic (python ints/Fractions overflow-free);
#   2. sweep slabs between consecutive event ys: pieces span whole slabs by
#      construction, are ordered exactly by their x at the slab midline,
#      COINCIDENT pieces are merged (this is what makes shared boundaries
#      vanish), and parity (even-odd) winding of A and B classifies each
#      trapezoid under the requested op;
#   3. boundary = side pieces whose two trapezoids disagree + horizontal
#      interval symmetric differences between adjacent slabs; segments are
#      stitched into rings, collinear vertices removed.
# Pure host-side Python — geometry overlay is scene-compile work, not
# device work. O(n^2) pairwise splitting (fine at cartographic sizes);
# every comparison is exact, so adjacency and degeneracy are handled by
# construction rather than by epsilons.

from __future__ import annotations

from fractions import Fraction
from typing import Dict, List, Sequence, Tuple

import numpy as np

__all__ = ["boolean_overlay", "snap_rings"]

Pt = Tuple[Fraction, Fraction]


def snap_rings(rings: Sequence, grid_bits: int = 28,
               bounds=None) -> Tuple[List[List[Tuple[int, int]]], tuple]:
    """Snap float rings to an integer grid spanning their bbox.

    Returns (integer rings, (x0, y0, scale)) for unsnapping."""
    arrs = [np.asarray(r, np.float64)[:, :2] for r in rings if len(r) >= 3]
    if not arrs:
        return [], (0.0, 0.0, 1.0)
    if bounds is None:
        allp = np.concatenate(arrs)
        lo = allp.min(0)
        hi = allp.max(0)
    else:
        lo = np.asarray(bounds[:2], np.float64)
        hi = np.asarray(bounds[2:], np.float64)
    span = max(float((hi - lo).max()), 1e-300)
    scale = (1 << grid_bits) / span
    out = []
    for a in arrs:
        ia = np.round((a - lo) * scale).astype(np.int64)
        ring = [tuple(map(int, p)) for p in ia]
        # drop consecutive duplicates created by snapping
        dedup = [ring[0]]
        for p in ring[1:]:
            if p != dedup[-1]:
                dedup.append(p)
        if len(dedup) >= 3 and dedup[0] == dedup[-1]:
            dedup.pop()
        if len(dedup) >= 3:
            out.append(dedup)
    return out, (float(lo[0]), float(lo[1]), scale)


def _seg_intersections(p1, p2, q1, q2) -> List[Pt]:
    """Exact proper/endpoint intersections of two integer segments
    (collinear overlaps return the overlapping endpoints)."""
    x1, y1 = p1
    x2, y2 = p2
    x3, y3 = q1
    x4, y4 = q2
    d = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
    if d == 0:
        # parallel; collinear overlap contributes the endpoints that lie
        # strictly inside the other segment
        out = []
        if (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1) != 0:
            return out
        for (px, py) in (q1, q2, p1, p2):
            if _on_segment(p1, p2, (px, py)) and _on_segment(q1, q2, (px, py)):
                out.append((Fraction(px), Fraction(py)))
        return out
    tn = (x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)
    un = (x3 - x1) * (y2 - y1) - (y3 - y1) * (x2 - x1)
    t = Fraction(tn, d)
    u = Fraction(un, d)
    if 0 <= t <= 1 and 0 <= u <= 1:
        ix = Fraction(x1) + t * (x2 - x1)
        iy = Fraction(y1) + t * (y2 - y1)
        return [(ix, iy)]
    return []


def _on_segment(a, b, p) -> bool:
    (ax, ay), (bx, by), (px, py) = a, b, p
    if (bx - ax) * (py - ay) - (by - ay) * (px - ax) != 0:
        return False
    return min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by)


class _Piece:
    __slots__ = ("p", "q", "fa", "fb")

    def __init__(self, p: Pt, q: Pt, fa: int, fb: int):
        # oriented so p.y < q.y (horizontal pieces are dropped earlier)
        if p[1] > q[1]:
            p, q = q, p
        self.p = p
        self.q = q
        self.fa = fa  # parity flips for A
        self.fb = fb

    def x_at(self, y: Fraction) -> Fraction:
        (px, py), (qx, qy) = self.p, self.q
        if qy == py:
            return px
        return px + (qx - px) * (y - py) / (qy - py)


def _edges_of(rings, owner_a: bool):
    out = []
    for ring in rings:
        n = len(ring)
        for i in range(n):
            p = ring[i]
            q = ring[(i + 1) % n]
            if p[1] == q[1]:
                continue  # horizontal edges never flip scanline parity
            out.append((p, q, owner_a))
    return out


def boolean_overlay(a_rings: Sequence, b_rings: Sequence, op: str,
                    grid_bits: int = 28) -> List[List[List[float]]]:
    """Exact boolean overlay of two even-odd (multi)polygons.

    a_rings/b_rings: lists of rings (each (N, 2) float coords). op:
    "union" | "intersection" | "difference". Returns result rings
    (floats), even-odd semantics (holes are separate rings)."""
    if op not in ("union", "intersection", "difference"):
        raise ValueError(f"unknown overlay op {op!r}")
    snapped, (x0, y0, scale) = snap_rings(list(a_rings) + list(b_rings),
                                          grid_bits)
    na = sum(1 for r in a_rings if len(r) >= 3)
    ia_rings = snapped[:na]
    ib_rings = snapped[na:]

    def include(in_a: bool, in_b: bool) -> bool:
        if op == "union":
            return in_a or in_b
        if op == "intersection":
            return in_a and in_b
        return in_a and not in_b

    edges = _edges_of(ia_rings, True) + _edges_of(ib_rings, False)
    if not edges:
        return []

    # --- exact pairwise splitting -----------------------------------------
    splits: List[List[Pt]] = [[] for _ in edges]
    for i in range(len(edges)):
        p1, p2, _ = edges[i]
        for j in range(i + 1, len(edges)):
            q1, q2, _ = edges[j]
            # cheap bbox reject in ints
            if (max(p1[0], p2[0]) < min(q1[0], q2[0])
                    or max(q1[0], q2[0]) < min(p1[0], p2[0])
                    or max(p1[1], p2[1]) < min(q1[1], q2[1])
                    or max(q1[1], q2[1]) < min(p1[1], p2[1])):
                continue
            for pt in _seg_intersections(p1, p2, q1, q2):
                splits[i].append(pt)
                splits[j].append(pt)

    pieces: List[_Piece] = []
    event_ys = set()
    for (p, q, owner_a), cuts in zip(edges, splits):
        pts = [(Fraction(p[0]), Fraction(p[1])),
               (Fraction(q[0]), Fraction(q[1]))]
        pts.extend(cuts)
        pts = sorted(set(pts), key=lambda t: (t[1], t[0]))
        for a, b in zip(pts[:-1], pts[1:]):
            if a[1] == b[1]:
                continue
            pieces.append(_Piece(a, b, 1 if owner_a else 0,
                                 0 if owner_a else 1))
        for t in pts:
            event_ys.add(t[1])
    ys = sorted(event_ys)

    # --- slab sweep ---------------------------------------------------------
    boundary: List[Tuple[Pt, Pt]] = []
    hsegs: List[Tuple[Fraction, Fraction, Fraction]] = []  # (y, xl, xr)
    junctions: Dict[Fraction, set] = {}

    def side(xl, y_a, xh, y_b):
        boundary.append(((xl, y_a), (xh, y_b)))
        junctions.setdefault(y_a, set()).add(xl)
        junctions.setdefault(y_b, set()).add(xh)

    prev_intervals: List[Tuple[Fraction, Fraction]] = []
    prev_y = None
    for y_lo, y_hi in zip(ys[:-1], ys[1:]):
        ym = (y_lo + y_hi) / 2
        active = [pc for pc in pieces if pc.p[1] <= y_lo and pc.q[1] >= y_hi]
        if not active:
            cur_intervals = []
        else:
            # merge coincident pieces (same segment geometry within the
            # slab): this is what makes shared boundaries vanish exactly
            merged: Dict[Tuple[Fraction, Fraction], List[int]] = {}
            for pc in active:
                key = (pc.x_at(y_lo), pc.x_at(y_hi))
                e = merged.setdefault(key, [0, 0])
                e[0] ^= pc.fa
                e[1] ^= pc.fb
            cols = sorted(merged.items(), key=lambda kv: (kv[0][0] + kv[0][1]))
            in_a = in_b = False
            cur_intervals = []
            run_start = None
            for (xl, xh), (fa, fb) in cols:
                was = include(in_a, in_b)
                in_a ^= bool(fa)
                in_b ^= bool(fb)
                now = include(in_a, in_b)
                if was != now:
                    side(xl, y_lo, xh, y_hi)
                    if now:
                        run_start = (xl, xh)
                    else:
                        cur_intervals.append((run_start, (xl, xh)))
                        run_start = None
        # horizontal boundary at y_lo: symmetric difference between the
        # slab below's intervals (at its top = y_lo) and this slab's (at
        # its bottom = y_lo)
        below = [(iv[0][1], iv[1][1]) for iv in prev_intervals] \
            if prev_y == y_lo else []
        here = [(iv[0][0], iv[1][0]) for iv in cur_intervals]
        for (l, r) in _interval_xor(below, here):
            if l != r:
                hsegs.append((y_lo, l, r))
        prev_intervals = cur_intervals
        prev_y = y_hi
    # top cap of the last slab
    for iv in prev_intervals:
        l, r = iv[0][1], iv[1][1]
        if l != r:
            hsegs.append((prev_y, l, r))

    # split horizontal boundary runs at junction vertices (where side
    # pieces end on that scanline) so touching loops keep their shared
    # vertex and the ring walk can route through it
    for (y, l, r) in hsegs:
        cuts = sorted(x for x in junctions.get(y, ()) if l < x < r)
        xs_run = [l, *cuts, r]
        for a, b in zip(xs_run[:-1], xs_run[1:]):
            boundary.append(((a, y), (b, y)))

    rings = _stitch(boundary)

    # unsnap, drop collinear vertices, orient CCW (holes are re-oriented
    # CW by callers after nesting classification)
    out = []
    inv = 1.0 / scale
    for ring in rings:
        ring = _drop_collinear(ring)
        if len(ring) < 3:
            continue
        sa = 0
        for i in range(len(ring)):
            (ax, ay) = ring[i]
            (bx, by) = ring[(i + 1) % len(ring)]
            sa += ax * by - bx * ay
        if sa < 0:
            ring = ring[::-1]
        out.append([[float(x) * inv + x0, float(y) * inv + y0]
                    for (x, y) in ring])
    return out


def _interval_xor(a: List[Tuple[Fraction, Fraction]],
                  b: List[Tuple[Fraction, Fraction]]):
    """Symmetric difference of two unions of half-open x-intervals."""
    events: Dict[Fraction, List[int]] = {}
    for (l, r) in a:
        events.setdefault(l, [0, 0])[0] += 1
        events.setdefault(r, [0, 0])[0] -= 1
    for (l, r) in b:
        events.setdefault(l, [0, 0])[1] += 1
        events.setdefault(r, [0, 0])[1] -= 1
    xs = sorted(events)
    out = []
    ca = cb = 0
    start = None
    for x in xs:
        da, db = events[x]
        was = (ca > 0) != (cb > 0)
        ca += da
        cb += db
        now = (ca > 0) != (cb > 0)
        if not was and now:
            start = x
        elif was and not now and start is not None:
            out.append((start, x))
            start = None
    return out


def _stitch(segments: List[Tuple[Pt, Pt]]) -> List[List[Pt]]:
    """Connect boundary segments into closed rings (every vertex of the
    exact arrangement has even degree). At junction vertices (degree > 2,
    e.g. polygons touching at a point) the walk continues with the most
    clockwise outgoing segment relative to the incoming direction — the
    standard face walk — so touching loops stitch into SIMPLE rings
    instead of self-cancelling figure-eights."""
    import math as _math

    adj: Dict[Pt, List[int]] = {}
    used = [False] * len(segments)
    for i, (p, q) in enumerate(segments):
        if p == q:
            used[i] = True
            continue
        adj.setdefault(p, []).append(i)
        adj.setdefault(q, []).append(i)

    def angle_from(cur, j, in_ang):
        a, b = segments[j]
        o = b if a == cur else a
        out_ang = _math.atan2(float(o[1] - cur[1]), float(o[0] - cur[0]))
        # clockwise turn from the reversed incoming direction
        return (in_ang - out_ang) % (2.0 * _math.pi)

    rings = []
    for i in range(len(segments)):
        if used[i]:
            continue
        used[i] = True
        p, q = segments[i]
        ring = [p, q]
        cur = q
        prev = p
        while cur != ring[0]:
            cands = [j for j in adj.get(cur, ()) if not used[j]]
            if not cands:
                break  # open chain (shouldn't happen; drop it)
            in_ang = _math.atan2(float(prev[1] - cur[1]),
                                 float(prev[0] - cur[0]))
            nxt = min(cands, key=lambda j: angle_from(cur, j, in_ang) or
                      2.0 * _math.pi)
            used[nxt] = True
            a, b = segments[nxt]
            prev = cur
            cur = b if a == cur else a
            ring.append(cur)
        if len(ring) >= 4 and ring[0] == ring[-1]:
            rings.append(ring[:-1])
    return rings


def _drop_collinear(ring: List[Pt]) -> List[Pt]:
    out = []
    n = len(ring)
    for i in range(n):
        a = ring[(i - 1) % n]
        b = ring[i]
        c = ring[(i + 1) % n]
        cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if cross != 0:
            out.append(b)
    return out
