# forge3d_tpu/labels/collision.py
# Label collision detection: uniform grid + STR-packed R-tree.
#
# Parity notes (reference behavior, not code): /root/reference/src/labels/
# {collision.rs, rtree.rs} test AABB overlap between label candidates via a
# screen-space grid for broad phase and an R-tree for large candidate sets.

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["CollisionGrid", "RTree", "boxes_overlap"]

Box = Tuple[float, float, float, float]  # (x_min, y_min, x_max, y_max)


def boxes_overlap(a: Box, b: Box, *, margin: float = 0.0) -> bool:
    return not (a[2] + margin <= b[0] or b[2] + margin <= a[0]
                or a[3] + margin <= b[1] or b[3] + margin <= a[1])


class CollisionGrid:
    """Uniform screen-space grid broad phase; insert committed boxes, query
    candidates against them."""

    def __init__(self, width: float, height: float, cell: float = 64.0):
        self.cell = float(cell)
        self.nx = max(1, int(math.ceil(width / cell)))
        self.ny = max(1, int(math.ceil(height / cell)))
        self._cells: Dict[Tuple[int, int], List[int]] = {}
        self._boxes: List[Box] = []

    def _cells_of(self, box: Box):
        x0 = max(0, int(box[0] // self.cell))
        y0 = max(0, int(box[1] // self.cell))
        x1 = min(self.nx - 1, int(box[2] // self.cell))
        y1 = min(self.ny - 1, int(box[3] // self.cell))
        for cy in range(y0, y1 + 1):
            for cx in range(x0, x1 + 1):
                yield (cx, cy)

    def insert(self, box: Box) -> int:
        idx = len(self._boxes)
        self._boxes.append(box)
        for key in self._cells_of(box):
            self._cells.setdefault(key, []).append(idx)
        return idx

    def query(self, box: Box, *, margin: float = 0.0) -> List[int]:
        seen = set()
        out = []
        grown = (box[0] - margin, box[1] - margin, box[2] + margin, box[3] + margin)
        for key in self._cells_of(grown):
            for idx in self._cells.get(key, ()):
                if idx not in seen:
                    seen.add(idx)
                    if boxes_overlap(box, self._boxes[idx], margin=margin):
                        out.append(idx)
        return sorted(out)

    def collides(self, box: Box, *, margin: float = 0.0) -> bool:
        grown = (box[0] - margin, box[1] - margin, box[2] + margin, box[3] + margin)
        for key in self._cells_of(grown):
            for idx in self._cells.get(key, ()):
                if boxes_overlap(box, self._boxes[idx], margin=margin):
                    return True
        return False


class RTree:
    """Static STR-bulk-loaded R-tree over boxes (build once, query many)."""

    def __init__(self, boxes: Sequence[Box], *, leaf_size: int = 16):
        self.boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
        n = len(self.boxes)
        self.leaf_size = leaf_size
        if n == 0:
            self._levels: List[np.ndarray] = []
            self._order = np.empty(0, np.int64)
            return
        # STR: sort by cx into vertical slabs, then by cy inside each slab
        cx = (self.boxes[:, 0] + self.boxes[:, 2]) / 2
        cy = (self.boxes[:, 1] + self.boxes[:, 3]) / 2
        n_leaves = math.ceil(n / leaf_size)
        n_slabs = max(1, int(math.ceil(math.sqrt(n_leaves))))
        slab_cap = int(math.ceil(n / n_slabs))
        order = np.argsort(cx, kind="stable")
        final_order = []
        for s in range(n_slabs):
            slab = order[s * slab_cap:(s + 1) * slab_cap]
            final_order.extend(slab[np.argsort(cy[slab], kind="stable")])
        self._order = np.asarray(final_order, np.int64)

        # build hierarchy of group AABBs
        levels = []
        cur = self.boxes[self._order]
        while len(cur) > 1:
            ng = math.ceil(len(cur) / leaf_size)
            nxt = np.empty((ng, 4))
            for g in range(ng):
                grp = cur[g * leaf_size:(g + 1) * leaf_size]
                nxt[g] = [grp[:, 0].min(), grp[:, 1].min(),
                          grp[:, 2].max(), grp[:, 3].max()]
            levels.append(nxt)
            cur = nxt
        self._levels = levels[::-1]  # root first

    def query(self, box: Box, *, margin: float = 0.0) -> List[int]:
        """Indices (original order) of boxes overlapping `box`."""
        if len(self.boxes) == 0:
            return []
        q = (box[0] - margin, box[1] - margin, box[2] + margin, box[3] + margin)
        ls = self.leaf_size
        # walk levels: maintain candidate group ranges
        cand = [0]
        for level in self._levels:
            nxt = []
            for g in cand:
                if g >= len(level):
                    continue
                b = level[g]
                if not (q[2] < b[0] or b[2] < q[0] or q[3] < b[1] or b[3] < q[1]):
                    base = g * ls
                    nxt.extend(range(base, base + ls))
            cand = nxt
        out = []
        for i in cand:
            if i >= len(self._order):
                continue
            oi = self._order[i]
            b = self.boxes[oi]
            if not (q[2] < b[0] or b[2] < q[0] or q[3] < b[1] or b[3] < q[1]):
                out.append(int(oi))
        return sorted(out)
