# forge3d_tpu/picking.py
# Picking: heightfield ray queries from screen coordinates, pick-ID maps,
# rich pick results, lasso selection.
#
# Parity notes (reference behavior, not code):
#   /root/reference/src/picking/{id_buffer,heightfield_ray,terrain_query,
#   lasso,selection,unified}.rs — screen-point -> terrain ray query with
#   CPU/GPU parity (the visibility-buffer gate requires 100% GPU/CPU match
#   over 10k samples; here there is one engine, so parity is structural),
#   pick-ID buffers from vector overlays, polygon lasso selection.

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np

from .camera import PinholeCamera


@dataclass(frozen=True)
class PickResult:
    hit: bool
    t: float
    world: Tuple[float, float, float]
    normal: Tuple[float, float, float]
    cell: Tuple[int, int]
    height: float
    uv: Tuple[float, float]   # normalized DEM coords


def screen_ray(cam: PinholeCamera, width: int, height: int, x: float, y: float):
    """Ray through pixel (x, y) (pixel centers at +0.5)."""
    half_h = math.tan(cam.fov_y_rad * 0.5)
    half_w = cam.aspect * half_h
    ndc_x = ((x + 0.5) / width) * 2.0 - 1.0
    ndc_y = (1.0 - (y + 0.5) / height) * 2.0 - 1.0
    r = np.asarray(cam.right)
    u = np.asarray(cam.up)
    f = np.asarray(cam.forward)
    d = ndc_x * half_w * r + ndc_y * half_h * u + f
    d = d / np.linalg.norm(d)
    return np.asarray(cam.origin, np.float32), d.astype(np.float32)


def pick_terrain(scene, static, cam: PinholeCamera, width: int, height: int,
                 x: float, y: float) -> PickResult:
    """Pick the terrain under screen point (x, y)."""
    from .ops.traversal import normal_at, trace

    ro, rd = screen_ray(cam, width, height, x, y)
    res = trace(scene, static,
                (np.float32([ro[0]]), np.float32([ro[1]]), np.float32([ro[2]])),
                (np.float32([rd[0]]), np.float32([rd[1]]), np.float32([rd[2]])))
    hit = bool(np.asarray(res.hit)[0])
    t = float(np.asarray(res.t)[0])
    if not hit:
        return PickResult(False, float("inf"), (0, 0, 0), (0, 1, 0), (-1, -1),
                          float("nan"), (float("nan"), float("nan")))
    p = ro + t * rd
    nx, ny, nz = normal_at(scene, static,
                           (np.float32([p[0]]), np.float32([p[1]]), np.float32([p[2]])),
                           res.cell_x, res.cell_z)
    cx = int(np.asarray(res.cell_x)[0])
    cz = int(np.asarray(res.cell_z)[0])
    ox, oz = float(scene.origin_xz[0]), float(scene.origin_xz[1])
    sx, sz = float(scene.spacing_xz[0]), float(scene.spacing_xz[1])
    u = (float(p[0]) - ox) / (sx * static.cell_w)
    v = (float(p[2]) - oz) / (sz * static.cell_h)
    return PickResult(
        hit=True, t=t, world=tuple(float(c) for c in p),
        normal=(float(np.asarray(nx)[0]), float(np.asarray(ny)[0]),
                float(np.asarray(nz)[0])),
        cell=(cx, cz), height=float(p[1]),
        uv=(u, v),
    )


def lasso_select(points_xy: np.ndarray, lasso: Sequence[Tuple[float, float]]) -> np.ndarray:
    """Boolean mask of points inside a lasso polygon (even-odd winding)."""
    pts = np.asarray(points_xy, np.float64).reshape(-1, 2)
    poly = np.asarray(lasso, np.float64).reshape(-1, 2)
    if len(poly) < 3:
        raise ValueError("lasso needs >= 3 vertices")
    x, y = pts[:, 0], pts[:, 1]
    inside = np.zeros(len(pts), bool)
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        crosses = ((y1 <= y) & (y2 > y)) | ((y2 <= y) & (y1 > y))
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(crosses, (y - y1) / (y2 - y1 + 1e-300), 0.0)
        xint = x1 + t * (x2 - x1)
        inside ^= crosses & (x < xint)
    return inside


@dataclass
class Selection:
    """Accumulating selection set with add/remove/toggle semantics
    (reference: src/picking/selection.rs)."""

    ids: set = None

    def __post_init__(self):
        if self.ids is None:
            object.__setattr__(self, "ids", set())

    def add(self, ids) -> None:
        self.ids.update(int(i) for i in np.atleast_1d(ids))

    def remove(self, ids) -> None:
        self.ids.difference_update(int(i) for i in np.atleast_1d(ids))

    def toggle(self, ids) -> None:
        for i in np.atleast_1d(ids):
            i = int(i)
            if i in self.ids:
                self.ids.remove(i)
            else:
                self.ids.add(i)

    def clear(self) -> None:
        self.ids.clear()

    def mask_for(self, id_array: np.ndarray) -> np.ndarray:
        if not self.ids:
            return np.zeros(np.asarray(id_array).shape, bool)
        return np.isin(np.asarray(id_array), list(self.ids))
