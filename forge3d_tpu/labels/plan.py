# forge3d_tpu/labels/plan.py
# Label planning: candidate generation (point/line/curved), screen-space
# projection with depth occlusion + horizon fade, solver orchestration.
#
# Parity notes (reference behavior, not code):
# /root/reference/python/forge3d/label_plan.py (1.8k LoC) generates
# candidates per feature (8-position point model, along-line placements),
# assigns priorities, invokes a declutter solver (greedy/annealing/
# optimal), and returns a plan consumed by the screen-space text pass.

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .declutter import (DeclutterResult, declutter_annealing, declutter_greedy,
                        declutter_optimal)
from .shape import text_shape

__all__ = ["LabelCandidate", "LabelPlacement", "LabelPlan", "plan_labels",
           "point_label_candidates", "line_label_candidates"]

# 8-position point-label model: offset directions in preference order
# (E, W, NE, NW, SE, SW, N, S) with multiplicative priority falloff.
_POINT_POSITIONS = [
    (1.0, -0.25, 1.00), (-1.0, -0.25, 0.90),
    (0.8, -1.0, 0.85), (-0.8, -1.0, 0.80),
    (0.8, 0.75, 0.75), (-0.8, 0.75, 0.70),
    (0.0, -1.2, 0.65), (0.0, 1.0, 0.60),
]


@dataclass
class LabelCandidate:
    label_id: int
    text: str
    x: float                 # baseline-left anchor, screen px
    y: float
    width: float
    height: float
    priority: float
    rotation_deg: float = 0.0
    size: float = 16.0
    kind: str = "point"      # point | line | curved | callout

    @property
    def box(self) -> Tuple[float, float, float, float]:
        if self.rotation_deg == 0.0:
            return (self.x, self.y - self.height, self.x + self.width, self.y)
        c = abs(math.cos(math.radians(self.rotation_deg)))
        s = abs(math.sin(math.radians(self.rotation_deg)))
        w = self.width * c + self.height * s
        h = self.width * s + self.height * c
        cx = self.x + self.width / 2 * math.cos(math.radians(self.rotation_deg))
        cy = self.y - self.width / 2 * math.sin(math.radians(self.rotation_deg)) \
            - self.height / 2
        return (cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2)


@dataclass
class LabelPlacement:
    label_id: int
    text: str
    x: float
    y: float
    size: float
    rotation_deg: float = 0.0
    color: Tuple[int, int, int, int] = (255, 255, 255, 255)
    halo_color: Tuple[int, int, int, int] = (0, 0, 0, 255)
    halo_width: float = 1.5
    opacity: float = 1.0
    kind: str = "point"


@dataclass
class LabelPlan:
    placements: List[LabelPlacement]
    dropped: List[int]                 # label ids with no placement
    solver: DeclutterResult
    stats: Dict[str, object] = field(default_factory=dict)


def _measure(text: str, size: float, atlas=None) -> Tuple[float, float]:
    run = text_shape(text, atlas=atlas, size=size)
    return run.width, run.ascent + run.descent


def point_label_candidates(label_id: int, text: str, ax: float, ay: float, *,
                           priority: float = 1.0, size: float = 16.0,
                           marker_radius: float = 4.0,
                           atlas=None) -> List[LabelCandidate]:
    """8-position candidates around an anchor point."""
    w, h = _measure(text, size, atlas)
    out = []
    for dx, dy, mult in _POINT_POSITIONS:
        x = ax + (marker_radius + 2) * dx - (w if dx < 0 else 0) \
            - (w / 2 if dx == 0 else 0)
        y = ay + (marker_radius + 2) * dy + h * 0.75 * max(dy, 0)
        out.append(LabelCandidate(label_id, text, x, y, w, h,
                                  priority * mult, size=size, kind="point"))
    return out


def line_label_candidates(label_id: int, text: str,
                          polyline: Sequence[Tuple[float, float]], *,
                          priority: float = 1.0, size: float = 16.0,
                          spacing: float = 240.0,
                          atlas=None) -> List[LabelCandidate]:
    """Placements along a polyline at regular arc-length intervals, rotated
    to the local tangent (upright: flipped when upside-down)."""
    pts = np.asarray(polyline, np.float64).reshape(-1, 2)
    if len(pts) < 2:
        return []
    w, h = _measure(text, size, atlas)
    seg = np.diff(pts, axis=0)
    seg_len = np.hypot(seg[:, 0], seg[:, 1])
    total = float(seg_len.sum())
    if total < w:
        return []
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    n_pos = max(1, int(total // spacing))
    out = []
    for k in range(n_pos):
        s_mid = (k + 0.5) * total / n_pos
        i = int(np.searchsorted(cum, s_mid, side="right") - 1)
        i = min(i, len(seg) - 1)
        t = (s_mid - cum[i]) / max(seg_len[i], 1e-12)
        px, py = pts[i] + t * seg[i]
        ang = math.degrees(math.atan2(-(seg[i, 1]), seg[i, 0]))
        if ang > 90 or ang < -90:
            ang += 180.0  # keep text upright
        # back up half the text width along the tangent
        ca, sa = math.cos(math.radians(ang)), math.sin(math.radians(ang))
        x = px - (w / 2) * ca
        y = py + (w / 2) * sa + h * 0.35
        out.append(LabelCandidate(label_id, text, x, y, w, h,
                                  priority * (0.95 ** k), rotation_deg=ang,
                                  size=size, kind="line"))
    return out


def project_anchors(points_world: np.ndarray, view_proj: np.ndarray,
                    width: int, height: int,
                    depth_map: Optional[np.ndarray] = None,
                    *, depth_tolerance: float = 2e-2,
                    horizon_fade_deg: float = 8.0) -> List[dict]:
    """World -> screen anchors with visibility: clip test, optional depth
    occlusion against the rendered depth map, horizon fade factor
    (reference: labels/mod.rs screen-space projection)."""
    pts = np.asarray(points_world, np.float64).reshape(-1, 3)
    ones = np.ones((len(pts), 1))
    clip = np.concatenate([pts, ones], 1) @ np.asarray(view_proj, np.float64).T
    out = []
    for i, (cx, cy, cz, cw) in enumerate(clip):
        vis = cw > 1e-9
        ndc = (cx / cw, cy / cw, cz / cw) if vis else (0, 0, 0)
        vis = vis and -1 <= ndc[0] <= 1 and -1 <= ndc[1] <= 1 and 0 <= ndc[2] <= 1
        sx = (ndc[0] * 0.5 + 0.5) * width
        sy = (1 - (ndc[1] * 0.5 + 0.5)) * height
        opacity = 1.0
        if vis and depth_map is not None:
            px = int(np.clip(sx, 0, width - 1))
            py = int(np.clip(sy, 0, height - 1))
            scene_d = float(depth_map[py, px])
            if ndc[2] > scene_d + depth_tolerance:
                vis = False
        out.append({"index": i, "visible": bool(vis), "x": float(sx),
                    "y": float(sy), "depth": float(ndc[2]), "opacity": opacity})
    return out


_SOLVERS = {"greedy": declutter_greedy, "annealing": declutter_annealing,
            "optimal": declutter_optimal}


def plan_labels(candidates: Sequence[LabelCandidate], *,
                frame_size: Tuple[int, int] = (1024, 1024),
                algorithm: str = "greedy", margin: float = 2.0,
                max_visible: Optional[int] = None,
                style: Optional[dict] = None, **solver_kw) -> LabelPlan:
    """Run a declutter solver over candidates and emit final placements."""
    W, H = frame_size
    cands = [c for c in candidates
             if c.box[2] > 0 and c.box[0] < W and c.box[3] > 0 and c.box[1] < H]
    boxes = [c.box for c in cands]
    pri = [c.priority for c in cands]
    labels = [c.label_id for c in cands]
    try:
        solver = _SOLVERS[algorithm]
    except KeyError:
        raise ValueError(f"unknown declutter algorithm: {algorithm!r}") from None
    result = solver(boxes, pri, labels, margin=margin, **solver_kw)
    chosen = result.chosen
    if max_visible is not None and len(chosen) > max_visible:
        chosen = sorted(sorted(chosen, key=lambda i: -pri[i])[:max_visible])
    style = style or {}
    placements = [LabelPlacement(
        label_id=cands[i].label_id, text=cands[i].text,
        x=cands[i].x, y=cands[i].y, size=cands[i].size,
        rotation_deg=cands[i].rotation_deg, kind=cands[i].kind,
        color=tuple(style.get("color", (255, 255, 255, 255))),
        halo_color=tuple(style.get("halo_color", (0, 0, 0, 255))),
        halo_width=float(style.get("halo_width", 1.5)),
    ) for i in chosen]
    placed_ids = {p.label_id for p in placements}
    dropped = sorted({c.label_id for c in candidates} - placed_ids)
    return LabelPlan(
        placements=placements, dropped=dropped, solver=result,
        stats={"candidates": len(candidates), "in_frame": len(cands),
               "placed": len(placements), "dropped": len(dropped),
               "algorithm": algorithm},
    )
