# forge3d_tpu/camera_rigs.py
# Camera rig presets for animations: orbit, flythrough, dolly, spiral.
#
# Parity notes (reference behavior, not code):
# /root/reference/python/forge3d/camera_rigs.py (739 LoC) provides orbit /
# flythrough rig presets that emit per-frame camera states for animation
# jobs, on top of the keyframe system (src/animation/). These compose with
# animation.CameraAnimation and the terrain renderer's orbit params.

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["CameraState", "OrbitRig", "FlythroughRig", "DollyRig",
           "SpiralRig", "rig_from_preset", "RIG_PRESETS"]


@dataclass(frozen=True)
class CameraState:
    origin: Tuple[float, float, float]
    look_at: Tuple[float, float, float]
    fov_y_deg: float = 45.0
    up: Tuple[float, float, float] = (0.0, 1.0, 0.0)

    def as_dict(self) -> dict:
        return {"origin": self.origin, "look_at": self.look_at,
                "fov_y": self.fov_y_deg, "up": self.up}


def _smoothstep(t: float) -> float:
    return t * t * (3 - 2 * t)


@dataclass
class OrbitRig:
    """Constant-radius orbit around a target; optional theta sweep."""

    target: Tuple[float, float, float]
    radius: float
    theta_deg: float = 35.0
    phi_start_deg: float = 0.0
    phi_end_deg: float = 360.0
    theta_end_deg: Optional[float] = None
    fov_y_deg: float = 45.0
    ease: bool = False

    def frame(self, t: float) -> CameraState:
        """t in [0, 1] -> camera state."""
        t = min(max(float(t), 0.0), 1.0)
        if self.ease:
            t = _smoothstep(t)
        phi = math.radians(self.phi_start_deg
                           + (self.phi_end_deg - self.phi_start_deg) * t)
        theta_end = (self.theta_end_deg if self.theta_end_deg is not None
                     else self.theta_deg)
        theta = math.radians(self.theta_deg
                             + (theta_end - self.theta_deg) * t)
        tx, ty, tz = self.target
        origin = (tx + self.radius * math.cos(theta) * math.cos(phi),
                  ty + self.radius * math.sin(theta),
                  tz + self.radius * math.cos(theta) * math.sin(phi))
        return CameraState(origin, self.target, self.fov_y_deg)

    def frames(self, n: int) -> List[CameraState]:
        return [self.frame(i / max(n - 1, 1)) for i in range(n)]


@dataclass
class FlythroughRig:
    """Catmull-Rom path through waypoints, looking ahead along the path."""

    waypoints: Sequence[Tuple[float, float, float]]
    look_ahead: float = 0.05
    look_at_override: Optional[Tuple[float, float, float]] = None
    fov_y_deg: float = 50.0

    def _point(self, t: float) -> np.ndarray:
        pts = np.asarray(self.waypoints, np.float64)
        n = len(pts)
        if n == 1:
            return pts[0]
        t = min(max(t, 0.0), 1.0) * (n - 1)
        i = min(int(t), n - 2)
        f = t - i
        p0 = pts[max(i - 1, 0)]
        p1 = pts[i]
        p2 = pts[i + 1]
        p3 = pts[min(i + 2, n - 1)]
        return 0.5 * ((2 * p1) + (-p0 + p2) * f
                      + (2 * p0 - 5 * p1 + 4 * p2 - p3) * f * f
                      + (-p0 + 3 * p1 - 3 * p2 + p3) * f ** 3)

    def frame(self, t: float) -> CameraState:
        pos = self._point(t)
        if self.look_at_override is not None:
            target = np.asarray(self.look_at_override, np.float64)
        else:
            target = self._point(min(t + self.look_ahead, 1.0))
            if np.allclose(target, pos):
                target = pos + np.array([1.0, 0.0, 0.0])
        return CameraState(tuple(map(float, pos)), tuple(map(float, target)),
                           self.fov_y_deg)

    def frames(self, n: int) -> List[CameraState]:
        return [self.frame(i / max(n - 1, 1)) for i in range(n)]


@dataclass
class DollyRig:
    """Straight dolly from start to end with optional FOV ramp (dolly
    zoom when fov_end differs)."""

    start: Tuple[float, float, float]
    end: Tuple[float, float, float]
    look_at: Tuple[float, float, float]
    fov_start_deg: float = 45.0
    fov_end_deg: Optional[float] = None
    ease: bool = True

    def frame(self, t: float) -> CameraState:
        t = min(max(float(t), 0.0), 1.0)
        if self.ease:
            t = _smoothstep(t)
        s = np.asarray(self.start, np.float64)
        e = np.asarray(self.end, np.float64)
        pos = s + (e - s) * t
        fov = self.fov_start_deg
        if self.fov_end_deg is not None:
            fov = self.fov_start_deg + (self.fov_end_deg - self.fov_start_deg) * t
        return CameraState(tuple(map(float, pos)), self.look_at, fov)

    def frames(self, n: int) -> List[CameraState]:
        return [self.frame(i / max(n - 1, 1)) for i in range(n)]


@dataclass
class SpiralRig:
    """Descending/ascending spiral approach toward a target."""

    target: Tuple[float, float, float]
    radius_start: float
    radius_end: float
    theta_start_deg: float = 60.0
    theta_end_deg: float = 20.0
    turns: float = 1.5
    fov_y_deg: float = 45.0

    def frame(self, t: float) -> CameraState:
        t = min(max(float(t), 0.0), 1.0)
        phi = 2 * math.pi * self.turns * t
        radius = self.radius_start + (self.radius_end - self.radius_start) * t
        theta = math.radians(self.theta_start_deg
                             + (self.theta_end_deg - self.theta_start_deg) * t)
        tx, ty, tz = self.target
        origin = (tx + radius * math.cos(theta) * math.cos(phi),
                  ty + radius * math.sin(theta),
                  tz + radius * math.cos(theta) * math.sin(phi))
        return CameraState(origin, self.target, self.fov_y_deg)

    def frames(self, n: int) -> List[CameraState]:
        return [self.frame(i / max(n - 1, 1)) for i in range(n)]


RIG_PRESETS: Dict[str, dict] = {
    "orbit_slow": {"kind": "orbit", "theta_deg": 35.0, "ease": False},
    "orbit_reveal": {"kind": "orbit", "theta_deg": 12.0,
                     "theta_end_deg": 45.0, "phi_end_deg": 270.0,
                     "ease": True},
    "spiral_approach": {"kind": "spiral", "turns": 1.25,
                        "theta_start_deg": 55.0, "theta_end_deg": 25.0},
    "dolly_in": {"kind": "dolly", "ease": True},
}


def rig_from_preset(name: str, *, target, radius: Optional[float] = None,
                    **overrides):
    """Instantiate a named rig preset around a target."""
    try:
        cfg = dict(RIG_PRESETS[name])
    except KeyError:
        raise KeyError(f"unknown rig preset {name!r}; available: "
                       f"{', '.join(sorted(RIG_PRESETS))}") from None
    kind = cfg.pop("kind")
    cfg.update(overrides)
    if kind == "orbit":
        return OrbitRig(target=tuple(target), radius=float(radius or 100.0),
                        **cfg)
    if kind == "spiral":
        r = float(radius or 100.0)
        return SpiralRig(target=tuple(target), radius_start=r * 1.6,
                         radius_end=r * 0.8, **cfg)
    if kind == "dolly":
        r = float(radius or 100.0)
        tx, ty, tz = target
        return DollyRig(start=(tx + r * 1.8, ty + r * 0.9, tz + r * 1.8),
                        end=(tx + r * 0.6, ty + r * 0.3, tz + r * 0.6),
                        look_at=tuple(target), **cfg)
    raise KeyError(f"unknown rig kind {kind!r}")
