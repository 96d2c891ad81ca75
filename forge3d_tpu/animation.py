# forge3d_tpu/animation.py
# Camera animation: keyframes + interpolation + orbit/flythrough rig presets.
#
# Parity notes (reference behavior, not code):
#   /root/reference/src/animation/ (CameraAnimation: keyframes +
#   interpolation) and python/forge3d/camera_rigs.py (orbit / flythrough rig
#   presets driving animation jobs like the wildfire video).

from __future__ import annotations

import bisect
import math
from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import numpy as np


@dataclass(frozen=True)
class CameraKeyframe:
    time: float
    origin: Tuple[float, float, float]
    look_at: Tuple[float, float, float]
    fov_y_deg: float = 45.0


def _smoothstep(t: float) -> float:
    return t * t * (3.0 - 2.0 * t)


@dataclass
class CameraAnimation:
    """Keyframed camera path with linear or smoothstep easing."""

    keyframes: List[CameraKeyframe] = field(default_factory=list)
    easing: str = "smooth"  # linear|smooth

    def add_keyframe(self, time: float, origin, look_at, fov_y_deg: float = 45.0) -> None:
        kf = CameraKeyframe(float(time), tuple(map(float, origin)),
                            tuple(map(float, look_at)), float(fov_y_deg))
        self.keyframes.append(kf)
        self.keyframes.sort(key=lambda k: k.time)

    @property
    def duration(self) -> float:
        if not self.keyframes:
            return 0.0
        return self.keyframes[-1].time - self.keyframes[0].time

    def sample(self, time: float) -> CameraKeyframe:
        kfs = self.keyframes
        if not kfs:
            raise ValueError("animation has no keyframes")
        if len(kfs) == 1 or time <= kfs[0].time:
            return kfs[0]
        if time >= kfs[-1].time:
            return kfs[-1]
        times = [k.time for k in kfs]
        i = bisect.bisect_right(times, time) - 1
        a, b = kfs[i], kfs[i + 1]
        t = (time - a.time) / (b.time - a.time)
        if self.easing == "smooth":
            t = _smoothstep(t)

        def lerp3(p, q):
            return tuple(p[j] + (q[j] - p[j]) * t for j in range(3))

        return CameraKeyframe(
            time=float(time),
            origin=lerp3(a.origin, b.origin),
            look_at=lerp3(a.look_at, b.look_at),
            fov_y_deg=a.fov_y_deg + (b.fov_y_deg - a.fov_y_deg) * t,
        )

    def frames(self, fps: float, start: float = None, end: float = None):
        """Yield evenly-spaced samples at the given frame rate."""
        if not self.keyframes:
            return
        start = self.keyframes[0].time if start is None else start
        end = self.keyframes[-1].time if end is None else end
        n = max(1, int(round((end - start) * fps)) + 1)
        for i in range(n):
            yield self.sample(start + i / fps)


def orbit_rig(target, radius: float, height: float, revolutions: float = 1.0,
              duration: float = 10.0, fov_y_deg: float = 45.0,
              keys_per_rev: int = 16) -> CameraAnimation:
    """Circular orbit rig around a target (reference: camera_rigs orbit)."""
    anim = CameraAnimation(easing="linear")
    t = np.asarray(target, np.float64)
    n = max(2, int(keys_per_rev * revolutions) + 1)
    for i in range(n):
        frac = i / (n - 1)
        ang = 2.0 * math.pi * revolutions * frac
        origin = (t[0] + radius * math.cos(ang), t[1] + height,
                  t[2] + radius * math.sin(ang))
        anim.add_keyframe(frac * duration, origin, tuple(t), fov_y_deg)
    return anim


def flythrough_rig(waypoints: Sequence, duration: float = 10.0,
                   look_ahead: int = 1, fov_y_deg: float = 50.0) -> CameraAnimation:
    """Flythrough rig along waypoints, looking ahead along the path."""
    wps = [tuple(map(float, w)) for w in waypoints]
    if len(wps) < 2:
        raise ValueError("flythrough needs >= 2 waypoints")
    anim = CameraAnimation(easing="smooth")
    n = len(wps)
    for i, wp in enumerate(wps):
        target = wps[min(i + look_ahead, n - 1)]
        if target == wp:
            d = np.subtract(wps[-1], wps[-2])
            target = tuple(np.add(wp, d))
        anim.add_keyframe(duration * i / (n - 1), wp, target, fov_y_deg)
    return anim
