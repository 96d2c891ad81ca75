# forge3d_tpu/interactive.py
# Interactive preview driver: progressive-refinement render sessions for
# notebooks/REPLs (reference seam: python/forge3d/interactive.py — a
# lightweight interactive layer over the renderer used when the full
# viewer process is overkill).

from __future__ import annotations

import time
from typing import Callable, Iterator, Optional

import numpy as np

__all__ = ["InteractiveSession", "progressive_render"]


class InteractiveSession:
    """Progressive preview session: starts coarse, refines quality as the
    camera stops moving; any parameter change restarts refinement.

    Quality ladder: render scale 1/4 -> 1/2 -> 1 with rising spp.
    """

    LADDER = ((0.25, 1), (0.5, 2), (1.0, 8))

    def __init__(self, heights: np.ndarray, *, width: int = 512,
                 height: int = 384):
        self.heights = np.asarray(heights, np.float32)
        self.width = int(width)
        self.height = int(height)
        self.cam = {"origin": (self.heights.shape[1] / 2,
                               float(self.heights.max()) + 40.0,
                               self.heights.shape[0] * 1.8),
                    "look_at": (self.heights.shape[1] / 2, 0.0,
                                self.heights.shape[0] / 2)}
        self.sun = {"azimuth": 135.0, "elevation": 45.0, "intensity": 2.5}
        self._rung = 0
        self._frame: Optional[np.ndarray] = None
        self.renders = 0

    # -------------------------------------------------------------- control
    def set_camera(self, origin=None, look_at=None) -> None:
        if origin is not None:
            self.cam["origin"] = tuple(float(v) for v in origin)
        if look_at is not None:
            self.cam["look_at"] = tuple(float(v) for v in look_at)
        self._rung = 0          # restart refinement

    def set_sun(self, azimuth=None, elevation=None, intensity=None) -> None:
        for k, v in (("azimuth", azimuth), ("elevation", elevation),
                     ("intensity", intensity)):
            if v is not None:
                self.sun[k] = float(v)
        self._rung = 0

    @property
    def quality(self) -> tuple:
        return self.LADDER[min(self._rung, len(self.LADDER) - 1)]

    @property
    def fully_refined(self) -> bool:
        return self._rung >= len(self.LADDER)

    # -------------------------------------------------------------- render
    def refine(self) -> np.ndarray:
        """Render the next quality rung (no-op frame when fully refined)."""
        import forge3d_tpu as f3d

        if self.fully_refined and self._frame is not None:
            return self._frame
        scale, spp = self.quality
        w = max(16, int(self.width * scale))
        h = max(16, int(self.height * scale))
        out = f3d.hybrid_render_terrain_reference(
            self.heights, w, h, self.cam, spp=spp, min_frames=1,
            max_frames=max(2 * spp, 2), variance_threshold=1e9,
            sun_azimuth_deg=self.sun["azimuth"],
            sun_elevation_deg=self.sun["elevation"],
            sun_intensity=self.sun["intensity"])
        frame = out["rgba"]
        if scale < 1.0:        # nearest upscale for display
            ry = (np.arange(self.height) * h // self.height).clip(0, h - 1)
            rx = (np.arange(self.width) * w // self.width).clip(0, w - 1)
            frame = frame[np.ix_(ry, rx)]
        self._frame = frame
        self._rung += 1
        self.renders += 1
        return frame

    def frame(self) -> np.ndarray:
        if self._frame is None:
            return self.refine()
        return self._frame


def progressive_render(heights, *, width: int = 512, height: int = 384,
                       cam=None, budget_s: float = 10.0
                       ) -> Iterator[np.ndarray]:
    """Yield progressively-refined frames until fully refined or the time
    budget runs out."""
    sess = InteractiveSession(heights, width=width, height=height)
    if cam:
        sess.set_camera(**cam)
    t0 = time.monotonic()
    while not sess.fully_refined and time.monotonic() - t0 < budget_s:
        yield sess.refine()
