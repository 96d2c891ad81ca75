# forge3d_tpu/frame.py
# Frame result types returned by render entry points.
#
# Parity notes: /root/reference/src/py_types/{frame.rs:5, aov.rs:5,
# hdr_frame.rs:5} — Frame (RGBA8 + metadata), AovFrame (named AOV planes),
# HdrFrame (float HDR radiance).

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np


@dataclass
class Frame:
    """RGBA8 render result."""

    rgba: np.ndarray                 # (H, W, 4) uint8
    metadata: Dict = field(default_factory=dict)

    @property
    def width(self) -> int:
        return int(self.rgba.shape[1])

    @property
    def height(self) -> int:
        return int(self.rgba.shape[0])

    def to_numpy(self) -> np.ndarray:
        return self.rgba

    def save_png(self, path) -> None:
        from .io.image import numpy_to_png

        numpy_to_png(path, self.rgba)


@dataclass
class AovFrame:
    """Named AOV planes from one render (float32 host arrays)."""

    aovs: Dict[str, np.ndarray]
    metadata: Dict = field(default_factory=dict)

    def get(self, name: str) -> Optional[np.ndarray]:
        return self.aovs.get(name)

    def names(self):
        return sorted(self.aovs)

    def __getitem__(self, name: str) -> np.ndarray:
        return self.aovs[name]

    def __contains__(self, name: str) -> bool:
        return name in self.aovs


@dataclass
class HdrFrame:
    """Linear HDR radiance result (pre-tonemap)."""

    rgb: np.ndarray                  # (H, W, 3) float32
    metadata: Dict = field(default_factory=dict)

    @property
    def width(self) -> int:
        return int(self.rgb.shape[1])

    @property
    def height(self) -> int:
        return int(self.rgb.shape[0])

    def tonemapped(self, mode: str = "reinhard", exposure: float = 1.0) -> Frame:
        import jax.numpy as jnp

        from .ops import tonemap as tm

        ldr = np.asarray(tm.apply(mode, jnp.asarray(self.rgb), exposure=exposure))
        rgba = np.concatenate(
            [
                (np.clip(ldr, 0, 1) * 255 + 0.5).astype(np.uint8),
                np.full((*ldr.shape[:2], 1), 255, np.uint8),
            ],
            axis=-1,
        )
        return Frame(rgba=rgba, metadata={**self.metadata, "tonemap": mode})
