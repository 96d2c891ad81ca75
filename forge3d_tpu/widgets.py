# forge3d_tpu/widgets.py
# Notebook embedding: ipywidgets/IPython viewer panels (reference seam:
# python/forge3d/widgets.py, 542 LoC — ipywidgets notebook embedding of
# the interactive viewer + parameter sliders).
#
# Gated: ipywidgets/IPython import lazily; plain-Python fallbacks render
# PNGs to files so the module is importable (and testable) headless.

from __future__ import annotations

import base64
import io
from typing import Callable, Optional

import numpy as np

__all__ = ["TerrainWidget", "png_data_uri", "available"]


def available() -> bool:
    try:
        import ipywidgets  # noqa: F401
        import IPython  # noqa: F401

        return True
    except ImportError:
        return False


def png_data_uri(rgba: np.ndarray) -> str:
    """Encode a frame as a data: URI for inline notebook display."""
    from .io.png import encode_png

    data = encode_png(np.asarray(rgba, np.uint8))
    return "data:image/png;base64," + base64.b64encode(data).decode()


class TerrainWidget:
    """Interactive terrain panel: sliders for sun/camera re-render through
    a user-provided render callback.

    render_fn(azimuth_deg, elevation_deg, phi_deg, theta_deg) -> rgba u8.
    In a notebook this builds ipywidgets sliders + an Image; headless it
    exposes .render(...) and .snapshot(path) so tests can drive it.
    """

    def __init__(self, render_fn: Callable[..., np.ndarray], *,
                 azimuth: float = 135.0, elevation: float = 45.0,
                 phi: float = 225.0, theta: float = 35.0):
        self.render_fn = render_fn
        self.state = {"azimuth": azimuth, "elevation": elevation,
                      "phi": phi, "theta": theta}
        self._last: Optional[np.ndarray] = None

    def render(self, **overrides) -> np.ndarray:
        self.state.update({k: float(v) for k, v in overrides.items()
                           if k in self.state})
        self._last = np.asarray(self.render_fn(
            self.state["azimuth"], self.state["elevation"],
            self.state["phi"], self.state["theta"]), np.uint8)
        return self._last

    def snapshot(self, path) -> None:
        from .io.image import numpy_to_png

        if self._last is None:
            self.render()
        numpy_to_png(path, self._last)

    # ------------------------------------------------------------ notebook
    def _ipython_display_(self):  # pragma: no cover - needs a notebook
        if not available():
            raise RuntimeError("ipywidgets not installed; use .render() / "
                               ".snapshot() headless")
        import ipywidgets as W
        from IPython.display import display

        img = W.Image(format="png")

        def update(*_):
            frame = self.render(azimuth=az.value, elevation=el.value,
                                phi=ph.value, theta=th.value)
            from .io.png import encode_png

            img.value = encode_png(frame)

        az = W.FloatSlider(value=self.state["azimuth"], min=0, max=360,
                           description="sun az")
        el = W.FloatSlider(value=self.state["elevation"], min=1, max=89,
                           description="sun el")
        ph = W.FloatSlider(value=self.state["phi"], min=0, max=360,
                           description="cam phi")
        th = W.FloatSlider(value=self.state["theta"], min=5, max=85,
                           description="cam theta")
        for s in (az, el, ph, th):
            s.observe(update, "value")
        update()
        display(W.VBox([W.HBox([az, el]), W.HBox([ph, th]), img]))
