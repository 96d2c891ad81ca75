# forge3d_tpu/config.py
# Renderer configuration: RendererConfig + JSON presets with CLI-style
# override merge.
#
# Parity notes (reference behavior, not code):
# /root/reference/python/forge3d/config.py (782 LoC: RendererConfig +
# load_renderer_config) and presets.py merge JSON preset files under
# explicit overrides (examples/terrain_demo.py:52-80). Env vars follow the
# reference's FORGE3D_* convention.

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field, fields
from pathlib import Path
from typing import Any, Dict, List, Optional

__all__ = ["RendererConfig", "load_renderer_config", "merge_config",
           "list_presets", "load_preset", "PRESETS"]


@dataclass
class RendererConfig:
    """Top-level renderer knobs (the reference's RendererConfig shape)."""

    width: int = 1024
    height: int = 768
    spp: int = 16
    max_frames: int = 512
    min_frames: int = 8
    variance_threshold: float = 1e-3
    seed: int = 1
    exposure: float = 1.0
    gamma: float = 2.2
    tonemap: str = "filmic"
    colormap: str = "terrain"
    z_scale: float = 1.0
    deterministic: bool = False
    denoise: Optional[str] = None           # None | "atrous" | "oidn"
    aovs: List[str] = field(default_factory=list)
    cache: Optional[str] = None
    output_srgb: bool = True
    extras: Dict[str, Any] = field(default_factory=dict)

    def validate(self) -> "RendererConfig":
        if self.width <= 0 or self.height <= 0:
            raise ValueError("width/height must be positive")
        if self.spp <= 0:
            raise ValueError("spp must be positive")
        if self.min_frames > self.max_frames:
            raise ValueError("min_frames must be <= max_frames")
        if self.tonemap not in ("reinhard", "reinhard_extended", "filmic",
                                "aces", "linear"):
            raise ValueError(f"unknown tonemap {self.tonemap!r}")
        if self.denoise not in (None, "atrous", "oidn"):
            raise ValueError(f"unknown denoiser {self.denoise!r}")
        return self

    def to_dict(self) -> dict:
        return asdict(self)


_FIELDS = {f.name for f in fields(RendererConfig)}


def merge_config(base: RendererConfig, *overrides: Optional[dict]
                 ) -> RendererConfig:
    """Later dicts win; unknown keys accumulate into extras."""
    data = base.to_dict()
    extras = dict(data.pop("extras", {}))
    for ov in overrides:
        if not ov:
            continue
        for k, v in ov.items():
            if v is None:
                continue
            if k in _FIELDS and k != "extras":
                data[k] = v
            else:
                extras[k] = v
    return RendererConfig(**data, extras=extras).validate()


PRESETS: Dict[str, dict] = {
    # draft trades convergence for speed: no variance gate, denoise after
    "draft": {"spp": 4, "max_frames": 32, "variance_threshold": 1e9,
              "denoise": "atrous"},
    "preview": {"spp": 16, "max_frames": 128, "variance_threshold": 3e-3},
    "production": {"spp": 64, "max_frames": 512,
                   "variance_threshold": 1e-3},
    "print": {"spp": 256, "max_frames": 1024, "variance_threshold": 3e-4,
              "width": 3840, "height": 2160},
    "deterministic_ci": {"spp": 8, "max_frames": 64, "seed": 7,
                         "deterministic": True, "variance_threshold": 1e9},
}


def list_presets() -> List[str]:
    return sorted(PRESETS)


def load_preset(name: str) -> dict:
    try:
        return dict(PRESETS[name])
    except KeyError:
        raise KeyError(f"unknown preset {name!r}; available: "
                       f"{', '.join(list_presets())}") from None


def _env_overrides() -> dict:
    """FORGE3D_<FIELD> env vars override file config (reference env
    convention, e.g. FORGE3D_DETERMINISTIC)."""
    out: dict = {}
    for f in fields(RendererConfig):
        env = os.environ.get(f"FORGE3D_{f.name.upper()}")
        if env is None:
            continue
        if f.type in ("int", int):
            out[f.name] = int(env)
        elif f.type in ("float", float):
            out[f.name] = float(env)
        elif f.type in ("bool", bool):
            out[f.name] = env.lower() in ("1", "true", "yes", "on")
        else:
            out[f.name] = env
    return out


def load_renderer_config(path: Optional[str] = None, *,
                         preset: Optional[str] = None,
                         overrides: Optional[dict] = None
                         ) -> RendererConfig:
    """Assemble a config: defaults < preset < JSON file < env < overrides
    (reference seam: load_renderer_config)."""
    layers: List[Optional[dict]] = []
    if preset:
        layers.append(load_preset(preset))
    if path:
        doc = json.loads(Path(path).read_text())
        file_preset = doc.pop("preset", None)
        if file_preset:
            layers.insert(0, load_preset(file_preset))
        layers.append(doc)
    layers.append(_env_overrides())
    layers.append(overrides)
    return merge_config(RendererConfig(), *layers)
