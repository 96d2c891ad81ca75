# forge3d_tpu/recipe_manifest.py
# Recipe manifests: canonical, hashable descriptions of a MapScene render
# for golden bookkeeping (reference seam: python/forge3d/recipe_manifest.py
# — the goldens under tests/golden/recipes/ pair each PNG with a manifest).

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Optional

import numpy as np

from ._version import __version__
from .assurance.certificate import canonical_json

__all__ = ["build_manifest", "manifest_digest", "save_manifest",
           "load_manifest", "verify_manifest"]

_SCHEMA = "forge3d-tpu/recipe-manifest/v1"


def _jsonable(obj):
    if isinstance(obj, np.ndarray):
        return {"__ndarray__": True,
                "sha256": hashlib.sha256(
                    np.ascontiguousarray(obj).tobytes()).hexdigest(),
                "shape": list(obj.shape), "dtype": str(obj.dtype)}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in sorted(obj.items())}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if hasattr(obj, "to_dict"):
        return _jsonable(obj.to_dict())
    if hasattr(obj, "__dict__") and not isinstance(obj, type):
        return _jsonable({k: v for k, v in vars(obj).items()
                          if not k.startswith("_")})
    return obj


def build_manifest(recipe, *, engine_version: Optional[str] = None,
                   outputs: Optional[dict] = None) -> dict:
    """Canonical manifest for a recipe object/dict: arrays become digests,
    nested dataclasses flatten, keys sort."""
    body = {
        "schema": _SCHEMA,
        "engine": {"name": "forge3d_tpu",
                   "version": engine_version or __version__},
        "recipe": _jsonable(recipe),
        "outputs": _jsonable(outputs or {}),
    }
    body["digest"] = manifest_digest(body)
    return body


def manifest_digest(manifest: dict) -> str:
    body = {k: v for k, v in manifest.items() if k != "digest"}
    return hashlib.sha256(canonical_json(body).encode()).hexdigest()


def save_manifest(path, manifest: dict) -> None:
    Path(path).write_text(json.dumps(manifest, indent=1, sort_keys=True))


def load_manifest(path) -> dict:
    return json.loads(Path(path).read_text())


def verify_manifest(manifest: dict) -> bool:
    """Digest self-consistency (fail-closed on tamper)."""
    return manifest.get("digest") == manifest_digest(manifest)
