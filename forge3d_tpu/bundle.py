# forge3d_tpu/bundle.py
# Portable .forge3d scene bundles: zip container with manifest + assets.
#
# Parity notes (reference behavior, not code): /root/reference/src/bundle/
# {mod,manifest}.rs + python/forge3d/bundle.py package a scene (terrain,
# state, overlays) into a single portable file with a JSON manifest, and
# the viewer save_bundle/load_bundle IPC round-trips it (request.rs:32-33).
# Deterministic: fixed zip timestamps + sorted entries -> byte-stable
# bundles for identical inputs.

from __future__ import annotations

import hashlib
import io
import json
import zipfile
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from .errors import RenderError

__all__ = ["save_bundle", "load_bundle", "bundle_manifest", "BundleError"]

_FORMAT = "forge3d-bundle"
_VERSION = 1
_FIXED_DATE = (2020, 1, 1, 0, 0, 0)  # deterministic zip timestamps


class BundleError(RenderError):
    pass


def _write_entry(zf: zipfile.ZipFile, name: str, data: bytes) -> None:
    info = zipfile.ZipInfo(name, date_time=_FIXED_DATE)
    info.compress_type = zipfile.ZIP_DEFLATED
    info.external_attr = 0o644 << 16
    zf.writestr(info, data)


def save_bundle(path, *, terrain: Optional[np.ndarray] = None,
                state: Optional[dict] = None,
                overlays: Optional[Dict[str, np.ndarray]] = None,
                meshes: Optional[dict] = None,
                extras: Optional[Dict[str, bytes]] = None) -> dict:
    """Write a .forge3d bundle; returns the manifest."""
    entries = {}
    payload: Dict[str, bytes] = {}

    if terrain is not None:
        arr = np.ascontiguousarray(terrain, np.float32)
        buf = io.BytesIO()
        np.save(buf, arr)
        payload["assets/terrain.npy"] = buf.getvalue()
        entries["terrain"] = {"path": "assets/terrain.npy",
                              "shape": list(arr.shape), "dtype": "float32"}
    if state is not None:
        payload["state.json"] = json.dumps(state, sort_keys=True,
                                           default=_json_default).encode()
        entries["state"] = {"path": "state.json"}
    for name, img in (overlays or {}).items():
        arr = np.ascontiguousarray(img)
        buf = io.BytesIO()
        np.save(buf, arr)
        key = f"assets/overlay_{name}.npy"
        payload[key] = buf.getvalue()
        entries.setdefault("overlays", {})[name] = {"path": key,
                                                    "shape": list(arr.shape)}
    for name, mesh in (meshes or {}).items():
        buf = io.BytesIO()
        np.savez(buf, vertices=mesh.vertices, indices=mesh.indices)
        key = f"assets/mesh_{name}.npz"
        payload[key] = buf.getvalue()
        entries.setdefault("meshes", {})[name] = {
            "path": key, "triangles": int(mesh.indices.shape[0])}
    for name, data in (extras or {}).items():
        key = f"extras/{name}"
        payload[key] = bytes(data)
        entries.setdefault("extras", {})[name] = {"path": key}

    digests = {k: hashlib.sha256(v).hexdigest() for k, v in payload.items()}
    manifest = {"format": _FORMAT, "version": _VERSION,
                "entries": entries, "digests": digests}
    with zipfile.ZipFile(path, "w") as zf:
        _write_entry(zf, "manifest.json",
                     json.dumps(manifest, sort_keys=True, indent=1).encode())
        for key in sorted(payload):
            _write_entry(zf, key, payload[key])
    return manifest


def _json_default(o):
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, (np.integer, np.floating)):
        return o.item()
    raise TypeError(f"not JSON serializable: {type(o)}")


def bundle_manifest(path) -> dict:
    with zipfile.ZipFile(path, "r") as zf:
        try:
            return json.loads(zf.read("manifest.json"))
        except KeyError:
            raise BundleError("bundle has no manifest.json") from None


def load_bundle(path) -> dict:
    """Read a bundle; verifies every asset digest (fail-closed)."""
    if not Path(str(path)).exists():
        raise BundleError(f"no such bundle: {path}")
    with zipfile.ZipFile(path, "r") as zf:
        manifest = json.loads(zf.read("manifest.json"))
        if manifest.get("format") != _FORMAT:
            raise BundleError("not a forge3d bundle")
        digests = manifest.get("digests", {})
        blobs = {}
        for key, want in digests.items():
            data = zf.read(key)
            got = hashlib.sha256(data).hexdigest()
            if got != want:
                raise BundleError(f"digest mismatch for {key} (corrupt bundle)")
            blobs[key] = data

    out: dict = {"manifest": manifest, "terrain": None, "state": {},
                 "overlays": {}, "meshes": {}}
    entries = manifest.get("entries", {})
    if "terrain" in entries:
        out["terrain"] = np.load(io.BytesIO(blobs[entries["terrain"]["path"]]))
    if "state" in entries:
        out["state"] = json.loads(blobs[entries["state"]["path"]])
    for name, e in entries.get("overlays", {}).items():
        out["overlays"][name] = np.load(io.BytesIO(blobs[e["path"]]))
    for name, e in entries.get("meshes", {}).items():
        npz = np.load(io.BytesIO(blobs[e["path"]]))
        from .io.mesh import MeshData

        out["meshes"][name] = MeshData(npz["vertices"], npz["indices"],
                                       name=name)
    return out
