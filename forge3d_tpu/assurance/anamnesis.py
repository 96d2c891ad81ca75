# forge3d_tpu/assurance/anamnesis.py
# ANAMNESIS: content-addressed render caching. A render's full input state
# hashes to a key; the resulting frame (plus metadata) is stored in an LRU
# content store, so repeat renders — including on another backend — restore
# without executing.
#
# Parity notes (reference behavior, not code):
#   /root/reference/src/core/anamnesis/{key,store,scheduler,report}.rs and
#   python/forge3d/anamnesis.py — SHA-256 pass/leaf keys over inputs +
#   engine fingerprint, LRU store, `cache=` kwarg on render entry points,
#   CacheReport {hits, misses, stores}, cross-backend restore proven by
#   byte-identical replay.

from __future__ import annotations

import hashlib
import json
import os
import shutil
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import numpy as np

from .._version import __version__


def engine_fingerprint() -> str:
    """Identifies the rendering engine revision for cache keys. Renders from
    different engine versions must not collide."""
    import jax

    return f"forge3d_tpu/{__version__}/jax-{jax.__version__}"


def _update(h, obj: Any) -> None:
    if obj is None:
        h.update(b"\x00none")
    elif isinstance(obj, np.ndarray):
        h.update(b"\x01nd")
        h.update(str(obj.dtype).encode())
        h.update(str(obj.shape).encode())
        h.update(np.ascontiguousarray(obj).tobytes())
    elif isinstance(obj, (bytes, bytearray)):
        h.update(b"\x02b")
        h.update(bytes(obj))
    elif isinstance(obj, (int, float, bool, str)):
        h.update(b"\x03s")
        h.update(repr(obj).encode())
    elif isinstance(obj, (list, tuple)):
        h.update(b"\x04l")
        for item in obj:
            _update(h, item)
    elif isinstance(obj, dict):
        h.update(b"\x05d")
        for k in sorted(obj, key=str):
            _update(h, str(k))
            _update(h, obj[k])
    elif hasattr(obj, "to_dict"):
        _update(h, obj.to_dict())
    else:
        h.update(b"\x06r")
        h.update(repr(obj).encode())


def pass_key(pass_name: str, **inputs) -> str:
    """SHA-256 content key of a named render pass over all of its inputs
    plus the engine fingerprint."""
    h = hashlib.sha256()
    h.update(engine_fingerprint().encode())
    h.update(b"|")
    h.update(pass_name.encode())
    _update(h, inputs)
    return h.hexdigest()


leaf_key = pass_key  # leaf = pass with no upstream passes (reference naming)


@dataclass
class CacheReport:
    hits: int = 0
    misses: int = 0
    stores: int = 0
    evictions: int = 0
    restored_bytes: int = 0

    def as_dict(self) -> dict:
        return dict(hits=self.hits, misses=self.misses, stores=self.stores,
                    evictions=self.evictions, restored_bytes=self.restored_bytes)


class ContentStore:
    """Disk-backed LRU content store: key -> (npz payload, meta json)."""

    def __init__(self, root: str, capacity_bytes: int = 2 * 1024**3):
        self.root = str(root)
        self.capacity_bytes = int(capacity_bytes)
        os.makedirs(self.root, exist_ok=True)
        self._lock = threading.Lock()
        self.report = CacheReport()

    def _path(self, key: str) -> str:
        if len(key) < 8 or not all(c in "0123456789abcdef" for c in key):
            raise ValueError(f"invalid content key {key!r}")
        return os.path.join(self.root, key[:2], key)

    def put(self, key: str, arrays: dict, meta: Optional[dict] = None) -> None:
        p = self._path(key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + f".tmp{os.getpid()}"
        np.savez_compressed(tmp + ".npz", **arrays)
        os.replace(tmp + ".npz", p + ".npz")
        with open(p + ".json", "w") as f:
            json.dump({"meta": meta or {}, "stored_at": time.time()}, f)
        with self._lock:
            self.report.stores += 1
        self._evict_if_needed()

    def get(self, key: str) -> Optional[tuple]:
        p = self._path(key)
        if not os.path.exists(p + ".npz"):
            with self._lock:
                self.report.misses += 1
            return None
        try:
            with np.load(p + ".npz") as z:
                arrays = {k: np.asarray(z[k]) for k in z.files}
            with open(p + ".json") as f:
                meta = json.load(f).get("meta", {})
        except Exception:
            with self._lock:
                self.report.misses += 1
            return None
        now = time.time()
        os.utime(p + ".npz", (now, now))  # LRU touch
        with self._lock:
            self.report.hits += 1
            self.report.restored_bytes += sum(a.nbytes for a in arrays.values())
        return arrays, meta

    def contains(self, key: str) -> bool:
        return os.path.exists(self._path(key) + ".npz")

    def stats(self) -> dict:
        total = 0
        count = 0
        for dirpath, _, files in os.walk(self.root):
            for fn in files:
                if fn.endswith(".npz"):
                    total += os.path.getsize(os.path.join(dirpath, fn))
                    count += 1
        return {"entries": count, "bytes": total,
                "capacity_bytes": self.capacity_bytes,
                **self.report.as_dict()}

    def clear(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
        os.makedirs(self.root, exist_ok=True)

    def _evict_if_needed(self) -> None:
        entries = []
        total = 0
        for dirpath, _, files in os.walk(self.root):
            for fn in files:
                if fn.endswith(".npz"):
                    fp = os.path.join(dirpath, fn)
                    sz = os.path.getsize(fp)
                    entries.append((os.path.getmtime(fp), fp, sz))
                    total += sz
        if total <= self.capacity_bytes:
            return
        entries.sort()  # oldest first
        for _, fp, sz in entries:
            if total <= self.capacity_bytes:
                break
            for suffix in ("", ".json"):
                try:
                    os.remove(fp[:-4] + suffix if suffix else fp)
                except OSError:
                    pass
            total -= sz
            with self._lock:
                self.report.evictions += 1


def open_store(cache: Any) -> Optional[ContentStore]:
    """Resolve a `cache=` kwarg: ContentStore passthrough, path string, or
    None/False."""
    if cache is None or cache is False:
        return None
    if isinstance(cache, ContentStore):
        return cache
    if isinstance(cache, (str, os.PathLike)):
        return ContentStore(str(cache))
    raise TypeError(f"cache must be a path or ContentStore, got {type(cache)}")


def cached_render(cache: Any, pass_name: str, key_inputs: dict,
                  render_fn: Callable[[], dict]) -> tuple:
    """Run `render_fn` through the cache. Returns (arrays_dict, was_hit)."""
    store = open_store(cache)
    if store is None:
        return render_fn(), False
    key = pass_key(pass_name, **key_inputs)
    got = store.get(key)
    if got is not None:
        return got[0], True
    out = render_fn()
    store.put(key, out, meta={"pass": pass_name})
    return out, False


def render_sequence(store: Any, frames: list, render_frame: Callable[[int, dict], dict],
                    pass_name: str = "sequence") -> list:
    """Cache-aware sequence render: each frame keys independently
    (reference: anamnesis.render_sequence used by MapScene animations)."""
    out = []
    for i, frame_inputs in enumerate(frames):
        arrays, _ = cached_render(
            store, f"{pass_name}[{i}]", dict(frame=i, **frame_inputs),
            lambda: render_frame(i, frame_inputs),
        )
        out.append(arrays)
    return out
