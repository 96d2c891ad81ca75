# forge3d_tpu/codec/_build.py
# Native build helper: compile .cpp sources into cached shared objects.
#
# The reference ships a prebuilt native module (maturin wheel); here the
# C++ runtime pieces compile on first use with g++ (baked into the image)
# and cache next to the sources keyed by source hash, so repeat imports are
# instant and stale binaries rebuild automatically.

from __future__ import annotations

import hashlib
import os
import subprocess
import threading
from pathlib import Path

_LOCK = threading.Lock()
_CACHE: dict = {}


class NativeBuildError(RuntimeError):
    pass


def build_native(name: str, source: Path) -> Path:
    """Compile `source` to a cached .so; returns the library path."""
    key = str(source)
    with _LOCK:
        if key in _CACHE:
            return _CACHE[key]
        src_bytes = source.read_bytes()
        digest = hashlib.sha256(src_bytes).hexdigest()[:16]
        out_dir = source.parent / "_cache"
        out_dir.mkdir(exist_ok=True)
        lib = out_dir / f"lib{name}-{digest}.so"
        if not lib.exists():
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   "-fno-fast-math", str(source), "-o", str(lib) + ".tmp"]
            proc = subprocess.run(cmd, capture_output=True, text=True)
            if proc.returncode != 0:
                raise NativeBuildError(
                    f"g++ failed for {name}:\n{proc.stderr[-4000:]}")
            os.replace(str(lib) + ".tmp", lib)
            # drop stale builds
            for old in out_dir.glob(f"lib{name}-*.so"):
                if old != lib:
                    try:
                        old.unlink()
                    except OSError:
                        pass
        _CACHE[key] = lib
        return lib
