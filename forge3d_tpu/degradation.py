# forge3d_tpu/degradation.py
# Global degradation sink: a typed, queryable record of every place the
# framework silently reduced capability instead of failing.
#
# Parity notes: /root/reference/src/core/degradation.rs and the Python surface
# native_degradations()/clear_native_degradations()
# (/root/reference/python/forge3d/__init__.py:141-143). Tests gate on an
# allowlist (tests/degradation_allowlist.toml in the reference); we keep the
# same shape so a policy TOML can be layered on later.

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field, asdict
from typing import List

_lock = threading.Lock()


@dataclass(frozen=True)
class Degradation:
    category: str
    message: str
    timestamp: float = field(default=0.0)


_SINK: List[Degradation] = []


def record_degradation(category: str, message: str) -> None:
    with _lock:
        _SINK.append(Degradation(category, message, time.time()))


def native_degradations() -> list[dict]:
    """All recorded degradations as plain dicts (reference-parity name)."""
    with _lock:
        return [asdict(d) for d in _SINK]


def clear_native_degradations() -> None:
    with _lock:
        _SINK.clear()
