# forge3d_tpu/diagnostics.py
# Structured diagnostics with severity + render-blocking policies.
#
# Parity notes (reference behavior, not code):
#   /root/reference/python/forge3d/diagnostics.py (1.1k) — Diagnostic
#   objects with severity, category codes, render policies that decide
#   whether a recipe may render (block on error, warn-through), and stats
#   endpoints aggregation.

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum
from typing import List, Optional


class Severity(IntEnum):
    INFO = 0
    WARNING = 1
    ERROR = 2
    FATAL = 3


@dataclass(frozen=True)
class Diagnostic:
    severity: Severity
    code: str               # stable machine code, e.g. "terrain.missing_dem"
    message: str
    subject: Optional[str] = None   # which recipe element

    def as_dict(self) -> dict:
        return {
            "severity": self.severity.name.lower(),
            "code": self.code,
            "message": self.message,
            "subject": self.subject,
        }


@dataclass
class ValidationReport:
    diagnostics: List[Diagnostic] = field(default_factory=list)

    def add(self, severity: Severity, code: str, message: str,
            subject: Optional[str] = None) -> None:
        self.diagnostics.append(Diagnostic(severity, code, message, subject))

    def info(self, code, message, subject=None):
        self.add(Severity.INFO, code, message, subject)

    def warning(self, code, message, subject=None):
        self.add(Severity.WARNING, code, message, subject)

    def error(self, code, message, subject=None):
        self.add(Severity.ERROR, code, message, subject)

    def fatal(self, code, message, subject=None):
        self.add(Severity.FATAL, code, message, subject)

    @property
    def max_severity(self) -> Severity:
        if not self.diagnostics:
            return Severity.INFO
        return max(d.severity for d in self.diagnostics)

    def blocking(self, policy: str = "block_on_error") -> List[Diagnostic]:
        """Diagnostics that block rendering under the given policy
        (reference: diagnostics.py:60-94 render policies)."""
        if policy == "block_on_error":
            thr = Severity.ERROR
        elif policy == "block_on_warning":
            thr = Severity.WARNING
        elif policy == "never_block":
            thr = Severity.FATAL + 1
        else:
            raise ValueError(f"unknown render policy {policy!r}")
        return [d for d in self.diagnostics if d.severity >= thr]

    def raise_if_blocking(self, policy: str = "block_on_error") -> None:
        from .errors import RenderError

        blocking = self.blocking(policy)
        if blocking:
            lines = "; ".join(f"[{d.code}] {d.message}" for d in blocking)
            raise RenderError(f"render blocked by diagnostics: {lines}")

    def as_dict(self) -> dict:
        return {
            "max_severity": self.max_severity.name.lower(),
            "diagnostics": [d.as_dict() for d in self.diagnostics],
        }

    def __iter__(self):
        return iter(self.diagnostics)

    def __len__(self):
        return len(self.diagnostics)


# ---------------------------------------------------------------------------
# Memory telemetry reports (reference diagnostics.py:381-461 contract:
# tests/test_bench_diagnostics.py:122-165 gates to_dict()["status"],
# ["diagnostics"][0]["code"/"details"], ["supported_features"])
# ---------------------------------------------------------------------------


@dataclass
class FeatureReport:
    """Typed report with detail payloads + feature support summary
    (the reference's ValidationReport shape for telemetry reports)."""

    diagnostics: List[dict] = field(default_factory=list)
    supported_features: dict = field(default_factory=dict)
    status: str = "ok"

    def to_dict(self) -> dict:
        return {
            "status": self.status,
            "diagnostics": list(self.diagnostics),
            "supported_features": dict(self.supported_features),
        }


def memory_budget_validation_report(metrics=None) -> FeatureReport:
    """Diagnostics report from memory-budget telemetry
    (reference diagnostics.py:381-418)."""
    if metrics is None:
        from .mem import memory_metrics

        metrics = memory_metrics()
    m = dict(metrics)
    host = int(m.get("host_visible_bytes", m.get("tracked_bytes", 0)))
    limit = m.get("limit_bytes", m.get("budget_bytes"))
    policy = str(m.get("budget_policy", m.get("policy", "enforce")))
    within = bool(m.get("within_budget", True))
    diag = {
        "code": "estimated_gpu_memory",
        "severity": "warning" if not within else "info",
        "message": ("estimated GPU memory exceeds the budget"
                    if not within else
                    "estimated GPU memory is within the budget"),
        "details": {
            "host_visible_bytes": host,
            "limit_bytes": int(limit) if limit is not None else None,
            "budget_policy": policy,
            "buffer_bytes": int(m.get("buffer_bytes", 0)),
            "texture_bytes": int(m.get("texture_bytes", 0)),
            "within_budget": within,
        },
    }
    return FeatureReport(
        diagnostics=[diag],
        status="warning" if not within else "ok",
    )


def memory_tracking_completeness_report(expected_bytes: int, metrics=None,
                                        *, min_coverage: float = 0.95
                                        ) -> FeatureReport:
    """Whether tracked memory accounts for an expected allocation envelope
    (reference diagnostics.py:421-461)."""
    if metrics is None:
        from .mem import memory_metrics

        metrics = memory_metrics()
    expected = max(0, int(expected_bytes))
    tracked = int(dict(metrics).get(
        "host_visible_bytes", dict(metrics).get("tracked_bytes", 0)))
    coverage = 1.0 if expected == 0 else tracked / float(expected)
    ok = coverage >= float(min_coverage)
    diag = {
        "code": "memory_tracking_completeness",
        "severity": "info" if ok else "warning",
        "message": ("Tracked memory coverage meets the expected "
                    "allocation envelope." if ok else
                    "Tracked memory coverage is below the expected "
                    "allocation envelope."),
        "details": {
            "expected_bytes": expected,
            "tracked_bytes": tracked,
            "coverage_ratio": coverage,
            "min_coverage": float(min_coverage),
        },
    }
    return FeatureReport(
        diagnostics=[diag],
        supported_features={
            "memory.tracking_completeness":
                "supported" if ok else "underdeveloped"},
        status="ok" if ok else "warning",
    )
