"""ValidationResult — the engine's verdict payload.

ref: dc43-service-clients data_quality/models.py:24-112. Status coercions
(anything unknown -> 'unknown'; ok with warnings -> 'warn') mirror the
reference constructor (models.py:58-64).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

_STATUSES = {"ok", "warn", "block", "unknown"}


@dataclass
class ValidationResult:
    ok: bool = True
    errors: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)
    metrics: dict[str, Any] = field(default_factory=dict)
    schema: dict[str, dict[str, Any]] = field(default_factory=dict)
    status: str = "ok"
    details: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.status not in _STATUSES:
            self.status = "unknown"
        if self.errors:
            self.ok = False
            if self.status == "ok":
                self.status = "block"
        elif self.warnings and self.status == "ok":
            self.status = "warn"

    @property
    def violations_total(self) -> int:
        return sum(
            int(v)
            for k, v in self.metrics.items()
            if k.startswith("violations.") and isinstance(v, (int, float))
        )

    def merge(self, other: "ValidationResult") -> "ValidationResult":
        return ValidationResult(
            ok=self.ok and other.ok,
            errors=[*self.errors, *other.errors],
            warnings=[*self.warnings, *other.warnings],
            metrics={**self.metrics, **other.metrics},
            schema={**self.schema, **other.schema},
            status=_worst(self.status, other.status),
            details={**self.details, **other.details},
        )

    def to_dict(self) -> dict[str, Any]:
        return {
            "ok": self.ok,
            "errors": list(self.errors),
            "warnings": list(self.warnings),
            "metrics": dict(self.metrics),
            "schema": dict(self.schema),
            "status": self.status,
            "details": dict(self.details),
        }

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "ValidationResult":
        return cls(
            ok=bool(data.get("ok", True)),
            errors=list(data.get("errors", [])),
            warnings=list(data.get("warnings", [])),
            metrics=dict(data.get("metrics", {})),
            schema=dict(data.get("schema", {})),
            status=data.get("status", "ok"),
            details=dict(data.get("details", {})),
        )


_ORDER = {"ok": 0, "warn": 1, "unknown": 2, "block": 3}


def _worst(a: str, b: str) -> str:
    return a if _ORDER.get(a, 2) >= _ORDER.get(b, 2) else b
