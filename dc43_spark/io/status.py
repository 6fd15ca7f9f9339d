"""Read-status strategies + governance interceptors (extension points).

Rebuilds the reference's pluggable post-read handling (dc43-integrations
spark/io/status.py:26-99) and read/write hook surface
(spark/io/interceptors.py:43-137) in one module:

- ``ReadStatusStrategy.apply(df, result)`` decides what a governed read
  returns when validation is not clean: enforce (raise on block), downgrade
  (warn and continue), or row-filter (return only rows passing every row
  predicate — the read-side analogue of the Split write strategy).
- ``GovernanceInterceptor`` hooks run before/after the physical read/write;
  pass instances explicitly, or let ``discover_interceptors`` instantiate
  dotted-path references from Spark conf / the environment (ref
  interceptors.py:84-137): ``dc43.governance.interceptors.<op>`` wins over
  ``dc43.governance.interceptors`` wins over ``DC43_GOVERNANCE_INTERCEPTORS``.
"""

from __future__ import annotations

import importlib
import os
from dataclasses import dataclass
from typing import Optional, Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dc43_spark.contracts.model import Contract
from dc43_spark.engine.results import ValidationResult
from dc43_spark.expectations.compiler import expectation_specs, row_predicates


class BlockedReadError(RuntimeError):
    def __init__(self, message: str, result: ValidationResult) -> None:
        super().__init__(message)
        self.result = result


class ReadStatusStrategy(Protocol):
    def apply(
        self, df: DataFrame, result: ValidationResult, contract: Contract
    ) -> tuple[DataFrame, ValidationResult]:
        ...


class EnforceReadStatus:
    """Default: raise when the verdict blocks (ref status.py default path)."""

    def apply(
        self, df: DataFrame, result: ValidationResult, contract: Contract
    ) -> tuple[DataFrame, ValidationResult]:
        if result.status == "block":
            raise BlockedReadError(
                f"read blocked for {contract.id}:{contract.version}: {result.errors}",
                result,
            )
        return df, result


class DowngradeBlockedReadStatus:
    """Continue on block, demoting it to a warning (ref status.py allow-list
    behaviour for pipelines that tolerate stale/blocked datasets)."""

    def apply(
        self, df: DataFrame, result: ValidationResult, contract: Contract
    ) -> tuple[DataFrame, ValidationResult]:
        if result.status != "block":
            return df, result
        demoted = ValidationResult(
            ok=False,
            errors=[],
            warnings=result.warnings
            + [f"blocked status downgraded: {e}" for e in result.errors],
            metrics=result.metrics,
            schema=result.schema,
            status="warn",
            details=result.details,
        )
        return df, demoted


class FilterInvalidRowsReadStatus:
    """Return only rows satisfying every (non-optional) row predicate — the
    read-side mirror of the Split write strategy. The filter is a plain SQL
    conjunction, so Catalyst pushes it into the scan."""

    def __init__(self, *, include_optional: bool = False) -> None:
        self.include_optional = include_optional

    def apply(
        self, df: DataFrame, result: ValidationResult, contract: Contract
    ) -> tuple[DataFrame, ValidationResult]:
        preds = row_predicates(
            expectation_specs(contract), include_optional=self.include_optional
        )
        if not preds:
            return df, result
        keep = " AND ".join(f"COALESCE(({p}), FALSE)" for p in preds.values())
        filtered = df.filter(F.expr(keep))
        note = f"invalid rows filtered by {len(preds)} predicate(s)"
        merged = result.merge(ValidationResult(warnings=[note], status="warn"))
        if merged.status == "block":
            merged = ValidationResult(
                ok=False, errors=[], warnings=merged.warnings + merged.errors,
                metrics=merged.metrics, schema=merged.schema, status="warn",
                details=merged.details,
            )
        return filtered, merged


# ------------------------------------------------------------ interceptors


@dataclass
class IoContext:
    """What hooks see about the operation (ref interceptors.py:43-90)."""

    operation: str  # "read" | "write"
    contract: Contract
    path: Optional[str] = None
    table: Optional[str] = None
    format: Optional[str] = None


class GovernanceInterceptor:
    """Base no-op hooks; subclass and override (ref interceptors.py:92-137).

    ``pre_read``/``pre_write`` may return a replacement DataFrame (write) or
    None; ``post_*`` observe the outcome."""

    def pre_read(self, ctx: IoContext) -> None:
        ...

    def post_read(self, ctx: IoContext, df: DataFrame, result: ValidationResult) -> None:
        ...

    def pre_write(self, ctx: IoContext, df: DataFrame) -> Optional[DataFrame]:
        ...

    def post_write(self, ctx: IoContext, result: ValidationResult) -> None:
        ...


# ------------------------------------------------- interceptor discovery

CONF_KEY = "dc43.governance.interceptors"
ENV_KEY = "DC43_GOVERNANCE_INTERCEPTORS"


def resolve_interceptor(ref) -> GovernanceInterceptor:
    """An interceptor instance from a dotted-path string (``pkg.mod.Cls``
    or ``pkg.mod:Cls``), a class, or an already-built instance (ref
    interceptors.py:84-110). A class is instantiated with no arguments."""
    if isinstance(ref, str):
        module_name, _, attr = ref.replace(":", ".").rpartition(".")
        if not module_name or not attr:
            raise ValueError(f"invalid interceptor reference {ref!r}")
        try:
            module = importlib.import_module(module_name)
        except ImportError as exc:
            raise ValueError(
                f"cannot import module {module_name!r} for interceptor {ref!r}"
            ) from exc
        target = getattr(module, attr, None)
        if target is None:
            raise ValueError(f"interceptor {attr!r} not found in {module_name!r}")
        ref = target
    if isinstance(ref, type):
        ref = ref()
    if not (hasattr(ref, "pre_read") and hasattr(ref, "pre_write")):
        raise TypeError(f"{ref!r} does not implement the interceptor hooks")
    return ref


def interceptor_refs(spark=None, operation: Optional[str] = None) -> tuple[str, ...]:
    """Comma-separated dotted-path references from (in priority order):
    ``dc43.governance.interceptors.<operation>`` Spark conf, the base
    ``dc43.governance.interceptors`` conf, then the
    ``DC43_GOVERNANCE_INTERCEPTORS`` env var (ref interceptors.py:112-137)."""
    raw = ""
    if spark is not None and operation:
        try:
            raw = spark.conf.get(f"{CONF_KEY}.{operation}", "") or ""
        except Exception:  # noqa: BLE001 — conf access must never fail IO
            raw = ""
    if spark is not None and not raw:
        try:
            raw = spark.conf.get(CONF_KEY, "") or ""
        except Exception:  # noqa: BLE001
            raw = ""
    if not raw:
        raw = os.environ.get(ENV_KEY, "")
    return tuple(part.strip() for part in raw.split(",") if part.strip())


def discover_interceptors(
    spark=None, operation: Optional[str] = None
) -> list[GovernanceInterceptor]:
    """Instantiated interceptors for the configured references. Governed
    reads/writes call this when no explicit interceptor list is passed, so
    a platform team can attach governance hooks to EVERY pipeline through
    session conf or the environment without touching pipeline code."""
    return [resolve_interceptor(ref) for ref in interceptor_refs(spark, operation)]
