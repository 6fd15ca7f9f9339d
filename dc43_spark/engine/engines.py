"""Pluggable data-quality execution engines behind one protocol.

ref: dc43-service-backends data_quality/backend/engines.py:27-212. The
reference ships three engines behind a registry:

- a **native** engine wrapping the built-in contract evaluator, and
- two **metrics-driven** engines (GreatExpectations / Soda) that do NOT
  invoke those tools — they translate run summaries carried inside the
  observation metrics (under a well-known ``metrics_key``) into the
  canonical ``ValidationResult``, with an optional suite/checks file
  feeding ``describe_expectations``.

Rebuilt here against this repo's ``Contract``/``ValidationResult`` types.
No external DQ library is required — matching the reference, which also
imports neither; the external tool runs out-of-band (its summary arrives
through the metrics payload) while Spark keeps doing the heavy scan work.

``ge_summary_from_metrics`` is the Spark-first bridge: it shapes this
engine's own single-pass metrics (engine/metrics.py) into a
GE-style run summary, so the adapter path is testable end-to-end without
Great Expectations installed — and drop-in compatible when a real GE
runner produces the summary instead.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Mapping, Optional, Protocol, Sequence

from dc43_spark.contracts.model import Contract
from dc43_spark.engine.results import ValidationResult
from dc43_spark.engine.validation import evaluate_contract
from dc43_spark.expectations.compiler import (
    expectation_plan,
    expectation_specs,
    row_predicates,
)

try:  # pragma: no cover - optional dependency (ref engines.py:21-24)
    import yaml  # type: ignore
except ImportError:  # pragma: no cover
    yaml = None  # type: ignore[assignment]


@dataclass
class ObservationPayload:
    """Schema snapshot + metrics handed to an engine for evaluation
    (ref dc43-service-clients data_quality ObservationPayload)."""

    schema: dict[str, dict[str, Any]] = field(default_factory=dict)
    metrics: dict[str, Any] = field(default_factory=dict)


class DataQualityExecutionEngine(Protocol):
    """Execution contract implemented by concrete DQ engines
    (ref engines.py:27-41)."""

    def evaluate(
        self, contract: Contract, payload: ObservationPayload
    ) -> ValidationResult:
        ...

    def describe_expectations(
        self, contract: Contract
    ) -> Sequence[Mapping[str, Any]]:
        ...


class NativeDQEngine:
    """Adapter around the built-in evaluator (ref engines.py:43-87):
    delegates to ``evaluate_contract`` and attaches the compiled
    expectation plan + predicates to the result details."""

    def __init__(
        self,
        *,
        strict_types: bool = False,
        allow_extra_columns: bool = True,
        operation: str = "write",
    ) -> None:
        self._strict_types = strict_types
        self._allow_extra_columns = allow_extra_columns
        self._operation = operation

    def evaluate(
        self, contract: Contract, payload: ObservationPayload
    ) -> ValidationResult:
        result = evaluate_contract(
            contract,
            schema=payload.schema,
            metrics=payload.metrics,
            strict_types=self._strict_types,
            allow_extra_columns=self._allow_extra_columns,
            operation=self._operation,
        )
        plan = expectation_plan(contract)
        if plan:
            result.details["expectation_plan"] = plan
            predicates = row_predicates(expectation_specs(contract))
            if predicates:
                result.details["expectation_predicates"] = predicates
        return result

    def describe_expectations(self, contract: Contract) -> Sequence[Mapping[str, Any]]:
        return expectation_plan(contract)


class _SuiteLoader:
    """Load an expectation suite / checks file for an external engine
    (ref engines.py:90-120). JSON always; YAML when available."""

    def __init__(self, path: str | Path | None) -> None:
        self._path = Path(path).expanduser() if path else None

    def load(self) -> Sequence[Mapping[str, Any]]:
        if self._path is None or not self._path.exists():
            return []
        try:
            data = self._path.read_text("utf-8")
        except OSError:
            return []
        suffix = self._path.suffix.lower()
        payload: Any
        if suffix in {".json", ".ge"}:
            try:
                payload = json.loads(data)
            except json.JSONDecodeError:
                return []
        elif suffix in {".yaml", ".yml"} and yaml is not None:
            try:
                payload = yaml.safe_load(data)
            except Exception:
                return []
        else:
            return []
        if isinstance(payload, Mapping):
            return [dict(payload)]
        if isinstance(payload, list):
            return [dict(item) for item in payload if isinstance(item, Mapping)]
        return []


class MetricsDrivenEngine:
    """Base for engines interpreting summaries emitted by external tools
    (ref engines.py:120-142): the summary lives at
    ``payload.metrics[metrics_key]``."""

    def __init__(self, *, metrics_key: str, suite_path: str | Path | None = None) -> None:
        self._metrics_key = metrics_key
        self._suite_loader = _SuiteLoader(suite_path)

    def _metrics_summary(self, payload: ObservationPayload) -> Optional[Mapping[str, Any]]:
        summary = (payload.metrics or {}).get(self._metrics_key)
        return summary if isinstance(summary, Mapping) else None

    def describe_expectations(self, contract: Contract) -> Sequence[Mapping[str, Any]]:
        suite = self._suite_loader.load()
        return suite if suite else expectation_plan(contract)


def _summary_result(
    *, engine: str, status: str, reason: Optional[str], summary: Mapping[str, Any]
) -> ValidationResult:
    """Shape an external-tool verdict into our ValidationResult: a blocking
    status carries the reason as an error (our result type derives ok/status
    from errors), anything else keeps it as detail."""
    errors = [reason] if reason and status == "block" else []
    warnings = [reason] if reason and status == "warn" else []
    return ValidationResult(
        ok=status not in {"block"},
        errors=errors,
        warnings=warnings,
        status=status,
        details={"engine": engine, **dict(summary)},
    )


class GreatExpectationsEngine(MetricsDrivenEngine):
    """Translate a Great Expectations run summary into a validation result
    (ref engines.py:144-178). Missing summary -> ``unknown`` (the run never
    happened; don't fabricate a verdict)."""

    def __init__(
        self, *, metrics_key: str = "great_expectations",
        suite_path: str | Path | None = None,
    ) -> None:
        super().__init__(metrics_key=metrics_key, suite_path=suite_path)

    def evaluate(
        self, contract: Contract, payload: ObservationPayload
    ) -> ValidationResult:
        summary = self._metrics_summary(payload)
        if not summary:
            return ValidationResult(
                ok=False,
                status="unknown",
                details={
                    "engine": "great_expectations",
                    "reason": "missing-great-expectations-summary",
                    "metrics_key": self._metrics_key,
                },
            )
        status = str(summary.get("status") or ("ok" if summary.get("success") else "block"))
        if status not in {"ok", "warn", "block", "unknown"}:
            status = "ok" if summary.get("success") else "block"
        reason = summary.get("exception_info") or summary.get("reason")
        if isinstance(reason, Mapping):
            reason = reason.get("exception_message")
        return _summary_result(
            engine="great_expectations",
            status=status,
            reason=str(reason) if reason else None,
            summary=summary,
        )


class SodaEngine(MetricsDrivenEngine):
    """Interpret Soda scan outcomes from observation metrics
    (ref engines.py:180-211)."""

    def __init__(
        self, *, metrics_key: str = "soda", checks_path: str | Path | None = None
    ) -> None:
        super().__init__(metrics_key=metrics_key, suite_path=checks_path)

    def evaluate(
        self, contract: Contract, payload: ObservationPayload
    ) -> ValidationResult:
        summary = self._metrics_summary(payload)
        if not summary:
            return ValidationResult(
                ok=False,
                status="unknown",
                details={
                    "engine": "soda",
                    "reason": "missing-soda-summary",
                    "metrics_key": self._metrics_key,
                },
            )
        outcome = str(summary.get("status") or summary.get("outcome") or "warn")
        if outcome not in {"ok", "warn", "block", "unknown"}:
            passed = str(summary.get("status", "")).lower() in {"passed", "pass"}
            outcome = "ok" if passed else "block"
        reason = summary.get("reason") or summary.get("error")
        return _summary_result(
            engine="soda",
            status=outcome,
            reason=str(reason) if reason else None,
            summary=summary,
        )


ENGINE_REGISTRY: dict[str, type] = {
    "native": NativeDQEngine,
    "great_expectations": GreatExpectationsEngine,
    "soda": SodaEngine,
}


def get_engine(name: str, **kwargs: Any) -> DataQualityExecutionEngine:
    try:
        factory = ENGINE_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown DQ engine {name!r}; have {sorted(ENGINE_REGISTRY)}"
        ) from None
    return factory(**kwargs)


def ge_summary_from_metrics(
    contract: Contract, metrics: Mapping[str, Any]
) -> dict[str, Any]:
    """Shape this engine's own single-pass metrics as a GE-style run
    summary — one 'expectation result' per compiled expectation, overall
    ``success`` iff nothing violated. Lets the GE adapter path run
    end-to-end without Great Expectations installed; a real GE runner
    producing the same shape is drop-in."""
    results = []
    for spec in expectation_specs(contract):
        count = int(metrics.get(f"violations.{spec.key}", 0) or 0)
        results.append(
            {
                "expectation_type": spec.rule,
                "column": spec.column,
                "unexpected_count": count,
                "success": count == 0,
            }
        )
    failed = [r for r in results if not r["success"]]
    return {
        "success": not failed,
        "statistics": {
            "evaluated_expectations": len(results),
            "unsuccessful_expectations": len(failed),
        },
        "results": results,
        "reason": (
            f"{len(failed)} expectation(s) failed: "
            + ", ".join(f"{r['expectation_type']}({r['column']})" for r in failed)
            if failed
            else None
        ),
    }
