"""Schema align/cast + contract evaluation + verdicts.

- ``apply_contract``     ref: dc43-integrations spark/validation.py:20-60
- ``evaluate_contract``  ref: dc43-service-backends data_quality/backend/engine.py:192-307
- verdict rules          ref: governance/backend/local.py:1958-2016
  (errors -> block; rule violations > 0 -> block on WRITE but only warn on
  READ; required/not-null failures escalate to error regardless of severity)
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dc43_spark.contracts.model import Contract
from dc43_spark.contracts.schema import property_to_spark_type, schema_snapshot
from dc43_spark.contracts.types import canonical_type, types_compatible
from dc43_spark.engine.metrics import compute_metrics
from dc43_spark.engine.results import ValidationResult
from dc43_spark.expectations.compiler import ExpectationSpec, expectation_specs


def apply_contract(
    df: DataFrame,
    contract: Contract,
    *,
    auto_cast: bool = True,
    keep_extra_columns: bool = False,
) -> DataFrame:
    """Align a DataFrame to the contract schema (lazy projection only).

    - reorder columns to contract order
    - cast each to the contract type (when ``auto_cast``)
    - synthesize missing columns as typed NULLs
    - keep extra columns at the end, or prune them (default)
    """
    existing = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for prop in contract.schema_object.properties:
        target = property_to_spark_type(prop)
        if prop.name in existing:
            col = F.col(prop.name)
            if auto_cast and existing[prop.name] != target:
                col = col.cast(target)
            cols.append(col.alias(prop.name))
        else:
            cols.append(F.lit(None).cast(target).alias(prop.name))
    if keep_extra_columns:
        contract_names = {p.name for p in contract.schema_object.properties}
        cols.extend(F.col(n) for n in df.columns if n not in contract_names)
    return df.select(*cols)


def evaluate_contract(
    contract: Contract,
    *,
    schema: dict[str, dict[str, Any]],
    metrics: dict[str, Any],
    strict_types: bool = False,
    allow_extra_columns: bool = True,
    operation: str = "read",
) -> ValidationResult:
    """Compare an observed schema + metric payload against the contract and
    derive the verdict. Pure driver-side logic (no Spark)."""
    errors: list[str] = []
    warnings: list[str] = []
    specs = expectation_specs(contract)
    spec_by_key = {s.key: s for s in specs}

    for prop in contract.schema_object.properties:
        observed = schema.get(prop.name)
        if observed is None:
            msg = f"missing column: {prop.name}"
            (errors if prop.required else warnings).append(msg)
            continue
        expected_t = canonical_type(prop.physical_type)
        observed_t = canonical_type(str(observed.get("odcs_type", observed.get("backend_type", ""))))
        if prop.properties or prop.items is not None:
            continue  # nested types compared structurally by apply_contract
        if not types_compatible(expected_t, observed_t, strict=strict_types):
            errors.append(
                f"type mismatch for {prop.name}: expected {expected_t}, observed {observed_t}"
            )
        elif expected_t != observed_t:
            warnings.append(
                f"type widening for {prop.name}: expected {expected_t}, observed {observed_t}"
            )
    if not allow_extra_columns:
        contract_names = {p.name for p in contract.schema_object.properties}
        for name in schema:
            if name not in contract_names:
                warnings.append(f"extra column: {name}")

    blocking_violations = 0
    for key, value in metrics.items():
        if not key.startswith("violations."):
            continue
        count = int(value or 0)
        if count <= 0:
            continue
        spec: Optional[ExpectationSpec] = spec_by_key.get(key[len("violations.") :])
        msg = f"expectation {key[len('violations.'):]} violated by {count} rows"
        if spec is not None and spec.rule == "not_null":
            errors.append(msg)  # required-column failures always escalate
        elif spec is not None and spec.optional:
            warnings.append(msg)
        else:
            blocking_violations += count
            if operation == "write":
                errors.append(msg)
            else:
                warnings.append(msg)

    status = "ok"
    if errors:
        status = "block"
    elif warnings:
        status = "warn"
    result = ValidationResult(
        ok=not errors,
        errors=errors,
        warnings=warnings,
        metrics=dict(metrics),
        schema=dict(schema),
        status=status,
        details={"operation": operation, "blocking_violations": blocking_violations},
    )
    return result


def evaluate_dataframe(
    df: DataFrame,
    contract: Contract,
    *,
    operation: str = "read",
    strict_types: bool = False,
    unique_strategy: str = "exact",
) -> ValidationResult:
    """One-stop: snapshot schema, compute single-pass metrics, evaluate."""
    snapshot = schema_snapshot(df)
    metrics = compute_metrics(df, contract, unique_strategy=unique_strategy)
    return evaluate_contract(
        contract,
        schema=snapshot,
        metrics=metrics,
        strict_types=strict_types,
        operation=operation,
    )
