"""Contract drafting: infer from DataFrames, propose drafts on drift/violation.

ref: dc43-integrations spark/contracts.py:105-191 (contract from DataFrame)
and dc43-service-backends contracts/backend/drafting.py:204-543
(draft-on-violation: relax ``required``, widen enums from observed values,
drop violated range rules; change-log; draft version suffix
``-draft-<dataset>-<pipeline>-<ts>-<uuid8>``, drafting.py:50-75).

Clock and uuid are injectable for deterministic tests (SURVEY §7.4).
"""

from __future__ import annotations

import uuid as _uuid
from dataclasses import dataclass, field, replace
from datetime import datetime, timezone
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from dc43_spark.contracts.model import Contract, QualityRule, SchemaObject, SchemaProperty
from dc43_spark.contracts.types import spark_to_odcs_type
from dc43_spark.contracts.versioning import SemVer
from dc43_spark.engine.results import ValidationResult


def _now_utc() -> datetime:
    return datetime.now(timezone.utc)


def _uuid8() -> str:
    return _uuid.uuid4().hex[:8]


def _field_to_property(f: T.StructField) -> SchemaProperty:
    if isinstance(f.dataType, T.StructType):
        return SchemaProperty(
            name=f.name,
            physical_type="object",
            required=not f.nullable,
            properties=[_field_to_property(sub) for sub in f.dataType.fields],
        )
    if isinstance(f.dataType, T.ArrayType):
        elem = T.StructField("element", f.dataType.elementType, f.dataType.containsNull)
        return SchemaProperty(
            name=f.name,
            physical_type="array",
            required=not f.nullable,
            items=_field_to_property(elem),
        )
    return SchemaProperty(
        name=f.name,
        physical_type=spark_to_odcs_type(f.dataType),
        required=not f.nullable,
    )


def contract_from_dataframe(
    df: DataFrame,
    *,
    contract_id: str,
    version: str = "0.1.0",
    name: Optional[str] = None,
    status: str = "draft",
) -> Contract:
    """Infer a draft contract from an observed DataFrame schema."""
    return Contract(
        id=contract_id,
        version=version,
        status=status,
        schema_objects=[
            SchemaObject(
                name=name or contract_id.rsplit(".", 1)[-1],
                properties=[_field_to_property(f) for f in df.schema.fields],
            )
        ],
    )


@dataclass
class DraftChange:
    kind: str  # relaxed_required | widened_enum | removed_rule | added_column | retyped_column
    column: Optional[str]
    detail: str


@dataclass
class DraftResult:
    contract: Contract
    changes: list[DraftChange] = field(default_factory=list)


def draft_version(
    base_version: str,
    *,
    dataset_id: str = "dataset",
    pipeline: str = "pipeline",
    clock: Callable[[], datetime] = _now_utc,
    uuid8: Callable[[], str] = _uuid8,
) -> str:
    """``<minor-bumped>-draft-<dataset>-<pipeline>-<ts>-<uuid8>`` (ref :50-75)."""
    bumped = SemVer.parse(base_version).bump("minor")
    ts = clock().strftime("%Y%m%dT%H%M%S")
    safe = lambda s: "".join(ch if ch.isalnum() else "-" for ch in s)  # noqa: E731
    return f"{bumped}-draft-{safe(dataset_id)}-{safe(pipeline)}-{ts}-{uuid8()}"


def draft_on_violation(
    contract: Contract,
    *,
    validation: ValidationResult,
    observed_df: Optional[DataFrame] = None,
    observed_enum_values: Optional[dict[str, list[str]]] = None,
    dataset_id: str = "dataset",
    pipeline: str = "pipeline",
    clock: Callable[[], datetime] = _now_utc,
    uuid8: Callable[[], str] = _uuid8,
) -> DraftResult:
    """Propose a draft that would accept the observed data (ref :204-543).

    - columns that failed ``not_null`` -> ``required=False``
    - enum rules that failed -> widened with observed values (when supplied
      via ``observed_enum_values`` or computable from ``observed_df``)
    - violated range rules (gt/ge/lt/le) and regex rules -> removed
    - extra observed columns -> appended as optional properties
    """
    changes: list[DraftChange] = []
    violated = {
        key[len("violations.") :]
        for key, v in validation.metrics.items()
        if key.startswith("violations.") and int(v or 0) > 0
    }

    enum_values = dict(observed_enum_values or {})
    new_props: list[SchemaProperty] = []
    for prop in contract.schema_object.properties:
        p = replace(prop, quality=list(prop.quality))
        if f"not_null_{p.name}" in violated and p.required:
            p = replace(p, required=False)
            changes.append(DraftChange("relaxed_required", p.name, "required -> false"))
        new_quality: list[QualityRule] = []
        for rule in p.quality:
            key = f"{rule.rule}_{p.name}"
            if key not in violated:
                new_quality.append(rule)
                continue
            if rule.rule == "enum":
                observed = enum_values.get(p.name)
                too_many = False
                if observed is None and observed_df is not None:
                    # BOUNDED collect: a drifted column may no longer be
                    # enum-like (free text), and distinct() on it would
                    # stream millions of values to the driver. cap+1 rows
                    # answer "is this still an enum?" without the flood.
                    cap = 1000
                    rows = (
                        observed_df.select(p.name).distinct().limit(cap + 1).collect()
                    )
                    observed = [r[0] for r in rows if r[0] is not None]
                    too_many = len(rows) > cap
                if too_many:
                    changes.append(
                        DraftChange(
                            "dropped_enum", p.name,
                            "observed cardinality exceeds enum bounds; rule dropped",
                        )
                    )
                else:
                    widened = sorted(set(rule.value or []) | set(observed or []))
                    new_quality.append(replace(rule, value=widened))
                    changes.append(
                        DraftChange(
                            "widened_enum", p.name,
                            f"enum {sorted(rule.value or [])} -> {widened}",
                        )
                    )
            else:
                changes.append(
                    DraftChange("removed_rule", p.name, f"dropped {rule.rule} rule")
                )
        p = replace(p, quality=new_quality)
        new_props.append(p)

    if observed_df is not None:
        known = {p.name for p in new_props}
        for f in observed_df.schema.fields:
            if f.name not in known:
                extra = _field_to_property(f)
                extra.required = False
                new_props.append(extra)
                changes.append(
                    DraftChange("added_column", f.name, f"observed extra column ({extra.physical_type})")
                )

    version = draft_version(
        contract.version,
        dataset_id=dataset_id,
        pipeline=pipeline,
        clock=clock,
        uuid8=uuid8,
    )
    draft = Contract(
        id=contract.id,
        version=version,
        status="draft",
        schema_objects=[
            SchemaObject(
                name=contract.schema_object.name,
                properties=new_props,
                quality=list(contract.schema_object.quality),
            )
        ],
        servers=list(contract.servers),
        custom_properties={
            **contract.custom_properties,
            "draft_base_version": contract.version,
            "draft_changes": [
                {"kind": c.kind, "column": c.column, "detail": c.detail} for c in changes
            ],
        },
    )
    return DraftResult(contract=draft, changes=changes)
