from __future__ import annotations

from datetime import datetime, timezone

from dc43_spark.contracts import Contract, QualityRule, SchemaObject, SchemaProperty
from dc43_spark.contracts.drafting import (
    contract_from_dataframe,
    draft_on_violation,
    draft_version,
)
from dc43_spark.engine import evaluate_dataframe

FIXED_CLOCK = lambda: datetime(2026, 1, 2, 3, 4, 5, tzinfo=timezone.utc)  # noqa: E731
FIXED_UUID = lambda: "abcd1234"  # noqa: E731


def orders_contract() -> Contract:
    return Contract(
        id="test.orders", version="0.1.0",
        schema_objects=[
            SchemaObject(
                name="orders",
                properties=[
                    SchemaProperty("order_id", "bigint", required=True),
                    SchemaProperty("amount", "double", required=True, quality=[QualityRule("gt", 0.0)]),
                    SchemaProperty("currency", "string", required=True, quality=[QualityRule("enum", ["EUR", "USD"])]),
                ],
            )
        ],
    )


def test_contract_from_dataframe(spark):
    df = spark.createDataFrame([(1, 10.0, "EUR", ["a"])], "id long, amt double, cur string, tags array<string>")
    c = contract_from_dataframe(df, contract_id="infer.orders")
    assert c.status == "draft" and c.version == "0.1.0"
    props = {p.name: p for p in c.iter_properties()}
    assert props["id"].physical_type == "bigint"
    assert props["amt"].physical_type == "double"
    assert props["tags"].items.physical_type == "string"


def test_draft_version_deterministic():
    v = draft_version("0.1.0", dataset_id="path:/x/y", pipeline="p1",
                      clock=FIXED_CLOCK, uuid8=FIXED_UUID)
    assert v == "0.2.0-draft-path--x-y-p1-20260102T030405-abcd1234"


def test_draft_on_violation(spark):
    df = spark.createDataFrame(
        [(1, -5.0, "GBP", "x"), (None, 10.0, "EUR", "y")],
        "order_id long, amount double, currency string, note string",
    )
    c = orders_contract()
    validation = evaluate_dataframe(df, c, operation="write")
    assert validation.status == "block"
    res = draft_on_violation(
        c, validation=validation, observed_df=df,
        dataset_id="ds", pipeline="p", clock=FIXED_CLOCK, uuid8=FIXED_UUID,
    )
    draft = res.contract
    assert draft.status == "draft" and draft.version.startswith("0.2.0-draft-")
    props = {p.name: p for p in draft.iter_properties()}
    assert props["order_id"].required is False  # relaxed (null observed)
    assert props["amount"].quality == []  # gt rule dropped
    assert props["currency"].quality[0].value == ["EUR", "GBP", "USD"]  # widened
    assert "note" in props and props["note"].required is False  # extra col added
    kinds = {c.kind for c in res.changes}
    assert kinds == {"relaxed_required", "removed_rule", "widened_enum", "added_column"}
    # original contract untouched
    assert orders_contract().schema_object.properties[1].quality[0].rule == "gt"
    assert draft.custom_properties["draft_base_version"] == "0.1.0"


def test_draft_keeps_passing_rules(spark):
    df = spark.createDataFrame([(1, -1.0, "EUR")], "order_id long, amount double, currency string")
    c = orders_contract()
    validation = evaluate_dataframe(df, c, operation="write")
    res = draft_on_violation(c, validation=validation, observed_df=df)
    props = {p.name: p for p in res.contract.iter_properties()}
    assert props["currency"].quality[0].value == ["EUR", "USD"]  # enum untouched
    assert props["order_id"].required is True


def test_enum_widening_bounded_on_high_cardinality_drift(spark):
    """A drifted 'enum' column that became effectively free text must DROP
    the rule instead of collecting every distinct value to the driver."""
    from dc43_spark.contracts.drafting import draft_on_violation
    from dc43_spark.contracts.model import (
        Contract, QualityRule, SchemaObject, SchemaProperty,
    )
    from dc43_spark.engine.results import ValidationResult

    contract = Contract(
        id="c", version="1.0.0",
        schema_objects=[SchemaObject(
            name="t",
            properties=[SchemaProperty(
                "k", "string", quality=[QualityRule("enum", ["a", "b"])]
            )],
        )],
    )
    df = spark.range(5000).selectExpr("concat('v', id) AS k")
    validation = ValidationResult(
        ok=False, errors=["enum_k"], warnings=[],
        metrics={"violations.enum_k": 5000}, schema={}, status="block",
        details={},
    )
    draft = draft_on_violation(
        contract, validation=validation, observed_df=df, dataset_id="d"
    )
    kinds = {c.kind for c in draft.changes}
    assert "dropped_enum" in kinds
    enum_rules = [
        r for p in draft.contract.schema_object.properties for r in p.quality
        if r.rule == "enum"
    ]
    assert enum_rules == []
