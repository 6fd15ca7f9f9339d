from __future__ import annotations

from dc43_spark.contracts import Contract, QualityRule, SchemaObject, SchemaProperty
from dc43_spark.engine.metrics import compute_metrics
from dc43_spark.engine.validation import evaluate_contract
from dc43_spark.contracts.schema import schema_snapshot
from dc43_spark.testing import synthetic_dataframe


def contract() -> Contract:
    return Contract(
        id="test.synth",
        version="0.1.0",
        status="active",
        schema_objects=[
            SchemaObject(
                name="t",
                properties=[
                    SchemaProperty("order_id", "bigint", required=True,
                                   quality=[QualityRule("unique", True)]),
                    SchemaProperty("amount", "double", required=True,
                                   quality=[QualityRule("gt", 0.0), QualityRule("le", 500.0)]),
                    SchemaProperty("currency", "string", required=True,
                                   quality=[QualityRule("enum", ["EUR", "USD", "GBP"])]),
                    SchemaProperty("flag", "boolean"),
                    SchemaProperty("created", "timestamp"),
                    SchemaProperty("note", "string"),
                ],
            )
        ],
    )


def test_synthetic_satisfies_contract(spark):
    df = synthetic_dataframe(spark, contract(), n_rows=500, seed=7)
    assert df.count() == 500
    metrics = compute_metrics(df, contract())
    result = evaluate_contract(
        contract(), schema=schema_snapshot(df), metrics=metrics, operation="write"
    )
    assert result.ok, (result.errors, result.warnings)
    assert result.violations_total == 0

    amounts = [r.amount for r in df.select("amount").collect()]
    assert all(0 < a <= 500.0 for a in amounts)
    currencies = {r.currency for r in df.select("currency").collect()}
    assert currencies <= {"EUR", "USD", "GBP"}


def test_synthetic_is_deterministic(spark):
    a = synthetic_dataframe(spark, contract(), n_rows=50, seed=7).collect()
    b = synthetic_dataframe(spark, contract(), n_rows=50, seed=7).collect()
    c = synthetic_dataframe(spark, contract(), n_rows=50, seed=8).collect()
    assert a == b
    assert a != c


def test_synthetic_violations_injected(spark):
    df = synthetic_dataframe(
        spark, contract(), n_rows=1000, seed=7, violation_fraction=0.1
    )
    metrics = compute_metrics(df, contract())
    assert metrics["violations.enum_currency"] > 0 or metrics["violations.not_null_currency"] > 0
    assert metrics["violations.not_null_order_id"] > 0


def test_synthetic_null_fraction(spark):
    df = synthetic_dataframe(
        spark, contract(), n_rows=1000, seed=7, null_fraction=0.2
    )
    n_null = df.filter("note IS NULL").count()
    assert 100 < n_null < 320  # ~20%
    # required columns never nulled by null_fraction
    assert df.filter("order_id IS NULL").count() == 0
