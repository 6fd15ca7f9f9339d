from __future__ import annotations

import pytest
from pyspark.sql import types as T

from dc43_spark.contracts import Contract, QualityRule, SchemaObject, SchemaProperty, schema_snapshot
from dc43_spark.engine import apply_contract, evaluate_contract, evaluate_dataframe


def orders_contract(amount_type: str = "double") -> Contract:
    return Contract(
        id="test.orders", version="0.1.0",
        schema_objects=[
            SchemaObject(
                name="orders",
                properties=[
                    SchemaProperty("order_id", "bigint", required=True),
                    SchemaProperty("customer_id", "bigint", required=True),
                    SchemaProperty("amount", amount_type, required=True, quality=[QualityRule("gt", 0.0)]),
                    SchemaProperty("currency", "string", required=True, quality=[QualityRule("enum", ["EUR", "USD"])]),
                ],
            )
        ],
    )


@pytest.fixture(scope="module")
def good_df(spark):
    return spark.createDataFrame(
        [(1, 101, 10.0, "EUR"), (2, 102, 20.5, "USD")],
        "order_id long, customer_id long, amount double, currency string",
    )


def test_apply_contract_reorders_and_prunes(spark):
    df = spark.createDataFrame(
        [("EUR", 10.0, 1, 101, "x")],
        "currency string, amount double, order_id long, customer_id long, note string",
    )
    out = apply_contract(df, orders_contract())
    assert out.columns == ["order_id", "customer_id", "amount", "currency"]
    out2 = apply_contract(df, orders_contract(), keep_extra_columns=True)
    assert out2.columns == ["order_id", "customer_id", "amount", "currency", "note"]


def test_apply_contract_casts(spark):
    # string-typed amount auto-cast (ref test_spark_validation.py:43-55)
    df = spark.createDataFrame(
        [(1, 101, "10.5", "EUR")],
        "order_id long, customer_id long, amount string, currency string",
    )
    out = apply_contract(df, orders_contract())
    assert dict(out.dtypes)["amount"] == "double"
    assert out.collect()[0]["amount"] == 10.5
    out_nocast = apply_contract(df, orders_contract(), auto_cast=False)
    assert dict(out_nocast.dtypes)["amount"] == "string"


def test_apply_contract_missing_column_null(spark):
    df = spark.createDataFrame([(1, 101, 5.0)], "order_id long, customer_id long, amount double")
    out = apply_contract(df, orders_contract())
    row = out.collect()[0]
    assert row["currency"] is None
    assert out.schema["currency"].dataType == T.StringType()


def test_apply_contract_decimal(spark):
    df = spark.createDataFrame([(1, 101, 10.555, "EUR")],
                               "order_id long, customer_id long, amount double, currency string")
    out = apply_contract(df, orders_contract("decimal(12,2)"))
    assert out.schema["amount"].dataType == T.DecimalType(12, 2)


def test_evaluate_ok(good_df):
    res = evaluate_dataframe(good_df, orders_contract())
    assert res.ok and res.status == "ok"
    assert res.metrics["row_count"] == 2


def test_evaluate_read_vs_write_verdict(spark):
    bad = spark.createDataFrame(
        [(1, 101, -4.0, "EUR")],
        "order_id long, customer_id long, amount double, currency string",
    )
    r_read = evaluate_dataframe(bad, orders_contract(), operation="read")
    assert r_read.ok and r_read.status == "warn"  # violations warn on read
    r_write = evaluate_dataframe(bad, orders_contract(), operation="write")
    assert not r_write.ok and r_write.status == "block"  # ...block on write


def test_required_null_always_blocks(spark):
    df = spark.createDataFrame(
        [(None, 101, 4.0, "EUR")],
        "order_id long, customer_id long, amount double, currency string",
    )
    res = evaluate_dataframe(df, orders_contract(), operation="read")
    assert not res.ok and res.status == "block"


def test_missing_required_column_blocks(good_df):
    snap = schema_snapshot(good_df.drop("currency"))
    res = evaluate_contract(orders_contract(), schema=snap, metrics={"row_count": 2})
    assert not res.ok and any("missing column: currency" in e for e in res.errors)


def test_type_mismatch(good_df):
    c = orders_contract()
    c.schema_objects[0].properties[2] = SchemaProperty("amount", "boolean", required=True)
    snap = schema_snapshot(good_df)
    res = evaluate_contract(c, schema=snap, metrics={"row_count": 2})
    assert not res.ok and any("type mismatch" in e for e in res.errors)


def test_widening_is_warning(spark):
    df = spark.createDataFrame([(1,)], "x int")  # int observed, bigint expected
    c = Contract(
        id="t.w", version="0.1.0",
        schema_objects=[SchemaObject(name="w", properties=[SchemaProperty("x", "bigint")])],
    )
    res = evaluate_contract(c, schema=schema_snapshot(df), metrics={"row_count": 1})
    assert res.ok and res.status == "warn"
    res_strict = evaluate_contract(
        c, schema=schema_snapshot(df), metrics={"row_count": 1}, strict_types=True
    )
    assert not res_strict.ok
