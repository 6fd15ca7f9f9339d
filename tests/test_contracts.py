from __future__ import annotations

from pyspark.sql import types as T

from dc43_spark.contracts import (
    Contract,
    QualityRule,
    SchemaObject,
    SchemaProperty,
    canonical_type,
    contract_from_dict,
    contract_to_struct_type,
    odcs_to_spark_type,
    spark_to_odcs_type,
)
from dc43_spark.contracts.types import parse_decimal, types_compatible


def orders_contract() -> Contract:
    """The canonical orders fixture (FIXTURES.md F1, ref tests/helpers/orders.py)."""
    return Contract(
        id="test.orders",
        version="0.1.0",
        schema_objects=[
            SchemaObject(
                name="orders",
                properties=[
                    SchemaProperty("order_id", "bigint", required=True),
                    SchemaProperty("customer_id", "bigint", required=True),
                    SchemaProperty("order_ts", "timestamp", required=True),
                    SchemaProperty(
                        "amount", "double", required=True,
                        quality=[QualityRule("gt", 0.0)],
                    ),
                    SchemaProperty(
                        "currency", "string", required=True,
                        quality=[QualityRule("enum", ["EUR", "USD"])],
                    ),
                ],
            )
        ],
    )


def test_type_mapping_roundtrip():
    for odcs, spark_t in [
        ("string", T.StringType()),
        ("bigint", T.LongType()),
        ("int", T.IntegerType()),
        ("smallint", T.ShortType()),
        ("tinyint", T.ByteType()),
        ("float", T.FloatType()),
        ("double", T.DoubleType()),
        ("boolean", T.BooleanType()),
        ("date", T.DateType()),
        ("timestamp", T.TimestampType()),
        ("binary", T.BinaryType()),
    ]:
        assert odcs_to_spark_type(odcs) == spark_t
        assert spark_to_odcs_type(spark_t) == odcs


def test_aliases():
    assert canonical_type("varchar") == "string"
    assert canonical_type("long") == "bigint"
    assert canonical_type("Integer") == "int"
    assert canonical_type("BOOL") == "boolean"


def test_decimal_precision_preserved():
    # the reference DROPS precision/scale (contracts.py:236-237); we keep it
    assert odcs_to_spark_type("decimal(12,2)") == T.DecimalType(12, 2)
    assert odcs_to_spark_type("numeric(5)") == T.DecimalType(5, 0)
    assert odcs_to_spark_type("decimal") == T.DecimalType(10, 0)
    assert parse_decimal("decimal(38,18)") == (38, 18)
    assert spark_to_odcs_type(T.DecimalType(12, 2)) == "decimal(12,2)"


def test_types_compatible():
    assert types_compatible("bigint", "int")
    assert not types_compatible("bigint", "int", strict=True)
    assert not types_compatible("int", "bigint")
    assert types_compatible("double", "float")
    assert not types_compatible("string", "int")


def test_timestamp_ntz_widens_not_blocks():
    # Spark 4 surfaces parquet TIMESTAMP as timestamp_ntz; either direction
    # is a widening (warn), never a mismatch (block)
    assert types_compatible("timestamp", "timestamp_ntz")
    assert types_compatible("timestamp_ntz", "timestamp")
    assert not types_compatible("timestamp", "timestamp_ntz", strict=True)
    assert not types_compatible("timestamp", "date")


def test_contract_to_struct_type():
    st = contract_to_struct_type(orders_contract())
    assert st.fieldNames() == ["order_id", "customer_id", "order_ts", "amount", "currency"]
    assert st["amount"].dataType == T.DoubleType()
    assert st["order_id"].nullable is False


def test_nested_struct_and_array():
    c = Contract(
        id="t.nested",
        version="0.1.0",
        schema_objects=[
            SchemaObject(
                name="n",
                properties=[
                    SchemaProperty(
                        "meta",
                        properties=[
                            SchemaProperty("k", "string", required=True),
                            SchemaProperty("v", "int"),
                        ],
                    ),
                    SchemaProperty("tags", items=SchemaProperty("element", "string")),
                ],
            )
        ],
    )
    st = contract_to_struct_type(c)
    assert isinstance(st["meta"].dataType, T.StructType)
    assert st["meta"].dataType["k"].dataType == T.StringType()
    assert st["tags"].dataType == T.ArrayType(T.StringType(), containsNull=True)


def test_json_roundtrip():
    c = orders_contract()
    d = c.to_dict()
    c2 = contract_from_dict(d)
    assert c2.id == c.id and c2.version == c.version
    assert [p.name for p in c2.iter_properties()] == [p.name for p in c.iter_properties()]
    assert c2.schema_object.properties[3].quality[0].rule == "gt"
    assert c2.to_dict() == d


def test_odcs_must_be_spellings():
    q = QualityRule.from_dict({"mustBeGreaterThan": 0})
    assert q.rule == "gt" and q.value == 0
    q = QualityRule.from_dict({"mustBeLessOrEqualTo": 10, "severity": "warning"})
    assert q.rule == "le" and q.value == 10 and q.severity == "warning"
