"""local_df: driver-local frames must scan JVM-only and stay
value-identical to the legacy ``createDataFrame(list)`` path (r14 —
the pickle path runs one Python worker task per default-parallelism
slice, which dominated the table-format gates' executor run time)."""

import datetime
import decimal

import pytest
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from dc43_spark.localdf import local_df


TYPED = StructType(
    [
        StructField("s", StringType()),
        StructField("n", LongType()),
        StructField("d", DateType()),
        StructField("ts", TimestampType()),
        StructField("dec", DecimalType(12, 2)),
        StructField("b", BooleanType()),
        StructField("f", DoubleType()),
        StructField("arr", ArrayType(LongType())),
        StructField("blob", BinaryType()),
    ]
)
TYPED_ROWS = [
    (
        "a",
        1,
        datetime.date(2024, 1, 2),
        datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
        decimal.Decimal("12.34"),
        True,
        1.5,
        [1, 2],
        b"\x00\xff",
    ),
    (None, None, None, None, None, None, None, None, None),
    (
        "b",
        2**40,
        datetime.date(1970, 1, 1),
        datetime.datetime(1999, 12, 31, 23, 59, 59),
        decimal.Decimal("0.01"),
        False,
        -2.5,
        [],
        b"",
    ),
]


def test_values_match_legacy_path(spark):
    legacy = spark.createDataFrame(TYPED_ROWS, TYPED)
    fast = local_df(spark, TYPED_ROWS, TYPED)
    assert fast.schema == legacy.schema
    assert sorted(map(tuple, fast.collect()), key=str) == sorted(
        map(tuple, legacy.collect()), key=str
    )


def test_no_python_eval_in_plan(spark):
    df = local_df(spark, [("x", 1)], "a string, b long")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan
    assert "Scan ExistingRDD" not in plan, plan


def test_empty_frame(spark):
    df = local_df(spark, [], "a string, b long")
    assert df.collect() == []
    assert df.schema.simpleString() == "struct<a:string,b:bigint>"
    assert df.rdd.getNumPartitions() == 0


def test_coalesce_single_partition(spark):
    df = local_df(spark, [(str(i),) for i in range(10)], "s string", coalesce=1)
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 10


def test_partitions_capped_by_rows(spark):
    # one row per partition up to defaultParallelism — never empty slices
    df = local_df(spark, [("a",), ("b",)], "s string")
    assert df.rdd.getNumPartitions() == 2


def test_fallback_types_still_work(spark):
    # map values ride the legacy path if Arrow conversion declines
    schema = StructType([StructField("m", MapType(StringType(), LongType()))])
    df = local_df(spark, [({"k": 1},)], schema)
    assert df.collect()[0].m == {"k": 1}


def test_ddl_and_structtype_schemas_agree(spark):
    a = local_df(spark, [("x", 3)], "a string, b long")
    b = local_df(
        spark,
        [("x", 3)],
        StructType([StructField("a", StringType()), StructField("b", LongType())]),
    )
    assert a.schema.simpleString() == b.schema.simpleString()
    assert a.collect() == b.collect()
