"""End-to-end Delta branch of S6 (MERGE) + S7 (time travel), env-gated.

delta-spark is not installed in this container, so these tests SKIP here —
but they light up unchanged the moment the environment gains delta-spark,
executing the primary (transactional, file-pruned) merge strategy and a
real ``versionAsOf`` read instead of the parquet fallbacks
(ref dc43-integrations spark/io/merge.py:43-127, locators.py:490-509)."""

from __future__ import annotations

import pytest

from dc43_spark.io.merge import delta_available, merge_with_contract
from dc43_spark.io.locators import delta_time_travel_options
from dc43_spark.io.read import ReadRequest, load_dataframe

pytestmark = pytest.mark.skipif(
    not delta_available(), reason="delta-spark not installed in this environment"
)

SCHEMA = "k long, v string, amount double"


@pytest.fixture(scope="module")
def delta_spark():
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("dc43-delta-tests")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
        .config("spark.ui.enabled", "false")
    )
    spark = configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark
    spark.stop()


def _contract():
    from dc43_spark.contracts import Contract, SchemaObject, SchemaProperty

    return Contract(
        id="test.delta_merge",
        version="0.1.0",
        schema_objects=[
            SchemaObject(
                name="t",
                properties=[
                    SchemaProperty("k", "bigint", required=True),
                    SchemaProperty("v", "string"),
                    SchemaProperty("amount", "double"),
                ],
            )
        ],
    )


def test_delta_merge_end_to_end(delta_spark, tmp_path):
    target = str(tmp_path / "t")
    base = delta_spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA)
    first = merge_with_contract(
        delta_spark, base, _contract(), keys=["k"], path=target, format="delta"
    )
    assert first.strategy == "initial-write"

    src = delta_spark.createDataFrame([(2, "B", 20.0), (3, "c", 3.0)], SCHEMA)
    res = merge_with_contract(
        delta_spark, src, _contract(), keys=["k"], path=target, format="delta"
    )
    assert res.strategy == "delta"  # the transactional branch actually ran
    assert sorted(tuple(r) for r in delta_spark.read.format("delta").load(target).collect()) == [
        (1, "a", 1.0), (2, "B", 20.0), (3, "c", 3.0),
    ]


def test_delta_time_travel_read(delta_spark, tmp_path):
    target = str(tmp_path / "t")
    base = delta_spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    merge_with_contract(
        delta_spark, base, _contract(), keys=["k"], path=target, format="delta"
    )
    src = delta_spark.createDataFrame([(1, "A", 10.0)], SCHEMA)
    merge_with_contract(
        delta_spark, src, _contract(), keys=["k"], path=target, format="delta"
    )
    # versionAsOf=0 must read the pre-merge state through the S7 option path
    request = ReadRequest(
        path=target, format="delta", options=delta_time_travel_options(version=0)
    )
    old = load_dataframe(delta_spark, request)
    assert [tuple(r) for r in old.collect()] == [(1, "a", 1.0)]
