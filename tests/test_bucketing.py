from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.bucketing import (
    BucketSpec,
    colocated_join,
    shuffle_exchanges,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"
SPEC = BucketSpec(keys=("o_custkey",), buckets=8)


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so the assertion targets shuffle placement, not
    the (orthogonal) broadcast decision."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet").withColumn(
        "o_custkey", F.col("c_custkey")
    )
    write_bucketed(orders, "b_orders", SPEC, path=str(tmp_path / "b_orders"))
    write_bucketed(customer, "b_customer", SPEC, path=str(tmp_path / "b_customer"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_colocated_join_has_no_shuffle(spark, no_broadcast, bucketed_tables):
    joined = colocated_join(spark, "b_orders", "b_customer", SPEC)
    assert shuffle_exchanges(joined) == 0
    # and it still computes the right thing
    expect = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert joined.count() == expect


def test_unbucketed_join_shuffles_both_sides(spark, no_broadcast):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    joined = orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
    assert shuffle_exchanges(joined) == 2


def test_bucketed_agg_on_key_has_no_shuffle(spark, bucketed_tables):
    agg = spark.table("b_orders").groupBy("o_custkey").agg(F.count("*").alias("n"))
    assert shuffle_exchanges(agg) == 0


def test_bucket_spec_validation():
    with pytest.raises(ValueError):
        BucketSpec(keys=(), buckets=8)
    with pytest.raises(ValueError):
        BucketSpec(keys=("k",), buckets=0)
