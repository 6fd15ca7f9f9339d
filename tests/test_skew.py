from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dc43_spark.functions.skew import salted_join, two_phase_distinct

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


@pytest.fixture(scope="module")
def customer(spark):
    return spark.read.parquet(f"{SF_DIR}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )


def test_salted_inner_join_row_identical(orders, customer):
    plain = orders.join(customer, on=["o_custkey"]).groupBy("o_custkey").count()
    salted = salted_join(orders, customer, on=["o_custkey"], salt=4).groupBy(
        "o_custkey"
    ).count()
    assert {(r.o_custkey, r["count"]) for r in salted.collect()} == {
        (r.o_custkey, r["count"]) for r in plain.collect()
    }


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k long, v string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k long, w string")
    out = salted_join(left, right, on=["k"], salt=3, how="left").collect()
    got = {r.k: r.w for r in out}
    assert got == {1: "x", 2: "y", 99: None}
    assert len(out) == 3  # unmatched row appears ONCE, not once per salt


def test_salt_actually_spreads_rows(spark):
    """A single hot key lands in multiple shuffle partitions (broadcast is
    disabled — a broadcast join has no shuffle and thus no skew problem)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE's skew-join splits the hot partition on its own (good! — but this
    # test demonstrates the MANUAL technique, so switch the automatic one
    # off), and AQE coalescing would re-merge these KB-sized test partitions
    # that at real scale would stay separate
    prev_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        # key must be data-dependent: a literal key constant-folds into a
        # filter + cartesian plan with no shuffle at all. 95% of rows share
        # key 7, the rest spread over 0..99.
        hot = spark.range(0, 10_000).select(
            F.when(F.col("id") % 100 < 95, F.lit(7))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id"),
        )
        dim = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "k long, w string")

        def hot_key_spread(df):
            """Distinct shuffle partitions holding the hot key's rows."""
            return (
                df.withColumn("p", F.spark_partition_id())
                .filter(F.col("k") == 7)
                .select("p")
                .distinct()
                .count()
            )

        assert hot_key_spread(hot.join(dim, on=["k"])) == 1  # one reducer
        # 8 sub-keys hash into the session's 4 reduce partitions — expect
        # more than one, not all 8 (pigeonholes, not uniformity)
        assert hot_key_spread(salted_join(hot, dim, on=["k"], salt=8)) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev_coalesce)


def test_two_phase_distinct_matches_count_distinct(orders):
    expect = {
        (r.o_custkey, r.n)
        for r in orders.groupBy("o_custkey")
        .agg(F.countDistinct("o_orderstatus").cast("long").alias("n"))
        .collect()
    }
    got = {
        (r.o_custkey, r.n_distinct)
        for r in two_phase_distinct(
            orders, key=["o_custkey"], value="o_orderstatus"
        ).collect()
    }
    assert got == expect


def test_salt_validation(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        salted_join(df, df, on=["id"], salt=0)


def test_skew_report_surfaces_heavy_hitters(spark):
    from dc43_spark.functions.skew import skew_report

    rows = [(1, "hot")] * 700 + [(i, f"k{i}") for i in range(2, 302)]
    df = spark.createDataFrame(rows, "v long, key string")
    out = skew_report(df, ["key"], top_n=3).collect()
    assert out[0].key == "hot" and out[0].n_rows == 700
    assert out[0].fraction_micro == 700_000  # 700/1000 exactly
    assert all(r.n_rows == 1 for r in out[1:])
    # deterministic tie-break on the key
    assert [r.key for r in out[1:]] == sorted(r.key for r in out[1:])
