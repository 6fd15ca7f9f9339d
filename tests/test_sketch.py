"""Heavy hitters (functions/sketch.py): the two-pass Misra–Gries plan
must be EXACTLY the naive ``groupBy(key).count().filter`` answer — the
sketch only bounds the shuffle, never the result."""

import pytest
from pyspark.sql import functions as F

from dc43_spark.functions.sketch import heavy_hitters


def _naive(df, col, frac):
    keyed = df.select(F.col(col).cast("string").alias("key")).filter(
        F.col("key").isNotNull()
    )
    total = keyed.count()
    return {
        (r.key, r.n)
        for r in keyed.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= F.lit(float(frac * total)))
        .collect()
    }


def _skewed(spark, n=20_000, parts=8):
    # geometric buckets: key = floor(log2(1 + id%4096)) — bucket 12
    # holds ~50% of rows, 11 ~25%, ... so every tested fraction has
    # hitters; plus nulls
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.when(
                F.col("id") % 97 == 0, F.lit(None)
            ).otherwise(
                F.floor(F.log2(1 + F.col("id") % 4096)).cast("long")
                .cast("string")
            ).alias("k")
        )
    )


@pytest.mark.parametrize("frac", [0.02, 0.05, 0.2])
def test_exact_parity_with_naive_plan(spark, frac):
    df = _skewed(spark)
    got = {
        (r.key, r.n)
        for r in heavy_hitters(df, "k", frac).collect()
    }
    assert got == _naive(df, "k", frac)
    assert got  # the distribution is skewed enough to have hitters


def test_capacity_never_changes_the_answer(spark):
    df = _skewed(spark, n=6_000, parts=5)
    base = {
        (r.key, r.n) for r in heavy_hitters(df, "k", 0.05).collect()
    }
    for cap in (41, 100, 500):
        got = {
            (r.key, r.n)
            for r in heavy_hitters(df, "k", 0.05, capacity=cap).collect()
        }
        assert got == base, cap


def test_uniform_distribution_yields_nothing(spark):
    df = spark.range(5_000).select(
        F.col("id").cast("string").alias("k")
    ).repartition(4)
    assert heavy_hitters(df, "k", 0.01).count() == 0


def test_validations_and_edges(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="min_fraction"):
        heavy_hitters(df, "k", 0.0)
    with pytest.raises(ValueError, match="completeness"):
        heavy_hitters(df, "k", 0.01, capacity=5)
    empty = spark.createDataFrame([], "k string")
    assert heavy_hitters(empty, "k", 0.5).count() == 0
    nulls = spark.createDataFrame([(None,)] * 5, "k string")
    assert heavy_hitters(nulls, "k", 0.5).count() == 0
    # total excludes nulls: 3 of 4 non-null rows are 'a'
    mixed = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), (None,)], "k string"
    )
    got = {(r.key, r.n, r.total)
           for r in heavy_hitters(mixed, "k", 0.6).collect()}
    assert got == {("a", 3, 4)}


def test_summary_output_is_bounded(spark):
    """The stage-1 output is O(partitions x capacity) — the whole point:
    the shuffle never sees the key cardinality."""
    from dc43_spark.functions.sketch import _mg_summaries

    import pandas as pd

    run = _mg_summaries(10)
    batches = [
        pd.DataFrame({"k": [str(i % 5000) for i in range(j, j + 2000)]})
        for j in range(0, 10_000, 2000)
    ]
    out = pd.concat(list(run(iter(batches))))
    assert len(out) <= 11  # capacity + the total row
    assert int(out[out["k" if "k" in out else "key"].isna()]["cnt"].iloc[0]) == 10_000
