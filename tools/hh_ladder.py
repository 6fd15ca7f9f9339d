#!/usr/bin/env python
"""Heavy-hitters ladder: the naive distinct-key shuffle vs the two-pass
Misra–Gries plan (functions/sketch.py) as key CARDINALITY grows.

The claim under measurement: the naive ``groupBy(key).count().filter``
shuffles one row per DISTINCT key, so its cost tracks cardinality even
though the answer is a handful of rows; the two-pass plan's stage-1
shuffle is O(partitions × capacity) and its recount touches only
candidate occurrences, so its cost tracks DATA size, not key count.
Also records the stage-1 shuffle row count (the sketch's whole point)
via a direct count of the summary output.

Usage: python tools/hh_ladder.py [--rows 20000000] [--frac 0.001]
Writes one JSON line per rung; paste the table into SCALE.md."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession, functions as F

from dc43_spark.functions.sketch import _mg_summaries, heavy_hitters


def _data(spark, rows, distinct, parts):
    # ~50% of rows spread over `distinct` uniform keys (the heavy tail),
    # ~50% concentrated on 20 hot keys (the hitters). The modulus runs
    # over id DIV 2 so each branch sees every residue — id % m over only
    # even (or only odd) ids would silently halve both cardinalities.
    half = F.floor(F.col("id") / 2)
    return (
        spark.range(rows)
        .repartition(parts)
        .select(
            F.when(
                F.col("id") % 2 == 0,
                (half % 20).cast("string"),
            )
            .otherwise(
                F.concat(F.lit("u"), (half % distinct).cast("string"))
            )
            .alias("k")
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--frac", type=float, default=0.001)
    ap.add_argument("--parts", type=int, default=32)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for distinct in (10_000, 1_000_000, 10_000_000):
        df = _data(spark, args.rows, distinct, args.parts).persist()
        n = df.count()  # materialize input once so both plans scan cache

        t0 = time.perf_counter()
        naive = (
            df.filter(F.col("k").isNotNull())
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= F.lit(args.frac * n))
            .count()
        )
        t_naive = time.perf_counter() - t0

        t0 = time.perf_counter()
        got = heavy_hitters(df, "k", args.frac)
        n_hh = got.count()
        t_sketch = time.perf_counter() - t0

        from dc43_spark.functions.sketch import default_capacity

        capacity = default_capacity(args.frac)
        summary_rows = (
            df.select(F.col("k").alias("key"))
            .mapInPandas(_mg_summaries(capacity), "key string, cnt long")
            .count()
        )
        df.unpersist()
        assert naive == n_hh, (naive, n_hh)
        print(json.dumps({
            "rows": n,
            "distinct_cold_keys": distinct,
            "hitters": n_hh,
            "naive_sec": round(t_naive, 2),
            "two_pass_sec": round(t_sketch, 2),
            "stage1_shuffle_rows": summary_rows,
            "naive_shuffle_rows_approx": distinct + 20,
        }))

    spark.stop()


if __name__ == "__main__":
    main()
