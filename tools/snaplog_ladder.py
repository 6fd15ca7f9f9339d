"""Empirical scale ladder for the snaplog table format: measure the
O(files changed) claims instead of arguing them from manifest shape.

Builds key-clustered snaplog tables at 1x / 4x / 16x row counts (and
proportional file counts) in a temp dir and measures, per size:

1. point-lookup read  — ``read(filters=[k = x])`` wall time and files
   opened. Expected: files opened == 1 at every size (data skipping);
   wall time FLAT while the full-scan filter grows with the table.
2. 1-row MERGE        — upsert of a single key. Expected: rewrites one
   file at every size; wall time FLAT (two-level pruning bounds the
   rewrite set by the key's cluster, not the table).
3. IVM refresh        — a fixed-size append then ``refresh_sum_view``.
   Expected: FLAT (cost follows the change window, not the table).

Usage: python tools/snaplog_ladder.py [--scales 1,4,16] [--reps 2]
Markdown table to stdout, one JSON line at the end (tools/microbench
noise caveat applies: reps take the MIN; run on an idle host).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_table(spark, path: str, n_rows: int, n_files: int):
    from pyspark.sql import functions as F

    from dc43_spark.io.snaplog import SnaplogTable

    t = SnaplogTable(spark, path, change_feed=True)
    df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("g"),
            (F.col("id") * 3).alias("x"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .repartitionByRange(n_files, "k")
        .sortWithinPartitions("k")
    )
    t.write(df, mode="overwrite")
    return t


def timed(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,4,16")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--base-rows", type=int, default=200_000)
    ap.add_argument("--base-files", type=int, default=8)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dc43_spark.io.ivm import refresh_sum_view
    from dc43_spark.io.snaplog import SnaplogTable

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="snaplog_ladder_")
    results = []
    try:
        for s in scales:
            n_rows = args.base_rows * s
            n_files = args.base_files * s
            path = f"{root}/t{s}"
            t = build_table(spark, path, n_rows, n_files)

            probe_key = n_rows // 2
            lookup = t.read(filters=[("k", "=", probe_key)])
            files_opened = len(lookup.inputFiles())
            t_lookup = timed(
                lambda: t.read(filters=[("k", "=", probe_key)]).collect(),
                args.reps,
            )
            t_fullscan = timed(
                lambda: t.read().filter(F.col("k") == probe_key).collect(),
                args.reps,
            )

            src = spark.createDataFrame(
                [(probe_key, probe_key % 97, 0, "upsert")],
                "k long, g long, x long, payload string",
            )
            merge_stats = []

            def one_merge():
                merge_stats.append(t.merge(src, ["k"]))

            t_merge = timed(one_merge, args.reps)
            rewritten = max(m.files_rewritten for m in merge_stats)

            view = SnaplogTable(spark, f"{root}/view{s}")
            refresh_sum_view(view, t, keys=["g"], sums={"sx": "x"})
            # fixed-size delta regardless of table size
            t.write(
                spark.range(1000).select(
                    (F.col("id") + 10 * n_rows).alias("k"),
                    (F.col("id") % 97).alias("g"),
                    F.col("id").alias("x"),
                    F.lit("delta").alias("payload"),
                )
            )
            t0 = time.monotonic()
            st = refresh_sum_view(view, t, keys=["g"], sums={"sx": "x"})
            t_refresh = time.monotonic() - t0

            results.append(
                {
                    "scale": s,
                    "rows": n_rows,
                    "files": len(t.snapshot().files),
                    "lookup_files_opened": files_opened,
                    "lookup_s": round(t_lookup, 3),
                    "fullscan_s": round(t_fullscan, 3),
                    "merge_rewritten_files": rewritten,
                    "merge_s": round(t_merge, 3),
                    "ivm_refresh_s": round(t_refresh, 3),
                    "ivm_strategy": st.strategy,
                }
            )
            shutil.rmtree(path, ignore_errors=True)
            shutil.rmtree(f"{root}/view{s}", ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    hdr = list(results[0].keys())
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for r in results:
        print("| " + " | ".join(str(r[h]) for h in hdr) + " |")
    print(json.dumps({"snaplog_ladder": results}))
    spark.stop()


if __name__ == "__main__":
    main()
