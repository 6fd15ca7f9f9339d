"""Wide-table profiling ladder (r14 — VERDICT r13 nit): measure
``profile_columns`` exact-vs-approx as column width grows.

The exact strategy plans one ``countDistinct`` per column; Catalyst
evaluates N distinct aggregates in one pass via Expand — N copies of
the scanned stream — so cost grows with width even though it is a
single job. ``distinct_strategy='approx'`` replaces them with HLL
sketches (no Expand, one stream): the 100 TB wide-table bootstrap
path. The ladder pins the gap; enum detection / min-max stay exact in
both (pass 2 is shared).

Usage: python tools/profile_width_ladder.py [--widths 8,32,64]
       [--rows 2000000] [--reps 2]
Prints a markdown table + one JSON line (SCALE.md material).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="8,32,64")
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    widths = [int(w) for w in args.widths.split(",")]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dc43_spark.contracts.profiling import profile_columns

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-width-ladder")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()  # session warm-up

    results = []
    print("| width | rows | exact_s | approx_s | speedup |")
    print("|---|---|---|---|---|")
    for w in widths:
        # half long columns (varying cardinality), half strings
        base = spark.range(args.rows, numPartitions=int(cpus))
        cols = []
        for i in range(w // 2):
            cols.append((F.col("id") % (10 ** (1 + i % 6))).alias(f"n{i}"))
        for i in range(w - w // 2):
            cols.append(
                F.concat(F.lit(f"s{i}_"), (F.col("id") % (5 + 50 * i)))
                .alias(f"s{i}")
            )
        df = base.select(*cols)
        df.count()  # materialize the file-less plan's codegen once
        timings = {}
        for strategy in ("exact", "approx"):
            best = None
            for _ in range(args.reps):
                t0 = time.perf_counter()
                profile_columns(df, distinct_strategy=strategy)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[strategy] = round(best, 3)
        speedup = round(timings["exact"] / max(timings["approx"], 1e-9), 2)
        print(
            f"| {w} | {args.rows} | {timings['exact']} "
            f"| {timings['approx']} | {speedup}x |"
        )
        results.append({"width": w, **timings, "speedup": speedup})
    print(json.dumps({
        "ladder": "profile_width",
        "rows": args.rows,
        "reps": args.reps,
        "rungs": results,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
