"""DML touch-set envelope ladder (VERDICT r10 #4): measure the jar-less
Delta UPDATE / DELETE / MERGE hit-set materialization at 1M / 10M (and
optionally 50M) matched rows.

r11 replaced the eager ``localCheckpoint`` of the touch frames with
``persist(StorageLevel.MEMORY_AND_DISK)``: spillable/evictable executor
storage whose lost blocks recompute from the PINNED snapshot scan (the
lineage scan is version-pinned, so recompute is deterministic), with the
2x-width ``_t_`` pre-image columns selected ONLY when the change feed
needs them. This ladder records the resulting wall-time envelope per
operation and that the persist is fully released after each op (a nonzero "leaked"
column would mean the unpersist discipline broke), so "fine for
CDC-sized batches" has a measured boundary instead of a guess.

Usage: python tools/dml_touch_ladder.py [--scales 1000000,10000000]
       [--files 16]
Prints a markdown table + one JSON line (SCALE.md material).
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


def _storage_mb(spark) -> float:
    """Block-manager storage in use across executors (MB) — sampled AFTER
    each op returns, i.e. after its finally-block unpersist: a nonzero
    reading here would mean the touch-set persist LEAKED."""
    try:
        sc = spark.sparkContext
        infos = sc._jsc.sc().getExecutorMemoryStatus()
        # scala Map[String, (Long, Long)]: (max, remaining)
        it = infos.iterator()
        used = 0
        while it.hasNext():
            kv = it.next()
            tup = kv._2()
            used += int(tup._1()) - int(tup._2())
        return used / (1 << 20)
    except Exception:
        return -1.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1000000,10000000")
    ap.add_argument("--files", type=int, default=16)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("dml_touch_ladder").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dc43_spark.io.delta_dml import delta_delete, delta_merge, delta_update
    from dc43_spark.io.delta_log import DeltaLogTable, delta_write

    rows = []
    for n in scales:
        # table = 2n rows so a "k % 2 = 0"-shaped predicate hits exactly n
        root = tempfile.mkdtemp(prefix="dml_touch_")
        path = os.path.join(root, "t")
        try:
            df = (
                spark.range(2 * n)
                .select(
                    F.col("id").alias("k"),
                    (F.col("id") * 7 % 1000).alias("v"),
                    F.sha1(F.col("id").cast("string")).alias("pad"),
                )
                .repartition(args.files)
            )
            t0 = time.perf_counter()
            delta_write(spark, df, path, checkpoint_interval=None,
                        configuration={"delta.enableDeletionVectors": "true"})
            t_build = time.perf_counter() - t0

            t0 = time.perf_counter()
            delta_update(spark, path, {"v": "v + 1"}, "k % 2 = 0")
            t_update = time.perf_counter() - t0
            mem_after_update = _storage_mb(spark)  # post-unpersist: proves release

            t0 = time.perf_counter()
            delta_merge(
                spark,
                spark.range(n).select(
                    (F.col("id") * 2 + 1).alias("k"),
                    F.lit(-1).alias("v"),
                    F.lit("m").alias("pad"),
                ),
                path, ["k"],
            )
            t_merge = time.perf_counter() - t0

            t0 = time.perf_counter()
            delta_delete(spark, path, "k % 4 = 0")
            t_delete = time.perf_counter() - t0

            got = DeltaLogTable(spark, path).read().count()
            assert got == 2 * n - (2 * n) // 4, got
            rows.append({
                "hit_rows": n, "table_rows": 2 * n,
                "build_sec": round(t_build, 1),
                "update_sec": round(t_update, 1),
                "merge_sec": round(t_merge, 1),
                "delete_sec": round(t_delete, 1),
                "storage_after_release_mb": round(mem_after_update, 1),
            })
        finally:
            shutil.rmtree(root, ignore_errors=True)

    print("| hit rows | table rows | build s | update s | merge s | delete s | leaked MB |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['hit_rows']:,} | {r['table_rows']:,} | {r['build_sec']} "
              f"| {r['update_sec']} | {r['merge_sec']} | {r['delete_sec']} "
              f"| {r['storage_after_release_mb']} |")
    print(json.dumps({"metric": "dml_touch_ladder", "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
