"""Deterministic per-query execution metrics via the Spark UI REST API.

Usage: python tools/job_metrics.py q1 q2 ... [--reps N]

For each named query (from __spark_entry__), runs it like bench.py does
and then sums, over the Spark jobs the run launched: job count, stage
count, task count, input bytes, shuffle read/write bytes, and executor
run/CPU time. These counts are host-noise-immune (a kernel storm changes
seconds, never job counts or shuffle bytes), so before/after comparisons
of an optimization stay meaningful on a stormy host; wall time is
reported alongside for reference.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.loads(r.read())


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 1
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dc43-job-metrics")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    import bench

    queries = {**entrymod.extra_queries(), **entrymod.queries()}
    for t in ("orders", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    import pandas as _pd  # noqa: F401

    def _noop(batches):
        yield from batches

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(
        _noop, "id long"
    ).count()

    def jobs_snapshot():
        return {j["jobId"] for j in _api(base, "/jobs?status=succeeded")} | {
            j["jobId"] for j in _api(base, "/jobs?status=failed")
        } | {j["jobId"] for j in _api(base, "/jobs?status=running")}

    for name in names:
        fn = queries[name]
        for rep in range(reps):
            before = jobs_snapshot()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if name in bench.COUNT_ONLY:
                df.count()
            else:
                df.collect()
            wall = time.perf_counter() - t0
            time.sleep(0.5)
            all_jobs = _api(base, "/jobs")
            new = [j for j in all_jobs if j["jobId"] not in before]
            n_stages = sum(len(j.get("stageIds", [])) for j in new)
            n_tasks = sum(j.get("numCompletedTasks", 0) for j in new)
            stage_ids = {s for j in new for s in j.get("stageIds", [])}
            inp = shr = shw = rt = ct = 0
            for s in _api(base, "/stages?status=complete"):
                if s["stageId"] in stage_ids:
                    inp += s.get("inputBytes", 0)
                    shr += s.get("shuffleReadBytes", 0)
                    shw += s.get("shuffleWriteBytes", 0)
                    rt += s.get("executorRunTime", 0)
                    ct += s.get("executorCpuTime", 0) // 1_000_000
            print(
                f"{name} rep{rep}: wall={wall:.2f}s jobs={len(new)} "
                f"stages={n_stages} tasks={n_tasks} input={inp/1e6:.1f}MB "
                f"shufR={shr/1e6:.2f}MB shufW={shw/1e6:.2f}MB "
                f"execRun={rt/1000:.1f}s execCpu={ct/1000:.1f}s"
            )
            spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
