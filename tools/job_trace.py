"""Trace every Spark job a query launches: name, tasks, duration.

Usage: python tools/job_trace.py <query> [<query> ...]

Like tools/job_metrics.py but prints one line per job (jobId, #tasks,
wall ms, name truncated) so redundant actions are attributable.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.loads(r.read())


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dc43-job-trace")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4048")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    queries = {**entrymod.extra_queries(), **entrymod.queries()}
    for t in ("orders", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    for name in names:
        before = {j["jobId"] for j in _api(base, "/jobs")}
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        jobs = [j for j in _api(base, "/jobs") if j["jobId"] not in before]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"=== {name}: {len(jobs)} jobs ===")
        for j in jobs:
            ntasks = j.get("numTasks", 0)
            desc = (j.get("description") or j.get("name") or "")[:150]
            print(f"  job {j['jobId']:>4} tasks={ntasks:>4} {desc}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
