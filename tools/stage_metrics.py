"""Per-stage metrics for one query via the Spark UI REST API.

Usage: python tools/stage_metrics.py <query> [--reps N]

Runs the named query like bench.py does and prints each Spark stage the
run launched (sorted by executor run time): task count, run/CPU seconds,
shuffle bytes, and the stage's name line — so a run>>cpu gap can be
attributed to a specific operator instead of the whole query.
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
        .appName("dc43-stage-metrics")
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

    queries = {**entrymod.extra_queries(), **entrymod.queries()}
    import bench as benchmod

    for name in names:
        fn = queries[name]
        for rep in range(reps):
            before = {s["stageId"] for s in _api(base, "/stages")}
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if name in benchmod.COUNT_ONLY:
                df.count()
            else:
                df.collect()
            wall = time.perf_counter() - t0
            spark.catalog.clearCache()
            stages = [
                s for s in _api(base, "/stages")
                if s["stageId"] not in before and s["status"] != "SKIPPED"
            ]
            stages.sort(key=lambda s: -s.get("executorRunTime", 0))
            print(f"== {name} rep{rep}: wall={wall:.2f}s stages={len(stages)}")
            for s in stages[:20]:
                print(
                    f"  stage {s['stageId']}: tasks={s['numCompleteTasks']}"
                    f" run={s.get('executorRunTime', 0)/1e3:.2f}s"
                    f" cpu={s.get('executorCpuTime', 0)/1e9:.2f}s"
                    f" shufR={s.get('shuffleReadBytes', 0)/1e6:.2f}MB"
                    f" shufW={s.get('shuffleWriteBytes', 0)/1e6:.2f}MB"
                    f" | {s.get('name', '')[:90]}"
                )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
