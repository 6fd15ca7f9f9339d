"""Ad-hoc micro-bench for tuning individual queries.

Usage: python tools/microbench.py q1 q2 ... [--reps N]
Times each named query (from __spark_entry__.queries()) at
$SPARK_GRAFT_SF_DIR with the same session config as bench.py.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 1
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dc43-microbench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    import bench

    # registered gates win on name clashes; extras are timeable too
    queries = {**entrymod.extra_queries(), **entrymod.queries()}
    for t in ("orders", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    import pandas as _pd  # noqa: F401

    def _noop(batches):
        for b in batches:
            yield b

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(_noop, "id long").count()

    for name in args:
        fn = queries[name]
        for r in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if name in bench.COUNT_ONLY:
                df.count()
            else:
                df.collect()
            dt = round(time.perf_counter() - t0, 3)
            print(f"{name} rep{r}: {dt}s", flush=True)
            spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
