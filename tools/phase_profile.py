"""Phase-level timing for the composite IO gates.

Usage: python tools/phase_profile.py <gate> [--reps N]
Re-implements the gate's phases inline (same calls as the showcase
function) with a perf_counter around each, so the gate's wall time is
attributed to write/merge/read/agg instead of guessed. Supported:
sql_merge_orders, delta_merge_orders, snaplog_stream_orders,
profile_orders, ivm_full_agg_orders, merge_upsert_orders.
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    gate = sys.argv[1]
    reps = 1
    for a in sys.argv[2:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dc43-phase-profile")
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
    for t in ("orders", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    import pandas as _pd  # noqa: F401

    def _noop(batches):
        yield from batches

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(
        _noop, "id long"
    ).count()

    phases: dict[str, list[float]] = {}

    @contextmanager
    def phase(name):
        t0 = time.perf_counter()
        yield
        phases.setdefault(name, []).append(time.perf_counter() - t0)

    from pyspark.sql import functions as F

    from dc43_spark import showcase_io

    for rep in range(reps):
        if gate == "sql_merge_orders":
            from dc43_spark.io.catalog import SnaplogCatalog
            from dc43_spark.io.delta_log import delta_write
            from dc43_spark.io.snaplog import SnaplogTable
            from dc43_spark.showcase_io import (
                _orders_base,
                _scratch,
                merge_orders_contract,
            )
            from dc43_spark.io.read import read_with_contract
            from dc43_spark.io.locators import (
                ContractVersionLocator,
                StaticDatasetLocator,
            )

            with phase("base+scratch"):
                base = _orders_base(spark, sf_dir)
                contract = merge_orders_contract()
                root = _scratch(sf_dir, "sql_merge")
                cat = SnaplogCatalog(spark, root)
            with phase("delta_write tgt"):
                delta_write(
                    spark,
                    base.filter(F.col("o_orderkey") % 2 == 0),
                    os.path.join(root, "otgt"),
                    configuration={"delta.enableDeletionVectors": "true"},
                    checkpoint_interval=None,
                )
            with phase("snaplog write src"):
                SnaplogTable(spark, os.path.join(root, "osrc")).write(
                    base.filter(F.col("o_orderkey") % 3 == 0).withColumn(
                        "o_totalprice_cents", F.col("o_totalprice_cents") * 2
                    ),
                    mode="overwrite",
                )
            with phase("merge sql"):
                cat.sql(
                    "MERGE INTO otgt t USING osrc s ON t.o_orderkey = s.o_orderkey "
                    "WHEN MATCHED AND s.o_custkey % 10 = 0 THEN DELETE "
                    "WHEN MATCHED AND t.o_totalprice_cents < 20000000 THEN UPDATE SET "
                    "  o_orderstatus = 'U', "
                    "  o_totalprice_cents = t.o_totalprice_cents + s.o_totalprice_cents "
                    "WHEN MATCHED THEN UPDATE SET "
                    "  o_orderstatus = 'V', "
                    "  o_totalprice_cents = t.o_totalprice_cents - 1 "
                    "WHEN NOT MATCHED AND s.o_orderkey % 4 = 1 THEN "
                    "  INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice_cents) "
                    "  VALUES (s.o_orderkey, s.o_custkey, 'N', "
                    "          s.o_totalprice_cents % 1000000) "
                    "WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 10 = 2 THEN "
                    "  UPDATE SET o_orderstatus = 'Z'"
                )

            def _pinned(version: str):
                aligned, result = read_with_contract(
                    spark,
                    contract,
                    metrics=False,
                    locator=ContractVersionLocator(
                        version,
                        base=StaticDatasetLocator(
                            path=os.path.join(root, "otgt"), format="delta"
                        ),
                    ),
                )
                assert result.status == "ok", result.errors
                return aligned.withColumn("version_read", F.lit(int(version)))

            with phase("pinned reads plan"):
                both = _pinned("0").unionByName(_pinned("1"))
                out = both.groupBy("version_read", "o_orderstatus").agg(
                    F.sum("o_totalprice_cents").cast("long").alias("revenue_cents"),
                    F.count(F.lit(1)).alias("n_rows"),
                )
            with phase("collect"):
                out.collect()
        elif gate == "delta_merge_orders":
            fn = showcase_io.IO_QUERIES[gate]
            with phase("whole gate"):
                df = fn(spark, sf_dir)
                df.collect()
        else:
            import __spark_entry__ as entrymod
            import bench

            queries = {**entrymod.extra_queries(), **entrymod.queries()}
            fn = queries[gate]
            with phase("whole gate"):
                df = fn(spark, sf_dir)
                if gate in bench.COUNT_ONLY:
                    df.count()
                else:
                    df.collect()
        spark.catalog.clearCache()

    for name, times in phases.items():
        pretty = " ".join(f"{t:.2f}" for t in times)
        print(f"{name:>20}: {pretty}  (min {min(times):.2f})")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
