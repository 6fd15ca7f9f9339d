"""dc43-spark Delta interop tour — everything jar-less, against a REAL
``_delta_log``: create/append/overwrite with constraints, idempotent txn
appends, streaming source + sink, OPTIMIZE (+ Z-ORDER), VACUUM, change
data feed, the snaplog→Delta mirror with live deletion vectors, and a
governed contract read of the result.

Run: python examples/delta_interop.py  (self-contained; temp dir)
"""

from __future__ import annotations

import os
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Python data source classes are cloudpickled BY REFERENCE to executor
# workers, which spawn with PYTHONPATH (not the driver's sys.path)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dc43_spark.io.delta_log import (
        DeltaLogTable,
        delta_optimize,
        delta_vacuum,
        delta_write,
        export_delta_snapshot,
        sync_delta_export,
    )
    from dc43_spark.io.delta_source import DeltaLogDataSource

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("dc43-delta-interop")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="dc43_delta_tour_")
    t = os.path.join(root, "orders")

    # 1. create + append + idempotent txn append (a replay is a no-op)
    def df(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("bucket")
        ).coalesce(1)

    delta_write(spark, df(0, 6), t)
    delta_write(spark, df(6, 10), t, txn={"appId": "tour", "version": 0})
    assert delta_write(spark, df(6, 10), t,
                       txn={"appId": "tour", "version": 0}) is None
    d = DeltaLogTable(spark, t)
    print(f"1. created {t}: v{d.version()}, {d.read().count()} rows "
          f"(txn replay skipped)")

    # 2. time travel + change data feed
    assert d.read(version_as_of=0).count() == 6
    changes = d.table_changes(1)
    print("2. CDF since v1:",
          [(r.k, r._change_type) for r in changes.orderBy("k").collect()][:3],
          "...")

    # 3. streaming read through the registered source
    spark.dataSource.register(DeltaLogDataSource)
    out = os.path.join(root, "stream_out")
    q = (
        spark.readStream.format("deltalog").load(t)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(root, "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    print(f"3. streamed {spark.read.parquet(out).count()} rows "
          "through format('deltalog')")

    # 4. OPTIMIZE ZORDER + VACUUM
    v = delta_optimize(spark, t, target_file_mb=64, zorder_by=["k", "bucket"])
    swept = delta_vacuum(spark, t, retain_hours=0)
    d = DeltaLogTable(spark, t)
    print(f"4. optimize z-ordered into {len(d.snapshot().files)} file(s) "
          f"at v{v}; vacuum swept {len(swept)} pre-layout file(s); "
          f"rows still {d.read().count()}")

    # 5. snaplog MOR table mirrored out WITH real deletion vectors
    from dc43_spark.io.snaplog import SnaplogTable

    src = SnaplogTable(spark, os.path.join(root, "src"))
    src.write(
        spark.createDataFrame([(i, f"s{i}") for i in range(8)],
                              "k long, v string").coalesce(1),
        mode="overwrite",
    )
    src.delete([("k", "in", (2, 5))], strategy="merge_on_read")
    mirror = os.path.join(root, "mirror")
    export_delta_snapshot(src, mirror)
    src.write(spark.createDataFrame([(100, "new")], "k long, v string")
              .coalesce(1), mode="append")
    sync_delta_export(src, mirror)  # one O(changed) commit
    m = DeltaLogTable(spark, mirror)
    print(f"5. mirror at v{m.version()}: "
          f"{sorted(r.k for r in m.read().collect())} "
          "(MOR deletes ride as protocol deletion vectors)")

    # 6. governed contract read over the jar-less log
    from dc43_spark.contracts.model import Contract, SchemaObject, SchemaProperty
    from dc43_spark.io.read import read_with_contract

    contract = Contract(
        id="tour.orders", version="1.0.0",
        schema_objects=[SchemaObject(name="orders", properties=[
            SchemaProperty("k", "bigint", required=True),
            SchemaProperty("bucket", "bigint", required=True),
        ])],
    )
    aligned, verdict = read_with_contract(
        spark, contract, path=t, format="delta", metrics=False,
    )
    print(f"6. governed read of format='delta': status={verdict.status}, "
          f"{aligned.count()} rows")

    # 7. row-mutating DML with deletion vectors + RESTORE (r10)
    from dc43_spark.io.delta_dml import delta_delete, delta_merge
    from dc43_spark.io.delta_log import delta_restore

    n0 = DeltaLogTable(spark, t).read().count()
    v_del = delta_delete(spark, t, "k % 3 = 0", use_dvs=True)
    v_mrg = delta_merge(
        spark,
        spark.createDataFrame([(1, 999), (1000, 7)], "k long, bucket long")
        .coalesce(1),
        t, ["k"], use_dvs=True,
    )
    d = DeltaLogTable(spark, t)
    print(f"7. DELETE v{v_del} (deletion vectors, no rewrite) + MERGE "
          f"v{v_mrg}: {n0} -> {d.read().count()} rows; "
          f"{sum(1 for f in d.snapshot().files if f.dv)} DV-bearing file(s)")
    v_rst = delta_restore(spark, t, version=v_del - 1)
    print(f"8. RESTORE to v{v_del - 1} landed as v{v_rst}: back to "
          f"{DeltaLogTable(spark, t).read().count()} rows, history intact")

    spark.stop()
    print("delta interop tour complete:", root)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
