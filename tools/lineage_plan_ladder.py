"""Plan-build ladder for partitioned scans (VERDICT r10 #7): measure the
DML lineage scan (io/delta_dml._live_lineage) and the protocol reader at
1k / 5k / 10k partition tuples, against the pre-r11 shape — a
one-branch-per-partition-tuple union whose Catalyst ANALYSIS cost grows
superlinearly — which this tool re-creates inline as the "union" mode so
the curve is measured, not asserted.

The r11 shape is ONE parquet scan + a broadcast file-identity join that
carries typed partition values (delta_log._file_identity_df), so its
analysis cost is flat in partition count.

Usage: python tools/lineage_plan_ladder.py [--scales 1000,5000,10000]
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

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(root: str, n_parts: int) -> None:
    """One tiny data file per partition tuple, flat layout, hand-authored
    protocol log (partitionValues from the log, not directories)."""
    os.makedirs(os.path.join(root, "_delta_log"))
    data = pa.table({"k": pa.array(range(4), pa.int64())})
    adds = []
    for i in range(n_parts):
        name = f"part-{i:06d}.parquet"
        pq.write_table(data, os.path.join(root, name))
        adds.append({"add": {
            "path": name, "partitionValues": {"p": str(i)}, "size": 1,
            "dataChange": True,
            "stats": json.dumps({"numRecords": 4}),
        }})
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "ladder",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps({"type": "struct", "fields": [
                          {"name": "k", "type": "long", "nullable": True,
                           "metadata": {}},
                          {"name": "p", "type": "long", "nullable": True,
                           "metadata": {}}]}),
                      "partitionColumns": ["p"], "configuration": {}}},
    ] + adds
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in actions)


def _union_lineage(spark, t, snap):
    """The pre-r11 shape, re-created for the comparison rung: one parquet
    read per partition tuple, typed literals, a giant unionByName."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from dc43_spark.io.delta_log import _parse_partition_value

    types = {f.name: f.dataType.typeName() for f in snap.schema.fields}
    data_schema = StructType(
        [f for f in snap.schema.fields if f.name not in snap.partition_columns]
    )
    groups: dict = {}
    for f in snap.files:
        key = tuple(f.partition_values.get(c) for c in snap.partition_columns)
        groups.setdefault(key, []).append(f)
    parts = []
    for key, members in sorted(groups.items(), key=lambda kv: str(kv[0])):
        df = (
            spark.read.format("parquet").schema(data_schema)
            .load([os.path.join(t.path, m.path) for m in members])
        )
        for c, raw in zip(snap.partition_columns, key):
            val = _parse_partition_value(types[c], raw)
            df = df.withColumn(c, F.lit(val).cast(snap.schema[c].dataType))
        parts.append(df.select(*[f.name for f in snap.schema.fields]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1000,5000,10000")
    ap.add_argument("--union-max", type=int, default=5000,
                    help="skip the union rung above this (it's the slow one)")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .appName("lineage_plan_ladder").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dc43_spark.io.delta_dml import _live_lineage
    from dc43_spark.io.delta_log import DeltaLogTable

    rows = []
    for n in scales:
        root = tempfile.mkdtemp(prefix="lineage_ladder_")
        try:
            _build(root, n)
            t = DeltaLogTable(spark, root)
            snap = t.snapshot()

            t0 = time.perf_counter()
            df = _live_lineage(t, snap)
            df.schema  # forces analysis
            t_analyze = time.perf_counter() - t0
            t0 = time.perf_counter()
            assert df.count() == 4 * n
            t_job = time.perf_counter() - t0
            rows.append({"partitions": n, "mode": "identity-join",
                         "analyze_sec": round(t_analyze, 2),
                         "first_job_sec": round(t_job, 2)})

            t0 = time.perf_counter()
            rdf = t.read()
            rdf.schema
            t_ra = time.perf_counter() - t0
            t0 = time.perf_counter()
            assert rdf.count() == 4 * n
            rows.append({"partitions": n, "mode": "reader",
                         "analyze_sec": round(t_ra, 2),
                         "first_job_sec": round(time.perf_counter() - t0, 2)})

            if n <= args.union_max:
                t0 = time.perf_counter()
                udf = _union_lineage(spark, t, snap)
                udf.schema
                t_ua = time.perf_counter() - t0
                t0 = time.perf_counter()
                assert udf.count() == 4 * n
                rows.append({"partitions": n, "mode": "union(pre-r11)",
                             "analyze_sec": round(t_ua, 2),
                             "first_job_sec": round(time.perf_counter() - t0, 2)})
        finally:
            shutil.rmtree(root, ignore_errors=True)

    print("| partitions | mode | analyze s | first job s |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['partitions']:,} | {r['mode']} | {r['analyze_sec']} "
              f"| {r['first_job_sec']} |")
    print(json.dumps({"metric": "lineage_plan_ladder", "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
