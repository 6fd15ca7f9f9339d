"""Read-path ladder for deletion-vector application (VERDICT r10 #1):
measure the DV anti-join in ``DeltaLogTable.read()`` at 1M / 10M / 100M
deleted positions, on both sides of the
``spark.dc43.delta.dvBroadcastMaxPositions`` gate.

The data side is a FIXED-size scan (``--rows`` over ``--files`` parquet
files): the variable under test is the expanded-DV build side — one row
per deleted position — which below the gate broadcasts and above it
shuffles (sort-merge). Broadcasting 100M+ positions is exactly the
driver-OOM shape the gate exists to prevent, so the ladder only forces
broadcast at rungs at or below the default ceiling.

The table is hand-authored protocol state (real parquet + real DV blobs
via io/dv.py + a real ``_delta_log``), so the measured path is the
production reader end to end.

``--source`` adds a rung per scale for the Python-DataSource STREAMING
path (``readStream.format("deltalog")`` -> noop sink, availableNow):
since r12 only the O(1) DV descriptor rides each pickled partition and
positions decode executor-side (VERDICT r11 #1), so this rung grows
with per-file decode work, never with driver memory.

``--cdf`` adds rungs for the batch ``table_changes`` DERIVED path
(VERDICT r12 #1): the table gets a v1 that re-adds every file with a
GROWN deletion vector (v0 carries the first half of each file's
positions, v1 the full set), so ``table_changes(1, 1)`` must diff the
two vectors per file. Since r13 the driver ships only the two O(1)
descriptors and an executor task decodes + ``setdiff1d``s them, so the
rung is gated the same way as the snapshot read (broadcast below
``dvBroadcastMaxPositions``, sort-merge above).

Usage: python tools/dv_read_ladder.py [--scales 1000000,10000000,100000000]
       [--files 64] [--rows 2000000] [--reps 2] [--source] [--cdf]
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
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dc43_spark.io import dv as dvmod  # noqa: E402
from dc43_spark.io.delta_log import DeltaLogTable  # noqa: E402

_GATE_KEY = "spark.dc43.delta.dvBroadcastMaxPositions"


def _dv_for(root: str, positions: np.ndarray) -> dict:
    blob = dvmod.serialize_dv_blob(positions)
    u = uuid.uuid4()
    (off,) = dvmod.write_dv_file(
        os.path.join(root, f"deletion_vector_{u}.bin"), [blob]
    )
    return {
        "storageType": "u",
        "pathOrInlineDv": dvmod.z85_encode(u.bytes),
        "offset": off, "sizeInBytes": len(blob),
        "cardinality": int(len(positions)),
    }


def _build(root: str, n_positions: int, n_files: int, n_rows: int,
           cdf: bool = False) -> None:
    os.makedirs(os.path.join(root, "_delta_log"))
    rows_per_file = n_rows // n_files
    pos_per_file = n_positions // n_files
    adds = []
    grown_adds = []
    data = pa.table({"k": pa.array(np.arange(rows_per_file), pa.int64())})
    rng = np.random.default_rng(11)
    for i in range(n_files):
        name = f"part-{i:05d}.parquet"
        pq.write_table(data, os.path.join(root, name))
        # positions spread over a 64M space: realistic sparse bitmaps,
        # most positions past the physical rows (join probe misses are
        # the common case on a MOR table's wide bitmap)
        positions = np.unique(
            rng.integers(0, 64_000_000, pos_per_file).astype(np.int64)
        )
        add = {
            "add": {
                "path": name, "partitionValues": {}, "size": 1,
                "dataChange": True,
                "stats": json.dumps({"numRecords": rows_per_file}),
                "deletionVector": _dv_for(
                    root, positions[: len(positions) // 2] if cdf
                    else positions
                ),
            }
        }
        adds.append(add)
        if cdf:
            # v1 re-adds the file with the FULL vector: a DV-growth
            # commit whose change rows are the second-half positions
            grown = json.loads(json.dumps(add))
            grown["add"]["deletionVector"] = _dv_for(root, positions)
            grown_adds.append(grown)
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "ladder", "format": {"provider": "parquet",
                                                 "options": {}},
                      "schemaString": json.dumps({"type": "struct", "fields": [
                          {"name": "k", "type": "long", "nullable": True,
                           "metadata": {}}]}),
                      "partitionColumns": [], "configuration": {}}},
    ] + adds
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in actions)
    if cdf:
        with open(os.path.join(root, "_delta_log", f"{1:020d}.json"),
                  "w") as fh:
            fh.writelines(json.dumps(a) + "\n" for a in grown_adds)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1000000,10000000,100000000")
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--source", action="store_true",
                    help="also ladder the deltalog DataSource stream read")
    ap.add_argument("--cdf", action="store_true",
                    help="ladder the batch table_changes derived path "
                         "over a DV-growth commit instead of the scan")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("dv_read_ladder")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n in scales:
        root = tempfile.mkdtemp(prefix="dv_read_ladder_")
        try:
            _build(root, n, args.files, args.rows, cdf=args.cdf)
            tbl = DeltaLogTable(spark, root)
            measure = (
                (lambda: tbl.table_changes(1, 1).count()) if args.cdf
                else (lambda: tbl.read().count())
            )
            for mode in ("broadcast", "shuffle"):
                if mode == "broadcast" and n > 10_000_000:
                    continue  # the gate exists to forbid exactly this
                spark.conf.set(_GATE_KEY, str(n + 1 if mode == "broadcast" else 0))
                best = min(_timed(measure) for _ in range(args.reps))
                rows.append({"positions": n,
                             "mode": ("cdf-" if args.cdf else "") + mode,
                             "count_sec": round(best, 2)})
            if args.source:
                from dc43_spark.io.delta_source import DeltaLogDataSource

                spark.dataSource.register(DeltaLogDataSource)

                def _stream() -> None:
                    cp = tempfile.mkdtemp(prefix="dv_read_ladder_cp_")
                    try:
                        q = (
                            spark.readStream.format("deltalog").load(root)
                            .writeStream.format("noop")
                            .option("checkpointLocation", cp)
                            .trigger(availableNow=True)
                            .start()
                        )
                        q.awaitTermination()
                        if q.exception():
                            raise RuntimeError(str(q.exception()))
                    finally:
                        shutil.rmtree(cp, ignore_errors=True)

                best = min(_timed(_stream) for _ in range(args.reps))
                rows.append({"positions": n, "mode": "stream-source",
                             "count_sec": round(best, 2)})
        finally:
            spark.conf.unset(_GATE_KEY)
            shutil.rmtree(root, ignore_errors=True)

    print("| positions | join mode | scan+count s |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['positions']:,} | {r['mode']} | {r['count_sec']} |")
    print(json.dumps({"metric": "dv_read_ladder", "rows": rows}))
    return 0


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    raise SystemExit(main())
