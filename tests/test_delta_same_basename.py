"""Foreign-writer file naming: delta-spark reuses ``part-00000-...``
basenames across partition DIRECTORIES routinely, so the r11 single-scan
identity join (basename hash + full-relative-path suffix residual) must
never cross-tag two files that share a basename — in the reader's
partition-value attach, the DML lineage scan, OR the DV anti-join."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dc43_spark.io.delta_dml import _live_lineage, delta_delete
from dc43_spark.io.delta_log import DeltaLogTable


def _mk_table(tmp_path, with_dv=False):
    """Two partition dirs, SAME basename inside each, different rows."""
    t = str(tmp_path / "t")
    os.makedirs(os.path.join(t, "_delta_log"))
    adds = []
    for p, lo in (("1", 0), ("2", 100)):
        d = os.path.join(t, f"p={p}")
        os.makedirs(d)
        pq.write_table(
            pa.table({"k": pa.array([lo, lo + 1], pa.int64())}),
            os.path.join(d, "part-00000.parquet"),
        )
        adds.append({"add": {
            "path": f"p={p}/part-00000.parquet",
            "partitionValues": {"p": p}, "size": 1, "dataChange": True,
            "stats": json.dumps({"numRecords": 2}),
        }})
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "x", "format": {"provider": "parquet",
                                            "options": {}},
                      "schemaString": json.dumps({"type": "struct", "fields": [
                          {"name": "k", "type": "long", "nullable": True,
                           "metadata": {}},
                          {"name": "p", "type": "integer", "nullable": True,
                           "metadata": {}}]}),
                      "partitionColumns": ["p"], "configuration": {}}},
    ] + adds
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in actions)
    return t


def test_reader_attaches_right_partition_values(spark, tmp_path):
    t = _mk_table(tmp_path)
    got = {(r.k, r.p) for r in DeltaLogTable(spark, t).read().collect()}
    assert got == {(0, 1), (1, 1), (100, 2), (101, 2)}
    # partition pruning still exact per file
    df = DeltaLogTable(spark, t).read(filters=[("p", "=", 2)])
    assert len(df.inputFiles()) == 1
    assert {r.k for r in df.collect()} == {100, 101}


def test_lineage_tags_right_relative_path(spark, tmp_path):
    t = _mk_table(tmp_path)
    tbl = DeltaLogTable(spark, t)
    lin = _live_lineage(tbl, tbl.snapshot())
    got = {(r.k, r.p, r._dc43_rel, r._dc43_pos) for r in lin.collect()}
    assert got == {
        (0, 1, "p=1/part-00000.parquet", 0),
        (1, 1, "p=1/part-00000.parquet", 1),
        (100, 2, "p=2/part-00000.parquet", 0),
        (101, 2, "p=2/part-00000.parquet", 1),
    }


def test_dv_mask_does_not_cross_apply_between_same_basenames(spark, tmp_path):
    """A DV delete that hits position 0 of p=1's file must NOT delete
    position 0 of p=2's identically-named file."""
    t = _mk_table(tmp_path)
    delta_delete(spark, t, "k = 0", use_dvs=True)
    got = {(r.k, r.p) for r in DeltaLogTable(spark, t).read().collect()}
    assert got == {(1, 1), (100, 2), (101, 2)}
    snap = DeltaLogTable(spark, t).snapshot()
    assert sum(1 for f in snap.files if f.dv) == 1
