"""Protocol conformance gate (io/delta_conformance.py — VERDICT r10 #6):
the PROTOCOL.md action-shape model must accept everything the repo's own
writer/DML/maintenance paths emit (positive: real tables exercised here;
plus the autouse conftest fixture sweeps every other test's logs) and
REJECT hand-broken logs of the classes the spec forbids (negative:
including b1eb905's tuple-list partitionValues)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.delta_conformance import (
    DeltaConformanceError,
    validate_action,
    validate_commit_file,
    validate_log_dir,
    validate_tree,
)
from dc43_spark.io.delta_dml import delta_delete, delta_merge, delta_update
from dc43_spark.io.delta_log import (
    delta_clone,
    delta_optimize,
    delta_restore,
    delta_write,
)


def test_every_writer_path_emits_conformant_logs(spark, tmp_path):
    """create + append + partitioned write + DV merge + update + delete +
    optimize + restore + clone, all validated commit-by-commit plus the
    checkpoint parquet."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(k, k % 3, k * 10) for k in range(20)], "k long, p long, amt long"
    )
    delta_write(
        spark, df, path, partition_by=["p"], checkpoint_interval=2,
        configuration={"delta.enableDeletionVectors": "true",
                       "delta.enableChangeDataFeed": "true"},
    )
    delta_write(
        spark,
        spark.createDataFrame([(100, 0, 1)], "k long, p long, amt long"),
        path, mode="append", checkpoint_interval=2,
        txn={"appId": "conf", "version": 1},
    )
    src = spark.createDataFrame(
        [(2, 0, 222), (200, 1, 2)], "k long, p long, amt long"
    )
    delta_merge(spark, src, path, ["k"], use_dvs=True)
    delta_update(spark, path, {"amt": "amt + 1"}, "k = 3")
    delta_delete(spark, path, "k = 4")
    delta_optimize(spark, path)
    delta_restore(spark, path, version=1)
    clone = str(tmp_path / "c")
    delta_clone(spark, path, clone, shallow=False)
    from dc43_spark.io.delta_log import DeltaLogTable, write_delta_checkpoint

    t = DeltaLogTable(spark, path)
    write_delta_checkpoint(t, t.version())

    got = validate_log_dir(path)
    assert got["commits"] >= 7
    assert got["checkpoints"] >= 1
    assert got["actions"] > got["commits"]
    total = validate_tree(str(tmp_path))
    assert total["tables"] == 2


@pytest.mark.nonconformant_log
def test_broken_logs_are_rejected(tmp_path):
    """Each corruption class raises with a pointed message."""
    # the b1eb905 class: partitionValues as a pair LIST, not an object
    with pytest.raises(DeltaConformanceError, match="partitionValues"):
        validate_action({"add": {
            "path": "f.parquet", "partitionValues": [["p", "1"]],
            "size": 1, "dataChange": True,
        }})
    # typed (non-string) partition value
    with pytest.raises(DeltaConformanceError, match="must be a string"):
        validate_action({"add": {
            "path": "f.parquet", "partitionValues": {"p": 1},
            "size": 1, "dataChange": True,
        }})
    # stats as an inline object instead of a stringified JSON
    with pytest.raises(DeltaConformanceError, match="JSON STRING"):
        validate_action({"add": {
            "path": "f.parquet", "partitionValues": {}, "size": 1,
            "dataChange": True, "stats": {"numRecords": 3},
        }})
    # two actions on one line
    with pytest.raises(DeltaConformanceError, match="exactly one action"):
        validate_action({"add": {"path": "f", "partitionValues": {},
                                 "size": 1, "dataChange": True},
                         "remove": {"path": "g"}})
    # writerFeatures on a pre-v7 protocol
    with pytest.raises(DeltaConformanceError, match="writerFeatures"):
        validate_action({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 2,
            "writerFeatures": ["deletionVectors"],
        }})
    # deletionVectors writer feature without the reader half
    with pytest.raises(DeltaConformanceError, match="readerFeatures"):
        validate_action({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": [], "writerFeatures": ["deletionVectors"],
        }})
    # DV descriptor with a bogus storageType / missing cardinality
    with pytest.raises(DeltaConformanceError, match="storageType"):
        validate_action({"add": {
            "path": "f.parquet", "partitionValues": {}, "size": 1,
            "dataChange": True,
            "deletionVector": {"storageType": "x", "pathOrInlineDv": "a",
                               "sizeInBytes": 1, "cardinality": 1},
        }})
    # partition column not in the schema
    with pytest.raises(DeltaConformanceError, match="not in the schema"):
        validate_action({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {}}]}),
            "partitionColumns": ["ghost"], "configuration": {},
        }})
    # cdc with dataChange true
    with pytest.raises(DeltaConformanceError, match="dataChange"):
        validate_action({"cdc": {"path": "c.parquet", "partitionValues": {},
                                 "size": 1, "dataChange": True}})
    # a whole broken commit file
    log = tmp_path / "t" / "_delta_log"
    log.mkdir(parents=True)
    bad = log / f"{0:020d}.json"
    bad.write_text(json.dumps({"add": {
        "path": "f.parquet", "partitionValues": [("p", "1")],
        "size": 1, "dataChange": True,
    }}) + "\n")
    with pytest.raises(DeltaConformanceError):
        validate_commit_file(str(bad))
    with pytest.raises(DeltaConformanceError):
        validate_tree(str(tmp_path))


@pytest.mark.nonconformant_log
def test_non_json_line_rejected(tmp_path):
    log = tmp_path / "t" / "_delta_log"
    log.mkdir(parents=True)
    (log / f"{0:020d}.json").write_text("{not json}\n")
    with pytest.raises(DeltaConformanceError, match="not valid JSON"):
        validate_log_dir(str(tmp_path / "t"))


@pytest.mark.nonconformant_log
def test_row_tracking_shape_violations_rejected(tmp_path):
    """r11: the structural gate extends to row tracking — overlapping id
    ranges, enabled-but-unassigned adds, and a high water mark below the
    top assigned id are all hand-broken-log rejects."""
    import os

    from dc43_spark.io.delta_conformance import validate_log_dir

    def _table(name, actions_per_commit):
        log = tmp_path / name / "_delta_log"
        log.mkdir(parents=True)
        for v, actions in enumerate(actions_per_commit):
            with open(log / f"{v:020d}.json", "w") as fh:
                fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
        return str(tmp_path / name)

    schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}}]})
    meta = {"metaData": {
        "id": "x", "format": {"provider": "parquet", "options": {}},
        "schemaString": schema, "partitionColumns": [],
        "configuration": {"delta.enableRowTracking": "true"},
    }}
    proto = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                          "writerFeatures": ["rowTracking",
                                             "domainMetadata"]}}

    def _add(path, base, rows):
        a = {"path": path, "partitionValues": {}, "size": 1,
             "modificationTime": 1, "dataChange": True,
             "stats": json.dumps({"numRecords": rows})}
        if base is not None:
            a["baseRowId"] = base
            a["defaultRowCommitVersion"] = 0
        return {"add": a}

    dom = {"domainMetadata": {"domain": "delta.rowTracking",
                              "configuration": json.dumps(
                                  {"rowIdHighWaterMark": 9}),
                              "removed": False}}
    ci = {"commitInfo": {"timestamp": 1, "operation": "WRITE"}}

    # overlapping ranges across two files
    t = _table("overlap", [[ci, proto, meta, _add("a.parquet", 0, 5),
                            _add("b.parquet", 3, 5), dom]])
    with pytest.raises(DeltaConformanceError, match="overlaps"):
        validate_log_dir(t)
    # enabled but an add carries no baseRowId
    t = _table("unassigned", [[ci, proto, meta, _add("a.parquet", None, 5)]])
    with pytest.raises(DeltaConformanceError, match="no baseRowId"):
        validate_log_dir(t)
    # HWM below the top assigned id
    low = {"domainMetadata": {"domain": "delta.rowTracking",
                              "configuration": json.dumps(
                                  {"rowIdHighWaterMark": 2}),
                              "removed": False}}
    t = _table("lowhwm", [[ci, proto, meta, _add("a.parquet", 0, 5), low]])
    with pytest.raises(DeltaConformanceError, match="does not cover"):
        validate_log_dir(t)
    # a VALID table passes: disjoint ranges + covering HWM
    t = _table("ok", [[ci, proto, meta, _add("a.parquet", 0, 5),
                       _add("b.parquet", 5, 5, ), dom]])
    validate_log_dir(t)


@pytest.mark.nonconformant_log
def test_row_tracking_zero_record_and_swallowed_ranges(tmp_path):
    """Review-fix pins: an EMPTY add occupies no ids (its base may
    coincide with a later file's — legal), while a wide early range
    swallowing a later one is caught even when adjacent-pair sorting
    would hide it."""
    from dc43_spark.io.delta_conformance import validate_log_dir

    schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}}]})
    meta = {"metaData": {
        "id": "x", "format": {"provider": "parquet", "options": {}},
        "schemaString": schema, "partitionColumns": [],
        "configuration": {"delta.enableRowTracking": "true"},
    }}
    proto = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                          "writerFeatures": ["rowTracking",
                                             "domainMetadata"]}}
    ci = {"commitInfo": {"timestamp": 1, "operation": "WRITE"}}

    def _add(path, base, rows):
        return {"add": {"path": path, "partitionValues": {}, "size": 1,
                        "modificationTime": 1, "dataChange": True,
                        "baseRowId": base, "defaultRowCommitVersion": 0,
                        "stats": json.dumps({"numRecords": rows})}}

    def _dom(hwm):
        return {"domainMetadata": {"domain": "delta.rowTracking",
                                   "configuration": json.dumps(
                                       {"rowIdHighWaterMark": hwm}),
                                   "removed": False}}

    def _table(name, actions):
        log = tmp_path / name / "_delta_log"
        log.mkdir(parents=True)
        with open(log / f"{0:020d}.json", "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
        return str(tmp_path / name)

    # legal: the empty add's base coincides with b's range start
    t = _table("empty_ok", [ci, proto, meta,
                            _add("empty.parquet", 5, 0),
                            _add("b.parquet", 5, 5), _dom(9)])
    validate_log_dir(t)
    # caught: a[0,99] swallows b[50,60] even though the sorted NEIGHBOR
    # of b is a same-path duplicate of a
    t = _table("swallow", [ci, proto, meta,
                           _add("a.parquet", 0, 100),
                           _add("a.parquet", 0, 100),
                           _add("b.parquet", 50, 11), _dom(99)])
    with pytest.raises(DeltaConformanceError, match="overlaps"):
        validate_log_dir(t)
