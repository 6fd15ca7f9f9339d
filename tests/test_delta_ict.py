"""In-commit timestamps (Delta writer feature ``inCommitTimestamp``,
PROTOCOL.md "In-Commit Timestamps"): commit time lives in
``commitInfo.inCommitTimestamp`` — strictly monotonic, authoritative for
time travel / history / CDF stamps — instead of file modification time.

Covers: create-time enablement (protocol v7 + feature, commit 0
stamped), late enablement via SET TBLPROPERTIES (enablementVersion /
enablementTimestamp markers, pre-enablement versions keep file-time
stamps), every commit path stamping (write / DML / OPTIMIZE / RESTORE /
CLONE / metadata commits), monotonicity under racing writers, and the
read side preferring ICT over mtime (ref spark/io/locators.py:490-509
drives timestamp travel through delta-spark; this is the jar-less
equivalent)."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.delta_dml import delta_delete, delta_merge, delta_update
from dc43_spark.io.delta_log import (
    DeltaLogTable,
    delta_clone,
    delta_optimize,
    delta_restore,
    delta_set_properties,
    delta_write,
)

ICT_CONF = {"delta.enableInCommitTimestamps": "true"}


def _df(spark, lo, hi, v="x"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(v).alias("v")
    ).coalesce(1)


def _commits(path):
    log = os.path.join(path, "_delta_log")
    out = {}
    for n in sorted(os.listdir(log)):
        if n.endswith(".json") and not n.startswith("_"):
            with open(os.path.join(log, n)) as fh:
                out[int(n.split(".")[0])] = [
                    json.loads(x) for x in fh if x.strip()
                ]
    return out


def _icts(path):
    """version -> inCommitTimestamp (only the commits that carry one)."""
    out = {}
    for v, lines in _commits(path).items():
        info = lines[0].get("commitInfo") or {}
        if "inCommitTimestamp" in info:
            out[v] = info["inCommitTimestamp"]
    return out


def test_create_with_ict_stamps_and_raises_protocol(spark, tmp_path):
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 5), t, configuration=ICT_CONF)
    commits = _commits(t)
    protocol = next(a["protocol"] for a in commits[0] if "protocol" in a)
    assert protocol["minWriterVersion"] == 7
    assert "inCommitTimestamp" in protocol["writerFeatures"]
    # v7-only feature on a fresh table: the features the old legacy
    # version implied are spelled out, not dropped
    assert {"invariants", "appendOnly"} <= set(protocol["writerFeatures"])
    assert 0 in _icts(t)
    # appends keep stamping, strictly increasing
    delta_write(spark, _df(spark, 5, 8), t)
    delta_write(spark, _df(spark, 8, 9), t)
    icts = _icts(t)
    assert sorted(icts) == [0, 1, 2]
    assert icts[0] < icts[1] < icts[2]


def test_read_side_prefers_ict_over_mtime(spark, tmp_path):
    """Timestamp time travel and history() must use the in-commit stamp:
    scrambling every file mtime changes nothing."""
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 3), t, configuration=ICT_CONF)
    delta_write(spark, _df(spark, 3, 6), t)
    d = DeltaLogTable(spark, t)
    icts = _icts(t)
    # make mtimes actively wrong (far future, reversed order)
    log = os.path.join(t, "_delta_log")
    for i, n in enumerate(sorted(os.listdir(log))):
        os.utime(os.path.join(log, n), (4102444800 - i, 4102444800 - i))
    hist = {v: ts for v, ts, _op in d.history()}
    assert hist[0] == pytest.approx(icts[0] / 1000.0)
    assert hist[1] == pytest.approx(icts[1] / 1000.0)
    # travel to just-after-v0's stamp lands on v0, not on mtime order
    got = d.read(timestamp_as_of=icts[0] / 1000.0 + 1e-4).collect()
    assert {r.k for r in got} == {0, 1, 2}


def test_late_enablement_records_markers_and_splits_history(spark, tmp_path):
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 3), t)          # v0: no ICT
    delta_write(spark, _df(spark, 3, 6), t)          # v1: no ICT
    v = delta_set_properties(spark, t, ICT_CONF)     # v2: enablement
    assert v == 2
    commits = _commits(t)
    meta = next(a["metaData"] for a in commits[2] if "metaData" in a)
    conf = meta["configuration"]
    assert conf["delta.inCommitTimestampEnablementVersion"] == "2"
    ict2 = int(conf["delta.inCommitTimestampEnablementTimestamp"])
    icts = _icts(t)
    assert sorted(icts) == [2] and icts[2] == ict2
    # protocol rose to v7 with the feature
    d = DeltaLogTable(spark, t)
    snap = d.snapshot()
    _p = [a for lines in commits.values() for a in lines if "protocol" in a]
    assert any(
        "inCommitTimestamp" in (p["protocol"].get("writerFeatures") or ())
        for p in _p
    )
    # pre-enablement versions still read mtime; post read ICT
    assert d._commit_timestamp(2) == pytest.approx(ict2 / 1000.0)
    # writes after enablement keep the chain
    delta_write(spark, _df(spark, 6, 9), t)
    icts = _icts(t)
    assert icts[3] > icts[2]
    assert snap.version == 2


def test_every_commit_path_stamps(spark, tmp_path):
    """DML (delete/update/merge), OPTIMIZE, RESTORE and metadata commits
    all chain the stamp; the conformance fixture then re-validates the
    whole log shape at teardown."""
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 10), t, configuration=ICT_CONF)
    delta_write(spark, _df(spark, 10, 20), t)
    delta_delete(spark, t, "k >= 18")                             # v2
    delta_update(spark, t, {"v": "'y'"}, "k < 2")                 # v3
    src = spark.range(3).select(
        F.col("id").alias("k"), F.lit("m").alias("v")
    )
    delta_merge(spark, src, t, ["k"])                             # v4
    delta_optimize(spark, t)                                      # v5
    delta_restore(spark, t, version=4)                            # v6
    delta_set_properties(spark, t, {"foo": "bar"})                # v7
    icts = _icts(t)
    assert sorted(icts) == list(range(8))
    vals = [icts[v] for v in range(8)]
    assert all(b > a for a, b in zip(vals, vals[1:]))
    # commitInfo is the FIRST action everywhere
    for v, lines in _commits(t).items():
        assert "commitInfo" in lines[0], f"v{v} commitInfo not first"


def test_clone_restarts_the_chain(spark, tmp_path):
    src = str(tmp_path / "src")
    delta_write(spark, _df(spark, 0, 5), src, configuration=ICT_CONF)
    delta_write(spark, _df(spark, 5, 8), src)
    dest = str(tmp_path / "dest")
    delta_clone(spark, src, dest, shallow=True)
    icts = _icts(dest)
    assert sorted(icts) == [0]
    meta = next(
        a["metaData"] for a in _commits(dest)[0] if "metaData" in a
    )
    conf = meta["configuration"]
    # enablement markers never carry over: they'd point at SOURCE versions
    assert "delta.inCommitTimestampEnablementVersion" not in conf
    assert conf["delta.enableInCommitTimestamps"] == "true"
    # and the clone keeps stamping on its own history
    delta_write(spark, _df(spark, 8, 9), dest)
    icts = _icts(dest)
    assert icts[1] > icts[0]


def test_monotonic_when_clock_stalls(spark, tmp_path, monkeypatch):
    """Two commits inside the same millisecond: the second must still be
    strictly greater (max(clock, prev+1))."""
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 2), t, configuration=ICT_CONF)
    frozen = time.time()
    monkeypatch.setattr(time, "time", lambda: frozen)
    delta_write(spark, _df(spark, 2, 3), t)
    delta_write(spark, _df(spark, 3, 4), t)
    icts = _icts(t)
    assert icts[2] > icts[1], icts


def test_racing_appenders_chain_without_gaps(spark, tmp_path):
    import threading

    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 2), t, configuration=ICT_CONF)
    errs = []

    def _append(lo):
        try:
            delta_write(spark, _df(spark, lo, lo + 2), t)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=_append, args=(10 * i,))
               for i in range(1, 4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    icts = _icts(t)
    assert sorted(icts) == [0, 1, 2, 3]
    vals = [icts[v] for v in range(4)]
    assert all(b > a for a, b in zip(vals, vals[1:]))


def test_hand_written_ict_log_reads_like_delta_spark(spark, tmp_path):
    """A foreign (delta-spark-shaped) log whose ICTs disagree with both
    commitInfo.timestamp and mtime: the reader must trust ICT."""
    t = tmp_path / "t"
    log = t / "_delta_log"
    log.mkdir(parents=True)
    spark.range(2).select(F.col("id").alias("k")).coalesce(1) \
        .write.mode("overwrite").parquet(str(t / "stage"))
    part = next(
        n for n in os.listdir(t / "stage") if n.endswith(".parquet")
    )
    os.rename(t / "stage" / part, t / "f0.parquet")
    schema = json.dumps({
        "type": "struct",
        "fields": [{"name": "k", "type": "long", "nullable": True,
                    "metadata": {}}],
    })
    base = 1700000000000
    v0 = [
        {"commitInfo": {"timestamp": 1, "inCommitTimestamp": base,
                        "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["inCommitTimestamp"]}},
        {"metaData": {
            "id": "11111111-1111-1111-1111-111111111111",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {
                "delta.enableInCommitTimestamps": "true",
                "delta.inCommitTimestampEnablementVersion": "0",
                "delta.inCommitTimestampEnablementTimestamp": str(base),
            },
        }},
        {"add": {"path": "f0.parquet", "partitionValues": {},
                 "size": os.path.getsize(t / "f0.parquet"),
                 "modificationTime": 1, "dataChange": True}},
    ]
    with open(log / f"{0:020d}.json", "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in v0) + "\n")
    d = DeltaLogTable(spark, str(t))
    assert d._commit_timestamp(0) == pytest.approx(base / 1000.0)
    assert {r.k for r in d.read(
        timestamp_as_of=base / 1000.0
    ).collect()} == {0, 1}
    # and OUR writer appends to the foreign table, continuing the chain
    delta_write(spark, spark.range(2, 4).select(F.col("id").alias("k")), str(t))
    icts = _icts(str(t))
    assert icts[1] > base


def test_ict_chain_ignores_v2_json_checkpoints(spark, tmp_path):
    """Finding-class: a v2 JSON checkpoint (<v>.checkpoint.<uuid>.json)
    is a snapshot, not a commit — the conformance chain validator must
    not demand an inCommitTimestamp from it."""
    from dc43_spark.io.delta_conformance import validate_log_dir

    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 3), t, configuration=ICT_CONF)
    delta_write(spark, _df(spark, 3, 5), t)
    log = os.path.join(t, "_delta_log")
    cp = os.path.join(
        log, f"{1:020d}.checkpoint.0f0f0f0f0f0f4e4e8e8e010101010101.json"
    )
    with open(cp, "w") as fh:
        fh.write(json.dumps(
            {"checkpointMetadata": {"version": 1, "tags": {}}}
        ) + "\n")
    out = validate_log_dir(t)  # must not raise on the checkpoint file
    assert out["commits"] >= 2
