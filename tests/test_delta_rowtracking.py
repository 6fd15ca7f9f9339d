"""Row tracking (Delta writer feature ``rowTracking``, PROTOCOL.md "Row
Tracking"): every add carries ``baseRowId`` / ``defaultRowCommitVersion``,
the ``delta.rowTracking`` domain advances the rowIdHighWaterMark in the
same commit, and rewrites (DML, OPTIMIZE, COW) preserve each row's
STABLE id — materialized into the configured physical columns — while
fresh rows draw ids above the high water mark. ``read(with_row_ids=
True)`` exposes ``_row_id`` / ``_row_commit_version`` with delta-spark's
``_metadata.row_id`` semantics (materialized value, else baseRowId +
row_index)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.delta_dml import delta_delete, delta_merge, delta_update
from dc43_spark.io.delta_log import (
    DeltaLogTable,
    DeltaWriteError,
    delta_clone,
    delta_enable_row_tracking,
    delta_optimize,
    delta_set_properties,
    delta_write,
    write_delta_checkpoint,
)

RT = {"delta.enableRowTracking": "true"}
RT_DV = {"delta.enableRowTracking": "true",
         "delta.enableDeletionVectors": "true"}


def _df(spark, lo, hi, v="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(v).alias("v")
    ).coalesce(1)


def _ids(spark, t):
    return sorted(
        (r.k, r.v, r._row_id, r._row_commit_version)
        for r in DeltaLogTable(spark, t).read(with_row_ids=True).collect()
    )


def _hwm(spark, t):
    d = DeltaLogTable(spark, t)
    conf = d._domains(d.version())["delta.rowTracking"]
    return json.loads(conf)["rowIdHighWaterMark"]


def test_create_enabled_assigns_ids_and_domain(spark, tmp_path):
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 5), t, configuration=RT)
    log = os.path.join(t, "_delta_log")
    with open(os.path.join(log, f"{0:020d}.json")) as fh:
        actions = [json.loads(x) for x in fh if x.strip()]
    protocol = next(a["protocol"] for a in actions if "protocol" in a)
    assert {"rowTracking", "domainMetadata"} <= set(
        protocol["writerFeatures"]
    )
    add = next(a["add"] for a in actions if "add" in a)
    assert add["baseRowId"] == 0 and add["defaultRowCommitVersion"] == 0
    conf = next(a["metaData"] for a in actions if "metaData" in a)[
        "configuration"
    ]
    assert conf["delta.rowTracking.materializedRowIdColumnName"].startswith(
        "_row-id-col-"
    )
    assert _hwm(spark, t) == 4
    assert _ids(spark, t) == [(i, "a", i, 0) for i in range(5)]
    # second append draws the next range
    delta_write(spark, _df(spark, 5, 8), t)
    assert _hwm(spark, t) == 7
    assert _ids(spark, t) == [(i, "a", i, 0) for i in range(5)] + [
        (i, "a", i, 1) for i in range(5, 8)
    ]


def test_enable_on_existing_table_backfills(spark, tmp_path):
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 4), t)
    delta_write(spark, _df(spark, 4, 6), t)
    v = delta_enable_row_tracking(spark, t)
    assert v == 2
    assert delta_enable_row_tracking(spark, t) == 2  # idempotent
    got = _ids(spark, t)
    assert [r[0] for r in got] == list(range(6))
    assert sorted(r[2] for r in got) == list(range(6))  # distinct stable ids
    assert all(r[3] == 2 for r in got)  # backfill version
    assert _hwm(spark, t) == 5
    delta_write(spark, _df(spark, 6, 8), t)
    got = {r.k: r._row_id for r in DeltaLogTable(spark, t).read(
        with_row_ids=True).collect()}
    assert got[6] == 6 and got[7] == 7


def test_ids_stable_through_dv_dml(spark, tmp_path):
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 6), t, configuration=RT_DV)
    delta_update(spark, t, {"v": "'b'"}, "k = 2")     # v1
    delta_delete(spark, t, "k = 5")                   # v2
    src = spark.createDataFrame([(0, "m"), (10, "n")], "k long, v string")
    delta_merge(spark, src, t, ["k"])                 # v3
    got = _ids(spark, t)
    by_k = {r[0]: r for r in got}
    # updated rows keep their IDENTITY, take the mutating commit's version
    assert by_k[2] == (2, "b", 2, 1)
    assert by_k[0] == (0, "m", 0, 3)
    # untouched rows keep everything
    assert by_k[1] == (1, "a", 1, 0)
    assert by_k[3] == (3, "a", 3, 0)
    # deleted id 5 never comes back; the insert draws a FRESH id above it
    assert 5 not in {r[2] for r in got}
    assert by_k[10][2] > 5
    assert by_k[10][3] == 3


def test_ids_stable_through_cow_dml(spark, tmp_path):
    """No DV feature: every touched file rewrites — kept rows must keep
    BOTH id and version via the materialized columns."""
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 6), t, configuration=RT)
    delta_update(spark, t, {"v": "'b'"}, "k = 2")
    delta_delete(spark, t, "k = 0")
    got = _ids(spark, t)
    assert got == [
        (1, "a", 1, 0), (2, "b", 2, 1), (3, "a", 3, 0),
        (4, "a", 4, 0), (5, "a", 5, 0),
    ]
    # the materialized columns are in the FILES, never in the schema
    d = DeltaLogTable(spark, t)
    assert set(d.read().columns) == {"k", "v"}


def test_optimize_materializes_and_draws_fresh_bases(spark, tmp_path):
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 3), t, configuration=RT)
    delta_write(spark, _df(spark, 3, 6), t)
    before = _ids(spark, t)
    v = delta_optimize(spark, t, target_file_mb=128)
    assert v == 2
    assert _ids(spark, t) == before  # identical ids AND versions
    d = DeltaLogTable(spark, t)
    snap = d.snapshot()
    assert len(snap.files) == 1
    # the compacted file drew a fresh base above the old ranges
    assert snap.files[0].base_row_id > 5
    assert _hwm(spark, t) >= snap.files[0].base_row_id + 5


def test_clone_carries_hwm_checkpoint_preserves_it(spark, tmp_path):
    src = str(tmp_path / "src")
    delta_write(spark, _df(spark, 0, 6), src, configuration=RT)
    dest = str(tmp_path / "dest")
    delta_clone(spark, src, dest)
    # the clone's first append may not reuse ids the cloned files carry
    delta_write(spark, _df(spark, 6, 8, "z"), dest)
    got = {r.k: r._row_id for r in DeltaLogTable(spark, dest).read(
        with_row_ids=True).collect()}
    assert got[6] > 5 and got[7] > 5
    assert len(set(got.values())) == 8
    # checkpoint + vacuumed JSON commits: HWM survives via the
    # checkpoint's domainMetadata rows, adds keep their baseRowId
    t2 = str(tmp_path / "cp")
    delta_write(spark, _df(spark, 0, 4), t2, configuration=RT)
    delta_write(spark, _df(spark, 4, 6), t2)
    write_delta_checkpoint(DeltaLogTable(spark, t2))
    log = os.path.join(t2, "_delta_log")
    for n in list(os.listdir(log)):
        if n.endswith(".json") and not n.startswith("_"):
            os.unlink(os.path.join(log, n))
    assert _hwm(spark, t2) == 5
    delta_write(spark, _df(spark, 6, 7), t2)
    got = {r.k: r._row_id for r in DeltaLogTable(spark, t2).read(
        with_row_ids=True).collect()}
    assert got[6] == 6 and len(set(got.values())) == 7


def test_racing_appenders_draw_disjoint_ranges(spark, tmp_path):
    import threading

    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 2), t, configuration=RT)
    errs = []

    def _append(lo):
        try:
            delta_write(spark, _df(spark, lo, lo + 3), t)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=_append, args=(10 * i,))
               for i in range(1, 4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    got = [r._row_id for r in DeltaLogTable(spark, t).read(
        with_row_ids=True).collect()]
    assert len(got) == 11 and len(set(got)) == 11
    assert _hwm(spark, t) == 10


def test_foreign_row_tracking_table_append(spark, tmp_path):
    """A delta-spark-shaped rowTracking log: our append must honor its
    HWM domain and its files' baseRowIds."""
    t = tmp_path / "t"
    log = t / "_delta_log"
    log.mkdir(parents=True)
    spark.range(3).select(F.col("id").alias("k")).coalesce(1) \
        .write.mode("overwrite").parquet(str(t / "stage"))
    part = next(n for n in os.listdir(t / "stage") if n.endswith(".parquet"))
    os.rename(t / "stage" / part, t / "f0.parquet")
    schema = json.dumps({
        "type": "struct",
        "fields": [{"name": "k", "type": "long", "nullable": True,
                    "metadata": {}}],
    })
    actions = [
        {"commitInfo": {"timestamp": 1, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["rowTracking", "domainMetadata"]}},
        {"metaData": {
            "id": "33333333-3333-3333-3333-333333333333",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {
                "delta.enableRowTracking": "true",
                "delta.rowTracking.materializedRowIdColumnName":
                    "_row-id-col-x",
                "delta.rowTracking.materializedRowCommitVersionColumnName":
                    "_row-commit-version-col-x",
            },
        }},
        {"add": {"path": "f0.parquet", "partitionValues": {},
                 "size": os.path.getsize(t / "f0.parquet"),
                 "modificationTime": 1, "dataChange": True,
                 "baseRowId": 100, "defaultRowCommitVersion": 0,
                 "stats": json.dumps({"numRecords": 3, "minValues": {},
                                      "maxValues": {}, "nullCount": {}})}},
        {"domainMetadata": {"domain": "delta.rowTracking",
                            "configuration": json.dumps(
                                {"rowIdHighWaterMark": 102}),
                            "removed": False}},
    ]
    with open(log / f"{0:020d}.json", "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    d = DeltaLogTable(spark, str(t))
    got = {r.k: r._row_id for r in d.read(with_row_ids=True).collect()}
    assert got == {0: 100, 1: 101, 2: 102}
    delta_write(
        spark, spark.range(3, 5).select(F.col("id").alias("k")), str(t)
    )
    got = {r.k: r._row_id for r in DeltaLogTable(spark, str(t)).read(
        with_row_ids=True).collect()}
    assert got[3] >= 103 and got[4] >= 103


def test_set_properties_refuses_row_tracking_keys(spark, tmp_path):
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 3), t)
    with pytest.raises(DeltaWriteError, match="delta_enable_row_tracking"):
        delta_set_properties(spark, t, {"delta.enableRowTracking": "true"})


def test_backfill_reads_footers_when_stats_missing(spark, tmp_path):
    """Finding-class: stats are OPTIONAL per add — a backfill that
    guessed a width would hand two rows the same 'stable' id. The
    enablement commit reads the parquet footer instead."""
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 5), t)   # one 5-row file
    delta_write(spark, _df(spark, 5, 8), t)   # one 3-row file
    log = os.path.join(t, "_delta_log")
    for n in sorted(os.listdir(log)):
        if not n.endswith(".json") or n.startswith("_"):
            continue
        p = os.path.join(log, n)
        with open(p) as fh:
            lines = [json.loads(x) for x in fh if x.strip()]
        for a in lines:
            if "add" in a:
                a["add"].pop("stats", None)  # foreign writer: no stats
        with open(p, "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    delta_enable_row_tracking(spark, t)
    got = [r._row_id for r in DeltaLogTable(spark, t).read(
        with_row_ids=True).collect()]
    assert len(got) == 8 and len(set(got)) == 8
    assert _hwm(spark, t) == 7


def test_enable_refuses_unknown_writer_feature(spark, tmp_path):
    """Enabling row tracking re-adds files — the same writer-protocol
    gate as every other write path must run first."""
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 3), t)
    log = os.path.join(t, "_delta_log")
    name = f"{0:020d}.json"
    with open(os.path.join(log, name)) as fh:
        lines = [json.loads(x) for x in fh if x.strip()]
    for a in lines:
        if "protocol" in a:
            a["protocol"] = {"minReaderVersion": 1, "minWriterVersion": 7,
                             "writerFeatures": ["icebergCompatV2"]}
    with open(os.path.join(log, name), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    with pytest.raises(DeltaWriteError, match="icebergCompatV2"):
        delta_enable_row_tracking(spark, t)


def test_governed_fallback_exposes_row_ids(spark, tmp_path):
    """The governed read route (delta_read_fallback options) can ask for
    the stable id columns — the same spelling a locator would emit."""
    from dc43_spark.io.delta_log import delta_read_fallback

    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 4), t, configuration=RT)
    got = delta_read_fallback(spark, t, {"withRowIds": "true"})
    assert {"_row_id", "_row_commit_version"} <= set(got.columns)
    assert sorted(r._row_id for r in got.collect()) == [0, 1, 2, 3]
    plain = delta_read_fallback(spark, t, {})
    assert "_row_id" not in plain.columns


def test_checkpoint_protection_feature_accepted(spark, tmp_path):
    """checkpointProtection's obligation (never clean up protected log
    history piecemeal) holds vacuously — this writer performs no log
    cleanup — so a foreign table carrying it must write, not refuse."""
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 3), t)
    log = os.path.join(t, "_delta_log")
    name = f"{0:020d}.json"
    with open(os.path.join(log, name)) as fh:
        lines = [json.loads(x) for x in fh if x.strip()]
    for a in lines:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 1, "minWriterVersion": 7,
                "writerFeatures": ["checkpointProtection"],
            }
    with open(os.path.join(log, name), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    delta_write(spark, _df(spark, 3, 5), t)
    assert DeltaLogTable(spark, t).read().count() == 5


def test_multi_clause_merge_preserves_row_ids_per_fate(spark, tmp_path):
    """r12: under an ordered multi-clause merge, each row's STABLE id
    follows its fate — update-fate rows (either matched update clause
    or a by-source SET) keep their id through the rewrite, delete-fate
    rows disappear, and inserted rows draw fresh ids above the mark."""
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 6), t, checkpoint_interval=None,
                configuration=RT_DV)
    before = {r[0]: r[2] for r in _ids(spark, t)}  # k -> _row_id

    src = spark.range(3, 9).select(
        F.col("id").alias("k"), F.lit("s").alias("v")
    )
    delta_merge(
        spark, src, t, ["k"],
        matched_clauses=[
            {"action": "delete", "condition": "t.k = 3"},
            {"action": "update", "condition": "t.k = 4",
             "set": {"v": "'first'"}},
            {"action": "update", "set": {"v": "'second'"}},
        ],
        not_matched_clauses=[{"action": "insert", "condition": "s.k >= 7"}],
        not_matched_by_source_clauses=[
            {"action": "update", "condition": "t.k = 0",
             "set": {"v": "'bs'"}},
        ],
    )
    after = {r[0]: (r[1], r[2]) for r in _ids(spark, t)}
    assert 3 not in after                       # delete fate
    assert after[4] == ("first", before[4])     # first update clause
    assert after[5] == ("second", before[5])    # fallback update clause
    assert after[0] == ("bs", before[0])        # by-source SET keeps id
    assert after[1][1] == before[1] and after[2][1] == before[2]  # untouched
    fresh = {after[k][1] for k in (7, 8)}
    assert fresh.isdisjoint(set(before.values()))  # inserts: new ids
    assert min(fresh) > max(before.values())
