"""Identity columns (PROTOCOL.md Identity Columns — delta-spark's
GENERATED ALWAYS AS IDENTITY): the writer ALLOCATES values for appends
(start + k*step, strictly beyond the high water mark) and advances
``delta.identity.highWaterMark`` in the same commit from the staged
footer stats; explicit inserts pass through only under
``allowExplicitInsert``; DML allows the operations that cannot corrupt
the sequence and refuses the rest."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.delta_dml import delta_delete, delta_merge, delta_update
from dc43_spark.io.delta_log import (
    DeltaLogTable,
    DeltaWriteError,
    _identity_columns,
    _metadata_commit,
    delta_write,
)


def _mk_identity_table(spark, tmp_path, *, start=100, step=10, allow=False):
    """Create via the writer, then stamp the identity metadata with a raw
    metadata commit (delta-spark creates these via DDL; the fixture stays
    writer-independent)."""
    path = str(tmp_path / "t")
    delta_write(
        spark,
        spark.createDataFrame([(0, "seed", 100)], "k long, v string, id long"),
        path, checkpoint_interval=None,
    )

    def mutate(meta, protocol):
        doc = json.loads(meta["schemaString"])
        for f in doc["fields"]:
            if f["name"] == "id":
                md = dict(f.get("metadata") or {})
                md["delta.identity.start"] = start
                md["delta.identity.step"] = step
                md["delta.identity.highWaterMark"] = 100
                md["delta.identity.allowExplicitInsert"] = allow
                f["metadata"] = md
        meta["schemaString"] = json.dumps(doc)
        return meta, None

    _metadata_commit(spark, path, "ADD IDENTITY", {}, mutate)
    return path


def test_append_allocates_beyond_high_water_mark(spark, tmp_path):
    path = _mk_identity_table(spark, tmp_path)
    d = DeltaLogTable(spark, path)
    delta_write(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                              "k long, v string"),
        path, mode="append", checkpoint_interval=None,
    )
    rows = {r.k: r.id for r in d.read().collect()}
    new_ids = [rows[k] for k in (1, 2, 3)]
    assert all(i > 100 for i in new_ids)                 # beyond the HWM
    assert all((i - 100) % 10 == 0 for i in new_ids)     # start + k*step
    assert len(set(new_ids)) == 3                        # unique
    spec = _identity_columns(d.snapshot().schema)["id"]
    assert spec["hwm"] == max(new_ids)                   # advanced in-commit
    # a second append keeps allocating past the NEW mark
    delta_write(
        spark, spark.createDataFrame([(4, "d")], "k long, v string"),
        path, mode="append", checkpoint_interval=None,
    )
    rows2 = {r.k: r.id for r in d.read().collect()}
    assert rows2[4] > max(new_ids)
    assert (rows2[4] - 100) % 10 == 0


def test_explicit_insert_rules(spark, tmp_path):
    path = _mk_identity_table(spark, tmp_path, allow=False)
    with pytest.raises(DeltaWriteError, match="IDENTITY"):
        delta_write(
            spark,
            spark.createDataFrame([(9, "x", 999)], "k long, v string, id long"),
            path, mode="append", checkpoint_interval=None,
        )
    path2 = _mk_identity_table(spark, tmp_path / "allow", allow=True)
    delta_write(
        spark,
        spark.createDataFrame([(9, "x", 999)], "k long, v string, id long"),
        path2, mode="append", checkpoint_interval=None,
    )
    d = DeltaLogTable(spark, path2)
    assert {(r.k, r.id) for r in d.read().collect()} >= {(9, 999)}
    # explicit values do NOT advance the mark (delta-spark's rule)
    assert _identity_columns(d.snapshot().schema)["id"]["hwm"] == 100


def test_dml_gates_on_identity_tables(spark, tmp_path):
    path = _mk_identity_table(spark, tmp_path)
    delta_write(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        path, mode="append", checkpoint_interval=None,
    )
    d = DeltaLogTable(spark, path)
    # DELETE and non-identity UPDATE are safe and allowed
    delta_delete(spark, path, "k = 0")
    delta_update(spark, path, {"v": "upper(v)"}, "k = 1")
    got = {(r.k, r.v) for r in d.read().collect()}
    assert (1, "A") in got and (0, "seed") not in got
    # SET on the identity column refuses
    with pytest.raises(DeltaWriteError, match="IDENTITY"):
        delta_update(spark, path, {"id": "0"}, "k = 1")
    # updateAll refuses (it would overwrite identity values); merge
    # INSERTS allocate since r12 (VERDICT r11 #3) — tested below;
    # identity-untouched SET maps work
    src = spark.createDataFrame([(2, "merged")], "k long, v string")
    with pytest.raises(DeltaWriteError, match="updateAll"):
        delta_merge(spark, src, path, ["k"], when_not_matched="ignore")
    delta_merge(
        spark, src, path, ["k"],
        when_matched={"v": "s.v"}, when_not_matched="ignore",
    )
    rows = {r.k: (r.v, r.id) for r in d.read().collect()}
    assert rows[2][0] == "merged"
    assert rows[2][1] is not None and rows[2][1] > 100  # identity kept


def test_negative_step_allocates_downward(spark, tmp_path):
    path = _mk_identity_table(spark, tmp_path, start=-5, step=-5)
    d = DeltaLogTable(spark, path)

    # reset the mark below: hand-stamp hwm to -5 via the fixture's shape
    def mutate(meta, protocol):
        doc = json.loads(meta["schemaString"])
        for f in doc["fields"]:
            if f["name"] == "id":
                f["metadata"]["delta.identity.highWaterMark"] = -5
        meta["schemaString"] = json.dumps(doc)
        return meta, None

    _metadata_commit(spark, path, "SET HWM", {}, mutate)
    delta_write(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        path, mode="append", checkpoint_interval=None,
    )
    ids = [r.id for r in d.read().filter("k > 0").collect()]
    assert all(i < -5 for i in ids)
    assert all((i + 5) % 5 == 0 for i in ids)
    assert _identity_columns(d.snapshot().schema)["id"]["hwm"] == min(ids)


def test_concurrent_identity_allocation_aborts(spark, tmp_path, monkeypatch):
    """Review r11 fix: the HWM guard must compare the HEAD's marks
    against the PINNED specs unconditionally (a head-vs-base comparison
    was dead code — base_version is reassigned by the head-moved
    re-check). A racer that advances the mark between our staging and
    our claim forces an abort, never a silent duplicate allocation."""
    from dc43_spark.io import snaplog as sl

    path = _mk_identity_table(spark, tmp_path)
    real_claim = sl.LinkCommitClaimer.claim
    state = {"injected": False}

    def claim(self, log, name, payload):
        if not state["injected"] and path in log:
            state["injected"] = True
            # a concurrent writer lands FIRST and advances the mark
            delta_write(
                spark,
                spark.createDataFrame([(50, "z")], "k long, v string"),
                path, mode="append", checkpoint_interval=None,
            )
        return real_claim(self, log, name, payload)

    monkeypatch.setattr(sl.LinkCommitClaimer, "claim", claim)
    from dc43_spark.io.delta_log import DeltaProtocolError

    with pytest.raises(DeltaProtocolError, match="identity high water mark"):
        delta_write(
            spark,
            spark.createDataFrame([(60, "y")], "k long, v string"),
            path, mode="append", checkpoint_interval=None,
        )


def test_schema_changing_overwrite_refuses_on_identity(spark, tmp_path):
    """Review r11 fix: a schema-changing overwrite would replace the
    schemaString with df.schema.json() and silently ERASE the
    delta.identity.* definition — refuse instead."""
    path = _mk_identity_table(spark, tmp_path)
    with pytest.raises(DeltaWriteError, match="identity-"):
        delta_write(
            spark,
            spark.createDataFrame([(1, "a", "extra")],
                                  "k long, v string, w string"),
            path, mode="overwrite", checkpoint_interval=None,
        )
    # a same-schema overwrite still works and re-allocates
    delta_write(
        spark,
        spark.createDataFrame([(7, "n")], "k long, v string"),
        path, mode="overwrite", checkpoint_interval=None,
    )
    d = DeltaLogTable(spark, path)
    rows = {r.k: r.id for r in d.read().collect()}
    assert rows[7] > 100
    assert _identity_columns(d.snapshot().schema)["id"]["hwm"] == rows[7]


def test_merge_inserts_allocate_identity(spark, tmp_path):
    """r12 (VERDICT r11 #3): merge-inserted rows allocate start + k*step
    beyond the high water mark in the SAME commit, the mark advances
    from the staged footer stats, matched rows keep their identity."""
    path = _mk_identity_table(spark, tmp_path)
    delta_write(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        path, mode="append", checkpoint_interval=None,
    )
    d = DeltaLogTable(spark, path)
    mark0 = _identity_columns(d.snapshot().schema)["id"]["hwm"]
    ids_before = {r.k: r.id for r in d.read().collect()}

    src = spark.createDataFrame(
        [(2, "upd"), (5, "new5"), (6, "new6"), (7, "new7")],
        "k long, v string",
    )
    delta_merge(
        spark, src, path, ["k"],
        when_matched={"v": "s.v"},  # insertAll default for not-matched
    )
    rows = {r.k: (r.v, r.id) for r in d.read().collect()}
    # matched row updated, identity UNCHANGED
    assert rows[2] == ("upd", ids_before[2])
    new_ids = [rows[k][1] for k in (5, 6, 7)]
    assert all(i > mark0 for i in new_ids)              # beyond the mark
    assert all((i - 100) % 10 == 0 for i in new_ids)    # start + k*step
    assert len(set(new_ids)) == 3                       # unique
    # mark advanced atomically with the merge commit
    assert _identity_columns(d.snapshot().schema)["id"]["hwm"] == max(new_ids)
    # a follow-up append keeps allocating past the merge's mark
    delta_write(
        spark, spark.createDataFrame([(8, "h")], "k long, v string"),
        path, mode="append", checkpoint_interval=None,
    )
    rows2 = {r.k: r.id for r in d.read().collect()}
    assert rows2[8] > max(new_ids)


def test_merge_insert_explicit_identity_rules(spark, tmp_path):
    """Explicit identity values in insert clauses follow delta_write's
    rules: refused under allowExplicitInsert=false, passed through (mark
    not chased) under true; mixing explicit and allocating clauses in
    one MERGE refuses."""
    path = _mk_identity_table(spark, tmp_path, allow=False)
    src = spark.createDataFrame([(5, "x", 999)], "k long, v string, id long")
    with pytest.raises(DeltaWriteError, match="allowExplicitInsert"):
        delta_merge(
            spark, src, path, ["k"],
            when_matched="ignore",
            not_matched_clauses=[{
                "action": "insert",
                "values": {"k": "s.k", "v": "s.v", "id": "s.id"},
            }],
        )

    path2 = _mk_identity_table(spark, tmp_path / "allow", allow=True)
    d2 = DeltaLogTable(spark, path2)
    delta_merge(
        spark, src, path2, ["k"],
        when_matched="ignore",
        not_matched_clauses=[{
            "action": "insert",
            "values": {"k": "s.k", "v": "s.v", "id": "s.id"},
        }],
    )
    assert {(r.k, r.id) for r in d2.read().collect()} >= {(5, 999)}
    # explicit values do NOT advance the mark
    assert _identity_columns(d2.snapshot().schema)["id"]["hwm"] == 100
    # mixing explicit and allocating insert clauses refuses
    with pytest.raises(DeltaWriteError, match="ambiguous"):
        delta_merge(
            spark, src, path2, ["k"],
            when_matched="ignore",
            not_matched_clauses=[
                {"action": "insert", "condition": "s.k > 100",
                 "values": {"k": "s.k", "v": "s.v", "id": "s.id"}},
                {"action": "insert", "values": {"k": "s.k", "v": "s.v"}},
            ],
        )


def test_merge_identity_race_reallocates(spark, tmp_path, monkeypatch):
    """A concurrent commit that advances the mark between the merge's
    staging and its claim forces a _DmlConflict retry; the retry
    reallocates under the NEW mark — never duplicate identities."""
    from dc43_spark.io import snaplog as sl

    path = _mk_identity_table(spark, tmp_path)
    real_claim = sl.LinkCommitClaimer.claim
    state = {"injected": False}

    def claim(self, log, name, payload):
        if not state["injected"] and path in log and '"MERGE"' in payload:
            state["injected"] = True
            delta_write(
                spark,
                spark.createDataFrame([(50, "z")], "k long, v string"),
                path, mode="append", checkpoint_interval=None,
            )
        return real_claim(self, log, name, payload)

    monkeypatch.setattr(sl.LinkCommitClaimer, "claim", claim)
    src = spark.createDataFrame([(60, "m")], "k long, v string")
    delta_merge(spark, src, path, ["k"], when_matched="ignore")
    d = DeltaLogTable(spark, path)
    rows = {r.k: r.id for r in d.read().collect()}
    assert state["injected"]
    ids = [v for v in rows.values() if v is not None]
    assert len(ids) == len(set(ids)), f"duplicate identity values: {rows}"
    # the merge-inserted row allocated past the RACER's allocation
    assert rows[60] > rows[50] > 100
