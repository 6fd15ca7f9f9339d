"""Logical conflict detection + commit rebase (Delta's
OptimisticTransaction checkAndRetry semantics on the snaplog log).

Every test interleaves a REAL concurrent commit between an operation's
snapshot read and its commit attempt, by wrapping ``SnaplogTable._commit``
so the first call fires an injected operation through a second handle
first. Disjoint work must REBASE and land; overlapping work must raise
``SnapshotConflictError`` with the precise reason.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.snaplog import ReadInfo, SnaplogTable, SnapshotConflictError

def _df(spark, lo, hi, val="x"):
    return spark.range(lo, hi).select(
        F.col("id").cast("long"), F.lit(val).alias("v")
    ).repartition(1)


def inject_before_next_commit(monkeypatch, action):
    """Run ``action()`` exactly once, immediately before the next
    ``_commit`` attempt anywhere — i.e. after the outer operation has
    read its snapshot and staged its files, a true write-write race."""
    fired = {"done": False}
    orig = SnaplogTable._commit

    def wrapper(self, *a, **k):
        if not fired["done"]:
            fired["done"] = True
            action()
        return orig(self, *a, **k)

    monkeypatch.setattr(SnaplogTable, "_commit", wrapper)


def heads(t):
    return {r["id"]: r["v"] for r in t.read().collect()}


# ---------------- merge


def test_merge_rebases_over_blind_append(spark, tmp_path, monkeypatch):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 10))
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch, lambda: other.write(_df(spark, 100, 105, "new"))
    )
    stats = t.merge(_df(spark, 0, 5, "upd"), ["id"])
    assert stats.files_rewritten == 1
    got = heads(t)
    assert all(got[i] == "upd" for i in range(5))
    assert all(got[i] == "x" for i in range(5, 10))
    assert all(got[i] == "new" for i in range(100, 105))
    ops = [h.operation for h in t.history()]
    assert ops[-2:] == ["append", "merge"]  # append landed FIRST, merge rebased


def test_merge_serializable_conflicts_on_overlapping_append(
    spark, tmp_path, monkeypatch
):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 10))
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch, lambda: other.write(_df(spark, 3, 6, "race"))
    )
    with pytest.raises(SnapshotConflictError, match="read predicate"):
        t.merge(_df(spark, 0, 5, "upd"), ["id"], isolation="serializable")


def test_merge_serializable_allows_range_disjoint_append(
    spark, tmp_path, monkeypatch
):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 10))
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch, lambda: other.write(_df(spark, 1000, 1005, "far"))
    )
    t.merge(_df(spark, 0, 5, "upd"), ["id"], isolation="serializable")
    got = heads(t)
    assert got[0] == "upd" and got[1000] == "far"


def test_disjoint_merges_both_land(spark, tmp_path, monkeypatch):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 50))
    t.write(_df(spark, 50, 100))  # second file, disjoint id range
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch,
        lambda: other.merge(_df(spark, 90, 95, "m2"), ["id"]),
    )
    t.merge(_df(spark, 0, 5, "m1"), ["id"])
    got = heads(t)
    assert all(got[i] == "m1" for i in range(5))
    assert all(got[i] == "m2" for i in range(90, 95))
    assert got[20] == "x" and got[70] == "x"


def test_overlapping_merges_conflict(spark, tmp_path, monkeypatch):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 50))
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch, lambda: other.merge(_df(spark, 0, 3, "m2"), ["id"])
    )
    with pytest.raises(SnapshotConflictError, match="rewrote|removed|read"):
        t.merge(_df(spark, 4, 8, "m1"), ["id"])


def test_overwrite_conflicts_pinned_merge(spark, tmp_path, monkeypatch):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 10))
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch, lambda: other.write(_df(spark, 0, 3, "ow"), mode="overwrite")
    )
    with pytest.raises(SnapshotConflictError):
        t.merge(_df(spark, 0, 5, "m"), ["id"])


# ---------------- compact (OPTIMIZE must not abort ingest)


def test_compact_rebases_over_append(spark, tmp_path, monkeypatch):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    for i in range(3):
        t.write(_df(spark, i * 10, i * 10 + 10))
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch, lambda: other.write(_df(spark, 500, 510, "in-flight"))
    )
    v = t.compact(target_file_mb=64)
    assert v is not None
    got = heads(t)
    assert len(got) == 40  # 30 compacted + 10 appended: nothing lost
    assert all(got[i] == "in-flight" for i in range(500, 510))
    # the in-flight append's file survived compaction as its own file
    snap = t.snapshot()
    assert snap.num_files == 2


def test_compact_conflicts_when_racer_rewrote_its_input(
    spark, tmp_path, monkeypatch
):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 10))
    t.write(_df(spark, 10, 20))
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch, lambda: other.delete([("id", "<", 3)])
    )
    with pytest.raises(SnapshotConflictError, match="rewrote|removed"):
        t.compact(target_file_mb=64)


# ---------------- delete / update


def test_delete_rebases_over_blind_append(spark, tmp_path, monkeypatch):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 10))
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch, lambda: other.write(_df(spark, 200, 205, "new"))
    )
    stats = t.delete([("id", "<", 5)])
    assert stats.files_rewritten == 1
    got = heads(t)
    assert sorted(got) == [5, 6, 7, 8, 9, *range(200, 205)]


def test_disjoint_deletes_both_land(spark, tmp_path, monkeypatch):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 50))
    t.write(_df(spark, 50, 100))
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch, lambda: other.delete([("id", ">=", 95)])
    )
    t.delete([("id", "<", 5)])
    assert sorted(heads(t)) == list(range(5, 95))


def test_same_file_deletes_conflict(spark, tmp_path, monkeypatch):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 50))
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch, lambda: other.delete([("id", "<", 3)])
    )
    with pytest.raises(SnapshotConflictError):
        t.delete([("id", ">", 40)])


def test_update_rebases_over_disjoint_nonblind_writer(
    spark, tmp_path, monkeypatch
):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 50))
    t.write(_df(spark, 50, 100))
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch, lambda: other.update([("id", ">=", 90)], {"v": F.lit("u2")})
    )
    t.update([("id", "<", 5)], {"v": F.lit("u1")})
    got = heads(t)
    assert all(got[i] == "u1" for i in range(5))
    assert all(got[i] == "u2" for i in range(90, 100))


def test_dv_add_conflicts_pinned_ops(spark, tmp_path, monkeypatch):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 50))
    t.write(_df(spark, 50, 100))
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch,
        lambda: other.delete([("id", ">=", 95)], strategy="merge_on_read"),
    )
    with pytest.raises(SnapshotConflictError, match="deletion vectors"):
        t.delete([("id", "<", 5)])


def test_schema_evolution_conflicts_pinned_ops(spark, tmp_path, monkeypatch):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 50))
    t.write(_df(spark, 50, 100))
    other = SnaplogTable(spark, t.path)
    evolved = _df(spark, 200, 205).withColumn("extra", F.lit(1))
    inject_before_next_commit(
        monkeypatch, lambda: other.write(evolved, merge_schema=True)
    )
    with pytest.raises(SnapshotConflictError, match="schema"):
        t.delete([("id", "<", 5)])


# ---------------- materialize


def test_materialize_rebases_over_append(spark, tmp_path, monkeypatch):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 20))
    t.delete([("id", "<", 5)], strategy="merge_on_read")
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch, lambda: other.write(_df(spark, 300, 305, "late"))
    )
    assert t.materialize_deletes() == 1
    assert not t.snapshot().dvs
    got = heads(t)
    assert sorted(got) == [*range(5, 20), *range(300, 305)]


# ---------------- partitioned tables: the headline scale story


def test_partition_disjoint_merges_land(spark, tmp_path, monkeypatch):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    df = spark.range(100).select(
        F.col("id").cast("long"),
        (F.col("id") % 2).cast("long").alias("p"),
        F.lit("x").alias("v"),
    )
    t.write(df, partition_by=["p"])
    other = SnaplogTable(spark, t.path)
    src2 = spark.range(1, 9, 2).select(
        F.col("id").cast("long"), F.lit(1).cast("long").alias("p"),
        F.lit("odd").alias("v"),
    )
    src1 = spark.range(0, 8, 2).select(
        F.col("id").cast("long"), F.lit(0).cast("long").alias("p"),
        F.lit("even").alias("v"),
    )
    # merges key on (p, id): each one's read set + key envelope stays
    # inside its own partition, so both commit
    inject_before_next_commit(monkeypatch, lambda: other.merge(src2, ["p", "id"]))
    t.merge(src1, ["p", "id"])
    got = heads(t)
    assert all(got[i] == "even" for i in range(0, 8, 2))
    assert all(got[i] == "odd" for i in range(1, 9, 2))
    assert got[50] == "x"


# ---------------- guardrails


def test_bad_isolation_rejected(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 5))
    with pytest.raises(ValueError, match="isolation"):
        t.merge(_df(spark, 0, 2, "m"), ["id"], isolation="chaos")
    with pytest.raises(ValueError, match="isolation"):
        t.delete([("id", "<", 1)], isolation="chaos")


def test_readinfo_defaults():
    info = ReadInfo(paths=frozenset({"data/a.parquet"}))
    assert info.reads_rest and info.isolation == "write_serializable"


def test_rebase_replays_full_window(spark, tmp_path, monkeypatch):
    """Three commits land mid-flight; all three are checked (the last
    one conflicts even though the first two are disjoint)."""
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 50))
    t.write(_df(spark, 50, 100))
    other = SnaplogTable(spark, t.path)

    def storm():
        other.write(_df(spark, 1000, 1005, "a"))
        other.write(_df(spark, 2000, 2005, "b"))
        other.delete([("id", "<", 3)])  # rewrites the outer delete's file

    inject_before_next_commit(monkeypatch, storm)
    with pytest.raises(SnapshotConflictError):
        t.delete([("id", "<", 10)])
    # and the disjoint twin still lands over the same storm
    t2 = SnaplogTable(spark, str(tmp_path / "t2"))
    t2.write(_df(spark, 0, 50))
    t2.write(_df(spark, 50, 100))
    other2 = SnaplogTable(spark, t2.path)

    def storm2():
        other2.write(_df(spark, 1000, 1005, "a"))
        # bounded so it rewrites ONLY file B, not the fresh append
        other2.delete([("id", ">=", 95), ("id", "<", 200)])

    inject_before_next_commit(monkeypatch, storm2)
    t2.delete([("id", "<", 10)])
    got = sorted(heads(t2))
    assert got == [*range(10, 95), *range(1000, 1005)]


def test_threaded_writer_soak(spark, tmp_path):
    """REAL races, not monkeypatched interleavings: appender threads,
    disjoint-key merger threads, and auto-compaction all hammer ONE
    table through independent handles. Appends chase the head
    (retry_append); mergers retry on SnapshotConflictError like any
    production writer. The final state must equal the serial model —
    every appended row exactly once, each merged key at its thread's
    last value — and the log must be a gap-free version chain."""
    import threading

    from dc43_spark.io.snaplog import SnaplogTable, SnapshotConflictError

    path = str(tmp_path / "t")
    SnaplogTable(spark, path, auto_compact=True, auto_compact_min_files=6).write(
        spark.createDataFrame([(0, "seed")], "k long, v string").coalesce(1),
        mode="overwrite",
    )
    errors = []

    def appender(tid: int) -> None:
        t = SnaplogTable(spark, path, auto_compact=True, auto_compact_min_files=6)
        try:
            for i in range(6):
                t.write(
                    spark.createDataFrame(
                        [(100 * tid + i, f"a{tid}")], "k long, v string"
                    ).coalesce(1),
                    mode="append",
                )
        except Exception as exc:  # pragma: no cover - fail loudly below
            errors.append(exc)

    def merger(tid: int) -> None:
        t = SnaplogTable(spark, path)
        try:
            for i in range(4):
                src = spark.createDataFrame(
                    [(10_000 * tid + j, f"m{tid}_{i}") for j in range(3)],
                    "k long, v string",
                ).coalesce(1)
                for attempt in range(25):
                    try:
                        t.merge(src, ["k"])
                        break
                    except SnapshotConflictError:
                        continue
                else:  # pragma: no cover
                    raise RuntimeError(f"merger {tid} starved out")
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=appender, args=(tid,)) for tid in (1, 2, 3)]
    threads += [threading.Thread(target=merger, args=(tid,)) for tid in (1, 2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errors, errors

    t = SnaplogTable(spark, path)
    got = {r.k: r.v for r in t.read().collect()}
    want = {0: "seed"}
    for tid in (1, 2, 3):
        want.update({100 * tid + i: f"a{tid}" for i in range(6)})
    for tid in (1, 2):
        want.update({10_000 * tid + j: f"m{tid}_3" for j in range(3)})
    assert got == want
    versions = [c.version for c in t.history()]
    assert versions == list(range(len(versions)))  # gap-free chain
    ops = {c.operation for c in t.history()}
    assert {"append", "merge"} <= ops


# ---------------- write_txn (idempotent append) vs rule changes


def test_write_txn_aborts_on_concurrent_constraint_change(
    spark, tmp_path, monkeypatch
):
    """write_txn validates constraints/generated/mapping against the head
    once before staging; a rule change landing between validation and
    commit means the staged files embody STALE rules — the retry loop
    must abort (the files were validated under the old constraint set),
    not blindly chase the head like a plain version conflict."""
    path = str(tmp_path / "t")
    t = SnaplogTable(spark, path)
    t.write(_df(spark, 0, 3), mode="overwrite")
    other = SnaplogTable(spark, path)
    inject_before_next_commit(
        monkeypatch, lambda: other.add_check_constraint("pos", "id >= 0")
    )
    with pytest.raises(SnapshotConflictError, match="constraint"):
        t.write_txn(_df(spark, 3, 6), app_id="app", version=1)
    # nothing landed: the staged files stay invisible
    assert SnaplogTable(spark, path).read().count() == 3


def test_write_txn_aborts_on_concurrent_generated_change(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t")
    t = SnaplogTable(spark, path)
    t.write(_df(spark, 0, 3), mode="overwrite")
    other = SnaplogTable(spark, path)
    inject_before_next_commit(
        monkeypatch,
        lambda: other.set_generated_column("v", "'x'"),
    )
    with pytest.raises(SnapshotConflictError, match="generated"):
        t.write_txn(_df(spark, 3, 6), app_id="app", version=1)
    assert SnaplogTable(spark, path).read().count() == 3


def test_write_txn_still_chases_plain_appends(spark, tmp_path, monkeypatch):
    """A rule-NEUTRAL concurrent append is the retryable case: the txn
    ledger re-check runs, the head is chased, and the batch lands once."""
    path = str(tmp_path / "t")
    t = SnaplogTable(spark, path)
    t.write(_df(spark, 0, 3), mode="overwrite")
    other = SnaplogTable(spark, path)
    inject_before_next_commit(
        monkeypatch, lambda: other.write(_df(spark, 100, 103), mode="append")
    )
    assert t.write_txn(_df(spark, 3, 6), app_id="app", version=1) is not None
    assert SnaplogTable(spark, path).read().count() == 9


def test_write_txn_respects_partition_spec(spark, tmp_path):
    """write_txn stages files under the table's partition layout — an
    idempotent append into a partitioned table must keep partition
    pruning alive for its files, not land them spec-less."""
    path = str(tmp_path / "t")
    t = SnaplogTable(spark, path)
    t.write(
        _df(spark, 0, 4).withColumn("p", F.col("id") % 2),
        mode="overwrite", partition_by=["p"],
    )
    t.write_txn(
        _df(spark, 4, 8).withColumn("p", F.col("id") % 2),
        app_id="app", version=1,
    )
    snap = t.snapshot(t.version())
    # every file (seed AND txn append) carries its typed partition value
    for e in snap.files:
        assert e.stats.get("p") is not None, e.path
        assert e.stats["p"]["min"] == e.stats["p"]["max"]
    # pruning over the partition column keeps only half the files
    kept = t.read(filters=[("p", "=", 0)])
    assert {r.id for r in kept.collect()} == {0, 2, 4, 6}
