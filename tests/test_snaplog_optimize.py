"""OPTIMIZE surface: optimizeWrite, autoCompact, OPTIMIZE WHERE.

Delta's small-file machinery re-expressed on snaplog: partition-aligned
shuffles before staging (delta.autoOptimize.optimizeWrite), best-effort
bin-packing of just-touched partitions after a commit
(delta.autoOptimize.autoCompact), and predicate-scoped compaction
(OPTIMIZE ... WHERE). ref context: the reference's writers
(dc43-integrations spark/io) delegate layout to Delta; this is the
in-container equivalent for the snaplog format."""

import datetime

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.snaplog import SnaplogTable


def _pdf(spark, rows):
    return spark.createDataFrame(rows, "p string, k long, v string")


def _one(spark, p, k):
    return _pdf(spark, [(p, k, f"s{k}")]).coalesce(1)


def test_optimize_write_one_file_per_partition_value(spark, tmp_path):
    """An 8-input-partition write to a 3-value partitioned table lands
    exactly 3 files with optimizeWrite (one per value) and fans out to
    many more without it — the classic small-file generator."""
    rows = [(p, i, "x") for p in ("a", "b", "c") for i in range(20)]
    df = _pdf(spark, rows).repartition(8)

    t = SnaplogTable(spark, str(tmp_path / "ow"), optimize_write=True)
    t.write(df, mode="overwrite", partition_by=["p"])
    snap = t.snapshot()
    assert snap.num_files == 3
    assert sorted(f.partition["p"] for f in snap.files) == ["a", "b", "c"]

    t2 = SnaplogTable(spark, str(tmp_path / "plain"))
    t2.write(df, mode="overwrite", partition_by=["p"])
    assert t2.snapshot().num_files > 3
    # rows identical either way
    assert t.read().count() == t2.read().count() == 60


def test_optimize_write_per_call_override_and_property(spark, tmp_path):
    """The table property persists (a later plain handle keeps writing
    aligned) and the per-write flag overrides in both directions."""
    path = str(tmp_path / "t")
    df = _pdf(spark, [("a", i, "x") for i in range(16)]).repartition(8)
    t = SnaplogTable(spark, path, optimize_write=True)
    t.write(df, mode="overwrite", partition_by=["p"])
    assert t.snapshot().num_files == 1

    plain = SnaplogTable(spark, path)  # no flag: reads the stored property
    assert plain.optimize_write is True
    plain.write(df, mode="append")
    assert plain.snapshot().num_files == 2  # one aligned file added

    plain.write(df, mode="append", optimize_write=False)  # explicit off
    assert plain.snapshot().num_files > 3  # fanned out again

    t3 = SnaplogTable(spark, str(tmp_path / "t3"))
    t3.write(df, mode="overwrite", partition_by=["p"], optimize_write=True)
    assert t3.snapshot().num_files == 1
    assert t3.optimize_write is False  # one-shot flag, not a property


def test_optimize_where_scopes_compaction(spark, tmp_path):
    """OPTIMIZE WHERE p='a' packs only partition a's files; partition b's
    files survive BY PATH (carried over, not rewritten), and the compact
    commit is data_change=false."""
    t = SnaplogTable(spark, str(tmp_path / "t"))
    for i in range(3):
        t.write(
            _pdf(spark, [("a", i, "x"), ("b", i, "x")]).coalesce(1),
            mode="overwrite" if i == 0 else "append",
            partition_by=["p"] if i == 0 else None,
        )
    snap = t.snapshot()
    assert len([f for f in snap.files if f.partition["p"] == "a"]) == 3
    b_files = {f.path for f in snap.files if f.partition["p"] == "b"}

    v = t.compact(where=[("p", "=", "a")])
    assert v is not None
    snap2 = t.snapshot()
    assert {f.path for f in snap2.files if f.partition["p"] == "b"} == b_files
    assert len([f for f in snap2.files if f.partition["p"] == "a"]) == 1
    assert t.read().count() == 6
    assert t._read_commit(v).get("data_change") is False
    # a WHERE matching nothing compacts nothing (exact partition pruning)
    assert t.compact(where=[("p", "=", "zzz")]) is None


def test_optimize_where_translates_hidden_transform_source(spark, tmp_path):
    """Under hidden partitioning (days(ts)) the WHERE speaks the SOURCE
    column; pruning translates to the derived day and only that day's
    files are rewritten."""
    t = SnaplogTable(spark, str(tmp_path / "t"))
    d1 = datetime.datetime(2026, 3, 1, 10, 0)
    d2 = datetime.datetime(2026, 3, 2, 10, 0)

    def day_df(d, k):
        return spark.createDataFrame([(d, k)], "ts timestamp, k long").coalesce(1)

    t.write(day_df(d1, 1), mode="overwrite", partition_by=["days(ts)"])
    t.write(day_df(d1, 2), mode="append")
    t.write(day_df(d2, 3), mode="append")
    t.write(day_df(d2, 4), mode="append")
    snap = t.snapshot()
    assert snap.num_files == 4
    day1_files = {
        f.path for f in snap.files if list(f.partition.values())[0] == 20513
    }  # days since epoch for 2026-03-01
    assert len(day1_files) == 2

    v = t.compact(where=[("ts", ">=", datetime.datetime(2026, 3, 2))])
    assert v is not None
    snap2 = t.snapshot()
    # day-1 files untouched; day-2's two files packed into one
    assert day1_files <= {f.path for f in snap2.files}
    assert snap2.num_files == 3
    assert t.read().count() == 4


def test_auto_compact_triggers_and_preserves_history(spark, tmp_path):
    """Tiny appends on an autoCompact table keep the head file count
    bounded; compact commits are data_change=false so the change feed
    stays pure inserts, and pre-compact versions still read."""
    t = SnaplogTable(
        spark,
        str(tmp_path / "t"),
        auto_compact=True,
        auto_compact_min_files=4,
        change_feed=True,
    )
    for i in range(6):
        t.write(_one(spark, "a", i), mode="append")
    ops = [c.operation for c in t.history()]
    assert "compact" in ops
    assert t.snapshot().num_files < 6
    assert t.read().count() == 6
    # the feed saw ONLY the six inserts — compaction is invisible
    feed = t.table_changes(0).collect()
    assert sorted(r._change_type for r in feed) == ["insert"] * 6
    # pre-compact versions still read their own row sets
    first_compact = next(c.version for c in t.history() if c.operation == "compact")
    assert t.read(version_as_of=first_compact - 1).count() == first_compact
    # the policy persists: a PLAIN handle keeps compacting
    plain = SnaplogTable(spark, str(tmp_path / "t"))
    assert plain.auto_compact and plain.auto_compact_min_files == 4
    for i in range(6, 12):
        plain.write(_one(spark, "a", i), mode="append")
    assert plain.snapshot().num_files < 6
    assert plain.read().count() == 12


def test_auto_compact_scopes_to_touched_partitions(spark, tmp_path):
    """Appends into partition a must never rewrite partition b's files —
    the follow-up is O(touched partition), not O(table)."""
    t = SnaplogTable(
        spark, str(tmp_path / "t"), auto_compact=True, auto_compact_min_files=3
    )
    t.write(
        _pdf(spark, [("a", 0, "x"), ("b", 0, "x")]).coalesce(1),
        mode="overwrite",
        partition_by=["p"],
    )
    b_files = {f.path for f in t.snapshot().files if f.partition["p"] == "b"}
    for i in range(1, 6):
        t.write(_one(spark, "a", i), mode="append")
    snap = t.snapshot()
    assert {f.path for f in snap.files if f.partition["p"] == "b"} == b_files
    assert "compact" in [c.operation for c in t.history()]
    assert len([f for f in snap.files if f.partition["p"] == "a"]) < 6
    assert t.read().count() == 7


def test_auto_compact_skips_with_active_deletion_vectors(spark, tmp_path):
    """Compaction would resurrect MOR-deleted rows, so auto-compact just
    skips while deletion vectors are active — the append itself must not
    fail on maintenance."""
    t = SnaplogTable(
        spark, str(tmp_path / "t"), auto_compact=True, auto_compact_min_files=2
    )
    t.write(_pdf(spark, [("a", i, "x") for i in range(3)]).coalesce(1), mode="append")
    t.delete([("k", "=", 1)], strategy="merge_on_read")
    assert t.snapshot().dvs
    t.write(_one(spark, "a", 10), mode="append")  # no raise, no compact
    assert "compact" not in [c.operation for c in t.history()]
    assert t.read().count() == 3


def test_auto_compact_after_merge(spark, tmp_path):
    """merge also feeds the auto-compact hook: repeated pure-insert
    merges (each adding one small file) stay bounded."""
    t = SnaplogTable(
        spark, str(tmp_path / "t"), auto_compact=True, auto_compact_min_files=4
    )
    t.write(_pdf(spark, [("a", i, "x") for i in range(8)]).coalesce(1), mode="append")
    for i in range(6):
        t.merge(_pdf(spark, [("a", 100 + i, f"m{i}")]).coalesce(1), ["k"])
    assert "compact" in [c.operation for c in t.history()]
    got = {r.k: r.v for r in t.read().collect()}
    assert len(got) == 14
    assert all(got[100 + i] == f"m{i}" for i in range(6))


def test_describe_detail_reports_optimize_policy(spark, tmp_path):
    t = SnaplogTable(
        spark, str(tmp_path / "t"), optimize_write=True, auto_compact=True
    )
    t.write(_one(spark, "a", 1), mode="append")
    d = t.describe_detail()
    assert d["optimize_write"] is True and d["auto_compact"] is True
