"""Streaming CDC upsert sink (streaming/sink.py::snaplog_upsert_sink)
plus the conditional-insert merge clause it rides on."""

import os

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.snaplog import SnaplogTable
from dc43_spark.streaming.sink import snaplog_upsert_sink

ROWS = "k long, v string, seq long, op string"


def _write_src(spark, src_dir, rows):
    spark.createDataFrame(rows, ROWS).coalesce(1).write.mode("append").parquet(
        src_dir
    )


def _run(spark, src_dir, table, cp, **kw):
    q = snaplog_upsert_sink(
        spark.readStream.schema(ROWS).parquet(src_dir),
        table,
        cp,
        keys=["k"],
        trigger_once=True,
        **kw,
    )
    assert q.awaitTermination(300)


def test_merge_insert_predicate_gates_unmatched_rows(spark, tmp_path):
    """The new conditional whenNotMatchedInsert: matched delete-marker
    rows delete, unmatched ones neither insert nor error."""
    t = SnaplogTable(spark, str(tmp_path / "t"), change_feed=True)
    t.write(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").coalesce(1),
        mode="overwrite",
    )
    src = spark.createDataFrame(
        [(1, "D1"), (3, "u3"), (9, "D9")], "k long, v string"
    )
    t.merge(
        src,
        ["k"],
        delete_predicate="s.v LIKE 'D%'",
        insert_predicate="NOT (s.v LIKE 'D%')",
    )
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {2: "b", 3: "u3"}  # 1 deleted, 9 skipped, 3 inserted
    # the change feed saw exactly: delete(1), insert(3) — nothing for 9
    feed = t.table_changes(t.version()).collect()
    assert sorted((r.k, r._change_type) for r in feed) == [
        (1, "delete"), (3, "insert"),
    ]


def test_upsert_sink_applies_cdc_feed_exactly_once(spark, tmp_path):
    src_dir = str(tmp_path / "feed")
    table = str(tmp_path / "t")
    cp = str(tmp_path / "cp")

    _write_src(spark, src_dir, [(1, "a", 1, "U"), (2, "b", 1, "U")])
    _run(spark, src_dir, table, cp, delete_predicate="s.op = 'D'")
    t = SnaplogTable(spark, table)
    assert {r.k: r.v for r in t.read().collect()} == {1: "a", 2: "b"}

    # second slice: update 1, delete 2, insert 3, unmatched delete 9
    _write_src(
        spark,
        src_dir,
        [(1, "a2", 2, "U"), (2, "b", 2, "D"), (3, "c", 2, "U"), (9, "x", 2, "D")],
    )
    _run(spark, src_dir, table, cp, delete_predicate="s.op = 'D'")
    assert {r.k: r.v for r in t.read().collect()} == {1: "a2", 3: "c"}

    # rerun with the SAME checkpoint: no new batches, nothing changes
    before = t.version()
    _run(spark, src_dir, table, cp, delete_predicate="s.op = 'D'")
    assert t.version() == before

    # FULL replay (lost checkpoint, same app identity): every batch
    # re-fires from the feed's beginning and the txn markers skip them
    # all — no duplicate applies, no extra versions
    before = t.version()
    _run(
        spark, src_dir, table, str(tmp_path / "cp_replay"),
        app_id=f"snaplog-upsert:{os.path.abspath(cp)}",
        delete_predicate="s.op = 'D'",
    )
    assert t.version() == before
    assert {r.k: r.v for r in t.read().collect()} == {1: "a2", 3: "c"}


def test_upsert_sink_in_batch_dedupe_by_order_col(spark, tmp_path):
    """A busy CDC batch carries several rows per key: keep the highest
    seq (the merge would otherwise refuse duplicate source keys)."""
    src_dir = str(tmp_path / "feed")
    table = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    _write_src(
        spark,
        src_dir,
        [(1, "old", 1, "U"), (1, "new", 2, "U"), (2, "only", 1, "U")],
    )
    _run(
        spark, src_dir, table, cp,
        order_col="seq", delete_predicate="s.op = 'D'",
    )
    t = SnaplogTable(spark, table)
    assert {r.k: r.v for r in t.read().collect()} == {1: "new", 2: "only"}
    # without order_col the same batch is a hard error (MERGE ambiguity)
    _write_src(spark, str(tmp_path / "feed2"), [(5, "x", 1, "U"), (5, "y", 2, "U")])
    q = snaplog_upsert_sink(
        spark.readStream.schema(ROWS).parquet(str(tmp_path / "feed2")),
        str(tmp_path / "t2"),
        str(tmp_path / "cp2"),
        keys=["k"],
        trigger_once=True,
    )
    with pytest.raises(Exception, match="duplicate keys"):
        q.awaitTermination(300)
        raise RuntimeError(str(q.exception()))

def test_sinks_evolve_schema_when_allowed(spark, tmp_path):
    """A feed that GAINS a column keeps landing with merge_schema=True
    (older rows read NULL); without the flag the drift fails loudly."""
    from dc43_spark.streaming.sink import snaplog_sink

    src_dir = str(tmp_path / "feed")
    table = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    spark.createDataFrame([(1, "a")], "k long, v string").coalesce(1)\
        .write.mode("append").parquet(src_dir)
    q = snaplog_sink(
        spark.readStream.schema("k long, v string").parquet(src_dir),
        table, cp, trigger_once=True,
    )
    assert q.awaitTermination(300)

    src2 = str(tmp_path / "feed2")
    spark.createDataFrame([(2, "b", 9.5)], "k long, v string, w double")\
        .coalesce(1).write.mode("append").parquet(src2)
    q = snaplog_sink(
        spark.readStream.schema("k long, v string, w double").parquet(src2),
        table, str(tmp_path / "cp2"), trigger_once=True,
    )
    with pytest.raises(Exception, match="schema"):  # drift w/o flag: loud
        q.awaitTermination(300)

    q = snaplog_sink(
        spark.readStream.schema("k long, v string, w double").parquet(src2),
        table, str(tmp_path / "cp3"), trigger_once=True, merge_schema=True,
    )
    assert q.awaitTermination(300)
    t = SnaplogTable(spark, table)
    got = {(r.k, r.v, r.w) for r in t.read().collect()}
    assert got == {(1, "a", None), (2, "b", 9.5)}


def test_upsert_sink_order_col_ties_pick_deterministic_survivor(spark, tmp_path):
    """Rows tying on order_col: the survivor is the lexicographically
    largest payload, NOT whichever row the plan happened to order first —
    a retried/re-planned batch must land the identical table state. The
    key columns can't break the tie (they are constant within the window
    partition), so the sink orders over the remaining payload struct."""
    src_dir = str(tmp_path / "feed")
    # 8 same-key rows ALL tying on seq, shuffled across two files so the
    # scan order is plan-dependent
    _write_src(spark, src_dir, [(1, f"v{i}", 7, "U") for i in (3, 0, 5, 1)])
    _write_src(spark, src_dir, [(1, f"v{i}", 7, "U") for i in (2, 7, 4, 6)])
    for run in ("a", "b"):  # two independent runs must agree
        table = str(tmp_path / f"t{run}")
        _run(spark, src_dir, table, str(tmp_path / f"cp{run}"),
             order_col="seq")
        t = SnaplogTable(spark, table)
        assert {(r.k, r.v) for r in t.read().collect()} == {(1, "v7")}, run
