"""Exactly-once streaming sink on the snaplog table format: batch data +
idempotence marker commit atomically, replays dedupe, restarts keep the
ledger, time travel works on a live streaming table."""

from __future__ import annotations

import pytest

from dc43_spark.io.snaplog import SnaplogTable


def test_write_txn_idempotent_and_monotonic(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    df2 = spark.createDataFrame([(2, "b")], "k long, v string")

    assert t.last_txn_version("app") is None
    v0 = t.write_txn(df1, app_id="app", version=0)
    assert v0 == 0 and t.last_txn_version("app") == 0
    # replay of version 0: skipped, no duplicate rows
    assert t.write_txn(df1, app_id="app", version=0) is None
    assert t.read().count() == 1
    # next version lands; a DIFFERENT app_id has its own ledger
    assert t.write_txn(df2, app_id="app", version=1) is not None
    assert t.write_txn(df2, app_id="other", version=0) is not None
    assert t.read().count() == 3
    assert t.last_txn_version("app") == 1
    assert t.last_txn_version("other") == 0
    # stale version after a newer one: skipped even though never written
    assert t.write_txn(df2, app_id="app", version=0) is None


def test_write_txn_survives_interleaved_commits(spark, tmp_path):
    """The version-pinned commit + ledger re-check: another writer moving
    the table head between stage and commit must not duplicate the txn or
    lose it."""
    t = SnaplogTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1,)], "k long")
    t.write(df, mode="append")
    # interleave: a plain append lands while a txn write is in flight —
    # simulated by pre-advancing the head right before write_txn runs
    t.write(spark.createDataFrame([(2,)], "k long"), mode="append")
    assert t.write_txn(df, app_id="s", version=0) is not None
    assert t.last_txn_version("s") == 0
    assert t.read().count() == 3


def test_streaming_sink_exactly_once_across_replays(spark, tmp_path):
    """Drive the real sink twice over the same source + checkpoint: the
    second run (a full availableNow replay window) adds nothing, and each
    micro-batch is one table version so versionAsOf reaches mid-stream
    snapshots."""
    from dc43_spark.streaming.sink import snaplog_sink

    src = tmp_path / "src"
    table = tmp_path / "table"
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, "x")], "k long, v string").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream = spark.readStream.schema("k long, v string").parquet(str(src))

    q = snaplog_sink(stream, str(table), ckpt, trigger_once=True)
    q.awaitTermination()
    t = SnaplogTable(spark, str(table))
    assert t.read().count() == 1
    v_after_first = t.version()

    # new file arrives; restart the query (same checkpoint)
    spark.createDataFrame([(2, "y"), (3, "z")], "k long, v string").coalesce(
        1
    ).write.mode("append").parquet(str(src))
    q = snaplog_sink(
        spark.readStream.schema("k long, v string").parquet(str(src)),
        str(table), ckpt, trigger_once=True,
    )
    q.awaitTermination()
    assert t.read().count() == 3

    # adversarial replay: a FRESH checkpoint re-delivers every batch id
    # from zero — the txn ledger (same app_id) must swallow batch 0 and
    # only ever have landed each id once. Use the explicit app_id the
    # first checkpoint created.
    ident = None
    for v in range(t.version() + 1):
        txn = t._read_commit(v).get("txn")
        if txn:
            ident = txn["app_id"]
            break
    assert ident is not None
    q = snaplog_sink(
        spark.readStream.schema("k long, v string").parquet(str(src)),
        str(table), str(tmp_path / "ckpt2"), app_id=ident, trigger_once=True,
    )
    q.awaitTermination()
    # fresh checkpoint batches BOTH files as batch 0; ledger already has
    # versions 0 and 1, so nothing lands
    assert t.read().count() == 3

    # live-table time travel: the first micro-batch is its own version
    assert t.read(version_as_of=v_after_first).count() == 1


def test_sink_rejects_nothing_but_marks_history(spark, tmp_path):
    """History records the txn commits as appends with markers."""
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write_txn(
        spark.createDataFrame([(1,)], "k long"), app_id="job", version=7
    )
    ops = [h.operation for h in t.history()]
    assert ops == ["append"]
    assert t._read_commit(0)["txn"] == {"app_id": "job", "version": 7}
    # version numbering monotonic past a skipped txn
    assert t.write_txn(
        spark.createDataFrame([(2,)], "k long"), app_id="job", version=7
    ) is None
    assert t.write_txn(
        spark.createDataFrame([(2,)], "k long"), app_id="job", version=8
    ) == 1


@pytest.mark.parametrize("keep", [1, 2])
def test_vacuum_after_txn_skips_cleans_orphans(spark, tmp_path, keep):
    """A skipped replay leaves staged-but-uncommitted files invisible;
    vacuum removes them without touching live data."""
    t = SnaplogTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1,)], "k long")
    t.write_txn(df, app_id="a", version=0)
    t.write_txn(df, app_id="a", version=0)  # replay: stages, then skips
    before = t.read().count()
    t.vacuum(keep_versions=keep)
    assert t.read().count() == before == 1


def test_governed_streaming_writer_txn_exactly_once(spark, tmp_path):
    """StreamingGovernedWriter(format='snaplog', txn_app_id=...) dedupes a
    replayed micro-batch at the sink: validation + metrics run again (the
    timeline grows), but the table gains no duplicate rows — the reference
    needs Delta for this property; the in-repo format carries it."""
    from dc43_spark.contracts.model import Contract, SchemaObject, SchemaProperty
    from dc43_spark.streaming.observer import StreamingGovernedWriter

    contract = Contract(
        id="t.ev", version="0.1.0",
        schema_objects=[SchemaObject(
            name="ev", properties=[SchemaProperty("k", "bigint", required=True)],
        )],
    )
    target = str(tmp_path / "gov_table")
    w = StreamingGovernedWriter(
        contract, path=target, format="snaplog", txn_app_id="gov-q1"
    )
    batch = spark.createDataFrame([(1,), (2,)], "k long")
    w.process_batch(batch, 0)
    w.process_batch(batch, 0)   # at-least-once replay of the SAME batch id
    w.process_batch(batch, 1)
    t = SnaplogTable(spark, target)
    assert t.read().count() == 4          # 2 + skipped replay + 2
    assert len(w.timeline) == 3           # governance observed every run
    assert t.last_txn_version("gov-q1") == 1
    # without txn_app_id the same replay duplicates (documented opt-in)
    w2 = StreamingGovernedWriter(contract, path=str(tmp_path / "plain"), format="snaplog")
    w2.process_batch(batch, 0)
    w2.process_batch(batch, 0)
    assert SnaplogTable(spark, str(tmp_path / "plain")).read().count() == 4
