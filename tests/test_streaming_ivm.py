"""Streaming materialized-view maintenance (streaming/ivm.py): the
snaplog commit stream as the refresh signal, exactly-once riding on
the views' own txn offsets — the streaming CHECKPOINT is disposable.

Oracle as in test_ivm: after every firing, each view must equal a full
GROUP BY recompute over the source head."""

import shutil

from pyspark.sql import functions as F

from dc43_spark.io.ivm import ViewSpec, refresh_views, sum_view_select
from dc43_spark.io.snaplog import SnaplogTable
from dc43_spark.streaming.ivm import ViewMaintainer, maintain_views_stream

ROWS = "g string, x long"


def _recompute(src):
    return {
        (r.g,): (r.s, r.n_rows)
        for r in src.read()
        .groupBy("g")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }


def _state(view):
    return {(r.g,): (r.s, r.n_rows) for r in sum_view_select(view, ["s"]).collect()}


def _run(spark, src, specs, cp, seen=None):
    q = maintain_views_stream(
        spark,
        src,
        specs,
        checkpoint_dir=cp,
        on_refresh=(seen.append if seen is not None else None),
    )
    assert q.awaitTermination(300)


def test_stream_catches_up_and_follows_commits(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"), change_feed=True)
    view = SnaplogTable(spark, str(tmp_path / "view"))
    cp = str(tmp_path / "cp")
    specs = [ViewSpec(view=view, keys=["g"], sums={"s": "x"})]

    src.write(spark.createDataFrame([("a", 1), ("a", 2), ("b", 10)], ROWS))
    src.write(spark.createDataFrame([("b", 5), ("c", 7)], ROWS))
    _run(spark, src, specs, cp)
    assert _state(view) == _recompute(src)

    # new commits (merge + delete), SAME checkpoint: incremental only
    src.merge(spark.createDataFrame([("a", 100), ("d", 1)], ROWS), ["g", "x"])
    src.delete([("g", "=", "b")])
    seen = []
    _run(spark, src, specs, cp, seen)
    assert _state(view) == _recompute(src)
    assert ("b",) not in _state(view)
    # every firing was initial-free: the catch-up pass already initialized
    assert all(s.strategy in ("incremental", "no-op") for f in seen for s in f)


def test_checkpoint_is_disposable_and_manual_refresh_coexists(spark, tmp_path):
    """Deleting the checkpoint replays the signal; a manual refresh_views
    racing the stream double-fires the refresh — both must no-op, never
    double-count (exactly-once lives in the view offsets, not the
    checkpoint)."""
    src = SnaplogTable(spark, str(tmp_path / "src"), change_feed=True)
    view = SnaplogTable(spark, str(tmp_path / "view"))
    cp = str(tmp_path / "cp")
    specs = [ViewSpec(view=view, keys=["g"], sums={"s": "x"})]

    src.write(spark.createDataFrame([("a", 1), ("b", 2)], ROWS))
    _run(spark, src, specs, cp)
    want = _recompute(src)
    assert _state(view) == want

    refresh_views(src, specs)  # manual double-fire: no-op
    assert _state(view) == want

    shutil.rmtree(cp)  # lost checkpoint: full signal replay
    _run(spark, src, specs, str(tmp_path / "cp2"))
    assert _state(view) == want


def test_source_maintenance_commits_do_not_break_the_stream(spark, tmp_path):
    """Compaction between firings is a rewrite commit — fatal to a
    row-reading snaplog stream without ignoreChanges, and invisible to
    the change feed; the signal stream must survive it and the view must
    stay exact."""
    src = SnaplogTable(spark, str(tmp_path / "src"), change_feed=True)
    view = SnaplogTable(spark, str(tmp_path / "view"))
    cp = str(tmp_path / "cp")
    specs = [ViewSpec(view=view, keys=["g"], sums={"s": "x"})]

    for i in range(3):
        src.write(
            spark.createDataFrame([("a", i), ("b", 10 * i)], ROWS).coalesce(1)
        )
    _run(spark, src, specs, cp)
    assert src.compact(target_file_mb=1) is not None
    src.write(spark.createDataFrame([("c", 5)], ROWS))
    _run(spark, src, specs, cp)
    assert _state(view) == _recompute(src)


def test_two_views_one_scan_and_poll_twin(spark, tmp_path):
    """N views ride one signal; the poll-driven ViewMaintainer converges
    to the same state and interleaves safely with the stream."""
    src = SnaplogTable(spark, str(tmp_path / "src"), change_feed=True)
    v1 = SnaplogTable(spark, str(tmp_path / "v1"))
    v2 = SnaplogTable(spark, str(tmp_path / "v2"))
    cp = str(tmp_path / "cp")
    specs = [
        ViewSpec(view=v1, keys=["g"], sums={"s": "x"}),
        ViewSpec(view=v2, keys=["g"], avgs={"m": "x"}),
    ]

    src.write(spark.createDataFrame([("a", 1), ("a", 3), ("b", 10)], ROWS))
    _run(spark, src, specs, cp)
    assert _state(v1) == _recompute(src)

    src.write(spark.createDataFrame([("b", 2), ("c", 9)], ROWS))
    m = ViewMaintainer(src, specs)
    assert m.run_until_idle() >= 1
    assert _state(v1) == _recompute(src)
    avgs = {
        (r.g,): r.m
        for r in v2.read().select("g", "m").collect()
    }
    want = {
        (r.g,): r.m
        for r in src.read().groupBy("g").agg(F.avg("x").alias("m")).collect()
    }
    assert avgs == want

    # the stream after the poller: nothing to do, nothing broken
    _run(spark, src, specs, cp)
    assert _state(v1) == _recompute(src)
