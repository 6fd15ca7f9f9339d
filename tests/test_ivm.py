"""Incremental materialized views over the snaplog change feed.

Oracle: after EVERY refresh, the maintained view must equal a full
GROUP BY recompute over the source head — including SQL's awkward
corners (NULL keys group, SUM of an all-NULL group is NULL, COUNT(*)
counts NULL measures, groups vanishing to zero rows)."""

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.ivm import (
    ViewSpec,
    refresh_sum_view,
    refresh_view,
    refresh_views,
    sum_view_offset,
    sum_view_select,
    view_select,
)
from dc43_spark.io.snaplog import SnaplogTable


def _src(spark, tmp_path, name="src"):
    return SnaplogTable(spark, str(tmp_path / name), change_feed=True)


def _recompute(t):
    return {
        (r.g,): (r.s, r.n)
        for r in t.read()
        .groupBy("g")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }


def _view_state(view):
    return {
        (r.g,): (r.s, r.n_rows)
        for r in sum_view_select(view, ["s"]).collect()
    }


def _assert_synced(view, src):
    assert _view_state(view) == _recompute(src)


def test_refresh_tracks_source_through_all_op_kinds(spark, tmp_path):
    src = _src(spark, tmp_path)
    view = SnaplogTable(spark, str(tmp_path / "view"))
    rows = "g string, x long"

    src.write(spark.createDataFrame([("a", 1), ("a", 2), ("b", 10)], rows))
    st = refresh_sum_view(view, src, keys=["g"], sums={"s": "x"})
    assert st.strategy == "initial"
    _assert_synced(view, src)

    # appends + merge (update and insert)
    src.write(spark.createDataFrame([("b", 5), ("c", 7)], rows))
    src.merge(spark.createDataFrame([("a", 100), ("d", 1)], rows), ["g", "x"])
    st = refresh_sum_view(view, src, keys=["g"], sums={"s": "x"})
    assert st.strategy == "incremental"
    _assert_synced(view, src)

    # delete an entire group -> view row must disappear
    src.delete([("g", "=", "b")])
    refresh_sum_view(view, src, keys=["g"], sums={"s": "x"})
    _assert_synced(view, src)
    assert ("b",) not in _view_state(view)

    # update measures in place
    src.update([("g", "=", "a")], set={"x": "x + 1"})
    refresh_sum_view(view, src, keys=["g"], sums={"s": "x"})
    _assert_synced(view, src)

    # no-op refresh advances nothing and changes nothing
    before = _view_state(view)
    st = refresh_sum_view(view, src, keys=["g"], sums={"s": "x"})
    assert st.strategy == "no-op"
    assert _view_state(view) == before


def test_null_measures_and_null_keys(spark, tmp_path):
    src = _src(spark, tmp_path)
    view = SnaplogTable(spark, str(tmp_path / "view"))
    rows = "g string, x long"
    src.write(
        spark.createDataFrame(
            [("a", None), ("a", 3), (None, 5), (None, None)], rows
        )
    )
    refresh_sum_view(view, src, keys=["g"], sums={"s": "x"})
    _assert_synced(view, src)

    # deleting the ONLY non-null measure of 'a' must yield SUM = NULL,
    # not 0 (the __nn bookkeeping is what makes this exact)
    src.delete([("g", "=", "a"), ("x", "=", 3)])
    refresh_sum_view(view, src, keys=["g"], sums={"s": "x"})
    _assert_synced(view, src)
    assert _view_state(view)[("a",)] == (None, 1)


def test_offset_rides_in_view_commits(spark, tmp_path):
    src = _src(spark, tmp_path)
    view = SnaplogTable(spark, str(tmp_path / "view"))
    src.write(spark.createDataFrame([("a", 1)], "g string, x long"))
    assert sum_view_offset(view, src) is None
    refresh_sum_view(view, src, keys=["g"], sums={"s": "x"})
    assert sum_view_offset(view, src) == src.version()
    src.write(spark.createDataFrame([("a", 2)], "g string, x long"))
    refresh_sum_view(view, src, keys=["g"], sums={"s": "x"})
    assert sum_view_offset(view, src) == src.version()
    # a foreign view without the marker refuses to refresh (double-count)
    foreign = SnaplogTable(spark, str(tmp_path / "foreign"))
    foreign.write(spark.createDataFrame([("a", 9, 9, 1)], "g string, s long, s__nn long, n_rows long"))
    with pytest.raises(ValueError, match="txn marker"):
        refresh_sum_view(foreign, src, keys=["g"], sums={"s": "x"})


def test_randomized_ops_vs_recompute_oracle(spark, tmp_path):
    """Deterministic pseudo-random op soup; refresh at staggered points;
    the view must equal the recompute after every refresh."""
    import random

    rng = random.Random(7)
    src = _src(spark, tmp_path)
    view = SnaplogTable(spark, str(tmp_path / "view"))
    groups = ["a", "b", "c", None]
    rows_t = "g string, x long"

    def some_rows(n):
        return [
            (rng.choice(groups), rng.choice([None, 1, 2, 5, 10])) for _ in range(n)
        ]

    src.write(spark.createDataFrame(some_rows(6), rows_t))
    for step in range(8):
        op = rng.choice(["append", "delete", "update", "append"])
        if op == "append":
            src.write(spark.createDataFrame(some_rows(rng.randint(1, 4)), rows_t))
        elif op == "delete":
            g = rng.choice(["a", "b", "c"])
            src.delete([("g", "=", g), ("x", ">=", rng.choice([1, 5]))])
        else:
            g = rng.choice(["a", "b", "c"])
            src.update([("g", "=", g)], set={"x": "x * 2"})
        if step % 2 == 1:
            refresh_sum_view(view, src, keys=["g"], sums={"s": "x"})
            _assert_synced(view, src)
    refresh_sum_view(view, src, keys=["g"], sums={"s": "x"})
    _assert_synced(view, src)


def test_validation(spark, tmp_path):
    src = _src(spark, tmp_path)
    view = SnaplogTable(spark, str(tmp_path / "view"))
    src.write(spark.createDataFrame([("a", 1)], "g string, x long"))
    with pytest.raises(ValueError, match="at least one"):
        refresh_sum_view(view, src, keys=["g"], sums={})
    with pytest.raises(ValueError, match="collide"):
        refresh_sum_view(view, src, keys=["g"], sums={"g": "x"})


# ---------------- AVG / MIN / MAX (non-invertible aggregates)


def _recompute_full(t):
    return {
        (r.g,): (r.s, r.a, r.lo, r.hi, r.n)
        for r in t.read()
        .groupBy("g")
        .agg(
            F.sum("x").alias("s"),
            F.avg("x").alias("a"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }


def _full_view_state(view):
    return {
        (r.g,): (r.s, r.a, r.lo, r.hi, r.n_rows)
        for r in view_select(
            view, sums=["s"], avgs=["a"], mins=["lo"], maxs=["hi"]
        ).collect()
    }


def _refresh_full(view, src):
    return refresh_view(
        view, src, keys=["g"],
        sums={"s": "x"}, avgs={"a": "x"}, mins={"lo": "x"}, maxs={"hi": "x"},
    )


def test_min_max_avg_track_source(spark, tmp_path):
    src = _src(spark, tmp_path)
    view = SnaplogTable(spark, str(tmp_path / "view"))
    rows = "g string, x long"
    src.write(spark.createDataFrame([("a", 1), ("a", 9), ("b", 5)], rows))
    st = _refresh_full(view, src)
    assert st.strategy == "initial"
    assert _full_view_state(view) == _recompute_full(src)

    # insert-only window: extrema update incrementally, NO rescan
    src.write(spark.createDataFrame([("a", 0), ("b", 7)], rows))
    st = _refresh_full(view, src)
    assert st.groups_rescanned == 0
    assert _full_view_state(view) == _recompute_full(src)

    # delete the stored minimum of 'a' -> targeted rescan of that group
    src.delete([("g", "=", "a"), ("x", "=", 0)])
    st = _refresh_full(view, src)
    assert st.groups_rescanned == 1
    assert _full_view_state(view) == _recompute_full(src)

    # delete a non-extremum -> clean, no rescan
    src.write(spark.createDataFrame([("a", 4)], rows))
    src.delete([("g", "=", "a"), ("x", "=", 4)])
    st = _refresh_full(view, src)
    assert st.groups_rescanned == 0
    assert _full_view_state(view) == _recompute_full(src)


def test_min_insert_then_delete_below_stored_min_in_one_window(spark, tmp_path):
    """The window that breaks the naive 'was the stored extremum
    deleted?' test: stored min 5; one window inserts 3 then deletes it.
    least(stored, inserted) = 3 is WRONG — the conservative dirty rule
    (del <= least(stored, ins)) must force a rescan back to 5."""
    src = _src(spark, tmp_path)
    view = SnaplogTable(spark, str(tmp_path / "view"))
    rows = "g string, x long"
    src.write(spark.createDataFrame([("a", 5), ("a", 8)], rows))
    _refresh_full(view, src)
    src.write(spark.createDataFrame([("a", 3)], rows))
    src.delete([("g", "=", "a"), ("x", "=", 3)])
    st = _refresh_full(view, src)
    assert st.groups_rescanned == 1
    assert _full_view_state(view) == _recompute_full(src)
    assert _full_view_state(view)[("a",)][2] == 5  # min back to 5


def test_all_null_group_extrema_and_avg(spark, tmp_path):
    src = _src(spark, tmp_path)
    view = SnaplogTable(spark, str(tmp_path / "view"))
    rows = "g string, x long"
    src.write(spark.createDataFrame([("a", None), ("a", 3), ("b", None)], rows))
    _refresh_full(view, src)
    assert _full_view_state(view) == _recompute_full(src)
    assert _full_view_state(view)[("b",)] == (None, None, None, None, 1)
    # deleting the only non-null of 'a' nulls sum/avg/min/max, keeps count
    src.delete([("g", "=", "a"), ("x", "=", 3)])
    _refresh_full(view, src)
    assert _full_view_state(view)[("a",)] == (None, None, None, None, 1)
    assert _full_view_state(view) == _recompute_full(src)


def test_randomized_ops_full_aggregates_vs_recompute(spark, tmp_path):
    import random

    rng = random.Random(13)
    src = _src(spark, tmp_path)
    view = SnaplogTable(spark, str(tmp_path / "view"))
    groups = ["a", "b", "c", None]
    rows_t = "g string, x long"

    def some_rows(n):
        return [
            (rng.choice(groups), rng.choice([None, 1, 2, 5, 10])) for _ in range(n)
        ]

    src.write(spark.createDataFrame(some_rows(6), rows_t))
    for step in range(8):
        op = rng.choice(["append", "delete", "update", "append"])
        if op == "append":
            src.write(spark.createDataFrame(some_rows(rng.randint(1, 4)), rows_t))
        elif op == "delete":
            g = rng.choice(["a", "b", "c"])
            src.delete([("g", "=", g), ("x", ">=", rng.choice([1, 5]))])
        else:
            g = rng.choice(["a", "b", "c"])
            src.update([("g", "=", g)], set={"x": "x * 2"})
        if step % 2 == 1:
            _refresh_full(view, src)
            assert _full_view_state(view) == _recompute_full(src)
    _refresh_full(view, src)
    assert _full_view_state(view) == _recompute_full(src)


def test_full_agg_validation(spark, tmp_path):
    src = _src(spark, tmp_path)
    view = SnaplogTable(spark, str(tmp_path / "view"))
    src.write(spark.createDataFrame([("a", 1)], "g string, x long"))
    with pytest.raises(ValueError, match="at least one"):
        refresh_view(view, src, keys=["g"])
    with pytest.raises(ValueError, match="duplicate"):
        refresh_view(view, src, keys=["g"], sums={"s": "x"}, mins={"s": "x"})


# ---------------- multi-view refresh from ONE change-feed read


def test_refresh_views_single_cdc_scan(spark, tmp_path, monkeypatch):
    """Three views over one source: refresh_views reads the change feed
    ONCE (table_changes call-count pin) and every view matches its own
    full recompute; each view advances its own offset."""
    src = _src(spark, tmp_path)
    rows = "g string, x long"
    v1 = SnaplogTable(spark, str(tmp_path / "v1"))
    v2 = SnaplogTable(spark, str(tmp_path / "v2"))
    v3 = SnaplogTable(spark, str(tmp_path / "v3"))
    specs = [
        ViewSpec(v1, ["g"], sums={"s": "x"}),
        ViewSpec(v2, ["g"], mins={"lo": "x"}, maxs={"hi": "x"}),
        ViewSpec(v3, ["g"], avgs={"a": "x"}),
    ]

    calls = {"n": 0}
    orig = SnaplogTable.table_changes

    def counting(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(SnaplogTable, "table_changes", counting)

    src.write(spark.createDataFrame([("a", 1), ("a", 9), ("b", 5)], rows))
    stats = refresh_views(src, specs)
    assert calls["n"] == 1
    assert [s.strategy for s in stats] == ["initial"] * 3

    src.write(spark.createDataFrame([("b", 2), ("c", 7)], rows))
    src.delete([("g", "=", "a"), ("x", "=", 1)])
    calls["n"] = 0
    stats = refresh_views(src, specs)
    assert calls["n"] == 1  # ONE _change_data read for all three views
    assert [s.strategy for s in stats] == ["incremental"] * 3
    assert all(s.offset_after == src.version() for s in stats)

    oracle = _recompute_full(src)
    assert {
        (r.g,): r.s for r in sum_view_select(v1, ["s"]).collect()
    } == {k: v[0] for k, v in oracle.items()}
    assert {
        (r.g,): (r.lo, r.hi)
        for r in view_select(v2, mins=["lo"], maxs=["hi"]).collect()
    } == {k: (v[2], v[3]) for k, v in oracle.items()}
    assert {
        (r.g,): r.a for r in view_select(v3, avgs=["a"]).collect()
    } == {k: v[1] for k, v in oracle.items()}


def test_refresh_views_staggered_offsets(spark, tmp_path):
    """A view that joined late filters the shared window down to its own
    un-applied commits — no double-count."""
    src = _src(spark, tmp_path)
    rows = "g string, x long"
    va = SnaplogTable(spark, str(tmp_path / "va"))
    vb = SnaplogTable(spark, str(tmp_path / "vb"))
    src.write(spark.createDataFrame([("a", 1)], rows))
    refresh_sum_view(va, src, keys=["g"], sums={"s": "x"})  # va at head
    src.write(spark.createDataFrame([("a", 2), ("b", 3)], rows))
    stats = refresh_views(
        src,
        [ViewSpec(va, ["g"], sums={"s": "x"}), ViewSpec(vb, ["g"], sums={"s": "x"})],
    )
    assert stats[0].strategy == "incremental" and stats[1].strategy == "initial"
    for v in (va, vb):
        assert {
            (r.g,): (r.s, r.n_rows) for r in sum_view_select(v, ["s"]).collect()
        } == _recompute(src)
    # all-current -> pure no-op, no commits
    heads = (va.version(), vb.version())
    stats = refresh_views(
        src,
        [ViewSpec(va, ["g"], sums={"s": "x"}), ViewSpec(vb, ["g"], sums={"s": "x"})],
    )
    assert [s.strategy for s in stats] == ["no-op", "no-op"]
    assert (va.version(), vb.version()) == heads
