"""Incremental materialized views over the snaplog change feed.

Oracle: after EVERY refresh, the maintained view must equal a full
GROUP BY recompute over the source head — including SQL's awkward
corners (NULL keys group, SUM of an all-NULL group is NULL, COUNT(*)
counts NULL measures, groups vanishing to zero rows)."""

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.ivm import refresh_sum_view, sum_view_offset, sum_view_select
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
