from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from dc43_spark.functions.asof import asof_join

T0 = datetime(2026, 1, 1)


def t(minutes: float) -> datetime:
    return T0 + timedelta(minutes=minutes)


L_SCHEMA = "id long, k long, ts timestamp"
R_SCHEMA = "k long, rts timestamp, v string"


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, 1, t(10)), (2, 1, t(25)), (3, 1, t(5)), (4, 2, t(10)), (5, 3, t(10))],
        L_SCHEMA,
    )
    right = spark.createDataFrame(
        [(1, t(8), "a"), (1, t(20), "b"), (1, t(30), "c"), (2, t(10), "x")],
        R_SCHEMA,
    )
    return left, right


def _by_id(df):
    return {r.id: (r.v, r.rts) for r in df.collect()}

def test_backward(frames, spark):
    left, right = frames
    got = _by_id(asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts"))
    assert got[1] == ("a", t(8))     # 10 -> latest <= 10 is 8
    assert got[2] == ("b", t(20))    # 25 -> 20
    assert got[3] == (None, None)    # 5 -> nothing before
    assert got[4] == ("x", t(10))    # equal timestamp matches
    assert got[5] == (None, None)    # key with no right rows


def test_forward(frames, spark):
    left, right = frames
    got = _by_id(
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", direction="forward")
    )
    assert got[1] == ("b", t(20))    # 10 -> earliest >= 10 is 20
    assert got[2] == ("c", t(30))
    assert got[3] == ("a", t(8))
    assert got[4] == ("x", t(10))    # equal timestamp matches forward too
    assert got[5] == (None, None)


def test_tolerance(frames, spark):
    left, right = frames
    got = _by_id(
        asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts", tolerance_seconds=120
        )
    )
    assert got[1] == ("a", t(8))     # gap 2 min == tolerance -> kept
    assert got[2] == (None, None)    # gap 5 min > 2 min -> nulled
    assert got[4] == ("x", t(10))    # gap 0


def test_tiebreak_duplicate_right_ts(spark):
    left = spark.createDataFrame([(1, 1, t(10))], L_SCHEMA)
    right = spark.createDataFrame(
        [(1, t(5), "m"), (1, t(5), "z"), (1, t(5), "a")], R_SCHEMA
    )
    got = _by_id(
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", tiebreak=["v"])
    )
    assert got[1] == ("z", t(5))     # last by tiebreak order wins, deterministically


def test_collision_raises(spark):
    left = spark.createDataFrame([(1, 1, t(1))], L_SCHEMA)
    right = spark.createDataFrame([(1, t(1), "a")], R_SCHEMA).withColumnRenamed("v", "ts")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts")


def test_matches_pandas_merge_asof(spark):
    """Fuzz vs pandas.merge_asof on a deterministic random set."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(0)
    lpdf = pd.DataFrame(
        {
            "id": np.arange(200),
            "k": rng.integers(0, 5, 200),
            "ts": pd.to_datetime(rng.integers(0, 10_000, 200), unit="s"),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 100),
            "rts": pd.to_datetime(rng.integers(0, 10_000, 100), unit="s"),
            "v": np.arange(100, dtype="int64"),
        }
    )
    # merge_asof requires unique sort order; drop duplicate (k, rts)
    rpdf = rpdf.drop_duplicates(subset=["k", "rts"])
    expect = pd.merge_asof(
        lpdf.sort_values("ts"),
        rpdf.sort_values("rts"),
        left_on="ts",
        right_on="rts",
        by="k",
        direction="backward",
    ).sort_values("id")

    got = (
        asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            on=["k"],
            left_ts="ts",
            right_ts="rts",
        )
        .toPandas()
        .sort_values("id")
    )
    assert list(got["v"].fillna(-1)) == list(expect["v"].fillna(-1))


def test_asof_ntz_tolerance_is_wall_clock_across_dst(spark):
    """TIMESTAMP_NTZ inputs must use wall-clock gaps regardless of session
    tz. Two NY wall times straddling the 2026-03-08 spring-forward are 2h
    apart on the wall but 1h apart as instants; with a 1.5h tolerance the
    match must be REJECTED (gap 2h) — the old cast-through-session-tz path
    measured 1h and wrongly matched."""
    from dc43_spark.functions.asof import asof_join

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        left = spark.sql(
            "SELECT 1 AS k, TIMESTAMP_NTZ'2026-03-08 03:30:00' AS ts, 10 AS lv"
        )
        right = spark.sql(
            "SELECT 1 AS k, TIMESTAMP_NTZ'2026-03-08 01:30:00' AS rts, 20 AS rv"
        )
        out = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            tolerance_seconds=5400,
        ).collect()
        assert len(out) == 1 and out[0]["rv"] is None
        # and with a 2h tolerance the same pair matches
        ok = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            tolerance_seconds=7200,
        ).collect()
        assert ok[0]["rv"] == 20
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
