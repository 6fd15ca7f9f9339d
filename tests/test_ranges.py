from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from dc43_spark.functions.ranges import interval_join

T0 = datetime(2026, 1, 1)


def t(minutes: float) -> datetime:
    return T0 + timedelta(minutes=minutes)


P_SCHEMA = "id long, k long, ts timestamp"
I_SCHEMA = "k long, start timestamp, end timestamp, label string"


@pytest.fixture()
def frames(spark):
    points = spark.createDataFrame(
        [
            (1, 1, t(5)),     # inside A
            (2, 1, t(30)),    # boundary: == A.end (inclusive)
            (3, 1, t(31)),    # in the gap
            (4, 1, t(90)),    # inside B (interval spans multiple 10-min buckets)
            (5, 2, t(5)),     # right key, wrong interval key
        ],
        P_SCHEMA,
    )
    intervals = spark.createDataFrame(
        [(1, t(0), t(30), "A"), (1, t(60), t(200), "B")],
        I_SCHEMA,
    )
    return points, intervals


def test_inner_containment(frames):
    points, intervals = frames
    got = {
        r.id: r.label
        for r in interval_join(
            points, intervals, on=["k"], bucket_width_seconds=600
        ).collect()
    }
    assert got == {1: "A", 2: "A", 4: "B"}


def test_left_keeps_unmatched(frames):
    points, intervals = frames
    rows = interval_join(
        points, intervals, on=["k"], bucket_width_seconds=600, how="left"
    ).collect()
    got = {r.id: r.label for r in rows}
    assert got == {1: "A", 2: "A", 3: None, 4: "B", 5: None}
    assert len(rows) == 5


def test_overlapping_intervals_yield_multiple_matches(spark):
    points = spark.createDataFrame([(1, 1, t(10))], P_SCHEMA)
    intervals = spark.createDataFrame(
        [(1, t(0), t(20), "X"), (1, t(5), t(15), "Y")], I_SCHEMA
    )
    rows = interval_join(points, intervals, on=["k"], bucket_width_seconds=60)
    assert {r.label for r in rows.collect()} == {"X", "Y"}


def test_matches_naive_inequality_join(spark):
    """Fuzz: bucketized result == naive BETWEEN join on random data,
    across bucket widths straddling the interval lengths."""
    import numpy as np

    rng = np.random.default_rng(1)
    points = spark.createDataFrame(
        [
            (int(i), int(k), t(float(m)))
            for i, (k, m) in enumerate(zip(rng.integers(0, 4, 300), rng.uniform(0, 500, 300)))
        ],
        P_SCHEMA,
    )
    ivs = []
    for j in range(40):
        start = float(rng.uniform(0, 480))
        ivs.append((int(rng.integers(0, 4)), t(start), t(start + float(rng.uniform(1, 120))), f"i{j}"))
    intervals = spark.createDataFrame(ivs, I_SCHEMA)

    from pyspark.sql import functions as F

    naive = (
        points.join(intervals, on="k")
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")))
        .select("id", "label")
    )
    expect = {(r.id, r.label) for r in naive.collect()}
    for width in (60, 600, 7200):
        got = {
            (r.id, r.label)
            for r in interval_join(
                points, intervals, on=["k"], bucket_width_seconds=width
            ).collect()
        }
        assert got == expect, f"width={width}"


def test_interval_join_ntz_is_wall_clock_across_dst(spark):
    """NTZ points/intervals must match on WALL CLOCK regardless of session
    tz: a 03:30 NY wall time across spring-forward is inside a
    [03:00, 04:00] wall interval — the old cast path could shift it out."""
    from dc43_spark.functions.ranges import interval_join

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        points = spark.sql(
            "SELECT 1 AS k, TIMESTAMP_NTZ'2026-03-08 03:30:00' AS ts, 1 AS pid"
        )
        intervals = spark.sql(
            "SELECT 1 AS k, TIMESTAMP_NTZ'2026-03-08 03:00:00' AS s, "
            "TIMESTAMP_NTZ'2026-03-08 04:00:00' AS e, 7 AS iv"
        )
        out = interval_join(
            points, intervals, on=["k"], point_ts="ts", start_ts="s", end_ts="e",
            bucket_width_seconds=1800,
        ).collect()
        assert len(out) == 1 and out[0]["iv"] == 7
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
