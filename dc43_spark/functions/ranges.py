"""Range (interval) join: match point rows to the interval rows that
contain them, without the inequality-join cross product.

A naive ``l.ts BETWEEN r.start AND r.end`` join gives Catalyst no equi-key
beyond ``on``: per key it is a nested-loop over |points| x |intervals|. The
scalable composition here bucketizes time:

    point  -> its bucket (floor(ts / width))          [narrow]
    interval -> every bucket it overlaps (sequence+explode)  [narrow, fan-out
                bounded by interval_length / width]
    equi-join on (key..., bucket)  -> ONE hash shuffle
    exact containment filter       -> drops same-bucket non-overlaps

Each (point, interval) pair meets in exactly one bucket — the point's own —
so no dedup pass is needed. Pick ``bucket_width`` near the typical interval
length: too small explodes long intervals, too large degrades toward the
nested loop within buckets (the classic DBSP/interval-index trade-off).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: Sequence[str] = (),
    point_ts: str = "ts",
    start_ts: str = "start",
    end_ts: str = "end",
    bucket_width_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to interval rows with ``start <= ts <= end``
    (inclusive both ends), equi-matched on ``on`` first.

    Output: all point columns + all interval columns (names must not
    collide apart from ``on``). ``how='left'`` keeps pointless points with
    NULL interval columns."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    on = list(on)
    p_cols = list(points.columns)
    i_cols = [c for c in intervals.columns if c not in on]
    collide = set(p_cols) & set(i_cols)
    if collide:
        raise ValueError(f"interval columns collide with point columns: {sorted(collide)}")

    width_us = bucket_width_seconds * 1_000_000

    # NTZ-faithful time math (same policy as asof_join): if any input is
    # wall-clock, bucket and compare in NTZ — a cast through the session tz
    # would skew gaps across DST transitions. Bucket micros come from
    # timestamp_diff against a fixed same-type epoch literal (the reference
    # point only sets bucket ALIGNMENT, never which pairs match).
    from pyspark.sql import types as T

    _ntz = any(
        isinstance(df.schema[c].dataType, T.TimestampNTZType)
        for df, c in ((points, point_ts), (intervals, start_ts), (intervals, end_ts))
    )
    ts_type = "timestamp_ntz" if _ntz else "timestamp"
    epoch = F.expr(
        ("TIMESTAMP_NTZ" if _ntz else "TIMESTAMP") + "'1970-01-01 00:00:00'"
    )

    def _bucket(col: str):
        # floor, not cast-truncate: truncation rounds toward zero, which
        # mis-buckets pre-epoch (negative-micros) timestamps
        micros = F.timestamp_diff("MICROSECOND", epoch, F.col(col).cast(ts_type))
        return F.floor(micros / width_us).cast("long")

    p = points.withColumn("_bucket", _bucket(point_ts))
    iv = intervals.withColumn(
        "_bucket", F.explode(F.sequence(_bucket(start_ts), _bucket(end_ts)))
    )
    joined = p.join(iv, on=on + ["_bucket"], how=how)
    contains = (F.col(point_ts).cast(ts_type) >= F.col(start_ts).cast(ts_type)) & (
        F.col(point_ts).cast(ts_type) <= F.col(end_ts).cast(ts_type)
    )
    if how == "inner":
        out = joined.filter(contains)
    else:
        # left: null out non-containing matches, then keep the best... a
        # bucket-equi LEFT join can emit both a matching and a non-matching
        # row for the same point, so re-aggregate to point granularity:
        # containment rows win, else one null row survives.
        matched = joined.filter(contains)
        unmatched = (
            p.join(
                matched.select(*[F.col(c) for c in on], F.col(point_ts)).distinct(),
                on=on + [point_ts],
                how="left_anti",
            )
        )
        for c in i_cols:
            unmatched = unmatched.withColumn(c, F.lit(None).cast(intervals.schema[c].dataType))
        out = matched.unionByName(unmatched.withColumn("_bucket", F.lit(None).cast("long")))
    return out.select(*p_cols, *i_cols)
