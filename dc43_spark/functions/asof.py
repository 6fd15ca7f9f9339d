"""As-of (point-in-time) join: match each left row to the temporally
nearest right row per key — backward (most recent right at-or-before the
left timestamp) or forward (earliest right at-or-after).

Spark has no ASOF JOIN operator (DuckDB/Polars/pandas ``merge_asof`` do),
and the naive rewrite — inequality join + per-left-row top-1 — is a range
join that degenerates to a per-key cross product. This implementation is
the scalable composition of built-ins:

    union both sides tagged -> ONE shuffle on the key ->
    window sort by (ts, side) -> running ``last(right_payload,
    ignorenulls=True)`` -> keep left rows.

Cost at 100 TB: exactly one hash shuffle of |L|+|R| rows and a per-key
sort — the same shape as any groupBy — versus |L|x|R_key| for the naive
range join. No UDFs; the whole plan stays in whole-stage codegen except
the window itself.

Semantics notes (all tested):
- equal timestamps match (<= / >=): the right row sorts before the left
  row at the same instant;
- ``tolerance_seconds`` nulls out matches farther than the bound;
- unmatched left rows survive with NULL right columns (left-join shape);
- duplicate right rows on (key, ts) are made deterministic via
  ``tiebreak`` columns (last by tiebreak order wins).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_seconds: Optional[float] = None,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Point-in-time join ``left`` to ``right`` on ``on`` + time proximity.

    Output: every left row (all its columns) plus all right columns except
    the key columns; right columns are NULL where no right row qualifies.
    Right column names must not collide with left's — rename beforehand
    (keeps the operator honest instead of silently suffixing)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    l_cols = list(left.columns)
    r_cols = [c for c in right.columns if c not in on]
    collide = set(l_cols) & set(r_cols)
    if collide:
        raise ValueError(f"right columns collide with left: {sorted(collide)}")

    l_struct = T.StructType([left.schema[c] for c in l_cols])
    r_struct = T.StructType([right.schema[c] for c in r_cols])

    # Unify the two ts types WITHOUT a tz round-trip when either side is
    # wall-clock: casting NTZ -> TIMESTAMP goes through the session time
    # zone, which reorders/shifts instants across DST transitions. If any
    # side is TIMESTAMP_NTZ, do the whole join in NTZ (DATE -> NTZ is a
    # pure wall-clock conversion); only all-instant inputs use TIMESTAMP.
    _ntz = any(
        isinstance(df.schema[c].dataType, T.TimestampNTZType)
        for df, c in ((left, left_ts), (right, right_ts))
    )
    ts_type = "timestamp_ntz" if _ntz else "timestamp"

    lu = left.select(
        *on,
        F.col(left_ts).cast(ts_type).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*l_cols).alias("_l"),
        F.lit(None).cast(r_struct).alias("_r"),
    )
    ru = right.select(
        *on,
        F.col(right_ts).cast(ts_type).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_struct).alias("_l"),
        F.struct(*r_cols).alias("_r"),
    )
    u = lu.unionByName(ru)

    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    # right (0) before left (1) at the same instant -> equal timestamps match
    order = [ts_order, F.col("_is_left").asc()] + [
        F.col(f"_r.{c}").asc_nulls_first() for c in tiebreak
    ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_r", ignorenulls=True).over(w)
    # the matched row's own timestamp, for the tolerance bound (computed in
    # the same Window node — no extra shuffle or sort)
    matched_ts = F.last(
        F.when(F.col("_is_left") == 0, F.col("_ts")), ignorenulls=True
    ).over(w)

    out = (
        u.withColumn("_m", matched)
        .withColumn("_mts", matched_ts)
        .filter(F.col("_is_left") == 1)
    )
    if tolerance_seconds is not None:
        # timestamp_diff handles TIMESTAMP and TIMESTAMP_NTZ natively — no
        # cast through the session time zone, so DST transitions can't skew
        # the gap (unix_micros(cast(ntz as timestamp)) differences are off
        # by the offset change when the two wall times straddle one)
        gap = (
            F.timestamp_diff("MICROSECOND", F.col("_mts"), F.col("_ts"))
            if direction == "backward"
            else F.timestamp_diff("MICROSECOND", F.col("_ts"), F.col("_mts"))
        )
        within = gap <= F.lit(int(tolerance_seconds * 1_000_000))
        out = out.withColumn(
            "_m", F.when(within, F.col("_m")).otherwise(F.lit(None).cast(r_struct))
        )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in l_cols],
        *[F.col(f"_m.{c}").alias(c) for c in r_cols],
    )
