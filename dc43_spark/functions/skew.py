"""Skew mitigation: salted joins and two-phase aggregation.

Heavy-hitter keys turn one shuffle partition into the straggler that
defines job wall-clock. Two standing remedies, each a pure rewrite that
leaves results identical (the salted-join gate query hash-matches the
plain-join oracle to prove it):

- ``salted_join``: the skewed (big) side gets a per-row pseudo-random salt
  in [0, salt); the small side is replicated once per salt value; the join
  key becomes (key, salt), splitting each hot key across ``salt``
  partitions. Cost: |small| x salt extra rows — cheap when the small side
  is dimension-sized.
- ``two_phase_distinct``: exact per-key distinct counts without funnelling
  each key's whole value set through one reducer — phase 1 dedups on
  (key, value) [the value spreads the hot key], phase 2 counts per key.

Spark's AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``) already
splits oversized partitions for sort-merge joins at runtime — prefer it
when it applies. Manual salting remains the tool when AQE can't see the
skew: broadcast-ineligible shuffle-hash paths, skewed aggregations feeding
the join, or streaming state keyed on the hot column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    *,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the hot keys of ``skewed`` spread over ``salt``
    sub-keys. Row-identical to ``skewed.join(small, on, how)``.

    The salt is ``rand(seed)``-derived — per-row, independent of the key
    (hashing the key would send every duplicate of a hot key to the same
    sub-partition, defeating the split)."""
    if salt <= 0:
        raise ValueError("salt must be positive")
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "left_anti"):
        # right/full-outer would emit each unmatched SMALL-side row once per
        # salt replica — not row-identical to the plain join
        raise ValueError(f"salted_join does not preserve semantics for how={how!r}")
    on = list(on)
    s = skewed.withColumn("_salt", F.floor(F.rand(seed) * salt).cast("int"))
    r = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = s.join(r, on=on + ["_salt"], how=how)
    return out.drop("_salt")


def two_phase_distinct(
    df: DataFrame,
    *,
    key: Sequence[str],
    value: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact distinct-count per key as dedup-then-count.

    ``groupBy(key).agg(countDistinct(value))`` shuffles every (key, value)
    pair to the key's single reducer; here phase 1 shuffles on
    (key, value) — spreading a hot key over as many partitions as it has
    distinct values — and phase 2 only moves one row per (key, value)."""
    key = list(key)
    return (
        df.select(*key, value)
        .distinct()
        .groupBy(*key)
        .agg(F.count(F.lit(1)).cast("long").alias(out_col))
    )


def skew_report(
    df: DataFrame,
    cols: Sequence[str],
    *,
    top_n: int = 20,
) -> DataFrame:
    """Heavy-hitter diagnosis for a prospective shuffle key: the ``top_n``
    key values by row count with each key's micro-fraction of the total —
    the number that decides whether a join/agg on ``cols`` needs salting
    (a key near 1/shuffle-partitions of the data IS the straggler).

    One partially-aggregated shuffle on the candidate key + a broadcast
    of the single-row total; output is top_n rows, driver-safe at any
    corpus size. Deterministic tie-break on the key values."""
    from dc43_spark.functions.curation import micro_ratio

    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    total = df.select(F.count(F.lit(1)).cast("long").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *cols,
            "n_rows",
            micro_ratio(F.col("n_rows"), F.col("_total")).alias("fraction_micro"),
        )
        .orderBy(F.col("n_rows").desc(), *[F.col(c).asc() for c in cols])
        .limit(top_n)
    )
