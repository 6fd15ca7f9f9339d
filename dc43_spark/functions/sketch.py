"""Heavy hitters at corpus scale: EXACT frequent-item detection without
a full-cardinality shuffle.

The naive plan — ``explode -> groupBy(token) -> count -> filter`` —
shuffles one row per DISTINCT key. At 100 TB the interesting keys
(URLs, hosts, 13-grams, near-duplicate fingerprints) easily run to
billions of distinct values, so the shuffle IS the job even though the
answer is a handful of rows. The classic fix is a two-pass plan with a
mergeable summary:

1. **Misra–Gries per input partition** (``mapInPandas``, Arrow-batched —
   the summary is inherently imperative, this is the documented
   can't-express-in-builtins case): one pass over the partition keeps at
   most ``capacity`` counters; every emitted count is a LOWER bound with
   per-partition undercount ≤ n_p/(capacity+1). Output is ≤ capacity
   rows per partition plus one total-count row — shuffle volume
   O(partitions × capacity), independent of key cardinality.
2. **Candidate selection** (one tiny aggregation): sum the per-partition
   lower bounds; a key's global UPPER bound is that sum + N/(capacity+1).
   Every key with true frequency ≥ min_fraction·N has an upper bound
   over the threshold and survives at least one partition summary (the
   guarantee needs capacity+1 > 1/min_fraction — enforced), so the
   candidate set provably contains every true heavy hitter.
3. **Exact recount** (second scan, broadcast semi-join on the small
   candidate set): exact counts for candidates only, final filter at
   the threshold. No approximation survives to the output.

The result is EXACT — identical to the naive plan — with shuffle volume
bounded by partitions × capacity + candidate occurrences. The SQL
oracle is the naive plan itself (gate ``heavy_hitters_documents``)."""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F
from dc43_spark.localdf import local_df


def _mg_summaries(capacity: int):
    """Per-partition Misra–Gries pass: iterator of Arrow batches ->
    (key, lower-bound count) rows, capped at ``capacity``, plus one
    (NULL, partition row count) total row."""

    def run(batches):
        import pandas as pd

        counters: dict = {}
        total = 0
        for pdf in batches:
            col = pdf.iloc[:, 0]
            total += int(col.notna().sum())
            # batched MG: vectorized value_counts merge, then subtract
            # the (capacity+1)-th largest count from ALL counters and
            # drop the non-positive — equivalent to that many
            # decrement-all rounds, so the classic bound holds (total
            # undercount ≤ n_p/(capacity+1); memory ≤ capacity +
            # batch-distincts, never the partition's key cardinality)
            for v, c in col.value_counts(dropna=True).items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > capacity:
                vals = sorted(counters.values(), reverse=True)
                m = vals[capacity]
                counters = {
                    k: n - m for k, n in counters.items() if n - m > 0
                }
        out = {"key": list(counters.keys()) + [None],
               "cnt": list(counters.values()) + [total]}
        yield pd.DataFrame(out)

    return run


def default_capacity(min_fraction: float) -> int:
    """The smallest per-partition summary size that makes the candidate
    set provably complete for ``min_fraction`` (capacity+1 > 1/φ with a
    2x margin that also halves the candidate count)."""
    return max(int(math.ceil(2.0 / min_fraction)), 2)


def heavy_hitters(
    df: DataFrame,
    key: Column | str,
    min_fraction: float,
    *,
    capacity: Optional[int] = None,
) -> DataFrame:
    """Exact keys with frequency ≥ ``min_fraction`` of the non-null
    total, as (key, n, total) — two scans, no full-cardinality shuffle.

    ``capacity`` defaults to the smallest size that makes the candidate
    set provably complete (ceil(2/min_fraction)); raising it shrinks the
    candidate set (fewer exact recounts), never changes the answer."""
    if not (0.0 < min_fraction <= 1.0):
        raise ValueError(f"min_fraction must be in (0, 1], not {min_fraction}")
    if capacity is None:
        capacity = default_capacity(min_fraction)
    if capacity + 1 <= 1.0 / min_fraction:
        raise ValueError(
            f"capacity {capacity} cannot guarantee completeness for "
            f"min_fraction {min_fraction}; need capacity+1 > 1/min_fraction"
        )
    col = F.col(key) if isinstance(key, str) else key
    keyed = df.select(col.cast("string").alias("key"))

    summaries = keyed.mapInPandas(
        _mg_summaries(capacity), "key string, cnt long"
    )
    # ONE tiny aggregation over ≤ partitions × (capacity+1) rows; the
    # NULL-key rows carry per-partition NON-NULL totals (nulls are never
    # keys and never count toward N)
    agg = summaries.groupBy("key").agg(F.sum("cnt").alias("lb")).persist()
    try:
        n_total = agg.filter(F.col("key").isNull()).select(
            F.sum("lb")
        ).first()[0] or 0
        if n_total == 0:
            return local_df(
                df.sparkSession, [], "key string, n long, total long"
            )
        slack = n_total / (capacity + 1)
        threshold = min_fraction * n_total
        candidates = (
            agg.filter(F.col("key").isNotNull())
            .filter(F.col("lb") + F.lit(slack) >= F.lit(threshold))
            .select("key")
        )
        # exact recount of the candidates only: broadcast semi-join keeps
        # the second scan shuffle at O(candidate occurrences)
        exact = (
            keyed.join(F.broadcast(candidates), "key", "left_semi")
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= F.lit(float(threshold)))
            .withColumn("total", F.lit(int(n_total)))
        )
        # pin the SMALL result (≤ 2/min_fraction rows by the lb-sum
        # argument: Σ lower bounds ≤ N, each candidate's ≥ threshold −
        # slack ≥ φN/2) so agg can unpersist without the recount
        # re-deriving the summaries
        exact = exact.localCheckpoint(eager=True)
    finally:
        agg.unpersist()
    return exact
