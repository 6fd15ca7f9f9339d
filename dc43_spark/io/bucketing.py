"""Bucketed tables: pay the join shuffle once, at write time.

At 100 TB the dominant cost of a fact-to-fact join is shuffling both sides
on the key. Writing each table bucketed by that key (``bucketBy(n, key)`` +
``sortBy`` + ``saveAsTable``) materialises the hash partitioning in storage;
every later join or aggregation on the key reads co-partitioned buckets and
Catalyst plans a SortMergeJoin with NO Exchange on the bucketed side(s) —
`reuse a partitioning across stages` as a storage contract.

Rules that make it work (all encoded in ``write_bucketed``):
- both sides must use the SAME bucket count (or a divisor, Spark >= 3.1
  with bucket coalescing) and the SAME key columns;
- bucketed output must go through ``saveAsTable`` (the catalog carries the
  bucket spec; a bare path write silently loses it);
- ``sortBy`` the key too, so the merge phase needs no per-bucket sort.

``shuffle_exchanges`` is the verification hook: tests (and operators that
care) assert a join over two co-bucketed tables plans ZERO shuffle
exchanges, instead of trusting that it "should".
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class BucketSpec:
    """Layout contract for a bucketed table: join key(s) + bucket count.

    Share one instance across every table that participates in the
    co-located join — same count, same keys, no drift."""

    keys: tuple[str, ...]
    buckets: int

    def __post_init__(self) -> None:
        if self.buckets <= 0:
            raise ValueError("buckets must be positive")
        if not self.keys:
            raise ValueError("at least one bucket key required")


def write_bucketed(
    df: DataFrame,
    table: str,
    spec: BucketSpec,
    *,
    path: Optional[str] = None,
    format: str = "parquet",
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed catalog table per ``spec``.

    ``path`` pins the storage location (external table); omit it to use the
    warehouse dir. Sorting within buckets is on by default so downstream
    SortMergeJoins skip their sort phase."""
    writer = df.write.format(format).mode(mode).bucketBy(spec.buckets, *spec.keys)
    if sort:
        writer = writer.sortBy(*spec.keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    spec: BucketSpec,
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with the same ``BucketSpec``.

    Just a catalog read + equi-join on the spec keys — the plan-level win
    (no Exchange) comes from the bucket metadata, not from anything done
    here. Kept as a function so callers express intent and tests have one
    seam to verify."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=list(spec.keys), how=how)


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The query plan as text (what ``df.explain`` prints)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def shuffle_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan.

    Broadcast exchanges are NOT counted — broadcasting a small side is the
    desired strategy, not a shuffle. Use this to assert a co-bucketed join
    is genuinely shuffle-free."""
    # "simple" mode inlines operator arguments (formatted mode moves them to
    # a details section, where hashpartitioning no longer follows "Exchange")
    plan = plan_string(df, "simple")
    return len(re.findall(r"\bExchange (?:hash|range)partitioning", plan))
