"""Single-pass validation metrics.

The reference computes one Spark job per expectation — ``df.count()`` plus
``filter(NOT p).count()`` per rule plus ``select(c).distinct().count()`` per
unique column (ref: dc43-integrations spark/data_quality.py:98-196). That is
N+1 full scans per validation. Here ALL row-level metrics collapse into ONE
aggregate pass:

    df.agg(count(*), sum(CASE WHEN NOT p THEN 1 END)..., count(DISTINCT c)...)

which Catalyst executes as a single scan with map-side partial aggregation —
at 100 TB that's the difference between one pass over the table and N.

Semantics parity notes (the metric VALUES must match the reference exactly):

- ``violations.<key>`` counts rows where ``NOT (predicate)`` is TRUE; a NULL
  predicate result (e.g. NULL compared with a bound) is NOT a violation —
  identical to ``filter(NOT p).count()`` null semantics.
- ``violations.unique_<col>`` = total - distinct-count-including-NULL,
  because the reference uses ``df.select(c).distinct().count()`` which counts
  NULL as one distinct value (data_quality.py:138-145).

``unique_strategy='approx'`` swaps exact distinct for HyperLogLog
``approx_count_distinct`` — the sanctioned fast path for very wide tables
(SURVEY §4); exact stays the default for oracle parity.

``observe_metrics`` piggybacks the same expressions on an existing action via
``DataFrame.observe`` — zero extra scans (used by streaming, SURVEY §2.6).
Distinct aggregates are not allowed in observations, so unique metrics are
computed separately (or approximated) in that mode.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from dc43_spark.contracts.model import Contract
from dc43_spark.expectations.compiler import ExpectationSpec, expectation_specs

QUERY_VIEW_NAME = "_dc43_dq_tmp"  # fixed, matches ref data_quality.py:180-191

SpecsOrContract = Union[Contract, Sequence[ExpectationSpec]]


def _as_specs(source: SpecsOrContract) -> list[ExpectationSpec]:
    if isinstance(source, Contract):
        return expectation_specs(source)
    return list(source)


def violation_expr(predicate: str) -> Column:
    """``sum(CASE WHEN NOT (p) THEN 1 ELSE 0 END)`` — NULL-safe violation count."""
    return F.sum(F.when(~F.expr(predicate), F.lit(1)).otherwise(F.lit(0)))


def unique_violations_expr(column: str, *, approx: bool = False) -> Column:
    """total - distinct(col)-including-NULL, as a single-pass expression."""
    col = F.col(column)
    distinct = (
        F.approx_count_distinct(col) if approx else F.countDistinct(col)
    ) + F.max(F.when(col.isNull(), F.lit(1)).otherwise(F.lit(0)))
    return F.count(F.lit(1)) - distinct


def metric_expressions(
    source: SpecsOrContract,
    *,
    unique_strategy: str = "exact",
    include_unique: bool = True,
    available_columns: Optional[Sequence[str]] = None,
) -> list[Column]:
    """Aliased aggregate columns for one-pass metric computation.

    Aliases are ``row_count`` and ``v_<key>`` (dots are illegal in column
    names; ``compute_metrics`` maps them back to ``violations.<key>``).
    Specs on columns absent from ``available_columns`` are skipped — the
    schema check reports those as missing-column errors instead.
    """
    specs = _as_specs(source)
    if available_columns is not None:
        present = set(available_columns)
        specs = [s for s in specs if s.column is None or s.column in present]
    exprs: list[Column] = [F.count(F.lit(1)).cast("long").alias("row_count")]
    for s in specs:
        if s.rule == "unique":
            if include_unique:
                exprs.append(
                    unique_violations_expr(
                        s.column, approx=unique_strategy == "approx"
                    ).cast("long").alias(f"v_{s.key}")
                )
        elif s.predicate is not None:
            exprs.append(violation_expr(s.predicate).cast("long").alias(f"v_{s.key}"))
    return exprs


def compute_metrics(
    df: DataFrame,
    source: SpecsOrContract,
    *,
    unique_strategy: str = "exact",
) -> dict[str, Any]:
    """All contract metrics in one aggregate action (+ one job per raw
    ``query`` rule, which is irreducible).

    Returns ``{"row_count": n, "violations.<key>": int, "query_<name>": x}``
    — same keys as the reference (data_quality.py:116-193).
    """
    specs = _as_specs(source)
    exprs = metric_expressions(
        specs, unique_strategy=unique_strategy, available_columns=df.columns
    )
    row = df.agg(*exprs).collect()[0].asDict()
    metrics: dict[str, Any] = {"row_count": row["row_count"] or 0}
    for k, v in row.items():
        if k.startswith("v_"):
            metrics[f"violations.{k[2:]}"] = int(v or 0)
    query_specs = [s for s in specs if s.rule == "query" and s.query]
    if query_specs:
        spark = df.sparkSession
        df.createOrReplaceTempView(QUERY_VIEW_NAME)
        try:
            for s in query_specs:
                rows = spark.sql(s.query).collect()
                metrics[s.key] = rows[0][0] if rows and len(rows[0]) else None
        finally:
            spark.catalog.dropTempView(QUERY_VIEW_NAME)
    return metrics


def metrics_dataframe(
    df: DataFrame,
    source: SpecsOrContract,
    *,
    unique_strategy: str = "exact",
) -> DataFrame:
    """The one-pass metric aggregation as a 1-row DataFrame (lazy)."""
    return df.agg(*metric_expressions(source, unique_strategy=unique_strategy))


def observe_metrics(
    df: DataFrame,
    source: SpecsOrContract,
    *,
    name: str = "dc43_metrics",
) -> tuple[DataFrame, Observation]:
    """Attach metrics to ``df`` via ``DataFrame.observe`` — the metrics ride
    along with whatever action consumes the frame (a write, a stream batch),
    costing zero extra scans. Unique metrics are excluded (Spark forbids
    distinct aggregates in observations); callers needing them run
    ``compute_metrics`` separately or accept approx in a later pass.
    """
    obs = Observation(name)
    exprs = metric_expressions(source, include_unique=False)
    return df.observe(obs, *exprs), obs


def observation_to_metrics(observed: dict[str, Any]) -> dict[str, Any]:
    """Map an Observation.get dict back to canonical metric keys."""
    out: dict[str, Any] = {}
    for k, v in observed.items():
        if k == "row_count":
            out["row_count"] = int(v or 0)
        elif k.startswith("v_"):
            out[f"violations.{k[2:]}"] = int(v or 0)
    return out
