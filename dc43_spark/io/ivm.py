"""Incremental materialized-view maintenance over the snaplog change feed.

A grouped sum/count aggregate is SELF-MAINTAINABLE from row-level
changes alone: sign each change (+1 for insert / update_postimage, -1
for delete / update_preimage), aggregate the signed deltas by group
key, and add them to the stored view. No base-table re-read — refresh
cost is O(rows changed since the last refresh), which at 100 TB is the
difference between touching one commit's delta and recomputing the
world. (The classic incremental view maintenance result: SUM/COUNT are
invertible under the signed-delta algebra; MIN/MAX are not — a deleted
extremum needs a group re-scan — so this module refuses them and a
caller who needs them recomputes affected groups.)

SQL-exact SUM semantics need one extra piece of state: ``SUM(col)`` over
a group whose non-null measures all disappeared is NULL, not 0, and the
accumulated signed total can't tell those apart. The view therefore
carries a hidden ``<out>__nn`` column counting non-null contributions
per measure; the exposed sum is NULL exactly when it reaches zero.
(Without it, deleting the only priced row of a group would surface 0
revenue instead of NULL — caught by the recompute-oracle test.)

Exactly-once without a sidecar: the consumer offset (last source
version applied) rides in the VIEW's own commit manifest as a ``txn``
marker (``{"app_id": "ivm:<source>", "version": head}``), so applying
the delta and advancing the offset are ONE atomic commit — a crash
between them is impossible, and a replayed refresh sees the advanced
offset and no-ops. The same machinery the exactly-once streaming sink
uses, pointed at CDC.

Groups whose row count reaches zero are DELETED from the view (via the
merge's delete predicate); transient groups (born and fully gone inside
one refresh window) are filtered out before the merge and never touch
storage.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import functions as F

from dc43_spark.io.snaplog import CHANGE_TYPE_COL, SnaplogTable

_PLUS = ("insert", "update_postimage")
_MINUS = ("delete", "update_preimage")


@dataclass
class RefreshStats:
    """One refresh: which source window was applied and how."""

    offset_before: Optional[int]
    offset_after: int
    groups_changed: int
    strategy: str  # "initial" | "incremental" | "no-op"


def _ivm_app_id(source: SnaplogTable) -> str:
    return f"ivm:{os.path.abspath(source.path)}"


def _nn(out: str) -> str:
    return f"{out}__nn"


def sum_view_offset(view: SnaplogTable, source: SnaplogTable) -> Optional[int]:
    """Source version the view has applied (None before first refresh) —
    read from the txn markers in the view's own log."""
    if not view.exists():
        return None
    return view.last_txn_version(_ivm_app_id(source))


def refresh_sum_view(
    view: SnaplogTable,
    source: SnaplogTable,
    *,
    keys: Sequence[str],
    sums: dict,
    count_col: str = "n_rows",
) -> RefreshStats:
    """Bring ``view`` = ``SELECT keys, SUM(col)..., COUNT(*) FROM source
    GROUP BY keys`` up to date with the source head, reading ONLY the
    change feed since the last refresh.

    ``sums`` maps output column -> source column (``{"revenue":
    "price"}``); ``count_col`` receives COUNT(*). SQL semantics
    throughout: SUM ignores NULL measures and is NULL for a group with
    none, COUNT(*) counts every row, NULL group keys form their own
    group. The view table carries one hidden ``<out>__nn`` column per
    sum (see module docstring).
    """
    keys = list(keys)
    if not sums:
        raise ValueError("refresh_sum_view needs at least one sum measure")
    reserved = set(keys) | {count_col}
    bad = sorted(c for c in sums if c in reserved or _nn(c) in reserved)
    if bad or count_col in keys:
        raise ValueError(f"measure column(s) collide with keys/count: {bad}")
    app_id = _ivm_app_id(source)
    offset = sum_view_offset(view, source)
    if offset is None and view.exists():
        raise ValueError(
            f"view {view.path} exists but carries no '{app_id}' txn marker "
            "— refreshing would double-count; start from an empty view path"
        )
    changes, head = source.changes_since(offset)
    if offset is not None and head <= offset:
        return RefreshStats(offset, offset, 0, "no-op")

    sign = (
        F.when(F.col(CHANGE_TYPE_COL).isin(*_PLUS), F.lit(1))
        .when(F.col(CHANGE_TYPE_COL).isin(*_MINUS), F.lit(-1))
        .otherwise(F.lit(0))
    )
    # signed delta per group: raw sum (coalesced to 0 so the algebra is
    # total), non-null contribution count, row count
    delta = changes.groupBy(*[F.col(k) for k in keys]).agg(
        *[
            F.coalesce(F.sum(sign * F.col(src)), F.lit(0)).alias(f"_d_{out}")
            for out, src in sums.items()
        ],
        *[
            F.coalesce(
                F.sum(sign * F.col(src).isNotNull().cast("int")), F.lit(0)
            ).alias(f"_d_{_nn(out)}")
            for out, src in sums.items()
        ],
        F.coalesce(F.sum(sign), F.lit(0)).alias(f"_d_{count_col}"),
    )

    def finalize(raw, nn):
        # exposed SUM: NULL iff zero non-null contributions remain
        return F.when(nn == 0, F.lit(None)).otherwise(raw)

    txn = {"app_id": app_id, "version": head}

    if offset is None and not view.exists():
        initial = delta.filter(F.col(f"_d_{count_col}") > 0).select(
            *keys,
            *[
                finalize(F.col(f"_d_{out}"), F.col(f"_d_{_nn(out)}")).alias(out)
                for out in sums
            ],
            *[F.col(f"_d_{_nn(out)}").alias(_nn(out)) for out in sums],
            F.col(f"_d_{count_col}").alias(count_col),
        ).localCheckpoint(eager=True)  # one CDC aggregation, consumed twice
        view.write(initial, mode="overwrite", txn=txn)
        return RefreshStats(None, head, initial.count(), "initial")

    # combine with the CURRENT view values for the affected groups only:
    # the join's left side is the delta (bounded by changed rows); at
    # scale, broadcast the delta against the much larger stored view
    cur = view.read().select(
        *[F.col(k).alias(f"_v_{k}") for k in keys],
        *[F.col(c).alias(f"_v_{c}") for c in [*sums, *map(_nn, sums), count_col]],
        F.lit(True).alias("_in_view"),
    )
    cond = [delta[k].eqNullSafe(cur[f"_v_{k}"]) for k in keys]
    joined = delta.join(cur, cond, "left_outer")
    new_nn = {
        out: F.coalesce(F.col(f"_v_{_nn(out)}"), F.lit(0)) + F.col(f"_d_{_nn(out)}")
        for out in sums
    }
    combined = joined.select(
        *[delta[k] for k in keys],
        *[
            finalize(
                F.coalesce(F.col(f"_v_{out}"), F.lit(0)) + F.col(f"_d_{out}"),
                new_nn[out],
            ).alias(out)
            for out in sums
        ],
        *[new_nn[out].alias(_nn(out)) for out in sums],
        (
            F.coalesce(F.col(f"_v_{count_col}"), F.lit(0)) + F.col(f"_d_{count_col}")
        ).alias(count_col),
        F.coalesce(F.col("_in_view"), F.lit(False)).alias("_in_view"),
    )
    # eager checkpoint: the plan below (CDC scan + signed-delta groupBy +
    # view join) is consumed twice — the count here and the merge's own
    # staging — and would otherwise re-execute end to end
    merge_src = combined.filter((F.col(count_col) > 0) | F.col("_in_view")).drop(
        "_in_view"
    ).localCheckpoint(eager=True)
    n = merge_src.count()
    if n == 0:
        # nothing to apply (e.g. only transient groups) — still advance
        # the offset atomically via an empty append commit
        view.write(view.read().limit(0), mode="append", txn=txn)
        return RefreshStats(offset, head, 0, "incremental")
    view.merge(
        merge_src,
        keys,
        delete_predicate=f"s.{count_col} = 0",
        txn=txn,
    )
    return RefreshStats(offset, head, n, "incremental")


def sum_view_select(view: SnaplogTable, sums: Sequence[str], count_col: str = "n_rows"):
    """The user-facing projection of the view (hides the ``__nn``
    bookkeeping columns)."""
    df = view.read()
    return df.drop(*[_nn(c) for c in sums])
