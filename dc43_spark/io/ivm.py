"""Incremental materialized-view maintenance over the snaplog change feed.

A grouped SUM/COUNT/AVG aggregate is SELF-MAINTAINABLE from row-level
changes alone: sign each change (+1 for insert / update_postimage, -1
for delete / update_preimage), aggregate the signed deltas by group
key, and add them to the stored view. No base-table re-read — refresh
cost is O(rows changed since the last refresh), which at 100 TB is the
difference between touching one commit's delta and recomputing the
world. (The classic incremental view maintenance result: SUM/COUNT are
invertible under the signed-delta algebra; AVG rides on stored SUM +
non-null COUNT; MIN/MAX are NOT invertible — deleting the current
extremum needs a group re-scan — so they get a TARGETED second pass
re-aggregating ONLY the dirty groups from the base table, joined from
the delta's affected-group set, never a full recompute.)

MIN/MAX dirtiness is decided conservatively but soundly: with stored
minimum ``m``, window-inserted minimum ``i`` and window-deleted minimum
``d``, a group is clean iff no delete reaches the candidate extremum
(``d > least(m, i)``). Proof the clean case is exact: every pre-state
value >= m and every inserted value >= i, so min(pre ∪ ins) =
least(m, i); deletes only removed values strictly above it, so every
occurrence of the candidate survives and it IS the post-state minimum.
This also catches the insert-then-delete-below-the-min window (insert 3,
delete 3 against stored min 5: d=3 <= least(5,3) -> dirty), where the
naive "was the stored extremum deleted?" test silently keeps 3. MAX is
the mirror (``greatest`` / ``>=``).

SQL-exact semantics need one extra piece of state: ``SUM(col)`` over a
group whose non-null measures all disappeared is NULL, not 0, and the
accumulated signed total can't tell those apart. The view therefore
carries a hidden ``<out>__nn`` column counting non-null contributions
per measure; the exposed aggregate is NULL exactly when it reaches zero
(AVG and MIN/MAX reuse the same counter; AVG additionally stores its
running total in a hidden ``<out>__sum``). Without it, deleting the
only priced row of a group would surface 0 revenue instead of NULL —
caught by the recompute-oracle test.

Exactly-once without a sidecar: the consumer offset (last source
version applied) rides in the VIEW's own commit manifest as a ``txn``
marker (``{"app_id": "ivm:<source>", "version": head}``), so applying
the delta and advancing the offset are ONE atomic commit — a crash
between them is impossible, and a replayed refresh sees the advanced
offset and no-ops. The same machinery the exactly-once streaming sink
uses, pointed at CDC.

``refresh_views`` maintains N views of one source from a SINGLE change
feed read: the union window (from the oldest view offset) is read once,
checkpointed, and each view filters it to ``_commit_version > its own
offset`` — one ``_change_data`` scan total instead of one per view,
with each view still advancing its own offset atomically in its own
commit.

Groups whose row count reaches zero are DELETED from the view (via the
merge's delete predicate); transient groups (born and fully gone inside
one refresh window) are filtered out before the merge and never touch
storage.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

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
    groups_rescanned: int = 0  # MIN/MAX dirty groups re-aggregated from base


@dataclass
class ViewSpec:
    """One maintained view for ``refresh_views``: the target table plus
    the same aggregate spec ``refresh_view`` takes."""

    view: SnaplogTable
    keys: Sequence[str]
    sums: dict = field(default_factory=dict)
    avgs: dict = field(default_factory=dict)
    mins: dict = field(default_factory=dict)
    maxs: dict = field(default_factory=dict)
    count_col: str = "n_rows"


def _ivm_app_id(source: SnaplogTable) -> str:
    return f"ivm:{os.path.abspath(source.path)}"


def _nn(out: str) -> str:
    return f"{out}__nn"


def _hsum(out: str) -> str:
    return f"{out}__sum"


def sum_view_offset(view: SnaplogTable, source: SnaplogTable) -> Optional[int]:
    """Source version the view has applied (None before first refresh) —
    read from the txn markers in the view's own log."""
    if not view.exists():
        return None
    return view.last_txn_version(_ivm_app_id(source))


view_offset = sum_view_offset  # generalized alias


def _validate(keys, sums, avgs, mins, maxs, count_col):
    keys = list(keys)
    outs = [*sums, *avgs, *mins, *maxs]
    if not outs:
        raise ValueError("refresh_view needs at least one aggregate measure")
    if len(set(outs)) != len(outs):
        dupes = sorted({o for o in outs if outs.count(o) > 1})
        raise ValueError(f"duplicate output column(s) across aggregates: {dupes}")
    reserved = set(keys) | {count_col}
    hidden = {_nn(o) for o in outs} | {_hsum(o) for o in avgs}
    bad = sorted(o for o in outs if o in reserved or o in hidden)
    if bad or count_col in keys:
        raise ValueError(f"measure column(s) collide with keys/count: {bad}")
    return keys


def refresh_sum_view(
    view: SnaplogTable,
    source: SnaplogTable,
    *,
    keys: Sequence[str],
    sums: dict,
    count_col: str = "n_rows",
) -> RefreshStats:
    """SUM/COUNT-only facade over :func:`refresh_view` (the original
    surface; kept because sums alone never trigger a base rescan)."""
    if not sums:
        raise ValueError("refresh_sum_view needs at least one sum measure")
    return refresh_view(view, source, keys=keys, sums=sums, count_col=count_col)


def refresh_view(
    view: SnaplogTable,
    source: SnaplogTable,
    *,
    keys: Sequence[str],
    sums: Optional[dict] = None,
    avgs: Optional[dict] = None,
    mins: Optional[dict] = None,
    maxs: Optional[dict] = None,
    count_col: str = "n_rows",
) -> RefreshStats:
    """Bring ``view`` = ``SELECT keys, SUM(..)/AVG(..)/MIN(..)/MAX(..),
    COUNT(*) FROM source GROUP BY keys`` up to date with the source
    head, reading ONLY the change feed since the last refresh (plus, for
    MIN/MAX only, a base re-aggregation pruned to the groups whose
    extremum a delete may have removed).

    Each aggregate dict maps output column -> source column (``{"rev":
    "price"}``); ``count_col`` receives COUNT(*). SQL semantics
    throughout: aggregates ignore NULL measures and are NULL for a group
    with none, COUNT(*) counts every row, NULL group keys form their own
    group. The view table carries one hidden ``<out>__nn`` column per
    measure and ``<out>__sum`` per AVG (see module docstring).
    """
    sums, avgs, mins, maxs = sums or {}, avgs or {}, mins or {}, maxs or {}
    keys = _validate(keys, sums, avgs, mins, maxs, count_col)
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
    return _apply_window(
        view, source, changes, head, offset,
        keys=keys, sums=sums, avgs=avgs, mins=mins, maxs=maxs,
        count_col=count_col,
    )


def refresh_views(source: SnaplogTable, specs: Sequence[ViewSpec]) -> list[RefreshStats]:
    """Maintain several views of one source from a SINGLE change-feed
    read: the union window (oldest offset .. head) is scanned once and
    checkpointed; each view filters it to its own ``_commit_version``
    range and commits its own txn offset. A view being initialized (no
    offset yet) widens the window to the full history, so change_feed
    must have been on since table creation for that view."""
    if not specs:
        return []
    offsets = [sum_view_offset(s.view, source) for s in specs]
    for s, off in zip(specs, offsets):
        if off is None and s.view.exists():
            raise ValueError(
                f"view {s.view.path} exists but carries no "
                f"'{_ivm_app_id(source)}' txn marker"
            )
        _validate(s.keys, s.sums, s.avgs, s.mins, s.maxs, s.count_col)
    start = None if any(o is None for o in offsets) else min(offsets)
    changes, head = source.changes_since(start)
    if all(o is not None and head <= o for o in offsets):
        return [RefreshStats(o, o, 0, "no-op") for o in offsets]
    # the ONE _change_data scan — everything downstream reads the
    # checkpointed window, not the feed (lazy: the first view's stats
    # action materializes it, saving a dedicated checkpoint job)
    changes = changes.localCheckpoint(eager=False)
    out = []
    for s, off in zip(specs, offsets):
        if off is not None and head <= off:
            out.append(RefreshStats(off, off, 0, "no-op"))
            continue
        win = (
            changes.filter(F.col("_commit_version") > F.lit(off))
            if off is not None and (start is None or off > start)
            else changes
        )
        out.append(
            _apply_window(
                s.view, source, win, head, off,
                keys=list(s.keys), sums=dict(s.sums), avgs=dict(s.avgs),
                mins=dict(s.mins), maxs=dict(s.maxs), count_col=s.count_col,
            )
        )
    return out


def _apply_window(
    view: SnaplogTable,
    source: SnaplogTable,
    changes: DataFrame,
    head: int,
    offset: Optional[int],
    *,
    keys: list,
    sums: dict,
    avgs: dict,
    mins: dict,
    maxs: dict,
    count_col: str,
) -> RefreshStats:
    """Apply one change window to one view (shared by refresh_view and
    refresh_views — ``changes`` is already restricted to (offset, head])."""
    sign = (
        F.when(F.col(CHANGE_TYPE_COL).isin(*_PLUS), F.lit(1))
        .when(F.col(CHANGE_TYPE_COL).isin(*_MINUS), F.lit(-1))
        .otherwise(F.lit(0))
    )
    summed = {**sums, **{out: src for out, src in avgs.items()}}

    def _agg_exprs():
        # signed delta per group: raw sums (coalesced to 0 so the algebra
        # is total), non-null contribution counts, window extrema of the
        # inserted (+) and deleted (-) values, row count
        exprs = []
        for out, src in summed.items():
            exprs.append(
                F.coalesce(F.sum(sign * F.col(src)), F.lit(0)).alias(f"_d_{out}")
            )
        for out, src in {**summed, **mins, **maxs}.items():
            exprs.append(
                F.coalesce(
                    F.sum(sign * F.col(src).isNotNull().cast("int")), F.lit(0)
                ).alias(f"_dnn_{out}")
            )
        for out, src in mins.items():
            exprs.append(F.min(F.when(sign == 1, F.col(src))).alias(f"_ins_{out}"))
            exprs.append(F.min(F.when(sign == -1, F.col(src))).alias(f"_del_{out}"))
        for out, src in maxs.items():
            exprs.append(F.max(F.when(sign == 1, F.col(src))).alias(f"_ins_{out}"))
            exprs.append(F.max(F.when(sign == -1, F.col(src))).alias(f"_del_{out}"))
        exprs.append(F.coalesce(F.sum(sign), F.lit(0)).alias(f"_d_{count_col}"))
        return exprs

    delta = changes.groupBy(*[F.col(k) for k in keys]).agg(*_agg_exprs())

    initial = offset is None and not view.exists()
    value_cols = [
        *summed, *map(_hsum, avgs),
        *mins, *maxs,
        *map(_nn, [*summed, *mins, *maxs]),
        count_col,
    ]
    if initial:
        # empty current state: same combine path, nothing to join
        joined = delta.select(
            "*",
            *[F.lit(None).alias(f"_v_{c}") for c in value_cols],
            F.lit(False).alias("_in_view"),
        )
    else:
        # combine with the CURRENT view values for the affected groups
        # only: the join's left side is the delta (bounded by changed
        # rows); at scale, broadcast the delta against the larger view
        cur = view.read().select(
            *[F.col(k).alias(f"_v_{k}") for k in keys],
            *[F.col(c).alias(f"_v_{c}") for c in value_cols],
            F.lit(True).alias("_in_view"),
        )
        cond = [delta[k].eqNullSafe(cur[f"_v_{k}"]) for k in keys]
        joined = delta.join(cur, cond, "left_outer").drop(
            *[f"_v_{k}" for k in keys]
        )

    def finalize(raw, nn):
        # exposed aggregate: NULL iff zero non-null contributions remain
        return F.when(nn == 0, F.lit(None)).otherwise(raw)

    new_nn = {
        out: F.coalesce(F.col(f"_v_{_nn(out)}"), F.lit(0)) + F.col(f"_dnn_{out}")
        for out in [*summed, *mins, *maxs]
    }
    cols = [*[F.col(k) for k in keys]]
    for out in sums:
        cols.append(
            finalize(
                F.coalesce(F.col(f"_v_{out}"), F.lit(0)) + F.col(f"_d_{out}"),
                new_nn[out],
            ).alias(out)
        )
    for out in avgs:
        new_sum = F.coalesce(F.col(f"_v_{_hsum(out)}"), F.lit(0)) + F.col(f"_d_{out}")
        cols.append(
            finalize(new_sum.cast("double") / new_nn[out], new_nn[out]).alias(out)
        )
        cols.append(new_sum.alias(_hsum(out)))
    dirty = F.lit(False)
    for out, ext, cmp_hit in (
        *[(o, F.least, "<=") for o in mins],
        *[(o, F.greatest, ">=") for o in maxs],
    ):
        cand = ext(F.col(f"_v_{out}"), F.col(f"_ins_{out}"))  # NULLs ignored
        hit = (
            F.col(f"_del_{out}") <= cand
            if cmp_hit == "<="
            else F.col(f"_del_{out}") >= cand
        )
        dirty = dirty | (F.col(f"_del_{out}").isNotNull() & F.coalesce(hit, F.lit(True)))
        cols.append(finalize(cand, new_nn[out]).alias(out))
    for out in [*summed, *mins, *maxs]:
        cols.append(new_nn[out].alias(_nn(out)))
    cols.append(
        (
            F.coalesce(F.col(f"_v_{count_col}"), F.lit(0)) + F.col(f"_d_{count_col}")
        ).alias(count_col)
    )
    cols.append(F.coalesce(F.col("_in_view"), F.lit(False)).alias("_in_view"))
    cols.append(dirty.alias("_dirty"))
    combined = joined.select(*cols)

    # lazy checkpoint: the plan (CDC scan + signed-delta groupBy + view
    # join) is consumed several times — the fused count below, the dirty
    # overlay, and the merge's own staging — and would otherwise
    # re-execute each time; eager=False lets the count job double as the
    # materialization pass instead of paying a separate checkpoint job
    merge_src = (
        combined.filter((F.col(count_col) > 0) | F.col("_in_view"))
        .drop("_in_view")
        .localCheckpoint(eager=False)
    )
    # one aggregate action yields the applied-group count, the
    # surviving-dirty-group count (a delete may have taken an extremum)
    # AND the dirty keys themselves — both bounded by changed groups, so
    # collecting them here is no more driver state than the broadcast
    # they feed, and it saves the separate dirty-keys scan + broadcast
    # materialization jobs the rescan used to launch (guide §1.4)
    is_dirty = F.col("_dirty") & (F.col(count_col) > 0)
    stats = merge_src.select(
        F.count(F.lit(1)).alias("_n"),
        F.count(F.when(is_dirty, F.lit(1))).alias("_ndirty"),
        F.collect_list(
            F.when(is_dirty, F.struct(*[F.col(k) for k in keys]))
        ).alias("_dkeys"),
    ).first()
    n = stats["_n"]
    rescanned = 0
    if mins or maxs:
        # re-aggregate ONLY the dirty groups from the base head (pruned
        # semi-join; the broadcast side is bounded by changed groups)
        rescanned = stats["_ndirty"]
        if rescanned:
            from dc43_spark.localdf import local_df

            key_fields = [merge_src.schema[k] for k in keys]
            dirty_keys = local_df(
                merge_src.sparkSession,
                [tuple(r[k] for k in keys) for r in stats["_dkeys"]],
                T.StructType(key_fields),
                coalesce=1,
            )
            base = source.read(version_as_of=head)
            on = [base[k].eqNullSafe(dirty_keys[k]) for k in keys]
            re_agg = (
                base.join(F.broadcast(dirty_keys), on, "left_semi")
                .groupBy(*[F.col(k) for k in keys])
                .agg(
                    *[F.min(src).alias(f"_re_{out}") for out, src in mins.items()],
                    *[F.max(src).alias(f"_re_{out}") for out, src in maxs.items()],
                    *[
                        F.count(src).alias(f"_renn_{out}")
                        for out, src in {**mins, **maxs}.items()
                    ],
                )
            )
            mk = merge_src
            on2 = [mk[k].eqNullSafe(re_agg[k]) for k in keys]
            overlay = []
            for c in mk.columns:
                base_col = mk[c]
                stem = c[: -len("__nn")] if c.endswith("__nn") else None
                if c in mins or c in maxs:
                    overlay.append(
                        F.when(mk["_dirty"], re_agg[f"_re_{c}"]).otherwise(base_col).alias(c)
                    )
                elif stem in mins or stem in maxs:
                    overlay.append(
                        F.coalesce(
                            F.when(mk["_dirty"], re_agg[f"_renn_{stem}"]), base_col
                        ).alias(c)
                    )
                else:
                    overlay.append(base_col.alias(c))
            merge_src = (
                mk.join(F.broadcast(re_agg), on2, "left_outer")
                .select(*overlay)
                .localCheckpoint(eager=False)
            )
    merge_src = merge_src.drop("_dirty")

    txn = {"app_id": _ivm_app_id(source), "version": head}
    if initial:
        view.write(
            merge_src.filter(F.col(count_col) > 0), mode="overwrite", txn=txn
        )
        return RefreshStats(None, head, n, "initial", rescanned)
    if n == 0:
        # nothing to apply (e.g. only transient groups) — still advance
        # the offset atomically via an empty append commit
        view.write(view.read().limit(0), mode="append", txn=txn)
        return RefreshStats(offset, head, 0, "incremental", rescanned)
    view.merge(
        merge_src,
        keys,
        delete_predicate=f"s.{count_col} = 0",
        txn=txn,
    )
    return RefreshStats(offset, head, n, "incremental", rescanned)


def view_select(
    view: SnaplogTable,
    *,
    sums: Sequence[str] = (),
    avgs: Sequence[str] = (),
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
    count_col: str = "n_rows",
) -> DataFrame:
    """The user-facing projection of the view (hides the ``__nn`` /
    ``__sum`` bookkeeping columns)."""
    hidden = [_nn(c) for c in [*sums, *avgs, *mins, *maxs]]
    hidden += [_hsum(c) for c in avgs]
    return view.read().drop(*hidden)


def sum_view_select(view: SnaplogTable, sums: Sequence[str], count_col: str = "n_rows"):
    """Original SUM-only facade over :func:`view_select`."""
    return view_select(view, sums=sums, count_col=count_col)
