"""Drain a rate-limited streaming backlog with repeated availableNow runs.

Why this exists: delta-spark's ``Trigger.AvailableNow`` honors
``maxFilesPerTrigger`` across MULTIPLE micro-batches inside one run; the
PySpark Python DataSource API exposes no admission-control hook, so an
availableNow run over a rate-limited jar-less source (io/delta_source.py,
io/snaplog_source.py) captures ONE capped target and terminates. Real
100 TB backfills are drained with exactly "availableNow + cap" — this
helper closes that workflow gap by looping capped availableNow runs
against the SAME checkpoint until a run admits nothing new.

Exactly-once needs no machinery here: each loop iteration is an ordinary
stream restart, so the engine replans the offset log's last batch through
``partitions()`` and then asks for the next capped offset — the
checkpoint IS the ledger. A crash between runs (or mid-run) resumes at
the same place; no duplicates, no loss (pinned by
tests/test_delta_source.py::test_drain_rate_limited_backlog).
"""

from __future__ import annotations

from typing import Callable, Optional


def _progress_rows(p) -> int:
    # recentProgress entries are dicts in some PySpark versions and
    # StreamingQueryProgress objects in others
    if isinstance(p, dict):
        return int(p.get("numInputRows") or 0)
    return int(getattr(p, "numInputRows", 0) or 0)


def _progress_moved(p) -> bool:
    """Did this batch ADVANCE any source offset? Termination keys on
    this, not on row counts: a rate-limited batch can legitimately
    admit a zero-row commit mid-backlog (a delete-only commit under
    ignoreDeletes, a commit dropped by skipChangeCommits, zero-row
    data files) — its offset moves while numInputRows stays 0, and
    stopping there would strand the rest of the backlog (ADVICE r13)."""
    if isinstance(p, dict):
        sources = p.get("sources") or []
        return any(
            str(s.get("startOffset")) != str(s.get("endOffset"))
            for s in sources
        )
    sources = getattr(p, "sources", None) or []
    return any(
        str(getattr(s, "startOffset", None))
        != str(getattr(s, "endOffset", None))
        for s in sources
    )


def drain(
    start_run: Callable,
    *,
    max_runs: int = 100,
    run_timeout_sec: Optional[float] = None,
) -> dict:
    """Loop ``start_run()`` — a zero-arg callable that STARTS a
    ``Trigger.AvailableNow`` StreamingQuery on a fixed checkpoint — until
    a run's source offsets stop ADVANCING, i.e. the rate-limited source
    reports caught-up. (Not until a zero-ROW run: a capped batch can
    legitimately admit a zero-row commit mid-backlog — skipChangeCommits,
    delete-only commits under ignoreDeletes — whose offset moves with no
    input rows; stopping there would strand the rest of the backlog.)
    Returns ``{"runs": N, "rows": total}`` where ``runs`` counts started
    queries (including the final no-advance verification run) and
    ``rows`` sums every batch's ``numInputRows``.

    ``max_runs`` is the trigger budget: exceeding it raises
    ``RuntimeError`` (the backlog outgrew the budget — raise the cap or
    the budget). ``run_timeout_sec`` bounds each individual run; a run
    that exceeds it is stopped and ``TimeoutError`` raised.

    The callable must apply the SAME checkpointLocation every time —
    that is what makes the loop exactly-once — and should carry the rate
    limit (``maxFilesPerTrigger`` / ``maxBytesPerTrigger``) so each run
    stays bounded::

        from dc43_spark.streaming.drain import drain

        stats = drain(lambda: (
            spark.readStream.format("deltalog")
            .option("maxFilesPerTrigger", 1000).load(table)
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        ))
    """
    if max_runs < 1:
        raise ValueError("max_runs must be at least 1")
    total = 0
    for runs in range(1, max_runs + 1):
        q = start_run()
        if run_timeout_sec is not None:
            if not q.awaitTermination(run_timeout_sec):
                q.stop()
                raise TimeoutError(
                    f"drain run {runs} exceeded {run_timeout_sec}s"
                )
        else:
            q.awaitTermination()
        exc = q.exception()
        if exc:
            raise exc
        progress = q.recentProgress or []
        rows = sum(_progress_rows(p) for p in progress)
        total += rows
        # caught-up = this run's offsets did NOT advance (no batch ran,
        # or every batch's endOffset equals its startOffset). Zero rows
        # alone is NOT caught-up: a capped batch can admit a zero-row
        # commit mid-backlog (skipChangeCommits, delete-only under
        # ignoreDeletes) whose offset moves with no input rows.
        if not any(_progress_moved(p) for p in progress):
            return {"runs": runs, "rows": total}
    raise RuntimeError(
        f"backlog not drained within max_runs={max_runs} "
        f"({total} rows so far); raise the rate limit or the budget"
    )
