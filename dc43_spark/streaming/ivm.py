"""Continuous materialized-view maintenance: the snaplog commit stream
drives ``refresh_views``, so views follow their source within one
trigger interval — exactly-once with a DISPOSABLE checkpoint.

The stream is a COMMIT SIGNAL only. Each micro-batch fires
``refresh_views(source, specs)`` (io/ivm.py), which reads its own
bounded change window via ``changes_since`` and advances every view's
consumer offset ATOMICALLY inside that view's own commit. The
foreachBatch body never touches the batch DataFrame, so the source's
row data is never materialized through the stream — a micro-batch
costs offset planning, nothing else. Consequences:

- Exactly-once does NOT depend on the streaming checkpoint: a deleted
  checkpoint, a replayed batch, or a concurrent manual refresh all
  re-fire ``refresh_views``, which sees the view offsets already at
  head and no-ops. The checkpoint only saves re-signaling work.
- Maintenance commits on the SOURCE (compaction, Z-order,
  materialize_deletes) can't kill the loop: the signal stream runs
  with ``ignoreChanges`` (it would only matter if rows were read), and
  ``changes_since`` skips data_change=false commits anyway.
- N views are maintained from ONE ``_change_data`` scan per firing
  (refresh_views' union-window read), not one per view.

At 100 TB this is the stream-native shape for serving layers: the
per-firing cost is O(rows changed since the last firing), independent
of view or source size.
"""

from __future__ import annotations

import threading
from typing import Optional, Sequence

from pyspark.sql import SparkSession

from dc43_spark.io.ivm import RefreshStats, ViewSpec, refresh_views
from dc43_spark.io.snaplog import SnaplogTable


def maintain_views_stream(
    spark: SparkSession,
    source: SnaplogTable,
    specs: Sequence[ViewSpec],
    *,
    checkpoint_dir: str,
    trigger: Optional[dict] = None,
    query_name: str = "snaplog-ivm",
    on_refresh=None,
):
    """Start a streaming query that keeps ``specs``' views up to date
    with ``source``. Returns the StreamingQuery.

    ``trigger`` is passed to ``DataStreamWriter.trigger`` (default
    ``{"availableNow": True}``: catch up through the current head, then
    stop — rerun with the same checkpoint for the next increment; use
    ``{"processingTime": "..."}`` for continuous maintenance).
    ``on_refresh`` (optional) receives the ``list[RefreshStats]`` of
    each firing — observability hook, exactness never depends on it.

    An initial synchronous refresh runs BEFORE the stream starts:
    availableNow with an up-to-date checkpoint plans zero batches, and
    views must still converge to head on every call."""
    from dc43_spark.io.snaplog_source import SnaplogDataSource

    spark.dataSource.register(SnaplogDataSource)
    stats = refresh_views(source, specs)
    if on_refresh is not None:
        on_refresh(stats)

    def _on_batch(batch_df, batch_id):  # noqa: ARG001 — signal only
        out = refresh_views(source, specs)
        if on_refresh is not None:
            on_refresh(out)

    return (
        spark.readStream.format("snaplog")
        .option("ignoreChanges", "true")  # rewrites are irrelevant to a signal
        .load(source.path)
        .writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_on_batch)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


class ViewMaintainer:
    """Poll-driven twin of :func:`maintain_views_stream` for hosts
    without a streaming runtime (cron, Airflow, a maintenance thread):
    ``tick()`` refreshes once; ``run_until_idle`` ticks until a firing
    applies zero rows (the op-soup convergence loop in tests). Safe to
    run CONCURRENTLY with the streaming twin — offsets make every
    refresh idempotent."""

    def __init__(self, source: SnaplogTable, specs: Sequence[ViewSpec]) -> None:
        self.source = source
        self.specs = list(specs)
        self._lock = threading.Lock()

    def tick(self) -> list[RefreshStats]:
        with self._lock:
            return refresh_views(self.source, self.specs)

    def run_until_idle(self, max_ticks: int = 100) -> int:
        """Tick until every view reports no-op; returns ticks spent (>=1)."""
        for i in range(1, max_ticks + 1):
            stats = self.tick()
            if all(s.strategy == "no-op" for s in stats):
                return i
        raise RuntimeError(f"views did not converge in {max_ticks} ticks")
