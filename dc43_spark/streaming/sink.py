"""Exactly-once streaming sink into a snaplog table.

Structured Streaming's file sink is append-only parquet with its own
_spark_metadata log that nothing else understands; Delta's streaming sink
gets exactly-once by recording (txnAppId, txnVersion) per commit. This is
that second design on the in-repo table format: every micro-batch lands
through ``SnaplogTable.write_txn`` with the batch_id as the transaction
version, so the batch's data files AND its idempotence marker commit in
ONE manifest.

Exactly-once argument under foreachBatch's at-least-once replays: a crash
AFTER the commit replays the batch, ``write_txn`` sees the marker and
skips (staged replay files stay invisible until vacuum); a crash BEFORE
the commit leaves no visible rows, and the replay commits normally. There
is no window where data is visible without its marker — they are the same
JSON write.

Readers get transactional snapshots for free: a batch is either fully
visible or absent, and ``versionAsOf`` time travel works on a LIVE
streaming table (each micro-batch is one table version).

Beyond the reference: its streaming sink (dc43-integrations
spark/io.py streaming branch) delegates exactly-once to Delta when
present and degrades to at-least-once parquet otherwise; here the
transactional sink works in any plain-filesystem deployment.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame


def snaplog_sink(
    df: DataFrame,
    table_path: str,
    checkpoint_path: str,
    *,
    app_id: Optional[str] = None,
    trigger_once: bool = False,
):
    """Start a streaming write of ``df`` into the snaplog table at
    ``table_path``. ``app_id`` defaults to a checkpoint-derived identity
    so a RESTARTED query (same checkpoint) keeps its transaction ledger
    while a different pipeline writing the same table gets its own.

    Returns the started StreamingQuery."""
    from dc43_spark.io.snaplog import SnaplogTable

    ident = app_id or f"snaplog-sink:{os.path.abspath(checkpoint_path)}"

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        table = SnaplogTable(batch_df.sparkSession, table_path)
        table.write_txn(batch_df, app_id=ident, version=int(batch_id))

    writer = (
        df.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
