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
    merge_schema: bool = False,
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
        # merge_schema: an upstream feed that GAINS columns keeps landing
        # (Delta's mergeSchema on the streaming sink); off by default so
        # accidental drift still fails loudly
        table.write_txn(
            batch_df, app_id=ident, version=int(batch_id), merge_schema=merge_schema
        )

    writer = (
        df.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def snaplog_upsert_sink(
    df: DataFrame,
    table_path: str,
    checkpoint_path: str,
    *,
    keys,
    app_id: Optional[str] = None,
    order_col: Optional[str] = None,
    delete_predicate: Optional[str] = None,
    trigger_once: bool = False,
    merge_schema: bool = False,
):
    """Streaming UPSERT into a snaplog table: each micro-batch MERGEs on
    ``keys`` with the batch_id riding as the transaction marker, so a
    replayed batch skips instead of re-applying (foreachBatch is
    at-least-once; the marker commits atomically with the merge's
    manifest). This is the CDC-apply recipe — Delta's
    foreachBatch-MERGE pattern — on the in-repo format.

    ``order_col``: when one batch carries SEVERAL rows per key (a busy
    CDC feed), keep only the row with the highest ``order_col`` per key
    (ties: deterministic — the lexicographically largest remaining row
    wins, ordered over the struct of the non-key non-order columns, so
    a replay or re-planned batch picks the SAME survivor). Without
    it, duplicate source keys are a hard error (SQL MERGE ambiguity —
    the same refusal the batch merge makes).

    ``delete_predicate``: SQL over the source alias ``s`` marking
    delete rows — pass ``"s.op = 'D'"`` to apply a soft-delete CDC
    feed. Matched delete rows DELETE; unmatched ones are SKIPPED (the
    merge's ``insert_predicate`` gates them out), so a feed's delete
    markers never materialize as data — all in the one atomic merge
    commit the txn marker rides on.

    Exactly-once argument: batches of ONE streaming query are serial
    (the checkpoint serializes them), so the check-marker-then-merge
    window has no same-app racer; a crash after the merge's commit
    replays into the marker check and skips; a crash before it left
    nothing visible."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dc43_spark.io.snaplog import SnaplogTable

    ident = app_id or f"snaplog-upsert:{os.path.abspath(checkpoint_path)}"
    key_list = list(keys)

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        table = SnaplogTable(batch_df.sparkSession, table_path)
        last = table.last_txn_version(ident)
        if last is not None and int(batch_id) <= last:
            return  # replayed batch: already committed atomically
        if order_col is not None:
            # key columns are CONSTANT within the window partition, so
            # they cannot break ties — order over the remaining payload
            # columns so rows tying on order_col pick the same survivor
            # across retries and re-planned batches
            rest = [c for c in batch_df.columns
                    if c not in key_list and c != order_col]
            tiebreak = (
                [F.struct(*[F.col(c) for c in rest]).desc()] if rest else []
            )
            w = Window.partitionBy(*key_list).orderBy(
                F.col(order_col).desc(), *tiebreak
            )
            batch_df = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        table.merge(
            batch_df,
            key_list,
            txn={"app_id": ident, "version": int(batch_id)},
            merge_schema=merge_schema,
            delete_predicate=delete_predicate,
            insert_predicate=(
                f"NOT ({delete_predicate})" if delete_predicate else None
            ),
        )

    writer = (
        df.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def delta_sink(
    df: DataFrame,
    table_path: str,
    checkpoint_path: str,
    *,
    app_id: Optional[str] = None,
    trigger_once: bool = False,
):
    """Streaming append into a JAR-LESS Delta table: each micro-batch
    lands through ``delta_write`` with the batch_id riding as Delta's
    transaction identifier (txn action), so a replayed batch skips
    instead of re-appending — the exactly-once recipe delta-spark's
    ``txnAppId``/``txnVersion`` options implement, on the protocol
    writer. Every Nth commit also writes a parquet checkpoint, so a
    long-lived streaming table keeps O(checkpoint + tail) replay for
    any Delta reader.

    Returns the started StreamingQuery."""
    from dc43_spark.io.delta_log import delta_write

    ident = app_id or f"delta-sink:{os.path.abspath(checkpoint_path)}"

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta_write(
            batch_df.sparkSession, batch_df, table_path,
            mode="append", txn={"appId": ident, "version": int(batch_id)},
        )

    writer = (
        df.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
