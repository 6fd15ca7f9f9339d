"""Streaming deduplication with bounded state.

Batch dedup (``functions/dedup.py``) sees the whole dataset; a stream
cannot, so exact dedup state would grow forever. The watermark bounds it:
``dedup_stream`` keeps each key's state only until the event-time
watermark passes ``delay``, after which a late duplicate is (by the
watermark contract) droppable anyway.

This wraps ``dropDuplicatesWithinWatermark`` — the Spark 3.5+ operator
that, unlike plain streaming ``dropDuplicates``, does not require the
event-time column itself to be part of the key and expires state on the
watermark alone. Duplicates whose event times differ (retries with fresh
timestamps, at-least-once replays) still dedup as long as they arrive
within ``delay`` of each other.

Scale: state is one row per distinct key within the watermark horizon —
shuffle is on the dedup key; the horizon, not the stream length, bounds
memory.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    *,
    keys: Sequence[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """First occurrence per ``keys`` within the watermark horizon.

    ``df`` must be a streaming DataFrame; ``ts_col`` is the event-time
    column the watermark rides on."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))


def dedup_stream_against_index(
    df: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    append_survivors: bool = True,
    trigger_once: bool = False,
):
    """Continuous-crawl NEAR-dup dedup: filter every micro-batch against
    the persisted LSH index (``functions/dedup_index.py``) and append the
    survivors to ``output_path``; with ``append_survivors`` each batch
    also extends the index, so batch N+1 dedups against batch N's
    accepted docs as well as the original corpus.

    Composition contract: exact/key dedup belongs in front of this
    (``dedup_stream`` for replays within a watermark horizon); this
    operator is the content-similarity stage. Intra-batch near-dups are
    not resolved here — run ``minhash_near_duplicates`` on the batch
    inside a custom foreachBatch if crawl batches self-duplicate.

    State story at scale: the stream holds NO similarity state — the
    index on storage IS the state, so restarts recover it for free and
    its size is bounded by the accepted corpus, not the stream length.
    Each micro-batch costs two broadcast probes of the batch against the
    index relations (zero index-side shuffle).

    Failure ordering (foreachBatch replays at-least-once): survivors are
    written to ``output_path`` BEFORE the index append. A crash between
    the two replays the batch with the index unchanged, so the docs are
    accepted again — duplicate output rows, never lost documents (the
    reverse order would re-probe against the batch's own appended copies
    and silently drop it from the output forever). Duplicate index rows
    from an append-side replay only cost probe work: candidates are
    DISTINCT'd. Exactly-once output needs a transactional sink (Delta
    MERGE via io/merge.py) in place of the parquet append.

    Returns the started StreamingQuery.
    """
    from dc43_spark.functions.dedup_index import dedup_batch_against_index, minhash_index_append

    def _probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        kept = dedup_batch_against_index(
            batch_df.sparkSession,
            index_path,
            batch_df,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
            append_survivors=False,
        ).localCheckpoint(eager=True)
        kept.write.mode("append").parquet(output_path)
        if append_survivors:
            minhash_index_append(
                batch_df.sparkSession, index_path, kept,
                text_col=text_col, id_col=id_col,
            )

    writer = (
        df.writeStream.foreachBatch(_probe_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream_against_embedding_index(
    df: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    multi_probe: int = 1,
    append_survivors: bool = True,
    trigger_once: bool = False,
):
    """Semantic twin of ``dedup_stream_against_index`` over the persisted
    EMBEDDING index (``functions/embedding_index.py``): each micro-batch
    keeps only vectors that do not near-duplicate the indexed corpus.

    Same failure ordering as the text side: output parquet append FIRST,
    index append after — an at-least-once replay between the two accepts
    the batch again (duplicate output rows, never lost vectors), while
    the reverse order would re-probe a replayed batch against its own
    appended copies and silently drop it forever.
    """
    from dc43_spark.functions.embedding_index import (
        dedup_batch_against_embedding_index,
        embedding_index_append,
    )

    def _probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        kept = dedup_batch_against_embedding_index(
            batch_df.sparkSession,
            index_path,
            batch_df,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            multi_probe=multi_probe,
            append_survivors=False,
        ).localCheckpoint(eager=True)
        kept.write.mode("append").parquet(output_path)
        if append_survivors:
            embedding_index_append(
                batch_df.sparkSession, index_path, kept,
                id_col=id_col, vec_col=vec_col,
            )

    writer = (
        df.writeStream.foreachBatch(_probe_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
