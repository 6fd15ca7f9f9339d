"""Streaming corpus curation: the batch curation pipeline as a
continuous-ingest loop.

Composes the existing stages per micro-batch — quality filter
(``curation.corpus_filter``) then near-dup probe against the persisted
LSH index (``dedup_index``) — writing accepted documents, extending the
index with them, and appending a per-batch observability report (the
streaming twin of ``filter_report_documents``).

Beyond the reference engine (no streaming curation exists there); the
state story matches ``streaming/dedup.py``: the stream holds NO
similarity state — the index on storage is the state, so restarts
recover it for free, and each batch costs one narrow filter pass plus
two broadcast probes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from dc43_spark.localdf import local_df

#: report rows: (batch_id, reason, n_docs) — reasons are the corpus
#: filter's individual drop reasons plus 'near_dup' and 'kept'
REPORT_SCHEMA = "batch_id long, reason string, n_docs long"


def curate_stream(
    df: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_path: str,
    *,
    report_path: Optional[str] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    append_survivors: bool = True,
    intra_batch_dedup: bool = False,
    trigger_once: bool = False,
    filter_kwargs: Optional[dict] = None,
):
    """Filter + near-dup-dedup every micro-batch of a document stream.

    Per batch: ``corpus_filter`` keeps quality documents (one narrow
    pass, text carried through via ``passthrough``), the keepers probe
    the persisted minhash index (broadcast probes, zero index-side
    shuffle), survivors are written to ``output_path`` and appended to
    the index so batch N+1 dedups against batch N's accepts. With
    ``report_path``, a (batch_id, reason, n_docs) histogram — filter
    drop reasons, ``near_dup``, ``kept`` — is appended per batch, giving
    operators the live twin of the batch ``filter_report`` gate.

    ``intra_batch_dedup=True`` additionally resolves near-dups WITHIN the
    micro-batch before probing the index (LSH mining + min-id canonical
    per cluster): a crawl batch that scraped the same page twice then
    contributes one accepted copy instead of racing both into the index.
    Off by default — batches from an upstream exact-dedup stage don't pay
    the extra mining pass.

    Failure ordering under at-least-once foreachBatch replays follows
    ``dedup_stream_against_index``: output append FIRST, index append
    after — a crash between the two replays the batch against an
    unchanged index and re-accepts it (duplicate output rows, never lost
    documents). The report is appended last; a replayed batch may repeat
    report rows, so consumers must de-duplicate per (batch_id, reason) —
    ``max(n_docs)``/``any_value(n_docs)`` grouped on those keys — NOT sum,
    which would double-count replayed batches.

    Returns the started StreamingQuery."""
    from dc43_spark.functions.curation import corpus_filter
    from dc43_spark.functions.dedup_index import (
        dedup_batch_against_index,
        minhash_index_append,
    )

    kwargs = dict(filter_kwargs or {})
    kwargs["passthrough"] = (text_col,)

    def _curate_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        flt = corpus_filter(batch_df, text_col=text_col, id_col=id_col, **kwargs)
        # one materialisation serves the keep slice AND the reason counts
        flt = flt.select(id_col, text_col, "keep", "drop_reasons").localCheckpoint(
            eager=True
        )
        kept_docs = flt.filter("keep").select(id_col, text_col)
        n_intra_dropped = 0
        if intra_batch_dedup:
            from dc43_spark.functions.dedup import (
                dedup_clusters,
                minhash_near_duplicates,
            )

            pairs = minhash_near_duplicates(
                kept_docs, text_col=text_col, id_col=id_col, threshold=threshold
            )
            clustered = dedup_clusters(kept_docs, pairs, id_col=id_col)
            canonical = clustered.filter(
                F.col(id_col) == F.col("cluster_id")
            ).select(id_col, text_col).localCheckpoint(eager=True)
            if report_path is not None:
                n_before_intra = kept_docs.count()
                n_intra_dropped = n_before_intra - canonical.count()
            kept_docs = canonical
        survivors = dedup_batch_against_index(
            spark,
            index_path,
            kept_docs,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
            append_survivors=False,
        ).localCheckpoint(eager=True)
        survivors.write.mode("append").parquet(output_path)
        if append_survivors:
            minhash_index_append(
                spark, index_path, survivors, text_col=text_col, id_col=id_col
            )
        if report_path is not None:
            n_kept_docs = kept_docs.count()
            n_survivors = survivors.count()
            reasons = (
                flt.filter(~F.col("keep"))
                .select(F.explode(F.split("drop_reasons", ",")).alias("reason"))
                .groupBy("reason")
                .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
                .select(F.lit(batch_id).cast("long").alias("batch_id"), "reason", "n_docs")
            )
            extra = local_df(
                spark,
                [
                    (batch_id, "intra_batch_dup", n_intra_dropped),
                    (batch_id, "near_dup", n_kept_docs - n_survivors),
                    (batch_id, "kept", n_survivors),
                ],
                REPORT_SCHEMA,
                coalesce=1,
            )
            reasons.unionByName(extra).coalesce(1).write.mode("append").parquet(
                report_path
            )

    writer = (
        df.writeStream.foreachBatch(_curate_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
