"""Keep persisted near-dup indexes in sync with a snaplog corpus table,
reading ONLY the table's change feed.

Two indexes share the machinery: the MinHash/LSH text index
(functions/dedup_index.py) and the hyperplane-bucketed embedding index
(functions/embedding_index.py). Both are the accepted-corpus state a
continuous-ingest pipeline probes batch after batch; when the corpus
lives in a snaplog table, every accepted write is a commit — so index
maintenance becomes a CDC consumer: pull ``changes_since(offset)``,
append the net-new entries, tombstone the net-deleted ids, advance the
offset. Cost per sync is O(docs changed), never O(corpus).

Contract: corpus rows are IMMUTABLE (the universal corpus-pipeline
convention — ids are content-derived; replacing content means a delete
plus an insert under a new id). A change feed containing
``update_preimage``/``update_postimage`` rows therefore raises instead
of guessing. Immutability is also what makes RESURRECTION sound: a
tombstoned id that reappears is the same content, so the sync just
removes its tombstone instead of re-indexing.

Deletes are TOMBSTONES, not rewrites: an APPEND-ONLY ledger of
(id, op, source_version) rows — latest wins, 'alive' resurrects —
probes filter matches against the effective set (one broadcast
anti-join), and the per-index ``*_vacuum`` rewrites the relations minus
the effective tombstones when the set has grown — the LSM trade: O(1)
delete now, amortized rewrite later. Append-only is what makes a crash
mid-sync unable to un-delete anything already recorded.

Crash safety is by IDEMPOTENCE, not atomicity: adds are anti-joined
against the ids already indexed and tombstones are deduplicated, so a
replay after a crash between apply and offset-write converges instead
of double-indexing.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dc43_spark.io.snaplog import CHANGE_TYPE_COL, SnaplogTable

_PLUS = ("insert", "update_postimage")
_UPDATES = ("update_preimage", "update_postimage")


def _offset_file(path: str) -> str:
    return os.path.join(path, "_sync_offset.json")


@dataclass
class IndexSyncStats:
    offset_before: Optional[int]
    offset_after: int
    docs_added: int
    docs_removed: int
    docs_resurrected: int
    strategy: str  # "initial" | "incremental" | "no-op"


@dataclass
class _IndexAdapter:
    """The index-specific operations the generic sync needs."""

    exists: Callable[[], bool]
    indexed_ids: Callable[[], DataFrame]  # one column: the index id name
    build: Callable[[DataFrame], None]
    append: Callable[[DataFrame], None]
    index_id: str  # id column name inside the index relations
    tombstones: Callable[[], Optional[DataFrame]]
    # append (ids, op, source_version) rows to the append-only ledger
    tombstone_ops: Callable[[DataFrame, str, int], None]


def _net_changes(changes: DataFrame, id_col: str):
    """(adds, remove_ids): net effect per id across the window — the LAST
    change wins; at equal version (an overwrite's delete+insert of the
    same id) insert wins. Raises on UPDATE rows (immutability contract)."""
    if changes.filter(F.col(CHANGE_TYPE_COL).isin(*_UPDATES)).limit(1).count():
        raise ValueError(
            "corpus rows are immutable: the change feed contains UPDATE "
            "rows; model content changes as delete + insert under a new "
            "(content-derived) id, or rebuild the index"
        )
    is_plus = F.col(CHANGE_TYPE_COL).isin(*_PLUS).cast("int")
    w = Window.partitionBy(id_col).orderBy(
        F.desc("_commit_version"), F.desc(is_plus)
    )
    last = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_commit_version", "_commit_timestamp")
    )
    adds = last.filter(F.col(CHANGE_TYPE_COL).isin(*_PLUS)).drop(CHANGE_TYPE_COL)
    removes = last.filter(F.col(CHANGE_TYPE_COL) == "delete").select(id_col)
    return adds, removes


def _sync(
    path: str,
    table: SnaplogTable,
    id_col: str,
    adapter: _IndexAdapter,
) -> IndexSyncStats:
    offset = None
    exists = adapter.exists()
    if exists and os.path.exists(_offset_file(path)):
        with open(_offset_file(path)) as fh:
            rec = json.load(fh)
        if rec.get("source") != os.path.abspath(table.path):
            raise ValueError(
                f"index {path} tracks {rec.get('source')}, not {table.path}"
            )
        offset = rec["version"]
    elif exists:
        raise ValueError(
            f"index {path} exists but has no sync offset — it was not "
            "built by a sync loop; rebuild from the table"
        )

    changes, head = table.changes_since(offset)
    if offset is not None and head <= offset:
        return IndexSyncStats(offset, offset, 0, 0, 0, "no-op")
    adds, removes = _net_changes(changes, id_col)

    if not exists:
        # ids already deleted by head were filtered by last-change-wins;
        # the initial build indexes only live rows
        adapter.build(adds)
        _save_offset(path, table, head)
        return IndexSyncStats(None, head, adds.count(), 0, 0, "initial")

    indexed = adapter.indexed_ids().withColumnRenamed(adapter.index_id, id_col)

    # resurrection: a re-inserted id that is currently tombstoned becomes
    # visible again via an 'alive' ledger row (same id => same content).
    # The ledger is append-only — a crash here never un-deletes anything
    # already recorded, and a replay appends an identical row that
    # collapses in the latest-wins read.
    tomb = adapter.tombstones()
    n_resurrected = 0
    if tomb is not None:
        add_ids = adds.select(F.col(id_col).alias(adapter.index_id))
        resurrected = tomb.join(
            F.broadcast(add_ids), adapter.index_id, "leftsemi"
        ).localCheckpoint(eager=True)
        n_resurrected = resurrected.count()
        if n_resurrected:
            adapter.tombstone_ops(resurrected, "alive", head)

    # idempotent adds: skip ids already physically indexed (replay after
    # a crash between append and offset-write converges)
    new_docs = adds.join(F.broadcast(indexed), id_col, "left_anti")
    n_added = new_docs.count()
    if n_added:
        adapter.append(new_docs)

    # idempotent removes: ledger a delete only for ids that are actually
    # indexed and not already effectively tombstoned
    live_removes = removes.select(F.col(id_col).alias(adapter.index_id)).join(
        F.broadcast(indexed.withColumnRenamed(id_col, adapter.index_id)),
        adapter.index_id,
        "leftsemi",
    )
    cur_tomb = adapter.tombstones()
    if cur_tomb is not None:
        live_removes = live_removes.join(
            F.broadcast(cur_tomb), adapter.index_id, "left_anti"
        )
    live_removes = live_removes.localCheckpoint(eager=True)
    n_removed = live_removes.count()
    if n_removed:
        adapter.tombstone_ops(live_removes, "delete", head)

    _save_offset(path, table, head)
    return IndexSyncStats(offset, head, n_added, n_removed, n_resurrected, "incremental")


def sync_minhash_index(
    spark: SparkSession,
    path: str,
    table: SnaplogTable,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    **index_params,
) -> IndexSyncStats:
    """Bring the MinHash/LSH text index at ``path`` up to date with
    ``table``'s head via the change feed. Builds the index
    (``index_params`` = num_hashes/rows_per_band/shingle_size/band_files)
    when it doesn't exist yet; afterwards parameters come from the index
    manifest."""
    from dc43_spark.functions import dedup_index as di

    _, shingles_path, _ = di._relations(path)
    adapter = _IndexAdapter(
        exists=lambda: os.path.isdir(os.path.join(path, "meta")),
        indexed_ids=lambda: spark.read.parquet(shingles_path).select("doc_id"),
        build=lambda df: di.minhash_index_write(
            df, path, text_col=text_col, id_col=id_col, **index_params
        ),
        append=lambda df: di.minhash_index_append(
            spark, path, df, text_col=text_col, id_col=id_col
        ),
        index_id="doc_id",
        tombstones=lambda: di.minhash_index_tombstones(spark, path),
        tombstone_ops=lambda ids, op, v: di._append_tombstone_ops(ids, path, op, v),
    )
    return _sync(path, table, id_col, adapter)


def sync_embedding_index(
    spark: SparkSession,
    path: str,
    table: SnaplogTable,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    **index_params,
) -> IndexSyncStats:
    """The embedding-index twin: keep the hyperplane-bucketed vector
    index following the corpus table (``index_params`` = n_planes/seed
    on first build)."""
    from dc43_spark.functions import embedding_index as ei

    vectors_path, meta_path = ei._relations(path)
    adapter = _IndexAdapter(
        exists=lambda: os.path.isdir(meta_path),
        indexed_ids=lambda: spark.read.parquet(vectors_path).select("vec_id"),
        build=lambda df: ei.embedding_index_write(
            df, path, id_col=id_col, vec_col=vec_col, **index_params
        ),
        append=lambda df: ei.embedding_index_append(
            spark, path, df, id_col=id_col, vec_col=vec_col
        ),
        index_id="vec_id",
        tombstones=lambda: ei.embedding_index_tombstones(spark, path),
        tombstone_ops=lambda ids, op, v: ei._append_tombstone_ops(ids, path, op, v),
    )
    return _sync(path, table, id_col, adapter)


def _save_offset(path: str, table: SnaplogTable, version: int) -> None:
    tmp = _offset_file(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"source": os.path.abspath(table.path), "version": version}, fh)
    os.replace(tmp, _offset_file(path))
