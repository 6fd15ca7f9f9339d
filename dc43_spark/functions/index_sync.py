"""Keep a persisted MinHash/LSH near-dup index in sync with a snaplog
corpus table, reading ONLY the table's change feed.

The index (functions/dedup_index.py) is the accepted-corpus LSH state a
continuous-ingest pipeline probes batch after batch. When the corpus
lives in a snaplog table, every accepted write is a commit — so index
maintenance becomes a CDC consumer: ``sync_minhash_index`` pulls
``changes_since(offset)``, appends the net-new documents' bands +
shingles, tombstones the net-deleted ids, and advances the offset. Cost
per sync is O(docs changed), never O(corpus).

Contract: corpus documents are IMMUTABLE (the universal corpus-pipeline
convention — ids are content-derived; replacing content means a delete
plus an insert under a new id). A change feed containing
``update_preimage``/``update_postimage`` rows therefore raises instead
of guessing. Immutability is also what makes RESURRECTION sound: a
tombstoned id that reappears is the same content, so the sync just
removes its tombstone instead of re-indexing.

Deletes are TOMBSTONES, not rewrites: the probe filters matches whose
``dup_of`` is tombstoned (one broadcast anti-join against a small
relation), and ``minhash_index_vacuum`` physically rewrites the
bands/shingles relations minus the tombstoned ids when the set has
grown — the LSM trade: O(1) delete now, amortized rewrite later.

Crash safety is by IDEMPOTENCE, not atomicity: adds are anti-joined
against the ids already indexed and tombstones are deduplicated, so a
replay after a crash between apply and offset-write converges instead
of double-indexing.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dc43_spark.functions.dedup_index import (
    _relations,
    _write_tombstones,
    minhash_index_append,
    minhash_index_tombstones,
    minhash_index_vacuum,
    minhash_index_write,
)
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


def sync_minhash_index(
    spark: SparkSession,
    path: str,
    table: SnaplogTable,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    **index_params,
) -> IndexSyncStats:
    """Bring the index at ``path`` up to date with ``table``'s head via
    the change feed. Builds the index (``index_params`` =
    num_hashes/rows_per_band/shingle_size/band_files) when it doesn't
    exist yet; afterwards parameters come from the index manifest."""
    offset = None
    exists = os.path.isdir(os.path.join(path, "meta"))
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
            "built by sync_minhash_index; rebuild from the table"
        )

    changes, head = table.changes_since(offset)
    if offset is not None and head <= offset:
        return IndexSyncStats(offset, offset, 0, 0, 0, "no-op")
    if changes.filter(F.col(CHANGE_TYPE_COL).isin(*_UPDATES)).limit(1).count():
        raise ValueError(
            "corpus documents are immutable: the change feed contains "
            "UPDATE rows; model content changes as delete + insert under "
            "a new (content-derived) doc_id, or rebuild the index"
        )

    # net effect per id across the window: the LAST change wins; at equal
    # version (an overwrite's delete+insert of the same id) insert wins
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

    if not exists:
        # ids already deleted by head were filtered out by
        # last-change-wins; the initial build indexes only live docs
        minhash_index_write(
            adds, path, text_col=text_col, id_col=id_col, **index_params
        )
        _save_offset(path, table, head)
        return IndexSyncStats(None, head, adds.count(), 0, 0, "initial")

    _, shingles_path, _ = _relations(path)
    indexed_ids = spark.read.parquet(shingles_path).select(
        F.col("doc_id").alias(id_col)
    )

    # resurrection: a re-inserted id that is currently tombstoned becomes
    # visible again by dropping its tombstone (same id => same content)
    tomb = minhash_index_tombstones(spark, path)
    n_resurrected = 0
    if tomb is not None:
        add_ids = adds.select(F.col(id_col).alias("doc_id"))
        resurrected = tomb.join(F.broadcast(add_ids), "doc_id", "leftsemi")
        n_resurrected = resurrected.count()
        if n_resurrected:
            remaining = tomb.join(F.broadcast(add_ids), "doc_id", "left_anti")
            tmp = remaining.localCheckpoint(eager=True)
            shutil.rmtree(f"{path.rstrip('/')}/tombstones")
            if tmp.count():
                _write_tombstones(tmp, path, "overwrite")

    # idempotent adds: skip ids already physically indexed (replay after
    # a crash between append and offset-write converges)
    new_docs = adds.join(F.broadcast(indexed_ids), id_col, "left_anti")
    n_added = new_docs.count()
    if n_added:
        minhash_index_append(spark, path, new_docs, text_col=text_col, id_col=id_col)

    # idempotent removes: tombstone only ids that are actually indexed
    # and not already tombstoned
    live_removes = removes.select(F.col(id_col).alias("doc_id")).join(
        F.broadcast(indexed_ids.withColumnRenamed(id_col, "doc_id")),
        "doc_id",
        "leftsemi",
    )
    cur_tomb = minhash_index_tombstones(spark, path)
    if cur_tomb is not None:
        live_removes = live_removes.join(F.broadcast(cur_tomb), "doc_id", "left_anti")
    n_removed = live_removes.count()
    if n_removed:
        _write_tombstones(live_removes, path, "append")

    _save_offset(path, table, head)
    return IndexSyncStats(offset, head, n_added, n_removed, n_resurrected, "incremental")


def _save_offset(path: str, table: SnaplogTable, version: int) -> None:
    tmp = _offset_file(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"source": os.path.abspath(table.path), "version": version}, fh)
    os.replace(tmp, _offset_file(path))
