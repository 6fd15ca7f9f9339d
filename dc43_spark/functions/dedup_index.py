"""Persisted near-dup index: incremental MinHash/LSH dedup for a growing
corpus (the continuous-crawl production shape).

The one-shot operators in ``functions/dedup.py`` compare a corpus against
itself. A 100 TB ingest pipeline instead asks, batch after batch: "which
of these NEW documents near-duplicate anything already accepted?" —
without rescanning the accepted corpus per batch. This module persists
the corpus's LSH state once and probes it incrementally:

- ``minhash_index_write``: one pass over the corpus -> two parquet
  relations under the index root: ``bands/`` (doc_id, band, band_hash —
  the LSH buckets) and ``shingles/`` (doc_id, distinct shingle array +
  size — the exact-verification side), plus a params manifest
  (``meta/``). Band rows are repartitioned on band_hash so files are
  uniform (md5 keys — no skew).
- ``minhash_index_probe``: signatures + bands for the (small) new batch
  only, then a BROADCAST join of the new bands against the index's band
  relation — the index side streams map-only, shuffle-free, regardless of
  corpus size. Candidates verify exactly via ``array_intersect`` on the
  two shingle arrays (same kernel as ``minhash_near_duplicates``), so
  reported jaccard is exact, not estimated.
- ``minhash_index_append``: append accepted new docs' bands + shingles —
  the next batch probes against them with no rebuild.

Parameters (num_hashes, rows_per_band, shingle_size) are pinned in the
manifest; probing with different settings raises instead of silently
joining incompatible buckets.

Scale notes: the probe shuffles nothing on the index side (broadcast of
the new batch's bands — a few hundred bytes per new doc); exact verify
joins only candidate doc_ids against ``shingles/``. Recall is the
standard banded-LSH curve ~1-(1-j^r)^(k/r); exact duplicates are always
caught (identical signatures collide in every band).

Beyond the reference engine (no dedup exists there); composes with
``streaming/dedup.py`` by probing each micro-batch inside foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dc43_spark.localdf import local_df
from dc43_spark.functions.dedup import (
    lsh_bands,
    minhash_signatures,
    token_shingles,
)

_META_COLS = ("num_hashes", "rows_per_band", "shingle_size")


def _relations(path: str) -> tuple:
    base = path.rstrip("/")
    return f"{base}/bands", f"{base}/shingles", f"{base}/meta"


def minhash_index_write(
    df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    rows_per_band: int = 4,
    shingle_size: int = 3,
    band_files: int = 8,
) -> None:
    """Build the index from the accepted corpus in one pass per relation."""
    bands_path, shingles_path, meta_path = _relations(path)
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes=num_hashes, shingle_size=shingle_size
    )
    bands = lsh_bands(sigs, rows_per_band=rows_per_band, id_col=id_col).select(
        F.col(id_col).alias("doc_id"), "band", "band_hash"
    )
    # md5 band_hash is uniform -> repartition gives equal-size files; at
    # cluster scale band_files rises with corpus size (one file per final
    # shuffle partition)
    bands.repartition(band_files, "band_hash").write.mode("errorifexists").parquet(
        bands_path
    )
    shingles = df.select(
        F.col(id_col).alias("doc_id"),
        token_shingles(text_col, shingle_size).alias("sh"),
    ).withColumn("n_sh", F.size("sh").cast("long"))
    shingles.write.mode("errorifexists").parquet(shingles_path)
    meta = local_df(
        df.sparkSession,
        [(num_hashes, rows_per_band, shingle_size)],
        "num_hashes int, rows_per_band int, shingle_size int",
        coalesce=1,
    )
    meta.coalesce(1).write.mode("errorifexists").json(meta_path)


def _read_meta(spark: SparkSession, path: str) -> dict:
    _, _, meta_path = _relations(path)
    row = spark.read.json(meta_path).collect()[0]
    return {k: int(row[k]) for k in _META_COLS}


# -- tombstones: logical deletes applied physically by vacuum (LSM trade:
#    O(1) delete now, amortized rewrite later). Written by the CDC sync
#    loop (functions/index_sync.py); honored by every probe. The ledger
#    is APPEND-ONLY — (doc_id, op, v) rows where the latest v wins and
#    op='alive' is a resurrection — so a crash mid-sync never loses an
#    already-recorded delete (rewriting the set in place would).


def _tombstones_path(path: str) -> str:
    return f"{path.rstrip('/')}/tombstones"


def _append_tombstone_ops(ids: DataFrame, path: str, op: str, version: int) -> None:
    """Append (id, op, v) rows to the ledger; idempotent under replay
    (identical rows collapse in the latest-wins read)."""
    ids.select(
        F.col("doc_id"), F.lit(op).alias("op"), F.lit(version).alias("v")
    ).write.mode("append").parquet(_tombstones_path(path))


def minhash_index_tombstones(spark: SparkSession, path: str) -> "DataFrame | None":
    """EFFECTIVE tombstoned doc ids (latest ledger op is 'delete'), or
    None when the ledger is empty/absent."""
    import os

    from pyspark.sql.window import Window

    tp = _tombstones_path(path)
    if not os.path.isdir(tp) or not any(
        n.endswith(".parquet") for n in os.listdir(tp)
    ):
        return None
    led = spark.read.parquet(tp)
    if "op" not in led.columns:  # pre-ledger layout: every row is a delete
        return led.select("doc_id").distinct()
    w = Window.partitionBy("doc_id").orderBy(F.desc("v"))
    latest = led.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return latest.filter(F.col("op") == "delete").select("doc_id").distinct()


def minhash_index_vacuum(spark: SparkSession, path: str) -> int:
    """Apply effective tombstones physically: rewrite bands/ and shingles/
    minus the tombstoned ids (temp-dir + swap; single-maintainer, like
    dataset compaction) and clear the ledger. Returns ids vacuumed.
    Crash between the rewrite and the ledger clear is harmless: probes
    keep filtering already-removed ids; the next vacuum clears."""
    import os
    import shutil
    import uuid

    tomb = minhash_index_tombstones(spark, path)
    if tomb is None:
        return 0
    tomb = tomb.localCheckpoint(eager=True)  # pin before mutating the dir
    n = tomb.count()
    bands_path, shingles_path, _ = _relations(path)
    if n:
        for rel in (bands_path, shingles_path):
            kept = spark.read.parquet(rel).join(F.broadcast(tomb), "doc_id", "left_anti")
            tmp = f"{rel}_vacuum_{uuid.uuid4().hex}"
            kept.write.parquet(tmp)
            shutil.rmtree(rel)
            os.rename(tmp, rel)
    shutil.rmtree(_tombstones_path(path))
    return n


def minhash_index_probe(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """(doc_id, dup_of, jaccard) for every new doc whose exact shingle
    Jaccard against an indexed doc reaches ``threshold`` (LSH-candidated,
    exactly verified). ``doc_id`` is the new batch's id space; ``dup_of``
    the index's."""
    meta = _read_meta(spark, path)
    bands_path, shingles_path, _ = _relations(path)

    sigs = minhash_signatures(
        new_df,
        text_col,
        id_col,
        num_hashes=meta["num_hashes"],
        shingle_size=meta["shingle_size"],
    )
    new_bands = lsh_bands(
        sigs, rows_per_band=meta["rows_per_band"], id_col=id_col
    ).select(F.col(id_col).alias("doc_id"), "band", "band_hash")

    idx_bands = spark.read.parquet(bands_path)
    # broadcast the BATCH side: the accepted-corpus relation streams
    # map-only with zero shuffle however large the index is
    candidates = (
        idx_bands.join(F.broadcast(new_bands), ["band", "band_hash"])
        .select(
            new_bands["doc_id"].alias("doc_id"),
            idx_bands["doc_id"].alias("dup_of"),
        )
        .distinct()
    )

    new_sh = new_df.select(
        F.col(id_col).alias("doc_id"),
        token_shingles(text_col, meta["shingle_size"]).alias("_sa"),
    )
    idx_sh = spark.read.parquet(shingles_path).select(
        F.col("doc_id").alias("dup_of"), F.col("sh").alias("_sb"), "n_sh"
    )
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("long")
    # candidates (batch_size x band collisions) carry the new docs'
    # shingle arrays and BROADCAST into the index's shingle relation —
    # like the band join, the big index side streams map-only with no
    # shuffle (candidates derive from a parquet scan, so without the
    # explicit hint Spark has no size estimate and sort-merges)
    cand_with_new = candidates.join(F.broadcast(new_sh), "doc_id")
    out = (
        idx_sh.join(F.broadcast(cand_with_new), "dup_of")
        .withColumn("_inter", inter)
        .withColumn(
            "jaccard",
            F.round(F.col("_inter") / (F.size("_sa") + F.col("n_sh") - F.col("_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        # distinct: a replayed append (at-least-once foreachBatch) can
        # leave duplicate shingle rows for a doc, which would duplicate
        # its hits — values are identical, so this collapses them
        .select("doc_id", "dup_of", "jaccard")
        .distinct()
    )
    # logically-deleted index docs never count as duplicates (tombstones
    # are small by construction — vacuum applies them physically)
    tomb = minhash_index_tombstones(new_df.sparkSession, path)
    if tomb is not None:
        out = out.join(
            F.broadcast(tomb.withColumnRenamed("doc_id", "dup_of")),
            "dup_of",
            "left_anti",
        )
    return out


def minhash_index_append(
    spark: SparkSession,
    path: str,
    accepted_df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    band_files: int = 2,
) -> None:
    """Add accepted new docs so later batches dedup against them too."""
    meta = _read_meta(spark, path)
    bands_path, shingles_path, _ = _relations(path)
    sigs = minhash_signatures(
        accepted_df,
        text_col,
        id_col,
        num_hashes=meta["num_hashes"],
        shingle_size=meta["shingle_size"],
    )
    bands = lsh_bands(
        sigs, rows_per_band=meta["rows_per_band"], id_col=id_col
    ).select(F.col(id_col).alias("doc_id"), "band", "band_hash")
    bands.repartition(band_files, "band_hash").write.mode("append").parquet(bands_path)
    accepted_df.select(
        F.col(id_col).alias("doc_id"),
        token_shingles(text_col, meta["shingle_size"]).alias("sh"),
    ).withColumn("n_sh", F.size("sh").cast("long")).write.mode("append").parquet(
        shingles_path
    )


def dedup_batch_against_index(
    spark: SparkSession,
    path: str,
    batch_df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    append_survivors: bool = False,
) -> DataFrame:
    """One ingest step: drop batch docs that near-duplicate the indexed
    corpus; optionally append the survivors to the index (the
    foreachBatch body for a streaming crawl).

    Intra-batch near-dups are NOT resolved here — run
    ``minhash_near_duplicates`` + ``keep_canonical`` on the batch first if
    the batch itself may contain duplicates."""
    dups = minhash_index_probe(
        spark, path, batch_df, text_col=text_col, id_col=id_col, threshold=threshold
    )
    kept = batch_df.join(
        dups.select(F.col("doc_id").alias(id_col)).distinct(), id_col, "left_anti"
    )
    if append_survivors:
        # snapshot BEFORE mutating the index: the survivors' lineage
        # contains the probe, so a lazy re-evaluation after the append
        # would re-probe the now-extended index and anti-join every
        # survivor against itself (eager checkpoint, not persist —
        # a cache eviction would silently reintroduce the race)
        kept = kept.localCheckpoint(eager=True)
        minhash_index_append(spark, path, kept, text_col=text_col, id_col=id_col)
    return kept
