"""Persisted EMBEDDING near-dup index: incremental SemDeDup for a growing
corpus — the semantic twin of ``functions/dedup_index.py``.

Where the text index buckets MinHash bands, this one buckets seeded
random-hyperplane signs (``similarity.hyperplanes``/``bucket_id``): the
accepted corpus's vectors are written ONCE, partitioned by their LSH
bucket; each new batch probes only the partitions its own (plus
Hamming-1) buckets name, verifies with exact cosine inside the bucket,
and appends its survivors.

Scale shape: the probe collects the batch's distinct bucket ids (at most
|batch| x (n_planes + 1) longs) and filters the index scan with them —
an `IN` over the PARTITION column, so the scan prunes to the probed
buckets at the file level and never touches the rest of the corpus. The
in-bucket join broadcasts the batch side. Nothing about the index ever
shuffles.

Determinism: hyperplanes regenerate exactly from (seed, dim, n_planes)
pinned in the manifest, so probe-side buckets always agree with the
buckets the index was written under; a dim/seed mismatch is detected,
not silently mis-bucketed.

Beyond the reference engine; batch-mode agreement with
``curation.embedding_near_dups`` is pinned in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dc43_spark.localdf import local_df
from dc43_spark.functions.similarity import (
    _as_double,
    bucket_id,
    cosine,
    expand_multi_probe,
    hyperplanes,
)

_META_COLS = ("n_planes", "seed", "dim")


def _relations(path: str) -> tuple:
    base = path.rstrip("/")
    return f"{base}/vectors", f"{base}/meta"


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    probe = df.select(F.size(vec_col)).first()
    if probe is None or probe[0] is None:
        raise ValueError("cannot infer embedding dim from an empty input")
    return int(probe[0])


def _check_batch_dim(df: DataFrame, vec_col: str, expected_dim: int) -> bool:
    """Validate EVERY row's vector against the manifest dim in one cheap agg.

    Returns False for an empty batch (callers short-circuit), raises
    ``ValueError`` naming the offending dims if any row is NULL or a
    different length. Checking only the first row (the r5 shape) let a
    mixed-dim batch slip through: its wrong-dim rows bucketed to NULL,
    matched nothing, and were silently reported unique — the exact
    recall-loss failure this guard exists to catch (r5 advice)."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col(vec_col).isNull(), 1)).alias("n_null"),
        F.collect_set(F.size(vec_col)).alias("dims"),
    ).first()
    if int(row["n"]) == 0:
        return False
    if int(row["n_null"]) > 0:
        raise ValueError(
            f"{row['n_null']} of {row['n']} rows have NULL {vec_col!r} vectors"
        )
    dims = sorted(int(d) for d in row["dims"])
    if dims != [expected_dim]:
        raise ValueError(
            f"batch embedding dims {dims} do not match the index's {expected_dim}"
        )
    return True


def embedding_index_write(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> None:
    """Persist the accepted corpus partitioned by LSH bucket."""
    vectors_path, meta_path = _relations(path)
    dim = _infer_dim(df, vec_col)
    planes = hyperplanes(dim, n_planes, seed=seed)
    vecs = df.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("vec"),
    ).withColumn("bucket", bucket_id(F.col("vec"), planes))
    vecs.write.mode("errorifexists").partitionBy("bucket").parquet(vectors_path)
    local_df(
        df.sparkSession,
        [(n_planes, seed, dim)],
        "n_planes int, seed int, dim int",
        coalesce=1,
    ).write.mode("errorifexists").json(meta_path)


def _read_meta(spark: SparkSession, path: str) -> dict:
    _, meta_path = _relations(path)
    row = spark.read.json(meta_path).collect()[0]
    return {k: int(row[k]) for k in _META_COLS}


def embedding_index_probe(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    multi_probe: int = 1,
    scale: int = 6,
) -> DataFrame:
    """(vec_id, dup_of, cosine) for every new vector whose exact cosine
    against an indexed vector in a probed bucket reaches ``threshold``.
    ``multi_probe=1`` also probes every bucket at Hamming distance 1,
    recovering neighbours that straddle one hyperplane.

    An empty batch probes to an empty result; a batch whose embedding dim
    differs from the manifest raises (a wrong-dim vector zips to a NULL
    bucket, which would otherwise silently match nothing and report the
    whole batch as unique — total recall loss, not an error)."""
    meta = _read_meta(spark, path)
    vectors_path, _ = _relations(path)
    dim = meta["dim"]
    planes = hyperplanes(dim, meta["n_planes"], seed=meta["seed"])

    if not _check_batch_dim(new_df, vec_col, dim):
        batch_id_t = new_df.schema[id_col].dataType.simpleString()
        idx_id_t = (
            spark.read.parquet(vectors_path).schema["vec_id"].dataType.simpleString()
        )
        return local_df(
            spark, [], f"vec_id {batch_id_t}, dup_of {idx_id_t}, cosine double"
        )

    probe = new_df.select(
        F.col(id_col).alias("q_id"),
        _as_double(F.col(vec_col)).alias("q_vec"),
    ).withColumn("bucket", bucket_id(F.col("q_vec"), planes))
    if multi_probe:
        probe = expand_multi_probe(probe, meta["n_planes"])
    # the probe frame is small by construction and is consumed twice
    # (bucket collect + broadcast join); the eager checkpoint computes the
    # n_planes dot products per row once instead of replaying the batch's
    # whole upstream lineage per consumer
    probe = probe.localCheckpoint(eager=True)

    # the batch's bucket list is small by construction; materialising it
    # as literals turns the index read into a partition-pruned scan of
    # ONLY the probed buckets
    buckets = [r.bucket for r in probe.select("bucket").distinct().collect()]
    idx = spark.read.parquet(vectors_path).filter(F.col("bucket").isin(buckets))

    out = (
        idx.join(F.broadcast(probe), "bucket")
        .select(
            F.col("q_id").alias("vec_id"),
            F.col("vec_id").alias("dup_of"),
            F.round(cosine(F.col("q_vec"), F.col("vec")), scale).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()  # multi-probe surfaces the same pair via several buckets
    )
    # logically-deleted vectors never count as duplicates (tombstones are
    # small by construction — vacuum applies them physically)
    tomb = embedding_index_tombstones(spark, path)
    if tomb is not None:
        out = out.join(
            F.broadcast(tomb.withColumnRenamed("vec_id", "dup_of")),
            "dup_of",
            "left_anti",
        )
    return out


# -- tombstones: logical deletes applied physically by vacuum; written by
#    the CDC sync loop (functions/index_sync.py); honored by every probe.
#    APPEND-ONLY ledger of (vec_id, op, v) rows, latest v wins, op='alive'
#    resurrects — a crash mid-sync never loses a recorded delete.


def _tombstones_path(path: str) -> str:
    return f"{path.rstrip('/')}/tombstones"


def _append_tombstone_ops(ids: DataFrame, path: str, op: str, version: int) -> None:
    """Append (id, op, v) rows to the ledger; idempotent under replay."""
    ids.select(
        F.col("vec_id"), F.lit(op).alias("op"), F.lit(version).alias("v")
    ).write.mode("append").parquet(_tombstones_path(path))


def embedding_index_tombstones(spark: SparkSession, path: str):
    """EFFECTIVE tombstoned vec ids (latest ledger op is 'delete'), or
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
        return led.select("vec_id").distinct()
    w = Window.partitionBy("vec_id").orderBy(F.desc("v"))
    latest = led.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return latest.filter(F.col("op") == "delete").select("vec_id").distinct()


def embedding_index_vacuum(spark: SparkSession, path: str) -> int:
    """Apply effective tombstones physically: rewrite vectors/ minus the
    tombstoned ids, keeping the bucket partitioning (temp-dir + swap;
    single-maintainer, like dataset compaction) and clear the ledger.
    Returns ids vacuumed."""
    import os
    import shutil
    import uuid

    tomb = embedding_index_tombstones(spark, path)
    if tomb is None:
        return 0
    tomb = tomb.localCheckpoint(eager=True)  # pin before mutating the dir
    n = tomb.count()
    vectors_path, _ = _relations(path)
    if n:
        kept = spark.read.parquet(vectors_path).join(
            F.broadcast(tomb), "vec_id", "left_anti"
        )
        tmp = f"{vectors_path}_vacuum_{uuid.uuid4().hex}"
        kept.write.partitionBy("bucket").parquet(tmp)
        shutil.rmtree(vectors_path)
        os.rename(tmp, vectors_path)
    shutil.rmtree(_tombstones_path(path))
    return n


def embedding_index_append(
    spark: SparkSession,
    path: str,
    accepted_df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Add accepted vectors so later batches dedup against them too.
    An empty frame is a no-op (an all-duplicates batch has nothing to
    append — r5 review: inferring dim from the empty frame crashed the
    normal ingest path); a wrong-dim frame raises."""
    meta = _read_meta(spark, path)
    vectors_path, _ = _relations(path)
    dim = meta["dim"]
    if not _check_batch_dim(accepted_df, vec_col, dim):
        return
    planes = hyperplanes(dim, meta["n_planes"], seed=meta["seed"])
    accepted_df.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("vec"),
    ).withColumn("bucket", bucket_id(F.col("vec"), planes)).write.mode(
        "append"
    ).partitionBy("bucket").parquet(vectors_path)


def dedup_batch_against_embedding_index(
    spark: SparkSession,
    path: str,
    batch_df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    multi_probe: int = 1,
    append_survivors: bool = False,
) -> DataFrame:
    """One ingest step: drop batch vectors that semantically duplicate
    the indexed corpus; optionally append the survivors. Survivors are
    eagerly checkpointed before the append — their lineage contains the
    probe, and a lazy re-evaluation after the index mutation would
    anti-join them against their own appended copies.

    Replay warning: with ``append_survivors=True`` the index mutates
    BEFORE the caller can write the returned frame anywhere — under an
    at-least-once retry (foreachBatch), a replayed batch re-probes
    against its own appended copies and loses every survivor. Streaming
    callers must use ``streaming.dedup.dedup_stream_against_embedding_index``,
    which writes output first and appends after."""
    dups = embedding_index_probe(
        spark,
        path,
        batch_df,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        multi_probe=multi_probe,
    )
    kept = batch_df.join(
        dups.select(F.col("vec_id").alias(id_col)).distinct(), id_col, "left_anti"
    )
    if append_survivors:
        kept = kept.localCheckpoint(eager=True)
        embedding_index_append(spark, path, kept, id_col=id_col, vec_col=vec_col)
    return kept
