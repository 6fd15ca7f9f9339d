"""Similarity search over embedding columns (array<float>).

Two tiers:

- ``cosine_topk``        — exact brute-force: query x corpus join with a
                           JVM-side dot product (``F.zip_with``/``aggregate``)
                           and a per-query top-k window. Correctness baseline
                           and fine when |queries| x |corpus| is bounded
                           (broadcast the small side).
- ``lsh_bucketed_topk``  — random-hyperplane LSH: b sign bits -> bucket id;
                           candidates share a bucket (multi-probe optional),
                           exact cosine only within buckets. The 100 TB path:
                           the corpus is hashed once (narrow pass) and the
                           join key is a small int bucket, so the shuffle is
                           bucket-local instead of all-pairs.

Hyperplanes are generated from a seeded NumPy RNG on the driver and shipped
as literal arrays — deterministic, no UDFs, no state on executors.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array columns (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    scale: Optional[int] = 6,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.

    Output: (query_id, neighbor_id, rank, cosine). Self-matches (same id)
    are excluded. Ties break on neighbor id for determinism.

    Scale: the queries side is broadcast (it is the small side by
    construction); the corpus is scanned once with no shuffle except the
    per-query top-k, which aggregates map-side via the window's partial
    sort. For corpus-x-corpus joins use the LSH variant instead."""
    q = queries.select(
        F.col(query_id).alias("q_id"), _as_double(F.col(query_vec)).alias("q_vec")
    )
    c = corpus.select(
        F.col(corpus_id).alias("n_id"), _as_double(F.col(corpus_vec)).alias("n_vec")
    )
    if broadcast_queries:
        q = F.broadcast(q)
    scored = (
        q.crossJoin(c)
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            cosine(F.col("q_vec"), F.col("n_vec")).alias("_cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_cos").desc(), F.col("n_id").asc())
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id"),
            F.col("n_id"),
            F.col("rank").cast("int").alias("rank"),
            (F.round(F.col("_cos"), scale) if scale else F.col("_cos")).alias("cosine"),
        )
    )
    return out


def cosine_topk_matmul(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    scale: Optional[int] = 6,
) -> DataFrame:
    """Exact top-k via Arrow-batched NumPy matmul (``mapInPandas``).

    The expression-tree dot product costs ~10us/pair (higher-order
    functions don't vectorise); BLAS matmul does the same work at memory
    bandwidth. The small query set is collected to a driver matrix and
    broadcast; each Arrow batch of the corpus computes
    ``batch_matrix @ Q.T`` and emits only its local top-k per query, so the
    shuffle carries |queries| * k * |batches| rows, not the full score
    matrix. Final exact top-k per query via window.

    Note: BLAS summation order differs from sequential ``aggregate`` — use
    ``cosine_topk`` when bit-exact parity with a sequential oracle matters.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(query_id, query_vec).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norms = np.linalg.norm(q_mat, axis=1)
    sc = queries.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat, q_norms))

    out_schema = "q_id long, n_id long, _cos double"

    def score(batches):
        ids, mat, norms = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf["_nid"].to_numpy(dtype=np.int64)
            c_mat = np.stack(pdf["_nvec"].to_numpy())
            c_norms = np.linalg.norm(c_mat, axis=1)
            cos = (c_mat @ mat.T) / np.outer(c_norms, norms)  # |batch| x |Q|
            # local top-k per query within this batch bounds shuffle volume
            top = min(k + 1, cos.shape[0])  # +1 in case self-match is in-batch
            idx = np.argpartition(-cos, top - 1, axis=0)[:top]
            rows = {
                "q_id": np.repeat(ids, top),
                "n_id": c_ids[idx].T.ravel(),
                "_cos": np.take_along_axis(cos, idx, axis=0).T.ravel(),
            }
            yield pd.DataFrame(rows)

    c = corpus.select(
        F.col(corpus_id).alias("_nid"),
        _as_double(F.col(corpus_vec)).alias("_nvec"),
    )
    scored = c.mapInPandas(score, out_schema).filter(F.col("q_id") != F.col("n_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("_cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "n_id",
            F.col("rank").cast("int").alias("rank"),
            (F.round(F.col("_cos"), scale) if scale else F.col("_cos")).alias("cosine"),
        )
    )


def hyperplanes(dim: int, n_planes: int, *, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit normals not required for sign)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def bucket_id(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket: b sign bits packed into a long."""
    out = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = (dot(vec, p) > 0).cast("long")
        out = out + F.shiftleft(bit, i)
    return out


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: Optional[int] = None,
    multi_probe: int = 1,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    scale: Optional[int] = 6,
) -> DataFrame:
    """Approximate top-k: exact cosine within matching LSH buckets only.

    ``multi_probe=1`` additionally probes every bucket at Hamming distance 1
    from the query's bucket — recovering neighbours from clusters that
    straddle a hyperplane at the cost of ``n_planes`` extra (still tiny)
    bucket lookups per query. At 1000-executor scale the bucket id becomes
    the shuffle key, turning an all-pairs join into a bucket-local one.
    Output schema matches ``cosine_topk``."""
    if dim is None:
        sample = corpus.select(F.size(corpus_vec)).first()
        dim = int(sample[0])
    planes = hyperplanes(dim, n_planes, seed=seed)
    q = queries.select(
        F.col(query_id).alias("q_id"),
        _as_double(F.col(query_vec)).alias("q_vec"),
    ).withColumn("bucket", bucket_id(F.col("q_vec"), planes))
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
        q = q.withColumn("bucket", F.explode(probes))
    c = corpus.select(
        F.col(corpus_id).alias("n_id"),
        _as_double(F.col(corpus_vec)).alias("n_vec"),
    ).withColumn("bucket", bucket_id(F.col("n_vec"), planes))
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("_cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "n_id",
            F.col("rank").cast("int").alias("rank"),
            (F.round(F.col("_cos"), scale) if scale else F.col("_cos")).alias("cosine"),
        )
    )
