"""Similarity search over embedding columns (array<float>).

Tiers, from exact baseline to indexed scale path:

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
- ``ivf_topk``           — IVF (inverted-file) ANN: spherical k-means coarse
                           quantizer trained on a deterministic sample,
                           corpus partitioned into centroid lists, queries
                           probe their ``nprobe`` nearest lists. Unlike LSH's
                           data-oblivious buckets, the quantizer ADAPTS to the
                           corpus distribution, so list sizes are balanced and
                           recall per probed vector is higher on clustered
                           data.

Hyperplanes and centroids are generated deterministically (seeded NumPy on
the driver) and broadcast — no RNG state on executors.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from dc43_spark.localdf import local_df


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
            # lexsort, not argpartition: ties at the k-th score must resolve
            # by ascending n_id (the global window's order), else local
            # pruning can drop the tie the final window would have kept
            # (r5 advice — duplicate corpus vectors in one Arrow batch)
            key_ids = np.broadcast_to(c_ids[:, None], cos.shape)
            idx = np.lexsort((key_ids, -cos), axis=0)[:top]
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


def _plane_literal(plane: list[float]) -> Column:
    """The plane as ONE parsed array literal instead of dim ``F.lit``
    column objects. Identical expression tree and identical doubles
    (``repr`` round-trips exactly through the SQL parser, the same
    route py4j itself uses), but built in one gateway call: the
    per-element form cost ~2 py4j round-trips per coordinate, which at
    8 planes x 64 dims made DataFrame CONSTRUCTION the dominant cost of
    the LSH gates (~2 of ann_lsh's ~3.8 s warm build measured r14) —
    driver-side, single-threaded, guide §5."""
    if not all(math.isfinite(float(x)) for x in plane):
        return F.array(*[F.lit(float(x)) for x in plane])  # exotic values
    return F.expr("array(" + ",".join(repr(float(x)) + "D" for x in plane) + ")")


def bucket_id(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket: b sign bits packed into a long."""
    out = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        bit = (dot(vec, _plane_literal(plane)) > 0).cast("long")
        out = out + F.shiftleft(bit, i)
    return out


def expand_multi_probe(df: DataFrame, n_planes: int) -> DataFrame:
    """Explode each row's ``bucket`` into itself plus every bucket at
    Hamming distance 1 — the shared multi-probe expansion for ALL
    LSH-bucket consumers (in-session join and persisted index alike), so
    probing changes land in one place. Any truthy ``multi_probe`` option
    upstream means radius 1."""
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
    )
    return df.withColumn("bucket", F.explode(probes))


def lsh_bucket_join(
    probe: DataFrame,
    corpus: DataFrame,
    planes: list[list[float]],
    *,
    multi_probe: int = 1,
) -> DataFrame:
    """Shared LSH candidate machinery: attach bucket ids from ``planes`` to
    both sides, explode Hamming-1 probes on the probe side (when
    ``multi_probe``), and equi-join on the bucket. ``probe`` must carry
    (q_id, q_vec), ``corpus`` (n_id, n_vec); the joined frame keeps all
    four. Both the ANN top-k and the embedding near-dup pruning paths
    build on this, so probing/bucketing changes land in one place."""
    p = probe.withColumn("bucket", bucket_id(F.col("q_vec"), planes))
    if multi_probe:
        p = expand_multi_probe(p, len(planes))
    c = corpus.withColumn("bucket", bucket_id(F.col("n_vec"), planes))
    return p.join(c, on="bucket")


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
    )
    c = corpus.select(
        F.col(corpus_id).alias("n_id"),
        _as_double(F.col(corpus_vec)).alias("n_vec"),
    )
    scored = (
        lsh_bucket_join(q, c, planes, multi_probe=multi_probe)
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


def train_sample(
    corpus: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    train_limit: int = 4096,
) -> np.ndarray:
    """The deterministic k-means training sample both trainers share: the
    first ``train_limit`` vectors by id (TakeOrdered — a top-k, not a
    full sort, so it stays cheap at 100 TB), pulled once via Arrow and
    L2-row-normalised. ``ivfpq_topk`` computes this once and hands it to
    ``ivf_centroids`` AND ``train_pq`` — through r13 each trainer pulled
    its own identical sample (two top-k jobs over the corpus)."""
    pdf = (
        corpus.select(F.col(corpus_id).alias("i"), _as_double(F.col(corpus_vec)).alias("v"))
        .orderBy("i")
        .limit(train_limit)
        .toPandas()  # Arrow transfer; Row-object collect is ~5x slower here
    )
    x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def ivf_centroids(
    corpus: DataFrame,
    *,
    n_centroids: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    train_limit: int = 4096,
    iters: int = 8,
    seed: int = 42,
    sample: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Train a spherical-k-means coarse quantizer on a deterministic sample.

    The sample is the first ``train_limit`` vectors by id (see
    ``train_sample``; pass ``sample=`` to reuse an already-pulled one);
    Lloyd iterations run in NumPy on the driver. Vectors and centroids are
    L2-normalised, so nearest-centroid-by-dot == nearest-by-cosine.
    Deterministic given (corpus, seed): seeded init, fixed iteration
    count, and empty clusters re-seeded from a fixed cursor. Returns
    (n_centroids, dim) float64, row-normalised.
    """
    x = (
        sample
        if sample is not None
        else train_sample(
            corpus,
            corpus_id=corpus_id,
            corpus_vec=corpus_vec,
            train_limit=train_limit,
        )
    )
    n = x.shape[0]
    k = min(n_centroids, n)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(n, size=k, replace=False)].copy()
    respawn = 0  # fixed cursor for deterministic empty-cluster re-seeding
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members) == 0:
                cent[j] = x[respawn % n]
                respawn += 1
            else:
                m = members.sum(axis=0)
                cent[j] = m / np.linalg.norm(m)
    return cent


def _ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str,
    vec_col: str,
    nprobe: int,
    emit_code: bool = False,
    emit_vec: bool = True,
) -> DataFrame:
    """Attach centroid list ids: (id, vec, centroid_id) — one output row per
    probed list. Arrow-batched matmul against the broadcast centroid matrix;
    shuffle-free (narrow map).

    ``emit_code`` additionally emits the int8 scalar-quantized vector
    (``round(x/||x|| * 127)`` per component — symmetric SQ8 on the unit
    sphere): the quantization shares the normalisation already computed for
    assignment, so the codes cost nothing extra here."""
    import pandas as pd

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(centroids)
    nprobe = min(nprobe, centroids.shape[0])

    src = df.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_vec"))

    def assign(batches):
        cent = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["_vec"].to_numpy())
            normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = normed @ cent.T  # |batch| x k
            if nprobe == 1:
                top = np.argmax(sims, axis=1)[:, None]
            else:
                part = np.argpartition(-sims, nprobe - 1, axis=1)[:, :nprobe]
                # order probes best-first for readability; ties by centroid id
                order = np.argsort(-np.take_along_axis(sims, part, axis=1), axis=1)
                top = np.take_along_axis(part, order, axis=1)
            out = {"_id": np.repeat(pdf["_id"].to_numpy(), nprobe)}
            if emit_vec:
                out["_vec"] = np.repeat(pdf["_vec"].to_numpy(), nprobe)
            out["centroid_id"] = top.astype(np.int64).ravel()
            if emit_code:
                codes = np.clip(np.rint(normed * 127.0), -127, 127).astype(np.int8)
                # 1-D object array of row-arrays (np.array(list-of-equal-len)
                # would collapse to 2-D and break the DataFrame constructor)
                obj = np.empty(codes.shape[0], dtype=object)
                for i in range(codes.shape[0]):
                    obj[i] = codes[i]
                out["_code"] = np.repeat(obj, nprobe)
            yield pd.DataFrame(out)

    schema = "_id long"
    if emit_vec:
        schema += ", _vec array<double>"
    schema += ", centroid_id long"
    if emit_code:
        schema += ", _code array<tinyint>"
    return src.mapInPandas(assign, schema)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    train_limit: int = 4096,
    iters: int = 8,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    scale: Optional[int] = 6,
    centroids: Optional[np.ndarray] = None,
) -> DataFrame:
    """IVF approximate top-k: exact cosine within the ``nprobe`` probed
    centroid lists per query. Output schema matches ``cosine_topk``.

    ``nprobe == n_centroids`` degrades gracefully to exact brute force (every
    list probed → every pair scored exactly once) — that full-probe setting
    is what the oracle-checked gate runs, so the whole train/assign/join
    machinery is hash-verified; partial-probe recall is asserted in tests.

    Scale path: the corpus assignment is a one-off narrow pass whose output
    is meant to be PERSISTED partitioned by ``centroid_id`` (see
    ``io.bucketing``); after that a query batch shuffles only its probed
    lists — |corpus| * nprobe / n_centroids rows — instead of the all-pairs
    cross join, and the per-list join is a co-partitioned hash join on a
    small int key. Exact cosine within lists keeps parity with the
    brute-force ranking on whatever pairs are scored."""
    if centroids is None:
        centroids = ivf_centroids(
            corpus,
            n_centroids=n_centroids,
            corpus_id=corpus_id,
            corpus_vec=corpus_vec,
            train_limit=train_limit,
            iters=iters,
            seed=seed,
        )
    c = _ivf_assign(corpus, centroids, id_col=corpus_id, vec_col=corpus_vec, nprobe=1)
    c = c.select(
        F.col("_id").alias("n_id"), F.col("_vec").alias("n_vec"), "centroid_id"
    )
    q = _ivf_assign(queries, centroids, id_col=query_id, vec_col=query_vec, nprobe=nprobe)
    q = F.broadcast(
        q.select(F.col("_id").alias("q_id"), F.col("_vec").alias("q_vec"), "centroid_id")
    )
    scored = (
        q.join(c, on="centroid_id")
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


def ivf_write_index(
    corpus: DataFrame,
    path: str,
    *,
    n_centroids: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    train_limit: int = 4096,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Materialise an IVF index: corpus rows assigned to centroid lists and
    written PARTITIONED BY centroid_id, centroids saved alongside.

    Partition-per-list is the 100 TB layout: a query probing ``nprobe`` of
    ``n_centroids`` lists prunes the rest at the file listing — the scan
    reads nprobe/n_centroids of the data before a single task runs
    (verified via PartitionFilters in tests). Layout:
    ``{path}/lists/centroid_id=*/...`` + ``{path}/centroids/`` (one row per
    centroid, its vector as array<double>). Returns the centroid matrix."""
    centroids = ivf_centroids(
        corpus,
        n_centroids=n_centroids,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        train_limit=train_limit,
        iters=iters,
        seed=seed,
    )
    assigned = _ivf_assign(
        corpus, centroids, id_col=corpus_id, vec_col=corpus_vec, nprobe=1
    )
    (
        assigned.select(
            F.col("_id").alias(corpus_id),
            F.col("_vec").alias(corpus_vec),
            "centroid_id",
        )
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{path}/lists")
    )
    spark = corpus.sparkSession
    local_df(
        spark,
        [(i, [float(x) for x in row]) for i, row in enumerate(centroids)],
        "centroid_id long, centroid array<double>",
        coalesce=1,
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    return centroids


def ivf_write_index_quantized(
    corpus: DataFrame,
    path: str,
    *,
    n_centroids: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    train_limit: int = 4096,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """int8 IVF index: lists hold ONLY (id, SQ8 code), partitioned by
    ``centroid_id`` — 8x smaller than float64 lists (4x vs float32), the
    standard 100 TB ANN memory optimisation (FAISS IVF+SQ shape). The float
    vectors are NOT duplicated into the index: exact rescoring joins the
    tiny candidate set back to the source table instead. Layout:
    ``{path}/lists/centroid_id=*/`` (id, code) + ``{path}/centroids/``."""
    centroids = ivf_centroids(
        corpus,
        n_centroids=n_centroids,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        train_limit=train_limit,
        iters=iters,
        seed=seed,
    )
    assigned = _ivf_assign(
        corpus, centroids, id_col=corpus_id, vec_col=corpus_vec, nprobe=1,
        emit_code=True, emit_vec=False,  # codes only: halves the Arrow volume
    )
    (
        assigned.select(
            F.col("_id").alias(corpus_id), F.col("_code").alias("code"), "centroid_id"
        )
        # co-locate each list before the partitioned write: a few files per
        # centroid_id dir instead of tasks x lists splinters
        .repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{path}/lists")
    )
    spark = corpus.sparkSession
    local_df(
        spark,
        [(i, [float(x) for x in row]) for i, row in enumerate(centroids)],
        "centroid_id long, centroid array<double>",
        coalesce=1,
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    return centroids


def ivf_query_index_quantized(
    spark,
    path: str,
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    nprobe: int = 4,
    rescore_factor: int = 8,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    scale: Optional[int] = 6,
) -> DataFrame:
    """Top-k against an int8 IVF index: coarse candidates by integer dot
    product over the codes, exact float rescore of the top
    ``k * rescore_factor`` per query against the source table.

    Cost shape at scale: the probed lists carry int8 codes (8x less shuffle
    and cache than float64); the integer scoring is an Arrow-batched NumPy
    matmul; the float vectors are touched ONLY for |queries| * k *
    rescore_factor candidate rows — a broadcast equi-join on id against the
    source table. Partition pruning on ``centroid_id`` applies exactly as in
    ``ivf_query_index``. All arithmetic is integer until the rescore, so the
    candidate set is bit-deterministic."""
    import pandas as pd

    cent_pdf = (
        spark.read.parquet(f"{path}/centroids").orderBy("centroid_id").toPandas()
    )
    centroids = np.stack(cent_pdf["centroid"].to_numpy())
    q = _ivf_assign(
        queries, centroids, id_col=query_id, vec_col=query_vec, nprobe=nprobe,
        emit_code=True, emit_vec=False,
    ).select(
        F.col("_id").alias("q_id"),
        F.col("_code").alias("q_code"),
        "centroid_id",
    )
    lists = spark.read.parquet(f"{path}/lists")
    if nprobe < centroids.shape[0]:
        # partition-pruned probe: collect the probed list ids (tiny — at most
        # |queries| * nprobe values) and push them into the partition filter
        probed = sorted(
            {r.centroid_id for r in q.select("centroid_id").distinct().collect()}
        )
        lists = lists.filter(F.col("centroid_id").isin(probed))
    # else full probe: every list is read — skip the extra distinct+collect
    # job (and the Python-stage recomputation of the query assignment it
    # would trigger; `q` is not cached because at scale it is a stream of
    # query batches, not a reusable table)
    joined = (
        F.broadcast(q)
        .join(
            lists.select(F.col(corpus_id).alias("n_id"), "code", "centroid_id"),
            on="centroid_id",
        )
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", "q_code", "code")
    )

    def int_score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            a = np.stack(pdf["q_code"].to_numpy()).astype(np.int32)
            b = np.stack(pdf["code"].to_numpy()).astype(np.int32)
            yield pd.DataFrame(
                {
                    "q_id": pdf["q_id"].to_numpy(),
                    "n_id": pdf["n_id"].to_numpy(),
                    "_approx": (a * b).sum(axis=1).astype(np.int64),
                }
            )

    scored = joined.mapInPandas(int_score, "q_id long, n_id long, _approx long")
    wa = Window.partitionBy("q_id").orderBy(F.col("_approx").desc(), F.col("n_id").asc())
    cand = (
        scored.withColumn("_arank", F.row_number().over(wa))
        .filter(F.col("_arank") <= k * rescore_factor)
        .select("q_id", "n_id")
    )
    # exact rescore: candidates are tiny -> broadcast them into the source
    # join; queries are small -> broadcast them too
    c_float = corpus.select(
        F.col(corpus_id).alias("n_id"), _as_double(F.col(corpus_vec)).alias("n_vec")
    )
    q_float = queries.select(
        F.col(query_id).alias("q_id"), _as_double(F.col(query_vec)).alias("q_vec")
    )
    rescored = (
        F.broadcast(cand)
        .join(c_float, on="n_id")
        .join(F.broadcast(q_float), on="q_id")
        .select("q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("_cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_cos").desc(), F.col("n_id").asc())
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "n_id",
            F.col("rank").cast("int").alias("rank"),
            (F.round(F.col("_cos"), scale) if scale else F.col("_cos")).alias("cosine"),
        )
    )


def ivf_query_index(
    spark,
    path: str,
    queries: DataFrame,
    *,
    k: int = 5,
    nprobe: int = 4,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    scale: Optional[int] = 6,
) -> DataFrame:
    """Top-k against a persisted IVF index, reading ONLY the probed lists.

    The probed centroid ids are computed driver-side from the (small) query
    set, then pushed as a partition filter — Catalyst prunes the unprobed
    ``centroid_id=*`` directories at planning time, so scan volume is
    ~nprobe/n_centroids of the index regardless of corpus size."""
    import pandas as pd

    cent_pdf = (
        spark.read.parquet(f"{path}/centroids").orderBy("centroid_id").toPandas()
    )
    centroids = np.stack(cent_pdf["centroid"].to_numpy())
    q = _ivf_assign(queries, centroids, id_col=query_id, vec_col=query_vec, nprobe=nprobe)
    q = q.select(
        F.col("_id").alias("q_id"), F.col("_vec").alias("q_vec"), "centroid_id"
    )
    lists = spark.read.parquet(f"{path}/lists")
    if nprobe < centroids.shape[0]:
        # see ivf_query_index_quantized: prune only on partial probe
        probed = sorted(
            {r.centroid_id for r in q.select("centroid_id").distinct().collect()}
        )
        lists = lists.filter(F.col("centroid_id").isin(probed))
    c = lists.select(
        F.col(corpus_id).alias("n_id"),
        F.col(corpus_vec).alias("n_vec"),
        "centroid_id",
    )
    scored = (
        F.broadcast(q)
        .join(c, on="centroid_id")
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


def _read_centroids(spark, path: str) -> np.ndarray:
    pdf = spark.read.parquet(f"{path}/centroids").orderBy("centroid_id").toPandas()
    return np.stack(pdf["centroid"].to_numpy())


def ivf_index_append(
    spark,
    path: str,
    df: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    quantized: bool = False,
) -> None:
    """Incrementally add vectors to a persisted IVF index (float or int8
    lists): assign each new vector to its nearest EXISTING centroid and
    append to that list's partition. The quantizer is frozen — centroids
    are never retrained on append, so earlier assignments (and any cached
    probe results) stay valid; recall for the appended vectors matches
    what a full rebuild with the same centroids would give. Rebuild (a
    fresh ``ivf_write_index*``) when drift between the centroids and the
    grown corpus warrants it — standard IVF maintenance (FAISS add()
    semantics).

    Cost shape: one broadcast-matmul assignment pass over the NEW batch +
    an append-mode partitioned write touching only the batch's lists;
    the existing index is never read or rewritten."""
    from dc43_spark.functions.embedding_index import _check_batch_dim

    centroids = _read_centroids(spark, path)
    dim = centroids.shape[1]
    # whole-batch guard (r6 advice): mixed-dim or NULL vectors must raise a
    # clear ValueError up front, not an opaque numpy shape error mid-assign.
    if not _check_batch_dim(df, corpus_vec, dim):
        return
    assigned = _ivf_assign(
        df, centroids, id_col=corpus_id, vec_col=corpus_vec, nprobe=1,
        emit_code=quantized, emit_vec=not quantized,
    )
    if quantized:
        out = assigned.select(
            F.col("_id").alias(corpus_id), F.col("_code").alias("code"), "centroid_id"
        )
    else:
        out = assigned.select(
            F.col("_id").alias(corpus_id),
            F.col("_vec").alias(corpus_vec),
            "centroid_id",
        )
    out.repartition("centroid_id").write.mode("append").partitionBy(
        "centroid_id"
    ).parquet(f"{path}/lists")


# --------------------------------------------------------------- product
# quantization (Jegou et al. 2011, "Product Quantization for Nearest
# Neighbor Search" — the FAISS IndexPQ scheme, public)


def train_pq(
    corpus: DataFrame,
    *,
    m: int = 8,
    n_codes: int = 256,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    train_limit: int = 4096,
    iters: int = 10,
    seed: int = 42,
    sample: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Train PQ codebooks: split the (L2-normalised) vector into ``m``
    subspaces and k-means each independently -> (m, n_codes, dim/m).

    Same scale contract as ``ivf_centroids``: the training sample is a
    deterministic TakeOrdered slice pulled to the driver via Arrow (see
    ``train_sample``; pass ``sample=`` to reuse an already-pulled one),
    and Lloyd runs in NumPy — the codebooks are tiny (m * n_codes * dim/m
    floats, ~128 KB at dim=64/m=8/256 codes) and broadcast everywhere
    they are used. Deterministic given (corpus, seed): seeded init,
    fixed iteration count, empty clusters re-seeded from a cursor."""
    x = (
        sample
        if sample is not None
        else train_sample(
            corpus,
            corpus_id=corpus_id,
            corpus_vec=corpus_vec,
            train_limit=train_limit,
        )
    )
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    k = min(n_codes, n)
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        xj = x[:, j * dsub : (j + 1) * dsub]
        cent = xj[rng.choice(n, size=k, replace=False)].copy()
        respawn = 0
        for _ in range(iters):
            # plain L2 Lloyd per subspace (subvectors are NOT unit-norm);
            # argmin ||x-c||^2 == argmin (||c||^2 - 2 x.c) — the same BLAS
            # form the encode kernel uses, instead of materialising the
            # (n, k, dsub) broadcast-difference cube per iteration
            d2 = (cent**2).sum(axis=1)[None, :] - 2.0 * (xj @ cent.T)
            assign = np.argmin(d2, axis=1)
            # group members once via a stable sort instead of k boolean
            # masks over the sample; each cluster's mean sees the same
            # members in the same ascending row order, so the update is
            # arithmetic-identical to the masked form
            order = np.argsort(assign, kind="stable")
            bounds = np.searchsorted(assign[order], np.arange(k + 1))
            for c in range(k):
                lo, hi = bounds[c], bounds[c + 1]
                if lo == hi:
                    cent[c] = xj[respawn % n]
                    respawn += 1
                else:
                    cent[c] = xj[order[lo:hi]].mean(axis=0)
        books[j] = cent
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code array<smallint>): each vector L2-normalised, each
    subvector snapped to its nearest codebook entry (L2). 8 bytes +
    m*2 bytes per vector instead of dim*8 — at dim=64/m=8 a 16x corpus
    compression, which is what lets a 100 TB embedding table's search
    working set fit a cluster's memory. Arrow-batched NumPy, narrow
    (shuffle-free) map."""
    import pandas as pd

    m, k, dsub = codebooks.shape
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(codebooks)

    src = df.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_vec"))

    def encode(batches):
        books = bc.value
        # ||c||^2 per subspace, precomputed once per executor batch-iter
        cnorm = (books**2).sum(axis=2)  # (m, k)
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            if mat.shape[1] != m * dsub:
                raise ValueError(
                    f"vector dim {mat.shape[1]} != codebook dim {m * dsub}"
                )
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            codes = np.empty((mat.shape[0], m), dtype=np.int16)
            for j in range(m):
                xj = mat[:, j * dsub : (j + 1) * dsub]
                # argmin ||x - c||^2 == argmin (||c||^2 - 2 x.c)
                scores = cnorm[j][None, :] - 2.0 * (xj @ books[j].T)
                codes[:, j] = np.argmin(scores, axis=1).astype(np.int16)
            obj = np.empty(codes.shape[0], dtype=object)
            for i in range(codes.shape[0]):
                obj[i] = codes[i]
            yield pd.DataFrame({"_id": pdf["_id"].to_numpy(), "_code": obj})

    return src.mapInPandas(encode, "_id long, _code array<smallint>").select(
        F.col("_id").alias(id_col), F.col("_code").alias("code")
    )


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: np.ndarray,
    *,
    k: int = 5,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus: Optional[DataFrame] = None,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    rescore_factor: int = 0,
    scale: Optional[int] = 6,
    probe_lists: Optional[dict] = None,
) -> DataFrame:
    """Approximate cosine top-k over PQ codes via ADC (asymmetric
    distance computation): per query, an (m x n_codes) table of
    subspace dot products is precomputed once driver-side and broadcast;
    each corpus CODE row then scores with m table lookups + a sum —
    never touching a float vector. The scan reads 2m bytes per row
    instead of 8*dim; local per-batch top-k bounds the shuffle exactly
    like ``cosine_topk_matmul``.

    ``rescore_factor`` > 0 re-ranks the top ``k*rescore_factor`` ADC
    candidates with EXACT cosine against ``corpus`` (required then) —
    the standard PQ serving recipe: cheap coarse pass over codes, exact
    pass over a candidate set that is k*factor rows per query, not the
    corpus."""
    import pandas as pd

    m, n_codes_, dsub = codebooks.shape
    q_rows = queries.select(query_id, query_vec).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_mat = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    if q_mat.shape[1] != m * dsub:
        raise ValueError(
            f"query dim {q_mat.shape[1]} != codebook dim {m * dsub}"
        )
    # tables[q, j, c] = q_sub_j . codebook[j, c]  -> ADC dot ~ cosine
    tables = np.einsum(
        "qjd,jcd->qjc", q_mat.reshape(-1, m, dsub), codebooks
    )
    sc = queries.sparkSession.sparkContext
    probes = (
        {int(q): np.array(sorted(v), dtype=np.int64) for q, v in probe_lists.items()}
        if probe_lists is not None
        else None
    )
    bq = sc.broadcast((q_ids, tables, probes))
    take = k * rescore_factor if rescore_factor else k

    def score(batches):
        ids, tabs, prb = bq.value
        arange_m = np.arange(m)
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf["_nid"].to_numpy(dtype=np.int64)
            cmat = np.stack(pdf["_code"].to_numpy()).astype(np.int64)  # (B, m)
            c_lists = (
                pdf["_list"].to_numpy(dtype=np.int64) if prb is not None else None
            )
            sims = np.empty((cmat.shape[0], len(ids)), dtype=np.float64)
            for qi in range(len(ids)):
                sims[:, qi] = tabs[qi][arange_m[None, :], cmat].sum(axis=1)
                if prb is not None:
                    # IVF-PQ per-query list restriction: a row outside
                    # THIS query's probed lists never becomes a candidate
                    mask = np.isin(c_lists, prb.get(int(ids[qi]), c_lists[:0]))
                    sims[~mask, qi] = -np.inf
            top = min(take + 1, sims.shape[0])
            key_ids = np.broadcast_to(c_ids[:, None], sims.shape)
            idx = np.lexsort((key_ids, -sims), axis=0)[:top]
            yield pd.DataFrame(
                {
                    "q_id": np.repeat(ids, top),
                    "n_id": c_ids[idx].T.ravel(),
                    "_adc": np.take_along_axis(sims, idx, axis=0).T.ravel(),
                }
            )

    sel = [F.col(corpus_id).alias("_nid"), F.col("code").alias("_code")]
    if probe_lists is not None:
        sel.append(F.col("centroid_id").alias("_list"))
    c = codes.select(*sel)
    scored = (
        c.mapInPandas(score, "q_id long, n_id long, _adc double")
        .filter(F.col("q_id") != F.col("n_id"))
        .filter(F.col("_adc") != float("-inf"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_adc").desc(), F.col("n_id").asc())
    coarse = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= take)
    )
    if not rescore_factor:
        return coarse.select(
            "q_id",
            "n_id",
            F.col("rank").cast("int").alias("rank"),
            (F.round(F.col("_adc"), scale) if scale else F.col("_adc")).alias("score"),
        )
    if corpus is None:
        raise ValueError("rescore_factor > 0 needs corpus= for exact rescoring")
    cand = coarse.select("q_id", "n_id")
    cvec = corpus.select(
        F.col(corpus_id).alias("n_id"), _as_double(F.col(corpus_vec)).alias("_nvec")
    )
    qvec = queries.select(
        F.col(query_id).alias("q_id"), _as_double(F.col(query_vec)).alias("_qvec")
    )
    exact = (
        cand.join(F.broadcast(qvec), "q_id")
        .join(cvec, "n_id")
        .select("q_id", "n_id", cosine(F.col("_qvec"), F.col("_nvec")).alias("_cos"))
    )
    w2 = Window.partitionBy("q_id").orderBy(F.col("_cos").desc(), F.col("n_id").asc())
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "n_id",
            F.col("rank").cast("int").alias("rank"),
            (F.round(F.col("_cos"), scale) if scale else F.col("_cos")).alias("score"),
        )
    )


# ---------------- IVF-PQ (FAISS IndexIVFPQ composition, public scheme)


def _ivfpq_encode(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    *,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, centroid_id, code) in ONE Arrow pass: coarse assignment
    against the broadcast centroid matrix + PQ encoding against the
    broadcast codebooks — the build side of IVF-PQ, narrow
    (shuffle-free). Codes are of the NORMALISED vector (not the
    residual): the plain-PQ codebooks stay reusable and `pq_topk`'s ADC
    tables apply verbatim; the tests measure what the simplification
    costs in recall."""
    import pandas as pd

    m, _k, dsub = codebooks.shape
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((centroids, codebooks))
    src = df.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_vec"))

    def enc(batches):
        cent, books = bc.value
        cnorm = (books**2).sum(axis=2)  # (m, k)
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            if mat.shape[1] != m * dsub:
                raise ValueError(
                    f"vector dim {mat.shape[1]} != codebook dim {m * dsub}"
                )
            normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            lists = np.argmax(normed @ cent.T, axis=1).astype(np.int64)
            codes = np.empty((mat.shape[0], m), dtype=np.int16)
            for j in range(m):
                xj = normed[:, j * dsub : (j + 1) * dsub]
                scores = cnorm[j][None, :] - 2.0 * (xj @ books[j].T)
                codes[:, j] = np.argmin(scores, axis=1).astype(np.int16)
            obj = np.empty(codes.shape[0], dtype=object)
            for i in range(codes.shape[0]):
                obj[i] = codes[i]
            yield pd.DataFrame(
                {"_id": pdf["_id"].to_numpy(), "centroid_id": lists, "_code": obj}
            )

    return src.mapInPandas(enc, "_id long, centroid_id long, _code array<smallint>")


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    n_codes: int = 256,
    seed: int = 42,
    rescore_factor: int = 4,
    train_limit: int = 4096,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    scale: Optional[int] = 6,
) -> DataFrame:
    """FAISS's IndexIVFPQ serving shape: a coarse quantizer prunes the
    corpus to the ``nprobe`` lists nearest each query, ADC scores ONLY
    those lists' 2m-byte codes, and the top ``k * rescore_factor``
    candidates re-rank with exact cosine. The scan cost is
    (probed fraction of corpus) x (2m bytes/row) — at 100 TB both
    factors matter: IVF bounds rows, PQ bounds bytes; the exact pass
    touches k x factor float vectors per query, never the corpus.

    Full probe (nprobe == n_centroids) + rescoring reproduces exact KNN
    whenever k x factor candidates suffice — the oracle the tests pin;
    partial-probe recall is measured, not argued."""
    # ONE training-sample pull feeds both trainers (identical slice —
    # pulling it per-trainer was two top-k jobs over the corpus)
    x = train_sample(
        corpus,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        train_limit=train_limit,
    )
    cent = ivf_centroids(
        corpus,
        n_centroids=n_centroids,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        train_limit=train_limit,
        seed=seed,
        sample=x,
    )
    books = train_pq(
        corpus,
        m=m,
        n_codes=n_codes,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        train_limit=train_limit,
        seed=seed,
        sample=x,
    )
    enc = _ivfpq_encode(
        corpus, cent, books, id_col=corpus_id, vec_col=corpus_vec
    )

    q_rows = queries.select(query_id, query_vec).collect()
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_mat = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    nprobe = min(nprobe, cent.shape[0])
    sims = q_mat @ cent.T
    part = np.argpartition(-sims, nprobe - 1, axis=1)[:, :nprobe]
    probe_map = {
        int(r[0]): {int(c) for c in row} for r, row in zip(q_rows, part)
    }
    probed = sorted({c for row in part for c in row})
    # two-level prune: the SCAN drops every list no query probes (one
    # pass over the union), and the ADC scorer then restricts each
    # query to ITS OWN probed lists (true IndexIVFPQ semantics — with
    # many queries the union alone would cover everything)
    pruned = enc.filter(F.col("centroid_id").isin(probed)).select(
        F.col("_id").alias(corpus_id),
        F.col("_code").alias("code"),
        "centroid_id",
    )
    return pq_topk(
        queries,
        pruned,
        books,
        k=k,
        query_id=query_id,
        query_vec=query_vec,
        corpus=corpus,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        rescore_factor=rescore_factor,
        scale=scale,
        probe_lists=probe_map,
    )
