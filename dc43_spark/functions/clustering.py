"""Distributed k-means over embedding columns: corpus clustering,
cluster-balanced sampling, diversity-aware subset selection.

A large-scale curation pipeline clusters its corpus embeddings to
balance domains (sample N docs per cluster instead of whatever the
crawl over-represents), to scope near-dup search (SemDeDup prunes
within clusters), and to pick representative subsets. The reference
engine has no clustering operator; this extends the training-data
toolkit alongside functions/curation.py and functions/similarity.py
(which has a DRIVER-side sampled k-means for IVF coarse quantizers —
``ivf_centroids``; this module is the distributed twin for when the
centroids must reflect the FULL corpus, not a 4k sample).

Scale shape:

- ``kmeans_fit``: Lloyd iterations where the heavy pass is an
  Arrow-batched ``mapInPandas`` matmul against the BROADCAST centroid
  matrix, pre-aggregated per task — each task emits at most k partial
  rows (cluster, count, sum-vector), so the per-round shuffle carries
  O(tasks x k) tiny rows and the driver receives exactly k x (dim+1)
  aggregated cells. Rounds are a fixed, deterministic count.
- ``assign_clusters``: zero-shuffle narrow map (the serving path).
- ``cluster_balanced_sample``: assignment + ONE window shuffle keyed by
  cluster id; k bounds the per-partition state. The optional join back
  to the full rows broadcasts the (k x n)-row pick list.

Everything is deterministic given (data, seed): seeded hash-order init,
fixed iteration count, empty clusters keep their previous centroid.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def seeded_centroids(dim: int, k: int, seed: int = 42) -> np.ndarray:
    """Deterministic random unit centroids (for fixed-codebook assignment
    and the oracle gates, which embed them as SQL literals)."""
    rng = np.random.default_rng(seed)
    cent = rng.standard_normal((k, dim))
    return cent / np.linalg.norm(cent, axis=1, keepdims=True)


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def _batch_assign(mat: np.ndarray, cent: np.ndarray, spherical: bool):
    """(assignments, scores) for one Arrow batch. Spherical: cosine
    argmax (ties -> lowest centroid id, numpy argmax semantics — the
    oracle SQL tie-breaks the same way). Euclidean: squared-distance
    argmin via the expanded form, one matmul either way."""
    if spherical:
        sims = _normalize_rows(mat) @ cent.T
        idx = np.argmax(sims, axis=1)
        return idx, sims[np.arange(len(idx)), idx]
    d2 = (
        (mat * mat).sum(axis=1, keepdims=True)
        - 2.0 * (mat @ cent.T)
        + (cent * cent).sum(axis=1)[None, :]
    )
    idx = np.argmin(d2, axis=1)
    return idx, d2[np.arange(len(idx)), idx]


def kmeans_fit(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 10,
    seed: int = 42,
    spherical: bool = True,
    init_centroids: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Distributed Lloyd's k-means over the FULL corpus; returns the
    (k, dim) float64 centroid matrix.

    Init: the k vectors ranked first by ``xxhash64(id, seed)`` — a
    deterministic pseudo-random sample picked by a top-k
    (TakeOrderedAndProject), never a full sort. Pass ``init_centroids``
    to resume or to pin a known start (the tests' NumPy twin does).

    Each round: broadcast centroids -> per-task partial (cluster, count,
    sum) via one Arrow matmul pass -> tiny groupBy -> k rows to the
    driver. Empty clusters keep their previous centroid (deterministic,
    resume-safe). Spherical k-means (unit sphere, cosine assignment,
    mean re-normalised) when ``spherical``; plain Euclidean otherwise.
    """
    import pandas as pd

    src = df.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_vec")
    )
    if init_centroids is not None:
        cent = np.asarray(init_centroids, dtype=np.float64).copy()
        if cent.shape[0] != k:
            raise ValueError(f"init_centroids has {cent.shape[0]} rows, want k={k}")
    else:
        rows = (
            src.orderBy(F.xxhash64(F.col("_id"), F.lit(seed)), F.col("_id"))
            .limit(k)
            .collect()
        )
        if len(rows) < k:
            raise ValueError(f"k={k} exceeds the corpus size {len(rows)}")
        cent = np.stack([np.asarray(r._vec, dtype=np.float64) for r in rows])
    if spherical:
        cent = _normalize_rows(cent)

    sc = df.sparkSession.sparkContext
    dim = cent.shape[1]
    for _ in range(max(0, iters)):
        bc = sc.broadcast(cent)

        def partials(batches):
            c = bc.value
            sums = np.zeros((k, dim), dtype=np.float64)
            counts = np.zeros(k, dtype=np.int64)
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
                pts = _normalize_rows(mat) if spherical else mat
                idx, _ = _batch_assign(mat, c, spherical)
                np.add.at(sums, idx, pts)
                np.add.at(counts, idx, 1)
            live = np.nonzero(counts)[0]
            if len(live):
                # count rides as element 0 of the payload array, so ONE
                # explode+sum aggregates counts and sums together
                yield pd.DataFrame(
                    {
                        "c": live.astype(np.int64),
                        "p": [
                            np.concatenate(([float(counts[j])], sums[j]))
                            for j in live
                        ],
                    }
                )

        agg = (
            src.mapInPandas(partials, "c long, p array<double>")
            .select("c", F.posexplode("p").alias("pos", "val"))
            .groupBy("c", "pos")
            .agg(F.sum("val").alias("s"))
            .collect()
        )
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.float64)
        for r in agg:
            if r.pos == 0:
                counts[r.c] = r.s
            else:
                sums[r.c, r.pos - 1] = r.s
        new = cent.copy()  # empty clusters keep their previous centroid
        live = counts > 0
        if spherical:
            norms = np.linalg.norm(sums[live], axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            new[live] = sums[live] / norms
        else:
            new[live] = sums[live] / counts[live, None]
        cent = new
        bc.destroy()
    return cent


def assign_clusters(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spherical: bool = True,
    score_col: str = "score",
) -> DataFrame:
    """(id, cluster_id, score) for every row — zero-shuffle narrow map
    (one Arrow matmul per batch against the broadcast centroid matrix).
    ``score`` is the cosine to the chosen centroid (spherical) or the
    squared Euclidean distance (not)."""
    import pandas as pd

    cent = np.asarray(centroids, dtype=np.float64)
    bc = df.sparkSession.sparkContext.broadcast(cent)
    src = df.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_vec")
    )

    def assign(batches):
        c = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            idx, score = _batch_assign(mat, c, spherical)
            yield pd.DataFrame(
                {
                    "_id": pdf["_id"].to_numpy(),
                    "cluster_id": idx.astype(np.int64),
                    score_col: score,
                }
            )

    out_schema = f"_id long, cluster_id long, {score_col} double"
    return src.mapInPandas(assign, out_schema).withColumnRenamed("_id", id_col)


def cluster_balanced_sample(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    n_per_cluster: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    by: str = "hash",
    seed: int = 42,
    spherical: bool = True,
    join_back: bool = True,
) -> DataFrame:
    """Pick ``n_per_cluster`` rows from every cluster — the
    domain-balancing sampler (a crawl over-represents some modes; a
    cluster-balanced subset doesn't).

    ``by='hash'``: uniform-at-random within the cluster, deterministic
    via xxhash64(id, seed) rank. ``by='representative'``: the rows
    closest to the centroid (cosine desc / distance asc, id tie-break).
    One window shuffle keyed by cluster id either way; with
    ``join_back`` the (k x n)-row pick list broadcast-joins back to the
    full-width rows, adding ``cluster_id``/``rank`` columns."""
    if by not in ("hash", "representative"):
        raise ValueError(f"by must be hash|representative, got {by!r}")
    assigned = assign_clusters(
        df, centroids, id_col=id_col, vec_col=vec_col, spherical=spherical
    )
    if by == "hash":
        order = [F.xxhash64(F.col(id_col), F.lit(seed)).asc(), F.col(id_col).asc()]
    elif spherical:
        order = [F.col("score").desc(), F.col(id_col).asc()]
    else:
        order = [F.col("score").asc(), F.col(id_col).asc()]
    w = Window.partitionBy("cluster_id").orderBy(*order)
    picked = (
        assigned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_per_cluster)
        .select(id_col, "cluster_id", "rank", "score")
    )
    if not join_back:
        return picked
    return df.join(F.broadcast(picked), on=id_col, how="inner")
