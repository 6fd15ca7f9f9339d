"""Distributed k-means + cluster-balanced sampling (functions/clustering.py).

Correctness model: a pure-NumPy Lloyd twin running the same algebra
(same init, same assignment tie-breaks, same empty-cluster rule) — the
established pattern for the LR / BPE / DSIR trainers. Exactness is
tolerance-checked (1e-8): Spark sums partials in task order, NumPy in
row order, so float associativity is the only allowed difference; the
fixtures use well-separated blobs so assignments can never flip on it.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dc43_spark.functions.clustering import (
    assign_clusters,
    cluster_balanced_sample,
    kmeans_fit,
    seeded_centroids,
)


def _numpy_lloyd(x, cent, iters, spherical):
    cent = cent.astype(np.float64).copy()
    k = cent.shape[0]
    for _ in range(iters):
        if spherical:
            pts = x / np.linalg.norm(x, axis=1, keepdims=True)
            idx = np.argmax(pts @ cent.T, axis=1)
        else:
            pts = x
            d2 = (
                (x * x).sum(1, keepdims=True)
                - 2 * (x @ cent.T)
                + (cent * cent).sum(1)[None, :]
            )
            idx = np.argmin(d2, axis=1)
        new = cent.copy()
        for j in range(k):
            members = pts[idx == j]
            if len(members) == 0:
                continue  # empty cluster keeps its previous centroid
            s = members.sum(axis=0)
            new[j] = s / np.linalg.norm(s) if spherical else s / len(members)
        cent = new
    return cent


def _blobs(seed=7, n_per=40, dim=8, k=3, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dim)) * 3.0
    pts = np.concatenate(
        [centers[j] + spread * rng.standard_normal((n_per, dim)) for j in range(k)]
    )
    return pts


def _df(spark, x):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )


@pytest.mark.parametrize("spherical", [True, False])
def test_kmeans_matches_numpy_twin(spark, spherical):
    x = _blobs()
    df = _df(spark, x).repartition(5)
    init = x[[0, 40, 80]]  # one seed point per blob
    got = kmeans_fit(
        df, 3, iters=4, spherical=spherical, init_centroids=init
    )
    want = _numpy_lloyd(
        x, init / np.linalg.norm(init, axis=1, keepdims=True) if spherical else init,
        4, spherical,
    )
    assert np.allclose(got, want, atol=1e-8)
    # and the resulting assignment recovers the three blobs exactly
    a = assign_clusters(df, got, spherical=spherical).collect()
    by_blob = {}
    for r in a:
        by_blob.setdefault(r.vec_id // 40, set()).add(r.cluster_id)
    assert all(len(v) == 1 for v in by_blob.values())
    assert len({next(iter(v)) for v in by_blob.values()}) == 3


def test_kmeans_hash_init_is_deterministic(spark):
    x = _blobs(seed=11)
    df = _df(spark, x).repartition(7)
    a = kmeans_fit(df, 3, iters=2, seed=5)
    b = kmeans_fit(df, 3, iters=2, seed=5)
    assert np.array_equal(a, b)
    c = kmeans_fit(df, 3, iters=2, seed=6)  # different seed, different init
    assert not np.allclose(a, c)


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # two identical points, k=2 with one init centroid FAR away: the far
    # cluster never wins a point and must survive untouched (no NaN)
    x = np.array([[1.0, 0.0], [1.0, 0.0]])
    init = np.array([[1.0, 0.0], [0.0, 1.0]])
    df = _df(spark, x)
    got = kmeans_fit(df, 2, iters=3, spherical=True, init_centroids=init)
    assert np.allclose(got[0], [1.0, 0.0])
    assert np.allclose(got[1], [0.0, 1.0])
    assert not np.isnan(got).any()


def test_kmeans_k_exceeding_corpus_raises(spark):
    df = _df(spark, np.eye(3))
    with pytest.raises(ValueError, match="exceeds the corpus"):
        kmeans_fit(df, 5, iters=1)


def test_assign_clusters_is_shuffle_free(spark):
    df = _df(spark, _blobs())
    cent = seeded_centroids(8, 4, seed=1)
    plan = assign_clusters(df, cent)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_cluster_balanced_sample_counts_and_order(spark):
    x = _blobs(seed=3, n_per=50)
    df = _df(spark, x)
    cent = kmeans_fit(df, 3, iters=3, init_centroids=x[[0, 50, 100]])

    rep = cluster_balanced_sample(
        df, cent, n_per_cluster=5, by="representative", join_back=False
    ).collect()
    per = {}
    for r in rep:
        per.setdefault(r.cluster_id, []).append(r)
    assert set(len(v) for v in per.values()) == {5}
    # representative = the 5 highest cosines of the cluster, rank-ordered
    a = {
        (r.vec_id, r.cluster_id): r.score
        for r in assign_clusters(df, cent).collect()
    }
    for cid, rows in per.items():
        got_ids = [r.vec_id for r in sorted(rows, key=lambda r: r.rank)]
        member = sorted(
            ((s, i) for (i, c), s in a.items() if c == cid),
            key=lambda t: (-t[0], t[1]),
        )
        assert got_ids == [i for _, i in member[:5]]

    # hash mode: deterministic and distinct from representative order
    h1 = cluster_balanced_sample(
        df, cent, n_per_cluster=5, by="hash", seed=9, join_back=False
    ).collect()
    h2 = cluster_balanced_sample(
        df, cent, n_per_cluster=5, by="hash", seed=9, join_back=False
    ).collect()
    assert {(r.vec_id, r.rank) for r in h1} == {(r.vec_id, r.rank) for r in h2}

    with pytest.raises(ValueError, match="hash|representative"):
        cluster_balanced_sample(df, cent, n_per_cluster=5, by="nope")


def test_cluster_balanced_sample_join_back_keeps_columns(spark):
    x = _blobs(seed=5)
    df = _df(spark, x).withColumn("extra", F.col("vec_id") * 2)
    cent = seeded_centroids(8, 4, seed=2)
    out = cluster_balanced_sample(df, cent, n_per_cluster=3)
    rows = out.collect()
    assert {"vec_id", "embedding", "extra", "cluster_id", "rank", "score"} <= set(
        out.columns
    )
    assert all(r.extra == r.vec_id * 2 for r in rows)
    assert len(rows) <= 4 * 3
    # ONE shuffle total: the row_number window (the pick-list join is a
    # broadcast, the assignment map is narrow)
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]  # AQE prints the pre-plan too
    )
    assert plan.count("Exchange hashpartitioning") == 1  # the window only
    # map-side top-n: the rank filter is pushed below the shuffle
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
