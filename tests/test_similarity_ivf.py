from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dc43_spark.functions.similarity import (
    cosine_topk,
    ivf_centroids,
    ivf_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_centroids_deterministic_and_normalised(emb):
    c1 = ivf_centroids(emb, n_centroids=8, seed=7)
    c2 = ivf_centroids(emb, n_centroids=8, seed=7)
    assert np.array_equal(c1, c2)
    assert c1.shape == (8, 64)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
    # a different seed trains a different quantizer
    assert not np.array_equal(c1, ivf_centroids(emb, n_centroids=8, seed=8))


def test_full_probe_equals_exact(emb):
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.q_id, r.rank): (r.n_id, r.cosine)
        for r in cosine_topk(queries, emb, k=3).collect()
    }
    full = {
        (r.q_id, r.rank): (r.n_id, r.cosine)
        for r in ivf_topk(queries, emb, k=3, n_centroids=8, nprobe=8).collect()
    }
    assert full == exact


def test_partial_probe_recall(emb):
    """nprobe=4 of 16 lists: each query scores ~1/4 of the corpus, yet keeps
    most true neighbours — the quantizer routes them into the probed lists."""
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(queries, emb, k=5).collect()
    approx = ivf_topk(queries, emb, k=5, n_centroids=16, nprobe=4).collect()
    truth = {(r.q_id, r.n_id) for r in exact}
    got = {(r.q_id, r.n_id) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"recall@5 {recall:.2f}"
    # every approximate hit that IS a true neighbour carries the exact cosine
    exact_cos = {(r.q_id, r.n_id): r.cosine for r in exact}
    for r in approx:
        if (r.q_id, r.n_id) in exact_cos:
            assert r.cosine == exact_cos[(r.q_id, r.n_id)]


def test_partial_probe_scores_fewer_pairs(emb):
    """The point of IVF: candidate volume scales with nprobe/n_centroids."""
    queries = emb.filter(F.col("vec_id") < 10)
    cents = ivf_centroids(emb, n_centroids=16)
    from dc43_spark.functions.similarity import _ivf_assign

    corpus_lists = _ivf_assign(emb, cents, id_col="vec_id", vec_col="embedding", nprobe=1)
    probed = _ivf_assign(queries, cents, id_col="vec_id", vec_col="embedding", nprobe=4)
    n_candidates = probed.join(corpus_lists.withColumnRenamed("_id", "n"), on="centroid_id").count()
    n_total = queries.count() * emb.count()
    assert n_candidates < 0.6 * n_total
