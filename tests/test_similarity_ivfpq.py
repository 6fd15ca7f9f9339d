"""IVF-PQ (functions/similarity.py::ivfpq_topk): the FAISS IndexIVFPQ
composition — coarse-quantizer list pruning x PQ byte compression, with
exact rescoring. Full probe + rescore must reproduce exact KNN;
partial-probe recall is measured against the exact oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dc43_spark.functions.similarity import cosine_topk, ivfpq_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_full_probe_with_rescore_equals_exact(emb):
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.q_id, r.n_id, r.rank, r.cosine)
        for r in cosine_topk(queries, emb, k=5).collect()
    }
    got = {
        (r.q_id, r.n_id, r.rank, r.score)  # pq_topk names the metric 'score'
        for r in ivfpq_topk(
            queries, emb, k=5, n_centroids=8, nprobe=8, rescore_factor=8
        ).collect()
    }
    assert got == exact


def test_partial_probe_recall_and_scan_bound(emb):
    queries = emb.filter(F.col("vec_id") < 8)
    truth = {(r.q_id, r.n_id) for r in cosine_topk(queries, emb, k=5).collect()}
    got = {
        (r.q_id, r.n_id)
        for r in ivfpq_topk(
            queries, emb, k=5, n_centroids=16, nprobe=4, rescore_factor=8
        ).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"recall@5 {recall:.2f}"
    # the IVF prune is real: the scanned code set is a strict subset
    from dc43_spark.functions.similarity import (
        _ivfpq_encode,
        ivf_centroids,
        train_pq,
    )

    cent = ivf_centroids(emb, n_centroids=16)
    books = train_pq(emb)
    enc = _ivfpq_encode(emb, cent, books, id_col="vec_id", vec_col="embedding")
    per_list = enc.groupBy("centroid_id").count().collect()
    assert len(per_list) > 4  # more lists exist than get probed
    total = sum(r["count"] for r in per_list)
    assert total == emb.count()
