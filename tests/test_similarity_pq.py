"""Product quantization (Jegou et al. 2011 / FAISS IndexPQ shape):
codebook determinism, encode parity vs a NumPy reference, ADC score
parity, recall vs the exact float path, and the rescore recipe.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dc43_spark.functions.similarity import (
    cosine_topk,
    pq_encode,
    pq_topk,
    train_pq,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def books(emb):
    # near-random synthetic embeddings are the hard case for PQ: use
    # fine subspaces (dsub=4) so pure-ADC ranking stays informative
    return train_pq(emb, m=16, n_codes=256, seed=42)


@pytest.fixture(scope="module")
def codes(emb, books):
    return pq_encode(emb, books).cache()


def _ref_encode(vecs, books):
    m, k, dsub = books.shape
    x = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    out = np.empty((x.shape[0], m), dtype=np.int64)
    for j in range(m):
        xj = x[:, j * dsub : (j + 1) * dsub]
        d2 = ((xj[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        out[:, j] = np.argmin(d2, axis=1)
    return out


def test_codebook_shape_and_determinism(emb):
    b1 = train_pq(emb, m=8, n_codes=64, seed=42)
    b2 = train_pq(emb, m=8, n_codes=64, seed=42)
    assert b1.shape == (8, 64, 8)
    assert np.array_equal(b1, b2)
    b3 = train_pq(emb, m=8, n_codes=64, seed=7)
    assert not np.array_equal(b1, b3)


def test_dim_divisibility_validated(emb):
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(emb, m=7)


def test_encode_matches_numpy_reference(spark, emb, books, codes):
    sample = emb.filter(F.col("vec_id") < 50).orderBy("vec_id").collect()
    vecs = np.array([r["embedding"] for r in sample], dtype=np.float64)
    want = _ref_encode(vecs, books)
    got = {
        r["vec_id"]: list(r["code"])
        for r in codes.filter(F.col("vec_id") < 50).collect()
    }
    for i, r in enumerate(sample):
        assert got[r["vec_id"]] == list(want[i])


def test_adc_scores_match_reference(spark, emb, books, codes):
    """ADC score == sum of subspace table lookups, to float64 exactness."""
    q = emb.filter(F.col("vec_id") == 3)
    got = {
        r["n_id"]: r["score"]
        for r in pq_topk(q, codes, books, k=10, scale=None).collect()
    }
    qv = np.array(q.collect()[0]["embedding"], dtype=np.float64)
    qv = qv / np.linalg.norm(qv)
    m, k, dsub = books.shape
    tables = np.einsum("jd,jcd->jc", qv.reshape(m, dsub), books)
    code_rows = {r["vec_id"]: list(r["code"]) for r in codes.collect()}
    for n_id, score in got.items():
        want = tables[np.arange(m), code_rows[n_id]].sum()
        assert score == pytest.approx(want, abs=1e-12)


def test_recall_vs_exact(spark, emb, books, codes):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r.q_id, r.n_id) for r in cosine_topk(queries, emb, k=5).collect()
    }
    adc = {
        (r.q_id, r.n_id)
        for r in pq_topk(queries, codes, books, k=5).collect()
    }
    recall = len(adc & exact) / len(exact)
    assert recall >= 0.5, f"pure-ADC recall {recall:.2f}"


def test_rescore_recovers_exact_topk(spark, emb, books, codes):
    """The serving recipe: ADC coarse top k*factor + exact rescore must
    reproduce the exact float top-k once the factor is generous."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.q_id, r.n_id, r.rank)
        for r in cosine_topk(queries, emb, k=5).collect()
    }
    got = {
        (r.q_id, r.n_id, r.rank)
        for r in pq_topk(
            queries, codes, books, k=5, corpus=emb, rescore_factor=20
        ).collect()
    }
    assert got == exact


def test_rescore_needs_corpus(spark, emb, books, codes):
    q = emb.filter(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="corpus"):
        pq_topk(q, codes, books, k=3, rescore_factor=4)


def test_codes_are_compact(codes):
    assert dict(codes.dtypes)["code"] == "array<smallint>"
    n = codes.count()
    assert codes.select("vec_id").distinct().count() == n


def _ref_lloyd(x, *, m, n_codes, iters, seed):
    """The pre-r14 masked-Lloyd trainer: O(n*k*dsub) broadcast-difference
    distance cube + one boolean mask per cluster. train_pq replaced both
    with the BLAS distance form and a stable-sort grouping; this reference
    pins that the replacement is ARITHMETIC-IDENTICAL (same members in the
    same order feed the same np.mean), not merely approximately equal."""
    n, dim = x.shape
    dsub = dim // m
    k = min(n_codes, n)
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        xj = x[:, j * dsub : (j + 1) * dsub]
        cent = xj[rng.choice(n, size=k, replace=False)].copy()
        respawn = 0
        for _ in range(iters):
            d2 = ((xj[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = xj[assign == c]
                if len(members) == 0:
                    cent[c] = xj[respawn % n]
                    respawn += 1
                else:
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def test_train_pq_matches_masked_lloyd_reference(emb):
    """Bitwise parity with the masked-Lloyd reference on real data — the
    r14 BLAS/sort rewrite must not move a single float (empty-cluster
    respawn order included: n_codes=512 > sample forces respawns)."""
    sample = emb.orderBy("vec_id").limit(256).collect()
    x = np.array([r["embedding"] for r in sample], dtype=np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    for m, n_codes in ((8, 64), (16, 256), (8, 512)):
        got = train_pq(emb, m=m, n_codes=n_codes, train_limit=256, seed=42)
        want = _ref_lloyd(x, m=m, n_codes=n_codes, iters=10, seed=42)
        assert np.array_equal(got, want), (m, n_codes)
