"""int8-quantized IVF: index layout, exactness under full probe + rescore,
and partial-probe recall vs the float path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dc43_spark.functions.similarity import (
    cosine_topk,
    ivf_query_index_quantized,
    ivf_write_index_quantized,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def quant_index(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf_q"))
    ivf_write_index_quantized(emb, path, n_centroids=16, seed=42)
    return path


def _pairs(df):
    return {(r.q_id, r.n_id, r.rank) for r in df.collect()}


def test_index_stores_codes_not_floats(spark, quant_index):
    lists = spark.read.parquet(f"{quant_index}/lists")
    types = dict(lists.dtypes)
    assert types["code"] == "array<tinyint>"  # 8x smaller than array<double>
    assert not any(t.startswith("array<double>") for c, t in types.items() if c != "code")
    # every corpus row lands in exactly one list
    assert lists.count() == spark.read.parquet(f"{quant_index}/lists").select("vec_id").distinct().count()


def test_full_probe_with_rescore_matches_exact(spark, emb, quant_index):
    """Full probe + generous rescore must reproduce the exact float top-k:
    the int8 coarse ranking only needs the true top-5 inside its top-40."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(queries, emb, k=5)
    quant = ivf_query_index_quantized(
        spark, quant_index, queries, emb, k=5, nprobe=16, rescore_factor=8
    )
    assert _pairs(quant) == _pairs(exact)


def test_partial_probe_recall(spark, emb, quant_index):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {(r.q_id, r.n_id) for r in cosine_topk(queries, emb, k=5).collect()}
    quant = ivf_query_index_quantized(
        spark, quant_index, queries, emb, k=5, nprobe=4, rescore_factor=8
    )
    got = {(r.q_id, r.n_id) for r in quant.collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, f"partial-probe recall {recall:.2f}"
    # rescoring is exact: every returned cosine equals the float cosine
    exact_all = {
        (r.q_id, r.n_id): r.cosine
        for r in cosine_topk(queries, emb, k=500, scale=6).collect()
    }
    for r in quant.collect():
        if (r.q_id, r.n_id) in exact_all:
            assert abs(r.cosine - exact_all[(r.q_id, r.n_id)]) < 1e-9
