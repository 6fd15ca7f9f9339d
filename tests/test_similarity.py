from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dc43_spark.functions import similarity as sim


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # close to 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.95, 0.05]),  # close to 3
        (5, [-1.0, 0.0, 0.0]),  # opposite of 1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_exact(vectors):
    out = sim.cosine_topk(vectors, vectors, k=2)
    by_query = {}
    for r in out.collect():
        by_query.setdefault(r["q_id"], []).append((r["rank"], r["n_id"], r["cosine"]))
    top1 = {q: sorted(v)[0][1] for q, v in by_query.items()}
    assert top1[1] == 2 and top1[2] == 1 and top1[3] == 4 and top1[4] == 3
    # opposite vector ranks last, never first
    assert all(len(v) == 2 for v in by_query.values())
    cos_1_2 = dict(((r["q_id"], r["n_id"]), r["cosine"]) for r in out.collect())
    assert cos_1_2[(1, 2)] == pytest.approx(0.9 / (0.9**2 + 0.1**2) ** 0.5, abs=1e-5)


def test_lsh_bucketed_recall(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    # 3 well-separated clusters in 16-dim
    centers = rng.standard_normal((3, 16)) * 10
    rows = []
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, (c + rng.standard_normal(16) * 0.1).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = sim.cosine_topk(df, df, k=3)
    e = {(r["q_id"], r["n_id"]) for r in exact.collect()}
    # single-probe loses neighbours when a cluster straddles a hyperplane
    single = sim.lsh_bucketed_topk(df, df, k=3, n_planes=4, seed=42, multi_probe=0)
    s = {(r["q_id"], r["n_id"]) for r in single.collect()}
    # multi-probe (Hamming-1 buckets) recovers them
    multi = sim.lsh_bucketed_topk(df, df, k=3, n_planes=4, seed=42, multi_probe=1)
    m = {(r["q_id"], r["n_id"]) for r in multi.collect()}
    recall_single = len(e & s) / len(e)
    recall_multi = len(e & m) / len(e)
    assert recall_multi >= recall_single
    assert recall_multi > 0.95


def test_topk_deterministic_tie_break(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = sim.cosine_topk(df, df, k=2).collect()
    ranks = {(r["q_id"], r["rank"]): r["n_id"] for r in out}
    assert ranks[(1, 1)] == 2 and ranks[(1, 2)] == 3  # id ascending on ties


def test_no_python_udfs_in_plan(vectors):
    plan = sim.cosine_topk(vectors, vectors, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan  # queries broadcast


def test_cosine_topk_matmul_matches_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from dc43_spark.functions import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = sim.cosine_topk(queries, emb, k=3, scale=None)
    fast = sim.cosine_topk_matmul(queries, emb, k=3, scale=None)
    e = {(r.q_id, r.rank): (r.n_id, r.cosine) for r in exact.collect()}
    f = {(r.q_id, r.rank): (r.n_id, r.cosine) for r in fast.collect()}
    assert e.keys() == f.keys()
    for key, (nid, cos) in e.items():
        assert f[key][0] == nid
        assert abs(f[key][1] - cos) < 1e-9


def test_cosine_topk_matmul_tie_safe_local_pruning(spark):
    """Many identical corpus vectors tie at cosine 1.0 inside ONE Arrow
    batch; local pruning must keep the smallest n_ids — the set the global
    (cosine desc, n_id asc) window selects — not an argpartition-arbitrary
    subset (r5 advice)."""
    n = 40  # single partition -> single Arrow batch holds every tie
    corpus = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(n)], "vec_id long, embedding array<double>"
    ).coalesce(1)
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = sim.cosine_topk_matmul(queries, corpus, k=3, scale=None).collect()
    got = {(r.rank): r.n_id for r in out}
    assert got == {1: 1, 2: 2, 3: 3}  # q_id 0 excluded, then smallest ids win


def test_plane_literal_bit_identical_to_per_element_lits(spark):
    """The parsed array literal (`_plane_literal`, an r14 build-time
    optimization) must carry EXACTLY the doubles the per-element
    ``F.array(F.lit(x), ...)`` form carried — bucket ids are oracle-pinned,
    so one flipped low bit in a plane coordinate flips sign bits near zero
    and changes which pairs the LSH gates score. Pins the bucket column
    end-to-end against an inline legacy construction, incl. exotic values
    through the fallback path."""
    import numpy as np

    from dc43_spark.functions import similarity as sim

    rng = np.random.default_rng(20260817)
    planes = (rng.standard_normal((6, 16)) * 10.0 ** rng.integers(
        -8, 9, size=(6, 16)
    )).tolist()

    def legacy_bucket(vec, planes):
        out = F.lit(0).cast("long")
        for i, plane in enumerate(planes):
            p = F.array(*[F.lit(float(x)) for x in plane])
            bit = (sim.dot(vec, p) > 0).cast("long")
            out = out + F.shiftleft(bit, i)
        return out

    df = spark.range(500).select(
        F.col("id").alias("vid"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: F.sin(F.col("id") * 131 + i * 17),
        ).alias("vec"),
    )
    got = df.select(
        sim.bucket_id(F.col("vec"), planes).alias("new"),
        legacy_bucket(F.col("vec"), planes).alias("old"),
    ).filter(F.col("new") != F.col("old"))
    assert got.count() == 0

    # fallback: a non-finite coordinate routes through the per-element form
    weird = [[float("inf"), 1.0], [0.5, -0.25]]
    vals = df.limit(3).select(
        sim.bucket_id(F.array(F.lit(1.0), F.lit(1.0)), weird).alias("new"),
        legacy_bucket(F.array(F.lit(1.0), F.lit(1.0)), weird).alias("old"),
    ).collect()
    assert all(r["new"] == r["old"] for r in vals)
