"""Persisted embedding near-dup index (functions/embedding_index.py):
build -> probe -> append lifecycle, batch-mode agreement with
curation.embedding_near_dups, and the partition-pruned probe plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dc43_spark.functions import embedding_index as ei


@pytest.fixture()
def corpus(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter("vec_id < 300")
        .select("vec_id", "embedding")
    )


def _py_cosine(a, b) -> float:
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_probe_finds_exact_and_near_copies(spark, corpus, tmp_path):
    idx = str(tmp_path / "ei")
    ei.embedding_index_write(corpus, idx)

    rows = corpus.orderBy("vec_id").limit(3).collect()
    dim = len(rows[0].embedding)
    rng = np.random.default_rng(7)
    # copy (cosine 1.0, identical bucket -> always found), a tiny jitter
    # (cosine ~0.999+), and a random vector (unrelated)
    jitter = (np.asarray(rows[1].embedding) + rng.normal(0, 1e-3, dim)).tolist()
    randvec = rng.standard_normal(dim).tolist()
    batch = spark.createDataFrame(
        [
            (90_001, [float(x) for x in rows[0].embedding]),
            (90_002, [float(x) for x in jitter]),
            (90_003, [float(x) for x in randvec]),
        ],
        "vec_id long, embedding array<double>",
    )
    hits = {(r.vec_id, r.dup_of): r.cosine for r in
            ei.embedding_index_probe(spark, idx, batch, threshold=0.98).collect()}
    assert hits.get((90_001, rows[0].vec_id)) == 1.0
    assert (90_002, rows[1].vec_id) in hits
    assert not any(v == 90_003 for v, _ in hits)
    # reported cosines match an independent numpy computation
    by_id = {r.vec_id: r.embedding for r in corpus.collect()}
    batch_vecs = {r.vec_id: r.embedding for r in batch.collect()}
    for (new_id, dup_of), c in hits.items():
        assert c == pytest.approx(
            _py_cosine(batch_vecs[new_id], by_id[dup_of]), abs=2e-6
        )


def test_self_probe_agrees_with_batch_semdedup(spark, corpus, tmp_path):
    """Index the corpus, probe the corpus: reducing the probe's pair set
    the way embedding_near_dups reduces (q > n, min dup_of) must
    reproduce its output exactly — same planes, same buckets, same
    cosine rounding."""
    from dc43_spark.functions.curation import embedding_near_dups

    # plant near-dups: jittered copies of 10 corpus vectors under higher
    # ids, so the agreement below is about a NON-EMPTY pair set (the raw
    # sf0.001 slice has no >=0.9 cosine pairs of its own)
    rng = np.random.default_rng(5)
    planted = [
        (int(r.vec_id) + 100_000,
         [float(x) for x in (np.asarray(r.embedding) + rng.normal(0, 2e-3, len(r.embedding)))])
        for r in corpus.orderBy("vec_id").limit(10).collect()
    ]
    corpus = corpus.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).union(spark.createDataFrame(planted, "vec_id long, embedding array<double>"))

    idx = str(tmp_path / "ei")
    ei.embedding_index_write(corpus, idx, n_planes=8, seed=42)
    hits = ei.embedding_index_probe(spark, idx, corpus, threshold=0.9, multi_probe=1)
    got = (
        hits.filter(F.col("vec_id") > F.col("dup_of"))
        .groupBy("vec_id")
        .agg(F.min("dup_of").alias("dup_of"), F.min_by("cosine", "dup_of").alias("cosine"))
    )
    want = embedding_near_dups(
        corpus, threshold=0.9, n_planes=8, seed=42, multi_probe=1
    ).select("vec_id", "dup_of", "cosine")
    got_rows = sorted(map(tuple, got.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows and got_rows  # non-trivial agreement


def test_append_extends_horizon_and_dim_guard(spark, corpus, tmp_path):
    idx = str(tmp_path / "ei")
    ei.embedding_index_write(corpus, idx)
    dim = len(corpus.first().embedding)
    rng = np.random.default_rng(11)
    fresh = [float(x) for x in rng.standard_normal(dim)]
    b1 = spark.createDataFrame([(70_001, fresh)], "vec_id long, embedding array<double>")
    kept = ei.dedup_batch_against_embedding_index(
        spark, idx, b1, threshold=0.95, append_survivors=True
    )
    assert kept.count() == 1
    # replaying the accepted vector is now a duplicate of 70_001
    b2 = spark.createDataFrame([(80_001, fresh)], "vec_id long, embedding array<double>")
    hits = ei.embedding_index_probe(spark, idx, b2, threshold=0.95)
    assert [(r.vec_id, r.dup_of, r.cosine) for r in hits.collect()] == [
        (80_001, 70_001, 1.0)
    ]
    # appending a wrong-dim batch is refused, not silently mis-bucketed
    bad = spark.createDataFrame(
        [(99_001, [0.1] * (dim + 1))], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dim"):
        ei.embedding_index_append(spark, idx, bad)


def test_probe_plan_prunes_partitions_and_broadcasts(spark, corpus, tmp_path):
    from dc43_spark.io.bucketing import plan_string

    idx = str(tmp_path / "ei")
    ei.embedding_index_write(corpus, idx)
    batch = corpus.limit(2)
    df = ei.embedding_index_probe(spark, idx, batch)
    plan = plan_string(df, "formatted")
    # bucket is a partition column: the IN-list must land in
    # PartitionFilters (file-level pruning), and the in-bucket join must
    # broadcast the batch, never sort-merge the index
    assert "PartitionFilters: [bucket" in plan.replace("\n", " ")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_all_duplicate_batch_appends_nothing_and_survives(spark, corpus, tmp_path):
    """An all-duplicates batch has an EMPTY survivor set — the append must
    no-op, not crash on dim inference (r5 review)."""
    idx = str(tmp_path / "ei")
    ei.embedding_index_write(corpus, idx)
    some = corpus.orderBy("vec_id").limit(1).collect()[0]
    batch = spark.createDataFrame(
        [(91_001, [float(x) for x in some.embedding])],
        "vec_id long, embedding array<double>",
    )
    kept = ei.dedup_batch_against_embedding_index(
        spark, idx, batch, threshold=0.99, append_survivors=True
    )
    assert kept.count() == 0


def test_wrong_dim_probe_raises_and_empty_probe_is_empty(spark, corpus, tmp_path):
    idx = str(tmp_path / "ei")
    ei.embedding_index_write(corpus, idx)
    dim = len(corpus.first().embedding)
    bad = spark.createDataFrame(
        [(1, [0.5] * (dim + 3))], "vec_id long, embedding array<double>"
    )
    # a wrong-dim batch must raise, not silently report zero duplicates
    with pytest.raises(ValueError, match="dim"):
        ei.embedding_index_probe(spark, idx, bad)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    hits = ei.embedding_index_probe(spark, idx, empty)
    assert hits.columns == ["vec_id", "dup_of", "cosine"] and hits.count() == 0


def test_mixed_dim_and_null_batches_raise(spark, corpus, tmp_path):
    """The dim guard must validate EVERY row, not just the first (r5
    advice): a batch whose FIRST row is well-formed but whose later rows
    are wrong-dim or NULL must raise — those rows would bucket to NULL and
    silently pass as unique otherwise."""
    idx = str(tmp_path / "ei")
    ei.embedding_index_write(corpus, idx)
    dim = len(corpus.first().embedding)
    good = [0.5] * dim
    mixed = spark.createDataFrame(
        [(1, good), (2, [0.5] * (dim + 2))], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dim"):
        ei.embedding_index_probe(spark, idx, mixed)
    with pytest.raises(ValueError, match="dim"):
        ei.embedding_index_append(spark, idx, mixed)
    nulled = spark.createDataFrame(
        [(1, good), (2, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="NULL"):
        ei.embedding_index_probe(spark, idx, nulled)
    with pytest.raises(ValueError, match="NULL"):
        ei.embedding_index_append(spark, idx, nulled)


def test_streaming_embedding_crawl_dedup(spark, corpus, tmp_path):
    """foreachBatch loop over the embedding index: batch 2's replay of a
    batch-1 survivor is dropped (output-first, append-after ordering)."""
    from dc43_spark.streaming.dedup import dedup_stream_against_embedding_index

    idx = str(tmp_path / "ei")
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    ei.embedding_index_write(corpus, idx)

    dim = len(corpus.first().embedding)
    rng = np.random.default_rng(23)
    indexed_vec = [float(x) for x in corpus.orderBy("vec_id").first().embedding]
    fresh = [float(x) for x in rng.standard_normal(dim)]
    spark.createDataFrame(
        [(40_001, indexed_vec), (40_002, fresh)],
        "vec_id long, embedding array<double>",
    ).coalesce(1).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema("vec_id long, embedding array<double>").parquet(
        str(src / "*")
    )
    q = dedup_stream_against_embedding_index(
        stream, idx, out, ckpt, threshold=0.95, trigger_once=True
    )
    q.awaitTermination(120)
    assert {r.vec_id for r in spark.read.parquet(out).collect()} == {40_002}

    fresh2 = [float(x) for x in rng.standard_normal(dim)]
    spark.createDataFrame(
        [(41_001, fresh), (41_002, fresh2)], "vec_id long, embedding array<double>"
    ).coalesce(1).write.parquet(str(src / "b2"))
    q2 = dedup_stream_against_embedding_index(
        stream, idx, out, ckpt, threshold=0.95, trigger_once=True
    )
    q2.awaitTermination(120)
    assert {r.vec_id for r in spark.read.parquet(out).collect()} == {40_002, 41_002}


def test_probe_scan_bounded_under_20x_index_growth(spark, corpus, tmp_path):
    """The embedding index's SCALE CONTRACT (r5 verdict item 7): probe
    scans are partition-pruned to the batch's (multi-probe) buckets, so a
    ~20x corpus growth must leave the probed PARTITION count identical and
    the probe's scan bytes far below the index's total size — probe cost
    tracks the probed buckets' contents, never the corpus."""
    import numpy as np

    from conftest import executed_metrics, metric_sum

    idx = str(tmp_path / "ei20")
    ei.embedding_index_write(corpus, idx)
    # batch = copies of two indexed vectors: guaranteed hits, so the
    # result is non-empty and AQE's empty-relation propagation cannot
    # replace the executed scans with an EmptyRelation (which would hide
    # their metrics)
    rows = corpus.orderBy("vec_id").limit(2).collect()
    batch = spark.createDataFrame(
        [(90_001, [float(x) for x in rows[0].embedding]),
         (90_002, [float(x) for x in rows[1].embedding])],
        "vec_id long, embedding array<double>",
    )

    def run(tag):
        spark.sparkContext.setJobGroup(tag, tag)
        metrics = executed_metrics(ei.embedding_index_probe(spark, idx, batch))
        spark.sparkContext.setJobGroup("", "")
        jobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup(tag))
        return metrics, jobs

    m1, jobs1 = run("eprobe-small")
    parts_before = metric_sum(m1, "Scan parquet", "numPartitions")
    for wave in range(4):
        grown = corpus.select(
            (F.col("vec_id") + 100_000 * (wave + 1)).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x * (wave + 2) + F.lit(0.001 * wave)
            ).alias("embedding"),
        )
        ei.embedding_index_append(spark, idx, grown)
    m2, jobs2 = run("eprobe-grown")
    parts_after = metric_sum(m2, "Scan parquet", "numPartitions")

    # same batch -> same probed buckets -> identical pruned partition count
    assert parts_after == parts_before and 0 < parts_after <= 2 * 9 * 2
    # probe scan touches a small fraction of the grown index
    import subprocess

    total_bytes = int(
        subprocess.run(
            ["du", "-sb", idx], capture_output=True, text=True
        ).stdout.split()[0]
    )
    scan_after = metric_sum(m2, "Scan parquet", "filesSize")
    assert scan_after < total_bytes * 0.5, (scan_after, total_bytes)
    assert jobs2 <= jobs1 + 1
    assert not any("SortMergeJoin" in m["node"] for m in m2)
