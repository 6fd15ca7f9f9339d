"""End-to-end streaming curation loop (streaming/curation.py): quality
filter -> near-dup probe vs the persisted index -> accept + index append
+ per-batch report, across two micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dc43_spark.functions import dedup_index as di
from dc43_spark.functions.curation import corpus_filter
from dc43_spark.streaming.curation import curate_stream


@pytest.fixture()
def corpus(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 120")
        .select("doc_id", "text")
    )


def test_streaming_curation_two_batches(spark, corpus, tmp_path):
    idx = str(tmp_path / "ndx")
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    rep = str(tmp_path / "report")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    base = corpus.filter("doc_id < 60")
    di.minhash_index_write(base, idx)
    # crawl docs: texts that PASS the quality filter and are NOT indexed
    passing = (
        corpus_filter(corpus.filter("doc_id >= 60"), passthrough=("text",))
        .filter("keep")
        .orderBy("doc_id")
        .limit(2)
        .collect()
    )
    assert len(passing) == 2, "fixture needs two filter-passing docs"
    gibberish = "zq xv"  # too short + no stopwords -> filter-dropped

    # batch 1: one passing novel doc (accept), one gibberish doc (drop)
    spark.createDataFrame(
        [(50_001, passing[0].text), (50_002, gibberish)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src / "*"))
    q = curate_stream(
        stream, idx, out, ckpt, report_path=rep, threshold=0.8, trigger_once=True
    )
    q.awaitTermination(120)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {50_001}

    # batch 2: replay of batch 1's accept (near-dup via the index append),
    # plus a second passing doc (accept)
    spark.createDataFrame(
        [(60_001, passing[0].text), (60_002, passing[1].text)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "b2"))
    q2 = curate_stream(
        stream, idx, out, ckpt, report_path=rep, threshold=0.8, trigger_once=True
    )
    q2.awaitTermination(120)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {50_001, 60_002}

    # report: per-batch reason histogram with near_dup + kept rows
    report = {
        (r.batch_id, r.reason): r.n_docs for r in spark.read.parquet(rep).collect()
    }
    assert report[(0, "kept")] == 1 and report[(1, "kept")] == 1
    assert report[(1, "near_dup")] == 1 and report[(0, "near_dup")] == 0
    # the gibberish doc shows up under filter reasons in batch 0
    batch0_reasons = {k[1] for k in report if k[0] == 0}
    assert "too_short" in batch0_reasons


def test_intra_batch_dedup_keeps_one_copy(spark, corpus, tmp_path):
    """Two near-identical docs in ONE crawl batch: with intra_batch_dedup
    the min-id canonical survives alone and the report counts the drop."""
    idx = str(tmp_path / "ndx2")
    src = tmp_path / "src2"
    out = str(tmp_path / "out2")
    rep = str(tmp_path / "rep2")
    src.mkdir()
    di.minhash_index_write(corpus.filter("doc_id < 60"), idx)
    passing = (
        corpus_filter(corpus.filter("doc_id >= 60"), passthrough=("text",))
        .filter("keep")
        .orderBy("doc_id")
        .limit(1)
        .collect()
    )[0]
    spark.createDataFrame(
        [(50_001, passing.text), (50_002, passing.text)],  # exact twins
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src / "*"))
    q = curate_stream(
        stream, idx, out, str(tmp_path / "ckpt2"), report_path=rep,
        threshold=0.8, intra_batch_dedup=True, trigger_once=True,
    )
    q.awaitTermination(120)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {50_001}
    report = {(r.batch_id, r.reason): r.n_docs
              for r in spark.read.parquet(rep).collect()}
    assert report[(0, "intra_batch_dup")] == 1
    assert report[(0, "kept")] == 1 and report[(0, "near_dup")] == 0
