"""Persisted LSH near-dup index: build -> probe -> append lifecycle
(functions/dedup_index.py), with jaccard cross-checked against an
independent pure-Python shingle computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dc43_spark.functions import dedup_index as di


def _py_shingles(text: str, k: int = 3) -> set:
    toks = text.lower().split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _py_jaccard(a: str, b: str) -> float:
    sa, sb = _py_shingles(a), _py_shingles(b)
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


@pytest.fixture()
def corpus(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 120")
        .select("doc_id", "text")
    )


def test_index_probe_matches_exact_jaccard(spark, corpus, tmp_path):
    idx = str(tmp_path / "ndx")
    di.minhash_index_write(corpus, idx)

    rows = corpus.orderBy("doc_id").limit(6).collect()
    # new batch: 3 exact copies (jaccard 1.0, ALWAYS caught: identical
    # signatures collide in every band), 2 fresh synthetic docs, 1 light
    # mutation of a corpus doc
    mutated = rows[3].text + " extra tail tokens appended here"
    batch = spark.createDataFrame(
        [
            (10_001, rows[0].text),
            (10_002, rows[1].text),
            (10_003, rows[2].text),
            (10_004, "completely novel text about nothing seen before xyzzy"),
            (10_005, "another unrelated fresh document with unique words qwerty"),
            (10_006, mutated),
        ],
        "doc_id long, text string",
    )
    hits = di.minhash_index_probe(spark, idx, batch, threshold=0.5)
    got = {(r.doc_id, r.dup_of): r.jaccard for r in hits.collect()}

    # the three exact copies must be found against their source docs
    for new_id, row in [(10_001, rows[0]), (10_002, rows[1]), (10_003, rows[2])]:
        assert got.get((new_id, row.doc_id)) == 1.0, (new_id, got)
    # fresh docs never match anything
    assert not any(d in (10_004, 10_005) for d, _ in got)
    # every reported jaccard equals the independent python computation
    by_id = {r.doc_id: r.text for r in corpus.collect()}
    batch_text = {r.doc_id: r.text for r in batch.collect()}
    for (new_id, dup_of), j in got.items():
        assert j == pytest.approx(_py_jaccard(batch_text[new_id], by_id[dup_of]), abs=1e-6)


def test_append_extends_the_dedup_horizon(spark, corpus, tmp_path):
    idx = str(tmp_path / "ndx")
    di.minhash_index_write(corpus, idx)

    batch1 = spark.createDataFrame(
        [(20_001, "a brand new accepted document with distinctive vocabulary")],
        "doc_id long, text string",
    )
    kept1 = di.dedup_batch_against_index(
        spark, idx, batch1, threshold=0.8, append_survivors=True
    )
    assert kept1.count() == 1  # novel -> survives and is appended

    # a later batch replays the SAME text -> now a duplicate of 20_001
    batch2 = spark.createDataFrame(
        [
            (30_001, "a brand new accepted document with distinctive vocabulary"),
            (30_002, "yet another unrelated document nobody has indexed"),
        ],
        "doc_id long, text string",
    )
    hits = di.minhash_index_probe(spark, idx, batch2, threshold=0.8)
    assert [(r.doc_id, r.dup_of, r.jaccard) for r in hits.collect()] == [
        (30_001, 20_001, 1.0)
    ]
    kept2 = di.dedup_batch_against_index(spark, idx, batch2, threshold=0.8)
    assert [r.doc_id for r in kept2.collect()] == [30_002]


def test_probe_agrees_with_one_shot_self_join(spark, corpus, tmp_path):
    """Index probe vs the one-shot miner: index the corpus, probe the
    corpus itself — hits must equal minhash_near_duplicates' pair set
    (both directions of each (a, b) pair, plus each doc matching itself)."""
    from dc43_spark.functions import dedup as dd

    idx = str(tmp_path / "ndx")
    di.minhash_index_write(corpus, idx)
    hits = di.minhash_index_probe(spark, idx, corpus, threshold=0.8)
    got = {(r.doc_id, r.dup_of) for r in hits.collect() if r.doc_id != r.dup_of}
    pairs = dd.minhash_near_duplicates(corpus, threshold=0.8).collect()
    want = {(r.doc_a, r.doc_b) for r in pairs} | {(r.doc_b, r.doc_a) for r in pairs}
    assert got == want
    # self-matches all present at jaccard 1.0
    n_docs = corpus.count()
    selfs = hits.filter("doc_id = dup_of")
    assert selfs.count() == n_docs
    assert selfs.filter("jaccard != 1.0").count() == 0


def test_probe_plan_broadcasts_batch_not_index(spark, corpus, tmp_path):
    idx = str(tmp_path / "ndx")
    di.minhash_index_write(corpus, idx)
    from dc43_spark.io.bucketing import plan_string

    batch = corpus.limit(3)
    plan = plan_string(di.minhash_index_probe(spark, idx, batch), "simple")
    assert "BroadcastHashJoin" in plan
    # neither the band join nor the shingle verify may sort-merge — that
    # would shuffle the full index relation on every incremental batch
    assert "SortMergeJoin" not in plan


def test_param_manifest_is_enforced(spark, corpus, tmp_path):
    idx = str(tmp_path / "ndx")
    di.minhash_index_write(corpus, idx, num_hashes=8, rows_per_band=2)
    meta = di._read_meta(spark, idx)
    assert meta == {"num_hashes": 8, "rows_per_band": 2, "shingle_size": 3}
    # probing uses the manifest's params, so a copy of an indexed doc is
    # still found even though the defaults differ from the build settings
    some = corpus.limit(1).collect()[0]
    batch = spark.createDataFrame([(77_001, some.text)], "doc_id long, text string")
    hits = {(r.doc_id, r.dup_of): r.jaccard for r in
            di.minhash_index_probe(spark, idx, batch, threshold=0.9).collect()}
    # the source doc itself is hit at 1.0; the synthetic corpus contains
    # near-dup families, so OTHER >=0.9 hits are legitimate
    assert hits.get((77_001, some.doc_id)) == 1.0
    assert all(j >= 0.9 for j in hits.values())


def test_streaming_crawl_dedup(spark, corpus, tmp_path):
    """foreachBatch crawl loop: stream two batches through the index —
    batch 2's replay of a batch-1 survivor must be dropped, because the
    survivor was appended to the index between the micro-batches."""
    import time

    from dc43_spark.streaming.dedup import dedup_stream_against_index

    idx = str(tmp_path / "ndx")
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    di.minhash_index_write(corpus, idx)

    indexed = corpus.orderBy("doc_id").limit(1).collect()[0]
    novel = "a freshly crawled page with words the corpus has never seen"
    # batch 1: one copy of an indexed doc (drop), one novel doc (accept)
    spark.createDataFrame(
        [(50_001, indexed.text), (50_002, novel)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "*")
    )
    q = dedup_stream_against_index(
        stream, idx, out, ckpt, threshold=0.8, trigger_once=True
    )
    q.awaitTermination(120)

    kept1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept1 == {50_002}

    # batch 2: replay the accepted novel doc (drop — it is in the index
    # now), plus another genuinely new doc (accept)
    spark.createDataFrame(
        [(60_001, novel), (60_002, "entirely different closing content here")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "b2"))
    q2 = dedup_stream_against_index(
        stream, idx, out, ckpt, threshold=0.8, trigger_once=True
    )
    q2.awaitTermination(120)
    time.sleep(0.5)

    kept_all = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept_all == {50_002, 60_002}


def test_probe_cost_flat_under_20x_index_growth(spark, corpus, tmp_path):
    """The probe's SCALE CONTRACT (r5 verdict item 7): however large the
    accepted corpus grows, the probe shuffles ONLY batch-derived rows —
    the index relations stream map-only into broadcast joins. Verified on
    runtime metrics: growing the index ~20x must leave the probe's
    shuffled bytes and job count flat (scan bytes are ALLOWED to grow —
    that's the map-only side) and the executed plan free of sort-merge
    joins."""
    from conftest import executed_metrics, metric_sum

    idx = str(tmp_path / "ndx20")
    base = corpus.filter("doc_id < 50")
    di.minhash_index_write(base, idx)
    # batch as a LOCAL relation: every 'Scan parquet' in the probe plan is
    # then an INDEX scan, so scan-size sums measure index growth alone
    batch = spark.createDataFrame(
        [(int(r.doc_id), r.text) for r in
         corpus.filter("doc_id >= 50 AND doc_id < 55").collect()],
        "doc_id long, text string",
    )

    def run(tag):
        spark.sparkContext.setJobGroup(tag, tag)
        probe = di.minhash_index_probe(spark, idx, batch)
        metrics = executed_metrics(probe)
        spark.sparkContext.setJobGroup("", "")
        jobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup(tag))
        return metrics, jobs

    m1, jobs1 = run("probe-small")
    # grow the index ~20x with synthetic variants of the whole corpus
    # (distinct content: suffixing doc_id-derived tokens changes shingles)
    for wave in range(4):
        grown = corpus.select(
            (F.col("doc_id") + 10_000 * (wave + 1)).alias("doc_id"),
            F.concat_ws(
                " ", F.col("text"), F.lit(f"wave{wave}"),
                (F.col("doc_id") * (wave + 2)).cast("string"),
            ).alias("text"),
        )
        di.minhash_index_append(spark, idx, grown)
    m2, jobs2 = run("probe-grown")

    scan_before = metric_sum(m1, "Scan parquet", "filesSize")
    scan_after = metric_sum(m2, "Scan parquet", "filesSize")
    assert scan_after > scan_before * 3  # the index really grew
    sh_before = metric_sum(m1, "Exchange", "shuffleBytesWritten") + metric_sum(
        m1, "ShuffleQueryStage", "shuffleBytesWritten"
    )
    sh_after = metric_sum(m2, "Exchange", "shuffleBytesWritten") + metric_sum(
        m2, "ShuffleQueryStage", "shuffleBytesWritten"
    )
    # batch unchanged -> shuffled volume flat (tolerance for stats noise)
    assert sh_after <= max(sh_before * 1.5, sh_before + 4096), (sh_before, sh_after)
    assert jobs2 <= jobs1 + 1, (jobs1, jobs2)
    assert not any("SortMergeJoin" in m["node"] for m in m2), [m["node"] for m in m2]
