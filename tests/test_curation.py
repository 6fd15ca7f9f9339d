from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from dc43_spark.functions import curation as cu


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c a b c a b c", "en"),       # heavy trigram repetition
        (2, "one two three four five six", "en"),  # all trigrams unique
        (3, "x y", "fr"),                      # shorter than the shingle size
        (4, "spam spam spam spam spam", "es"),  # single repeated token
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---------------------------------------------------------- repetition


def test_ngram_repetition_values(docs):
    out = {
        r["doc_id"]: r.asDict()
        for r in cu.ngram_repetition(docs, n=3).collect()
    }
    # doc 1: 7 trigrams with multiplicity -> {"a b c": 3, "b c a": 2, "c a b": 2}
    assert out[1]["n_ngrams"] == 7 and out[1]["n_distinct"] == 3
    assert out[1]["dup_micro"] == round(4 / 7 * 1_000_000 + 1e-9)
    assert out[1]["top_micro"] == round(3 / 7 * 1_000_000 + 1e-9)
    # doc 2: 4 unique trigrams -> zero repetition
    assert out[2]["n_ngrams"] == 4 and out[2]["dup_micro"] == 0
    assert out[2]["top_micro"] == 250_000
    # doc 3: shorter than n -> single whole-text shingle
    assert out[3]["n_ngrams"] == 1 and out[3]["n_distinct"] == 1
    # doc 4: "spam spam spam" x3 -> fully repetitive
    assert out[4]["n_ngrams"] == 3 and out[4]["n_distinct"] == 1
    assert out[4]["dup_micro"] == round(2 / 3 * 1_000_000 + 1e-9)
    assert out[4]["top_micro"] == 1_000_000


# ------------------------------------------------------------ sampling


def _py_bucket(key, seed="dc43"):
    return int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:12], 16) % cu.MICRO


def test_hash_sample_matches_reference_hash(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    kept = {r["k"] for r in cu.hash_sample(df, "k", 0.3).collect()}
    expected = {k for k in range(1000) if _py_bucket(k) < 300_000}
    assert kept == expected
    assert 0 < len(kept) < 1000


def test_hash_sample_is_nested_and_deterministic(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    small = {r["k"] for r in cu.hash_sample(df, "k", 0.1).collect()}
    large = {r["k"] for r in cu.hash_sample(df, "k", 0.5).collect()}
    again = {r["k"] for r in cu.hash_sample(df, "k", 0.1).collect()}
    assert small <= large          # thresholds nest: growing a sample keeps prior rows
    assert small == again          # replayable
    other_seed = {r["k"] for r in cu.hash_sample(df, "k", 0.1, seed="v2").collect()}
    assert small != other_seed     # seed rotates the selection


def test_stratified_sample_rates(docs):
    out = cu.stratified_sample(
        docs, "doc_id", "lang", {"en": 1.0, "fr": 0.0}, default_rate=0.0
    ).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 2]  # all en kept, fr zeroed, es falls to the 0.0 default


def test_stratified_default_rate(docs):
    out = cu.stratified_sample(docs, "doc_id", "lang", {}, default_rate=1.0).collect()
    assert len(out) == 4


# ---------------------------------------------------------- vocabulary


def test_vocab_top_terms_ordering(docs):
    top = cu.vocab_top_terms(docs, top_n=3).collect()
    # corpus tf: spam=5, a=3, b=3, c=3 -> tie on 3 breaks alphabetically
    assert [(r["term"], r["tf"]) for r in top] == [("spam", 5), ("a", 3), ("b", 3)]
    # df: "spam" appears in exactly one document
    assert top[0]["df"] == 1


def test_tf_idf_values(docs):
    rows = cu.tf_idf(docs).collect()
    byk = {(r["doc_id"], r["term"]): r for r in rows}
    # "spam": tf=5 in doc 4, df=1, N=4 -> tfidf = 5 * ln(4)
    r = byk[(4, "spam")]
    assert r["tf"] == 5 and r["df"] == 1
    assert r["tfidf"] == pytest.approx(5 * math.log(4.0))
    # a term present in every doc would get ln(1)=0; here "a" is only in doc 1
    assert byk[(1, "a")]["tfidf"] == pytest.approx(3 * math.log(4.0))


def test_tf_idf_min_df_prunes(docs):
    rows = cu.tf_idf(docs, min_df=2).collect()
    assert rows == []  # no term spans two documents in this corpus


# ------------------------------------------- embedding near-dup pruning


def test_embedding_near_dups_finds_duplicates(spark):
    # 2 identical vectors + 1 near-identical + 2 far-away distractors
    base = [1.0, 0.0, 0.5, 0.25]
    near = [0.99, 0.01, 0.5, 0.25]
    rows = [
        (0, base),
        (1, [-1.0, 0.5, -0.5, 0.0]),
        (2, base),            # exact dup of 0
        (3, near),            # near dup of 0 and 2
        (4, [0.0, -1.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r.asDict() for r in
           cu.embedding_near_dups(df, threshold=0.9, n_planes=4, dim=4).collect()}
    assert set(out) == {2, 3}
    assert out[2]["dup_of"] == 0 and out[2]["cosine"] == 1.0
    assert out[3]["dup_of"] == 0  # lowest-id neighbour wins
    # distractors are not flagged; the canonical (lowest id) never is
    assert 0 not in out and 1 not in out and 4 not in out


def test_embedding_near_dups_empty_when_threshold_high(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert cu.embedding_near_dups(df, threshold=0.5, n_planes=2, dim=2).count() == 0
