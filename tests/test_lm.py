"""Stupid-backoff n-gram LM: Spark implementation vs an independent
pure-Python reference (training counts AND per-document scores), OOV /
empty-document behavior, pruning semantics, and a UDF-free plan pin.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

from dc43_spark.functions.lm import (
    BOS,
    perplexity_partition,
    score_ngram_lm,
    train_ngram_lm,
)

DOCS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the cat ate the fish"),
    ("d3", "a dog sat on a log"),
    ("d4", "the dog and the cat sat"),
    ("d5", ""),
    ("d6", "zyzzyva qwerty the"),  # OOV-heavy
]


# ---------------- independent reference implementation


def ref_counts(texts, order):
    c = Counter()
    for t in texts:
        toks = t.split()
        padded = [BOS] * (order - 1) + toks
        for i in range(len(toks)):
            end = i + order  # exclusive, in padded coords
            for k in range(1, order + 1):
                c[" ".join(padded[end - k : end])] += 1
    return c


def ref_score(text, counts, order, alpha, total):
    toks = text.split()
    if not toks:
        return 0, None
    padded = [BOS] * (order - 1) + toks
    lp = 0.0
    for i in range(len(toks)):
        end = i + order
        s = counts.get(padded[end - 1], 0.0) or 0.5
        s = s / total
        for k in range(2, order + 1):
            g = counts.get(" ".join(padded[end - k : end]))
            x = counts.get(" ".join(padded[end - k : end - 1]))
            s = g / x if g and x else alpha * s
        lp += math.log(s)
    return len(toks), lp


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


@pytest.mark.parametrize("order", [1, 2, 3])
def test_training_counts_match_reference(spark, docs_df, order):
    got = {
        r["ngram"]: (r["n"], r["count"])
        for r in train_ngram_lm(docs_df, order=order).collect()
    }
    want = ref_counts([t for _, t in DOCS], order)
    assert {k: v[1] for k, v in got.items()} == dict(want)
    assert all(n == len(k.split()) for k, (n, _c) in got.items())
    # unigram mass is the real token count: padding never counted
    n_tokens = sum(len(t.split()) for _, t in DOCS)
    assert sum(c for k, (n, c) in got.items() if n == 1) == n_tokens
    assert not any(k.endswith(BOS) for k in got)


@pytest.mark.parametrize("order,alpha", [(2, 0.4), (3, 0.4), (3, 0.25)])
def test_scores_match_reference(spark, docs_df, order, alpha):
    lm = train_ngram_lm(docs_df, order=order)
    scored = {
        r["doc_id"]: (r["n_tokens"], r["logprob"], r["ppl"])
        for r in score_ngram_lm(
            docs_df, lm, order=order, alpha=alpha
        ).collect()
    }
    counts = ref_counts([t for _, t in DOCS], order)
    total = float(sum(c for k, c in counts.items() if len(k.split()) == 1))
    assert set(scored) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        n, lp = ref_score(text, counts, order, alpha, total)
        got_n, got_lp, got_ppl = scored[doc_id]
        assert got_n == n
        if lp is None:
            assert got_lp is None and got_ppl is None
        else:
            assert got_lp == pytest.approx(lp, abs=1e-9)
            assert got_ppl == pytest.approx(math.exp(-lp / n), rel=1e-9)


def test_gibberish_scores_worse_than_fluent(spark, docs_df):
    lm = train_ngram_lm(docs_df, order=3)
    ppl = {
        r["doc_id"]: r["ppl"]
        for r in score_ngram_lm(docs_df, lm, order=3).collect()
    }
    assert ppl["d6"] > ppl["d1"]  # OOV soup vs in-corpus fluent text


def test_pruning_backs_off(spark, docs_df):
    """min_count pruning drops rare grams; pruned grams score exactly as
    unseen (backoff), mirrored by pruning the reference the same way."""
    order, alpha = 3, 0.4
    lm = train_ngram_lm(docs_df, order=order, min_count=2)
    counts = {
        k: c for k, c in ref_counts([t for _, t in DOCS], order).items() if c >= 2
    }
    total = float(sum(c for k, c in counts.items() if len(k.split()) == 1))
    scored = {
        r["doc_id"]: r["logprob"]
        for r in score_ngram_lm(docs_df, lm, order=order, alpha=alpha).collect()
    }
    for doc_id, text in DOCS:
        n, lp = ref_score(text, counts, order, alpha, total)
        if lp is not None:
            assert scored[doc_id] == pytest.approx(lp, abs=1e-9)


def test_scoring_unseen_corpus(spark, docs_df):
    """Score documents the LM never saw — every position resolves, all
    the way down to the OOV floor."""
    lm = train_ngram_lm(docs_df, order=3)
    other = spark.createDataFrame(
        [("x1", "the cat sat quietly"), ("x2", "entirely novel words here")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in score_ngram_lm(other, lm, order=3).collect()}
    assert got["x1"]["n_tokens"] == 4 and got["x1"]["logprob"] < 0
    assert got["x2"]["ppl"] > got["x1"]["ppl"]


def test_perplexity_partition_buckets(spark, docs_df):
    lm = train_ngram_lm(docs_df, order=2)
    scored = score_ngram_lm(docs_df, lm, order=2)
    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_partition(scored, head=5.0, tail=50.0).collect()
    }
    assert got["d5"] == "tail"  # empty doc: NULL ppl -> tail
    assert set(got.values()) <= {"head", "middle", "tail"}
    with pytest.raises(ValueError, match="head < tail"):
        perplexity_partition(scored, head=9.0, tail=1.0)


def test_plan_is_udf_free(spark, docs_df):
    lm = train_ngram_lm(docs_df, order=3)
    plan = score_ngram_lm(docs_df, lm, order=3)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    plan_t = train_ngram_lm(docs_df, order=3)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan_t and "ArrowEvalPython" not in plan_t


def test_order_validation(spark, docs_df):
    with pytest.raises(ValueError, match="order"):
        train_ngram_lm(docs_df, order=0)
    with pytest.raises(ValueError, match="order"):
        score_ngram_lm(docs_df, docs_df, order=0)
