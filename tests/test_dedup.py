from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dc43_spark.functions import dedup as dd


@pytest.fixture(scope="module")
def docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"  # 1 token off
    rows = [
        (1, base),
        (2, base),                      # exact dup of 1
        (3, near),                      # near dup of 1
        (4, "completely different words nothing shared here at all ok"),
        (5, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r["doc_id"]: r["n_dups"] for r in dd.exact_dedup(docs).collect()}
    assert out[1] == 2  # docs 1+2 collapse, canonical = min id
    assert 2 not in out
    assert out[3] == 1 and out[4] == 1 and out[5] == 1


def test_keep_canonical(docs):
    kept = sorted(r["doc_id"] for r in dd.keep_canonical(docs).collect())
    assert kept == [1, 3, 4, 5]


def test_keep_canonical_reused_id_selects_only_group_winner(spark):
    """The semi-join matches (hash, id) pairs: id 1 wins the 'aaa' group,
    but the different-text row that also carries id 1 must NOT ride along
    (r4 advice: an id-only semi-join kept every row bearing a winning id)."""
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (1, "zzz unrelated"), (3, "zzz unrelated")],
        "doc_id long, text string",
    )
    kept = sorted((r["doc_id"], r["text"]) for r in dd.keep_canonical(df).collect())
    assert kept == [(1, "aaa"), (1, "zzz unrelated")]


def test_token_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b")], "doc_id long, text string")
    out = {
        r["doc_id"]: sorted(r["sh"])
        for r in df.select("doc_id", dd.token_shingles("text", 3).alias("sh")).collect()
    }
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == ["a b"]  # shorter than n -> whole text


def test_minhash_identical_docs_same_signature(docs):
    sigs = {r["doc_id"]: r["signature"] for r in dd.minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]
    # near-dup shares most hash mins
    shared = sum(1 for a, b in zip(sigs[1], sigs[3]) if a == b)
    assert shared >= 8  # 10-token docs differing in 1 token


def test_lsh_candidates_and_near_dups(docs):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dd.minhash_near_duplicates(docs, threshold=0.5).collect()
    }
    assert (1, 2) in pairs  # identical
    assert not any(4 in p for p in pairs)


def test_ngram_jaccard_exact(docs):
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
           dd.ngram_jaccard_pairs(docs, threshold=0.1).collect()}
    assert out[(1, 2)] == 1.0
    # near pair: shingles of 10-token docs differing in last token:
    # 8 shingles each, 7 shared -> j = 7/9
    assert out[(1, 3)] == pytest.approx(7 / 9, abs=1e-6)
    assert (1, 4) not in out


def test_simhash(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dd.simhash64(docs).collect()}
    assert sh[1] == sh[2]
    df = dd.simhash64(docs)
    a = df.alias("a")
    b = df.alias("b")
    ham = (
        a.crossJoin(b)
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            dd.hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("h"),
        )
    )
    hmap = {(r["da"], r["db"]): r["h"] for r in ham.collect()}
    assert hmap[(1, 2)] == 0
    assert hmap[(1, 3)] < hmap[(1, 4)]  # near-dup closer than unrelated


def test_all_ops_stay_jvm_side(docs):
    # no BatchEvalPython / ArrowEvalPython in any dedup plan (UDF-free)
    for frame in [
        dd.exact_dedup(docs),
        dd.minhash_signatures(docs),
        dd.simhash64(docs),
        dd.ngram_jaccard_pairs(docs, threshold=0.5),
    ]:
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


def test_keep_canonical_null_text_keeps_min_id(spark):
    """NULL-text rows form one group and keep their min-id row (r5
    review: md5(NULL) = NULL never joins to itself, which silently
    dropped EVERY null-text row)."""
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (4, "x")], "doc_id long, text string"
    )
    kept = sorted((r.doc_id, r.text) for r in dd.keep_canonical(df).collect())
    assert kept == [(1, None), (3, "x")]


def test_keep_canonical_preserves_caller_fp_column(spark):
    """The internal join key must not clobber a caller column (the old
    '_fp' name vanished from the output)."""
    df = spark.createDataFrame(
        [(1, "a", "keepme"), (2, "a", "keepme2")], "doc_id long, text string, _fp string"
    )
    out = dd.keep_canonical(df)
    assert out.columns == ["doc_id", "text", "_fp"]
    assert out.collect()[0]._fp == "keepme"


def test_duplicated_spans_handcrafted(spark):
    """Known overlap: docs 1 and 2 share the passage 'one two three four
    five'; doc 3 is unique. With k=3 the shared passage yields 3
    consecutive duplicated windows -> ONE maximal span of 5 tokens in
    each doc, at the right offsets."""
    from dc43_spark.functions import dedup as dd

    rows = [
        (1, "alpha one two three four five omega"),
        (2, "one two three four five beta gamma delta"),
        (3, "totally unique words without any repeats here"),
        (4, "xy"),   # shorter than k: no windows
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {
        (r.doc_id, r.start_pos): (r.n_windows, r.span_tokens)
        for r in dd.duplicated_spans(df, k=3, min_occurrences=2).collect()
    }
    assert spans == {
        (1, 1): (3, 5),   # tokens 1..5 of doc 1
        (2, 0): (3, 5),   # tokens 0..4 of doc 2
    }


def test_strip_spans_removes_covered_tokens(spark):
    from dc43_spark.functions import dedup as dd

    df = spark.createDataFrame(
        [
            (1, "alpha one two three four five omega"),
            (2, "one two three four five beta gamma delta"),
            (3, "keep me whole"),
        ],
        "doc_id long, text string",
    )
    spans = dd.duplicated_spans(df, k=3, min_occurrences=2)
    # policy: keep the lowest-id occurrence of the shared passage, strip
    # the rest (both spans here are the same passage)
    keep_id = spans.agg(F.min("doc_id")).collect()[0][0]
    to_strip = spans.filter(F.col("doc_id") != keep_id)
    out = {r.doc_id: (r.text, r.n_tokens_after)
           for r in dd.strip_spans(df, to_strip).collect()}
    assert out[1] == ("alpha one two three four five omega", 7)  # kept
    assert out[2] == ("beta gamma delta", 3)  # passage stripped
    assert out[3] == ("keep me whole", 3)     # untouched passthrough


def test_duplicated_spans_randomized_vs_python_reference(spark):
    """Bulk parity on random corpora: spans from the Spark operator equal
    a brute-force pure-Python computation (windows, corpus counts, island
    collapse) across seeds, k values and thresholds."""
    import random

    from dc43_spark.functions import dedup as dd

    def py_spans(texts, k, min_occ):
        wins = {}  # gram -> count
        per_doc = {}
        for did, text in texts:
            toks = text.split()
            grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
            per_doc[did] = grams
            for g in grams:
                wins[g] = wins.get(g, 0) + 1
        out = set()
        for did, grams in per_doc.items():
            dup = [i for i, g in enumerate(grams) if wins[g] >= min_occ]
            run_start = None
            prev = None
            for i in dup + [None]:
                if i is not None and prev is not None and i == prev + 1:
                    prev = i
                    continue
                if run_start is not None:
                    n = prev - run_start + 1
                    out.add((did, run_start, n, n + k - 1))
                run_start, prev = i, i
        return out

    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    for seed, k, min_occ in [(0, 3, 2), (1, 2, 2), (2, 3, 3), (3, 4, 2)]:
        rng = random.Random(seed)
        texts = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 14))))
            for i in range(40)
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = {
            (r.doc_id, r.start_pos, r.n_windows, r.span_tokens)
            for r in dd.duplicated_spans(df, k=k, min_occurrences=min_occ).collect()
        }
        assert got == py_spans(texts, k, min_occ), (seed, k, min_occ)
