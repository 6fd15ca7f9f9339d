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


def test_micro_ratio_exact_past_double_precision(spark):
    """2*num*1e6 beyond 2^53: float division + cast truncation diverges
    from exact integer div by 1 here — micro_ratio must use integral div."""
    den, num = 10_000_999_999, 5_000_494_999
    df = spark.createDataFrame([(num, den)], "num long, den long")
    got = df.select(cu.micro_ratio(F.col("num"), F.col("den")).alias("m")).first()["m"]
    assert got == (2 * num * 1_000_000 + den) // (2 * den) == 499_999


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


def test_hash_split_disjoint_exhaustive_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    out = cu.hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    by_split: dict[str, set] = {}
    for r in out:
        by_split.setdefault(r["split"], set()).add(r["k"])
    # exhaustive (weights sum to 1 -> no NULL split) and disjoint by construction
    assert sum(len(v) for v in by_split.values()) == 2000
    assert set(by_split) == {"train", "val", "test"}
    assert 1300 < len(by_split["train"]) < 1900  # ~80%
    # growth-stable: restricting the corpus never moves a row between splits
    sub = cu.hash_split(
        df.filter(F.col("k") < 500), "k", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect()
    for r in sub:
        assert r["k"] in by_split[r["split"]]


def test_hash_split_partial_weights_leave_null(spark):
    df = spark.range(0, 200).withColumnRenamed("id", "k")
    out = cu.hash_split(df, "k", {"sample": 0.2}).collect()
    labels = {r["split"] for r in out}
    assert labels == {"sample", None}
    with pytest.raises(ValueError):
        cu.hash_split(df, "k", {"a": 0.9, "b": 0.2})


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


# ------------------------------------------------------------- chunking


def test_chunk_documents_windows(spark):
    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        cu.chunk_documents(df, chunk_size=4, overlap=1).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 3: starts 0,3,6,9 -> windows [0:4],[3:7],[6:10],[9:10]
    assert [r["chunk_idx"] for r in out] == [0, 1, 2, 3]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[1]["chunk_text"] == "t3 t4 t5 t6"  # 1-token overlap
    assert out[3]["chunk_text"] == "t9" and out[3]["n_tokens"] == 1
    assert [r["n_tokens"] for r in out] == [4, 4, 4, 1]


def test_chunk_documents_short_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "only two"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    out = cu.chunk_documents(df, chunk_size=8, overlap=2).collect()
    assert [(r["doc_id"], r["chunk_text"], r["n_tokens"]) for r in out] == [
        (1, "only two", 2)
    ]  # empty/whitespace docs emit no chunks


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        cu.chunk_documents(df, chunk_size=4, overlap=4)


# ------------------------------------------------------- decontamination


def test_ngram_contamination_detects_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # contains bench 10's text
            (2, "one two three four five six seven"),     # disjoint
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon")],  # 3 trigram shingles
        "bench_id long, text string",
    )
    out = cu.ngram_contamination(corpus, bench, n=3, min_overlap=3).collect()
    assert [(r["doc_id"], r["bench_id"], r["n_shared"]) for r in out] == [(1, 10, 3)]
    # raising the bar above the overlap empties the result
    assert cu.ngram_contamination(corpus, bench, n=3, min_overlap=4).count() == 0


# ------------------------------------------------------ sequence packing


def test_pack_chunks_concat_and_chop(spark):
    chunks = spark.createDataFrame(
        [(1, 0, 30), (1, 1, 30), (2, 0, 30), (2, 1, 10)],
        "doc_id long, chunk_idx long, n_tokens long",
    )
    # single shard -> one global stream: offsets 0,30,60,90; budget 64
    out = sorted(
        cu.pack_chunks(chunks, budget=64, shards=1, shard_expr=F.lit(0)).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    assert [r["tok_offset"] for r in out] == [0, 30, 60, 90]
    assert [r["bin_id"] for r in out] == [0, 0, 0, 1]
    assert all(r["shard"] == 0 for r in out)


def test_pack_chunks_shards_are_independent_streams(spark):
    chunks = spark.createDataFrame(
        [(i, 0, 50) for i in range(20)], "doc_id long, chunk_idx long, n_tokens long"
    )
    out = cu.pack_chunks(chunks, budget=100, shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(out) == 20 and len(by_shard) > 1
    for rows in by_shard.values():
        offsets = sorted(r["tok_offset"] for r in rows)
        assert offsets == [50 * i for i in range(len(rows))]  # per-shard cumsum


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


# ----------------------------------- randomized bulk parity vs pure Python


def test_curation_ops_match_python_reference_on_random_corpus(spark):
    """200 seeded random docs, ONE Spark job per operator, every row checked
    against an independent pure-Python implementation (Counter/slicing) —
    randomized coverage without per-example job overhead."""
    import random
    from collections import Counter

    rng = random.Random(20260813)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))))
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def py_shingles(text: str, n: int = 3) -> list[str]:
        toks = text.split()
        if len(toks) < n:
            return [" ".join(toks)]
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    # repetition
    rep = {r["doc_id"]: r.asDict() for r in cu.ngram_repetition(df, n=3).collect()}
    for doc_id, text in docs:
        c = Counter(py_shingles(text))
        total, distinct, top = sum(c.values()), len(c), max(c.values())
        r = rep[doc_id]
        assert (r["n_ngrams"], r["n_distinct"]) == (total, distinct), doc_id
        assert r["dup_micro"] == (2 * (total - distinct) * 1_000_000 + total) // (
            2 * total
        )
        assert r["top_micro"] == (2 * top * 1_000_000 + total) // (2 * total)

    # chunking: offsets tile the token list; text reconstructs by slicing
    chunks: dict[int, list] = {}
    for r in cu.chunk_documents(df, chunk_size=7, overlap=2).collect():
        chunks.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in docs:
        toks = text.split()
        got = sorted(chunks[doc_id], key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in got] == list(range(len(got)))
        for r in got:
            start = r["chunk_idx"] * 5  # stride = 7 - 2
            expect = toks[start : start + 7]
            assert r["chunk_text"] == " ".join(expect) and r["n_tokens"] == len(expect)
        # full coverage: last chunk reaches the final token
        last = got[-1]
        assert last["chunk_idx"] * 5 + last["n_tokens"] == len(toks)

    # vocabulary
    tf = Counter(t for _, text in docs for t in text.split())
    dfreq = Counter(t for _, text in docs for t in set(text.split()))
    for r in cu.term_counts(df).collect():
        assert (r["tf"], r["df"]) == (tf[r["term"]], dfreq[r["term"]]), r["term"]


def test_corpus_filter_signals_and_reasons(spark):
    from dc43_spark.functions.curation import corpus_filter

    docs = spark.createDataFrame(
        [
            # clean English running text, plenty of stopwords
            (1, "the quick brown fox jumps over the lazy dog and then the "
                "dog chases the fox around the big old tree in the yard"),
            # too short
            (2, "tiny doc"),
            # keyword spam: no stopwords
            (3, "buy cheap widgets discount sale offer deal price shop "
                "cart checkout shipping warehouse stock bulk order invoice"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus_filter(docs).collect()}
    assert out[1]["keep"] is True and out[1]["drop_reasons"] == ""
    assert out[2]["keep"] is False and "too_short" in out[2]["drop_reasons"]
    assert out[3]["keep"] is False and "low_stopword" in out[3]["drop_reasons"]
    # signal columns are integer micro-units
    assert isinstance(out[1]["quality_micro"], int)
    assert out[1]["stop_micro"] > out[3]["stop_micro"]


def test_bpe_pair_counts_kernel(spark):
    from dc43_spark.functions.curation import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "x, ab!")], "doc_id long, text string"
    )
    out = {r["pair"]: r for r in bpe_pair_counts(docs, top_n=10).collect()}
    # 'aaab' -> aa, aa, ab per occurrence (x2 docs-tokens); 'ab' -> ab;
    # 1-char tokens (x , !) contribute nothing
    assert out["aa"]["n"] == 4
    assert out["ab"]["n"] == 3
    assert set(out) == {"aa", "ab"}
    # deterministic total order: count desc then pair asc
    assert out["aa"]["rank"] == 1 and out["ab"]["rank"] == 2


def test_encode_tokens_both_strategies_agree(spark):
    from dc43_spark.functions.curation import encode_tokens, vocab_top_terms

    docs = spark.createDataFrame(
        [(1, "b a b c b x"), (2, "a a unknownword"), (3, "")],
        "doc_id long, text string",
    )
    vocab = vocab_top_terms(docs, top_n=3)  # b(3) -> 1, a(3)... tf ties
    literal = {r["doc_id"]: r for r in encode_tokens(docs, vocab).collect()}
    joined = {
        r["doc_id"]: r
        for r in encode_tokens(docs, vocab, literal_map_max=1).collect()
    }
    for d in (1, 2, 3):
        assert literal[d]["ids"] == joined[d]["ids"]
        assert literal[d]["n_unk"] == joined[d]["n_unk"]
    # vocab order: tf desc, term asc -> a(3)=1, b(3)=2, c(1)=3; x/unknown -> 0
    assert literal[1]["ids"] == [2, 1, 2, 3, 2, 0]
    assert literal[2]["ids"] == [1, 1, 0] and literal[2]["n_unk"] == 1
    assert literal[3]["ids"] == [] and literal[3]["n_tokens"] == 0


# ----------------------------------------------------------- BPE training


def _ref_bpe(texts, n_merges, min_count=2):
    """Pure-Python reference trainer (Sennrich-style, overlap-counted
    pairs, greedy non-overlapping merge application, count-then-lex
    tie-break) — the independent oracle for train_bpe."""
    import collections
    import re

    from dc43_spark.functions.text import BPE_TOKEN_RE

    words = collections.Counter(
        t for x in texts for t in re.findall(BPE_TOKEN_RE, x) if len(t) >= 2
    )
    syms = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pc = collections.Counter()
        for w, c in words.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        best, cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((best[0], best[1], cnt))
        from dc43_spark.functions.curation import _merge_word

        for w in syms:
            syms[w] = _merge_word(syms[w], best[0], best[1])
    return merges


def test_train_bpe_matches_reference(spark):
    texts = [
        "the theme of the theater is thorough",
        "low lower lowest newest new news",
        "hello hello hellish shell she sells seashells 2024 2025",
        "the quick brown fox jumps over the lazy dog, the dog sleeps!",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = cu.train_bpe(df, n_merges=25, checkpoint_every=4)
    want = _ref_bpe(texts, 25)
    assert got == want, f"first divergence at {next((i for i,(a,b) in enumerate(zip(got,want)) if a!=b), '?')}:\n{got}\n{want}"
    # both trainers exhaust the corpus at the same merge (min_count stop)
    assert len(got) >= 15


def test_train_bpe_early_stop_and_segment(spark):
    df = spark.createDataFrame([("ab ab cd",)], "text string")
    merges = cu.train_bpe(df, n_merges=10)
    # 'ab' appears twice -> merged; 'cd' appears once -> below min_count
    assert [(m[0], m[1]) for m in merges] == [("a", "b")]
    assert cu.bpe_segment("ab cd abab", merges) == ["ab", "c", "d", "ab", "ab"]


def test_train_bpe_documents_slice(spark, sf_dir):
    """Real-corpus smoke at sf0.001: merges agree with the reference
    trainer run on the collected text."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter("doc_id < 60")
    got = cu.train_bpe(docs, n_merges=12)
    want = _ref_bpe([r.text for r in docs.select("text").collect()], 12)
    assert got == want


def test_mix_by_weight_fractional_epochs(spark):
    """Factor 2.5 -> every row twice + a deterministic half a third time;
    factor 0.5 -> a deterministic half once; factor 0 -> dropped. Copy
    indices are dense 0..n-1 and the op is reproducible."""
    from dc43_spark.functions import curation as cu

    df = spark.createDataFrame(
        [(i, "a" if i < 400 else ("b" if i < 800 else "c")) for i in range(1200)],
        "k long, dom string",
    )
    out = cu.mix_by_weight(df, "k", "dom", {"a": 2.5, "b": 0.5, "c": 0.0})
    rows = out.collect()
    by_dom = {}
    for r in rows:
        by_dom.setdefault(r.dom, {}).setdefault(r.k, []).append(r.copy)
    assert "c" not in by_dom  # factor 0 drops the stratum entirely
    # a: every key 2 or 3 copies, total ~2.5x, copies dense from 0
    a_counts = {k: sorted(v) for k, v in by_dom["a"].items()}
    assert set(len(v) for v in a_counts.values()) == {2, 3}
    assert all(v == list(range(len(v))) for v in a_counts.values())
    total_a = sum(len(v) for v in a_counts.values())
    assert 400 * 2 < total_a < 400 * 3 and abs(total_a - 1000) < 60
    # b: kept keys have exactly one copy, ~half kept
    b_counts = {k: v for k, v in by_dom["b"].items()}
    assert all(v == [0] for v in b_counts.values())
    assert abs(len(b_counts) - 200) < 40
    # deterministic: same output on re-run
    again = sorted((r.k, r.dom, r.copy) for r in
                   cu.mix_by_weight(df, "k", "dom", {"a": 2.5, "b": 0.5, "c": 0.0}).collect())
    assert again == sorted((r.k, r.dom, r.copy) for r in rows)
    # kept fraction agrees with stratified_sample's rule (same bucket)
    strat = {r.k for r in cu.stratified_sample(df, "k", "dom", {"b": 0.5}).collect()}
    assert strat == set(b_counts)
    with pytest.raises(ValueError):
        cu.mix_by_weight(df, "k", "dom", {"a": -1.0})


def test_mix_by_weight_zero_shuffle(spark):
    from dc43_spark.functions import curation as cu
    from dc43_spark.io.bucketing import plan_string

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("dom")
    )
    out = cu.mix_by_weight(df, "k", "dom", {"0": 2.0, "1": 0.5})
    plan = plan_string(out, "simple")
    assert "Exchange" not in plan  # narrow generator: explode, no shuffle


def test_bigram_familiarity_scores(spark):
    """Common-transition text scores high; a doc of unique gibberish
    scores 0; short docs get 0 bigrams and NULL score."""
    from dc43_spark.functions import curation as cu

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on a chair"),
        (3, "the cat sat on the rug"),
        (4, "zq xv qj wk pz mn"),      # unique bigrams only
        (5, "word"),                    # 1 token -> no bigrams
        (6, ""),                        # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in cu.bigram_familiarity(df, min_count=3).collect()}
    assert out[1].n_bigrams == 5 and out[4].n_bigrams == 5
    # 'the cat'/'cat sat'/'sat on' appear 3x -> common; doc1 has 3/5
    assert out[1].common_micro == 600000
    assert out[2].common_micro == 600000
    assert out[4].common_micro == 0
    assert out[5].n_bigrams == 0 and out[5].common_micro is None
    assert out[6].n_bigrams == 0 and out[6].common_micro is None
    assert set(out) == {1, 2, 3, 4, 5, 6}  # nothing vanishes


def _np_lr_reference(rows, n_features, iters, lr):
    """Independent dense-NumPy twin of train_quality_lr (same hashed
    featurisation, same full-batch GD updates)."""
    import hashlib

    import numpy as np

    def fh(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:7], 16) % n_features

    X, y = [], []
    for _, label, text in rows:
        toks = text.split()
        if not toks:
            continue
        x = np.zeros(n_features)
        for t in toks:
            x[fh(t)] += 1.0 / len(toks)
        X.append(x)
        y.append(float(label))
    X, y = np.array(X), np.array(y)
    w, b = np.zeros(n_features), 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        err = p - y
        w -= lr * (X.T @ err) / len(y)
        b -= lr * err.sum() / len(y)
    return w, b


def test_train_quality_lr_matches_numpy_reference(spark):
    from dc43_spark.functions import curation as cu

    rows = [
        (i, 1 if i % 2 == 0 else 0,
         ("good clean prose text here sample %d" % (i % 5)) if i % 2 == 0
         else ("spam junk buy now click %d" % (i % 7)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, label int, text string")
    model = cu.train_quality_lr(
        df, "label", n_features=64, iters=8, learn_rate=0.5
    )
    w_ref, b_ref = _np_lr_reference(rows, 64, 8, 0.5)
    import numpy as np

    assert abs(model["bias"] - b_ref) < 1e-6
    assert np.allclose(np.array(model["weights"]), w_ref, atol=1e-6)


def test_quality_lr_separates_and_scores_at_scan_speed(spark):
    from dc43_spark.functions import curation as cu
    from dc43_spark.io.bucketing import plan_string

    good = ["the quick brown fox jumps with fluent readable sentences %d" % i
            for i in range(40)]
    bad = ["zzz xxx qqq kkk www lll %d" % i for i in range(40)]
    rows = [(i, 1, t) for i, t in enumerate(good)] + [
        (100 + i, 0, t) for i, t in enumerate(bad)
    ]
    df = spark.createDataFrame(rows, "doc_id long, label int, text string")
    model = cu.train_quality_lr(df, "label", n_features=256, iters=25)
    scored = cu.quality_lr_score(df, model)
    probs = {r.doc_id: r.quality_prob for r in scored.collect()}
    good_scores = [probs[i] for i in range(40)]
    bad_scores = [probs[100 + i] for i in range(40)]
    assert min(good_scores) > max(bad_scores)  # fully separable corpus
    # scoring is a pure projection: zero shuffle, no Python in the plan
    plan = plan_string(scored, "simple")
    assert "Exchange" not in plan and "EvalPython" not in plan
    # empty docs score NULL, and every row survives
    extra = spark.createDataFrame([(999, 1, "")], "doc_id long, label int, text string")
    out = {r.doc_id: r.quality_prob for r in cu.quality_lr_score(extra, model).collect()}
    assert out == {999: None}


def test_evaluate_quality_lr_holdout_metrics(spark):
    """The training loop's missing half: train on one slice, evaluate on a
    DISJOINT holdout — AUC ~= 1 on the separable corpus, operating-point
    precision/recall/accuracy perfect, and the metrics surface as rows in
    the filter observability report channel."""
    from dc43_spark.functions import curation as cu

    def mk(lo, hi):
        rows = [
            (i, 1, "the quick brown fox jumps with fluent readable prose %d" % i)
            for i in range(lo, hi)
        ] + [
            (1000 + i, 0, "zzz xxx qqq kkk www lll %d" % i)
            for i in range(lo, hi)
        ]
        return spark.createDataFrame(rows, "doc_id long, label int, text string")

    train, holdout = mk(0, 40), mk(40, 60)
    model = cu.train_quality_lr(train, "label", n_features=256, iters=25)
    m = cu.evaluate_quality_lr(holdout, model, "label")
    assert m["auc"] is not None and m["auc"] > 0.99
    assert m["precision"] == 1.0 and m["recall"] == 1.0
    assert m["f1"] == 1.0 and m["accuracy"] == 1.0
    assert m["n_pos"] == 20 and m["n_neg"] == 20 and m["n_scored"] == 40
    assert m["n_unscored"] == 0

    # report rows: classifier quality in the same channel as drop reasons
    report = cu.quality_eval_report_rows(spark, m)
    rows = {r.reason: r.n_docs for r in report.collect()}
    assert rows["classifier_auc_micro"] >= 990_000
    assert rows["classifier_precision_micro"] == 1_000_000
    assert rows["classifier_n_scored"] == 40
    # and it unions cleanly with a corpus_filter reason histogram
    flt = cu.corpus_filter(holdout.select("doc_id", "text"))
    hist = (
        flt.groupBy(F.col("keep").cast("string").alias("reason"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    combined = hist.unionByName(report)
    assert combined.count() == hist.count() + report.count()


def test_evaluate_quality_lr_degenerate_and_unscored(spark):
    """Single-class holdout -> AUC undefined (None, not a crash); empty
    documents are counted unscored, not silently dropped."""
    from dc43_spark.functions import curation as cu

    train = spark.createDataFrame(
        [(i, 1, "good fluent text %d" % i) for i in range(20)]
        + [(100 + i, 0, "zzz qqq %d" % i) for i in range(20)],
        "doc_id long, label int, text string",
    )
    model = cu.train_quality_lr(train, "label", n_features=64, iters=10)
    one_class = spark.createDataFrame(
        [(1, 1, "good fluent text a"), (2, 1, ""), (3, 1, "good fluent text b")],
        "doc_id long, label int, text string",
    )
    m = cu.evaluate_quality_lr(one_class, model, "label")
    assert m["auc"] is None
    assert m["n_scored"] == 2 and m["n_unscored"] == 1
    assert m["n_pos"] == 2 and m["n_neg"] == 0
    assert m["recall"] == 1.0  # both true positives found
    assert m["accuracy"] == 1.0


def test_mix_by_weight_randomized_vs_python_reference(spark):
    """Bulk parity: copy counts from the Spark operator equal a
    pure-Python reimplementation of the md5-bucket rule across random
    factor maps and key spaces."""
    import hashlib
    import random

    from dc43_spark.functions import curation as cu

    def py_bucket(key, seed="dc43"):
        h = int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:12], 16)
        return h % 1_000_000

    for seed in range(3):
        rng = random.Random(seed)
        strata = ["a", "b", "c", "d"]
        factors = {s: round(rng.uniform(0, 3.5), 3) for s in strata[:3]}
        default = round(rng.uniform(0, 2), 3)
        rows = [(i, rng.choice(strata)) for i in range(300)]
        df = spark.createDataFrame(rows, "k long, dom string")
        got = {}
        out = cu.mix_by_weight(df, "k", "dom", factors, default_factor=default)
        for r in out.collect():
            got[r.k] = got.get(r.k, 0) + 1
        want = {}
        for k, dom in rows:
            fm = int(round(factors.get(dom, default) * 1_000_000))
            nc = fm // 1_000_000 + (1 if py_bucket(k) < fm % 1_000_000 else 0)
            if nc > 0:
                want[k] = nc
        assert got == want, seed


def _py_feature_ids(text, n_features, ns=(1, 2)):
    toks = [t.lower() for t in text.split()]
    grams = []
    for n in ns:
        if n == 1:
            grams += toks
        elif len(toks) >= n:
            grams += [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    return [int(hashlib.md5(g.encode()).hexdigest()[:7], 16) % n_features for g in grams]


def test_dsir_log_weights_match_python_reference(spark):
    """Bit-level parity with an independent pure-Python DSIR: same md5
    feature hashing, same add-one smoothing, same log-ratio sum."""
    from dc43_spark.functions import curation as cu

    n_features = 256
    src_rows = [(i, f"the quick brown fox number {i} jumps") for i in range(15)] + [
        (100 + i, f"zzz qqq spam {i} buy now") for i in range(15)
    ]
    tgt_rows = [(i, f"the quick brown fox {i} leaps gracefully") for i in range(10)]
    src = spark.createDataFrame(src_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    out = {
        r.doc_id: r.log_weight
        for r in cu.dsir_log_weights(src, tgt, n_features=n_features).collect()
    }

    tgt_counts = [0] * n_features
    for _, t in tgt_rows:
        for f in _py_feature_ids(t, n_features):
            tgt_counts[f] += 1
    src_counts = [0] * n_features
    for _, t in src_rows:
        for f in _py_feature_ids(t, n_features):
            src_counts[f] += 1
    dt = sum(tgt_counts) + n_features
    ds = sum(src_counts) + n_features
    diff = [
        math.log((tgt_counts[i] + 1) / dt) - math.log((src_counts[i] + 1) / ds)
        for i in range(n_features)
    ]
    for doc_id, text in src_rows:
        ref = sum(diff[f] for f in _py_feature_ids(text, n_features))
        assert abs(out[doc_id] - ref) < 1e-9, doc_id

    # semantics: target-like docs outweigh junk
    fox = [out[i] for i in range(15)]
    junk = [out[100 + i] for i in range(15)]
    assert min(fox) > max(junk)


def test_dsir_resample_enriches_target_like_docs(spark):
    """Gumbel-top-k resampling keeps mostly target-like documents, is
    deterministic under a fixed seed, and changes under another seed."""
    from dc43_spark.functions import curation as cu
    from dc43_spark.io.bucketing import plan_string

    src = spark.createDataFrame(
        [(i, f"the quick brown fox number {i} jumps") for i in range(30)]
        + [(100 + i, f"zzz qqq spam {i} buy now click") for i in range(30)],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame(
        [(i, f"the quick brown fox {i} leaps gracefully") for i in range(10)],
        "doc_id long, text string",
    )
    w = cu.dsir_log_weights(src, tgt, n_features=512)
    picked = cu.dsir_resample(w, 20)
    ids = {r.doc_id for r in picked.collect()}
    assert len(ids) == 20
    assert sum(1 for i in ids if i < 100) >= 16  # heavily enriched
    # deterministic under the same seed
    again = {r.doc_id for r in cu.dsir_resample(w, 20).collect()}
    assert again == ids
    other = {r.doc_id for r in cu.dsir_resample(w, 20, seed="other").collect()}
    assert other != ids
    # top-k plans as TakeOrdered, never a global sort shuffle
    plan = plan_string(cu.dsir_resample(w, 20), "simple")
    assert "TakeOrderedAndProject" in plan
    # scoring itself is a zero-shuffle projection
    score_plan = plan_string(w, "simple")
    assert "Exchange" not in score_plan and "EvalPython" not in score_plan


def test_dsir_degenerate_inputs(spark):
    from dc43_spark.functions import curation as cu

    empty_text = spark.createDataFrame([(1, "")], "doc_id long, text string")
    tgt = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        cu.dsir_log_weights(empty_text, tgt)
    src = spark.createDataFrame(
        [(1, "a b"), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r.log_weight for r in cu.dsir_log_weights(src, tgt, n_features=64).collect()}
    assert out[2] == 0.0  # featureless doc scores neutral, not NULL
