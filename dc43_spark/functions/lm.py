"""Distributed n-gram language model: train + perplexity scoring.

The missing stage of the corpus-quality pipeline: CCNet (Wenzek et al.
2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data") filters web text by KenLM 5-gram perplexity — documents
whose token stream the LM finds improbable are gibberish, boilerplate
soup or machine spam. This module implements the same signal with
STUPID BACKOFF smoothing (Brants et al. 2007, "Large Language Models in
Machine Translation"), the scheme DESIGNED for distributed training:
no discounting pass, no normalization — raw relative frequencies with a
fixed backoff factor, which Brants showed approaches Kneser-Ney quality
at scale while training as two map-reduce count jobs.

    S(w | c_{k-1}) = count(c w) / count(c)        if count(c w) > 0
                   = alpha * S(w | shorter c)     otherwise
    S(w)           = count(w) / N                 (unigram base)
    S(unk)         = 0.5 / N                      (documented OOV floor)

Reference parity: the dc43 reference has no LM stage; this extends the
corpus-filter family (curation.py: C4/Gopher heuristics,
bigram_familiarity's count-threshold "LM-lite") with real log-prob
scoring. Tokenisation is the shared whitespace splitter (text.tokens),
so the LM composes with the existing pipeline's token counts.

Scale shape (the whole point):

- **Training is ONE explode + ONE partially-aggregated shuffle** for
  every order at once: each document emits all its 1..order-grams
  (windows END at a real token; contexts pad with <s>), and one
  groupBy(ngram) count produces the whole model. Counts live in a
  DataFrame keyed by the ngram string — the model is DATA, never
  collected to the driver, so a 100 TB corpus trains a model bigger
  than any single machine.
- **Scoring is ONE lookup join + two re-aggregations.** Each scored
  position needs up to 2*order-1 count lookups (ngram + context at
  each level); they are exploded as TAGGED keys and resolved with a
  single join against the counts relation, then pivoted back per
  position and folded per document. Hot keys (stopword unigrams) are
  exactly the shape AQE skew-split handles. No Python touches a row:
  everything is codegen'd expressions (the plan is pinned UDF-free).
- min_count pruning bounds the model for serving; pruned n-grams
  behave as unseen (they back off), identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dc43_spark.functions.text import tokens

#: sentence-start padding token (KenLM's <s> convention). Never scored,
#: only context; a real corpus token spelled "<s>" would collide, which
#: mirrors KenLM's own reserved-token rule.
BOS = "<s>"


def _padded(toks: Column, order: int) -> Column:
    return F.concat(
        F.array_repeat(F.lit(BOS), order - 1), toks
    )


def _window(padded: Column, i: Column, order: int, k: int) -> Column:
    """The k-gram ending at real-token position ``i`` (1-based):
    padded[i + order - k .. i + order - 1] joined with spaces."""
    return F.concat_ws(" ", F.slice(padded, i + F.lit(order - k), k))


def _context(padded: Column, i: Column, order: int, k: int) -> Column:
    """The (k-1)-token CONTEXT of the k-gram ending at ``i`` — same
    start, one shorter: padded[i + order - k .. i + order - 2]."""
    return F.concat_ws(" ", F.slice(padded, i + F.lit(order - k), k - 1))


def _positions(toks: Column) -> Column:
    """1..len(toks) — guarded, because Spark's ``sequence(1, 0)`` steps
    DOWNWARD and would fabricate two positions for an empty document."""
    return F.when(
        F.size(toks) > 0, F.sequence(F.lit(1), F.size(toks))
    ).otherwise(F.array().cast("array<int>"))


def train_ngram_lm(
    df: DataFrame,
    text_col: str = "text",
    *,
    order: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Count every 1..order-gram of the corpus -> (ngram, n, count).

    ``n`` is the gram order (split size), derivable but materialised for
    cheap filtering. Windows END at real tokens and PAD context with
    <s>, so a document's first word still gets a full-order context row
    — the KenLM convention — while unigram counts see only real tokens
    (N = sum of order-1 counts = corpus token count, exactly).
    ``min_count`` > 1 drops rare n-grams of EVERY order (model-size
    bound for serving); scoring treats pruned grams as unseen and backs
    off, the standard serving approximation."""
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    toks = tokens(text_col)
    padded = _padded(toks, order)
    grams = F.flatten(
        F.transform(
            _positions(toks),
            lambda i: F.array(
                *[_window(padded, i, order, k) for k in range(1, order + 1)]
            ),
        )
    )
    counted = (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
        .select(
            "ngram",
            F.size(F.split("ngram", " ")).cast("int").alias("n"),
            "count",
        )
    )
    if min_count > 1:
        counted = counted.filter(F.col("count") >= min_count)
    return counted


def score_ngram_lm(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    order: int = 3,
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document stupid-backoff log-probability and perplexity.

    Output: (id, n_tokens, logprob, ppl) — ``logprob`` is the natural-log
    sum over all token positions, ``ppl = exp(-logprob / n_tokens)``;
    empty documents keep a row with n_tokens=0 and NULL scores.

    Every position explodes into its tagged lookup keys (the k-gram AND
    its (k-1)-context for k = order..2, plus the unigram), resolved with
    ONE join against ``lm`` and pivoted back per position — a constant
    2*order-1 row amplification, one shuffle join, two partial-agg
    shuffles, zero UDFs.

    Two documented approximations, both standard for stupid backoff and
    both mirrored exactly by the in-test oracle: (a) denominators are
    the context's GRAM count (its count ending at a real token), not its
    prefix count — they differ only at document-final positions, and the
    ratio stays <= 1; (b) a context containing <s> padding was never
    counted as a gram, so the first order-1 positions of a document back
    off toward the unigram (KenLM instead counts <s> contexts
    explicitly)."""
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    total_row = (
        lm.filter(F.col("n") == 1)
        .agg(F.sum("count").cast("double").alias("_N"))
    )
    toks = tokens(text_col)
    padded = _padded(toks, order)
    # tag layout: g<k> = the k-gram at this position, x<k> = its context
    tags = []
    for k in range(order, 1, -1):
        tags.append((f"g{k}", k, False))
        tags.append((f"x{k}", k, True))
    tags.append(("g1", 1, False))

    def keys_at(i: Column) -> Column:
        pairs = []
        for tag, k, is_ctx in tags:
            key = (
                _context(padded, i, order, k)
                if is_ctx
                else _window(padded, i, order, k)
            )
            pairs.append(F.struct(F.lit(tag).alias("tag"), key.alias("key")))
        return F.array(*pairs)

    positions = df.select(
        F.col(id_col),
        F.posexplode_outer(
            F.transform(_positions(toks), keys_at)
        ).alias("_pos", "_keys"),
    )
    lookups = positions.select(
        id_col, "_pos", F.explode("_keys").alias("_kv")
    ).select(id_col, "_pos", F.col("_kv.tag").alias("_tag"), F.col("_kv.key").alias("_key"))
    resolved = lookups.join(
        lm.select(F.col("ngram").alias("_key"), F.col("count").alias("_c")),
        "_key",
        "left",
    )
    per_pos = resolved.groupBy(id_col, "_pos").agg(
        *[
            F.max(F.when(F.col("_tag") == t, F.col("_c"))).alias(t)
            for t, _k, _ctx in tags
        ]
    )
    # stupid backoff cascade, innermost (unigram + OOV floor) outwards
    score = F.coalesce(F.col("g1").cast("double"), F.lit(0.5)) / F.col("_N")
    for k in range(2, order + 1):
        score = F.when(
            F.col(f"g{k}").isNotNull() & F.col(f"x{k}").isNotNull(),
            F.col(f"g{k}").cast("double") / F.col(f"x{k}").cast("double"),
        ).otherwise(F.lit(alpha) * score)
    per_doc = (
        per_pos.crossJoin(F.broadcast(total_row))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(F.log(score)).alias("logprob"),
        )
    )
    # posexplode_outer keeps empty docs as a NULL-pos row: count them as 0
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(
                F.when(F.col("logprob").isNotNull(), F.col("_n")), F.lit(0)
            ).cast("long").alias("n_tokens"),
            F.col("logprob"),
            F.when(
                F.col("logprob").isNotNull(),
                F.exp(-F.col("logprob") / F.col("_n")),
            ).alias("ppl"),
        )
    )


def perplexity_partition(
    scored: DataFrame,
    *,
    head: float,
    tail: float,
    ppl_col: str = "ppl",
) -> DataFrame:
    """CCNet's head/middle/tail split: label each document by its
    perplexity against two fixed cutoffs (CCNet derives them as corpus
    terciles; compute those once with approxQuantile and pass them in —
    keeping this a zero-shuffle projection). NULL ppl (empty docs) ->
    'tail', matching CCNet's treatment of unscorable content."""
    if not head < tail:
        raise ValueError(f"need head < tail, got {head} >= {tail}")
    c = F.col(ppl_col)
    return scored.withColumn(
        "ppl_bucket",
        F.when(c.isNull(), F.lit("tail"))
        .when(c <= F.lit(head), F.lit("head"))
        .when(c <= F.lit(tail), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
