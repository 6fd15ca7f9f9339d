"""Training-data curation operators: repetition analysis, deterministic
sampling, corpus vocabulary, and embedding-level near-dup pruning.

These are beyond-reference capabilities (the dc43 reference stops at
contract governance); they cover the corpus-preparation stages a
large-scale LLM data pipeline runs between ingestion and training:

- ``ngram_repetition``     — Gopher-style intra-document repetition
                             metrics (duplicate n-gram fraction, top
                             n-gram fraction) for boilerplate/spam
                             filtering.
- ``hash_sample`` /
  ``stratified_sample``    — deterministic, reproducible sampling from a
                             md5-derived uniform bucket: the same row set
                             is selected on every engine and every run,
                             so ablations and holdouts are replayable.
- ``term_counts`` /
  ``vocab_top_terms`` /
  ``tf_idf``               — corpus vocabulary statistics and TF-IDF
                             weighting for tokenizer training and
                             quality filtering.
- ``embedding_near_dups``  — semantic (embedding-cosine) near-duplicate
                             pruning via seeded random-hyperplane LSH
                             buckets: the SemDeDup-shaped scale path
                             where candidate pairs exist only inside a
                             bucket, never all-pairs.

Scale notes (100 TB):
- repetition/vocab ops explode tokens then aggregate with map-side
  combine — shuffle volume is bounded by the token stream, and the
  second-stage keys (doc_id / term) are high-cardinality and uniform;
- sampling is a narrow filter (zero shuffle) and composes with partition
  pruning;
- embedding dedup shuffles on the LSH bucket id, so cluster-local
  cosine work replaces the quadratic all-pairs join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dc43_spark.functions.dedup import token_shingles
from dc43_spark.functions.similarity import cosine, hyperplanes, lsh_bucket_join
from dc43_spark.functions.text import tokens
from dc43_spark.localdf import local_df

#: denominator for micro-unit ratios and sampling buckets (1e6 = ppm).
MICRO = 1_000_000


def micro_ratio(num: Column, den: Column) -> Column:
    """round(num/den * 1e6) half-up, exactly, in BIGINT arithmetic.

    Cross-engine stable where ``round(double, n)`` is not: Spark rounds
    the shortest decimal repr of a double while DuckDB rounds the exact
    binary value, so ratios in gate outputs are always emitted through
    this helper (DuckDB twin: ``(2*num*1000000 + den) // (2*den)``).

    Integral ``div`` — NOT float ``/`` + cast, which loses exactness once
    ``2*num*1e6`` passes 2^53 and diverges from the DuckDB twin. Domain:
    num <= den < ~4.6e12 (int64 / 2e6), far beyond any per-document
    count."""
    return F.call_function(
        "div", F.lit(2) * num * F.lit(MICRO) + den, F.lit(2) * den
    ).cast("long")


# ------------------------------------------------------------ repetition


def ngram_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
) -> DataFrame:
    """Gopher-style repetition metrics per document.

    Output: (id, n_ngrams, n_distinct, dup_micro, top_micro) where
    ``dup_micro`` is the fraction of n-grams that are repeats of an
    earlier occurrence (1 - distinct/total) and ``top_micro`` is the
    fraction claimed by the single most frequent n-gram — the two
    classic boilerplate/template detectors.

    Shape: explode n-grams (with multiplicity) -> count per (doc, gram)
    -> per-doc totals. Both aggregations partial-combine map-side; the
    shuffle key (doc_id, gram) is high-cardinality and uniform, so this
    survives arbitrarily long documents where a per-row O(len^2)
    mode-of-array expression would not.
    """
    sh = df.select(
        F.col(id_col),
        F.explode(token_shingles(text_col, n, distinct=False)).alias("_sh"),
    )
    per_gram = sh.groupBy(id_col, "_sh").agg(F.count(F.lit(1)).alias("_c"))
    totals = per_gram.groupBy(id_col).agg(
        F.sum("_c").cast("long").alias("n_ngrams"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("_c").cast("long").alias("_top"),
    )
    return totals.select(
        F.col(id_col),
        "n_ngrams",
        "n_distinct",
        micro_ratio(F.col("n_ngrams") - F.col("n_distinct"), F.col("n_ngrams")).alias(
            "dup_micro"
        ),
        micro_ratio(F.col("_top"), F.col("n_ngrams")).alias("top_micro"),
    )


# -------------------------------------------------------------- sampling


def sample_bucket(key: Column | str, *, seed: str = "dc43") -> Column:
    """Deterministic uniform bucket in [0, 1e6) from md5(seed|key).

    48 bits of the md5 prefix mod 1e6 — modulo bias ~2^-28, irrelevant
    for sampling. Pure JVM expression, zero shuffle, and byte-identical
    in any engine with md5 (DuckDB twin:
    ``('0x' || substr(md5(seed || '|' || key::VARCHAR), 1, 12))::BIGINT
    % 1000000``)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(seed), c.cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")
    return h % MICRO


def hash_sample(
    df: DataFrame, key_col: str, rate: float, *, seed: str = "dc43"
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows keyed on ``key_col``.

    Unlike ``df.sample()`` this is stable across runs, partitionings and
    engines — the reproducibility contract a training-data pipeline
    needs for holdouts and ablations. Rows with the same key always land
    on the same side of the cut."""
    return df.filter(sample_bucket(key_col, seed=seed) < int(round(rate * MICRO)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
    seed: str = "dc43",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance languages).

    ``rates`` maps stratum value -> keep fraction; strata not listed get
    ``default_rate``. A narrow filter — zero shuffle — so it composes
    with partition pruning when the data is partitioned by the stratum."""
    threshold: Column = F.lit(int(round(default_rate * MICRO)))
    for value in sorted(rates):  # deterministic CASE order
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(round(rates[value] * MICRO)))
        ).otherwise(threshold)
    return df.filter(sample_bucket(key_col, seed=seed) < threshold)


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    *,
    seed: str = "dc43",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint split assignment (train/val/test): each row
    gets the split whose cumulative-weight interval its md5 bucket falls
    in. Weights must sum to <= 1; rows past the total get NULL (use 1.0
    total for an exhaustive split).

    Splits are stable under corpus growth: a row's assignment depends
    only on (seed, key), so adding data never reshuffles existing rows
    between train and test — the property that keeps eval sets
    uncontaminated across dataset versions."""
    total = sum(splits.values())
    if total > 1 + 1e-9:
        raise ValueError("split weights must sum to <= 1")
    bucket = sample_bucket(key_col, seed=seed)
    bounds = []
    acc = 0.0
    for name in sorted(splits):  # deterministic interval order
        acc += splits[name]
        bounds.append((name, int(round(acc * MICRO))))
    # build the CASE from the highest boundary down so the lowest interval
    # wins in the final WHEN chain
    expr: Column = F.lit(None).cast("string")
    for name, bound in reversed(bounds):
        expr = F.when(bucket < bound, F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def mix_by_weight(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    factors: dict[str, float],
    *,
    default_factor: float = 1.0,
    seed: str = "dc43",
    copy_col: str = "copy",
) -> DataFrame:
    """Deterministic domain re-weighting with FRACTIONAL epochs — the
    data-mixture primitive (down-weight an over-represented domain,
    repeat an under-represented one, e.g. multilingual rebalancing or
    code/web/books mixture weights for a pre-training run).

    Each row is emitted ``floor(f)`` times plus one more when its md5
    bucket falls under ``frac(f)``, where ``f`` is its stratum's factor:
    factor 0.8 keeps a deterministic 80% (same rule as
    ``stratified_sample``), factor 2.5 emits every row twice plus a
    deterministic half of them a third time. Emitted copies carry a
    0-based ``copy`` index so downstream shuffling/packing can distinguish
    them. Stable across runs/partitionings/engines: the bucket depends
    only on (seed, key), so growing the corpus never changes which
    existing rows repeat — the reproducibility contract ablations need.

    Scale shape: one narrow projection + per-row ``explode(sequence)``;
    ZERO shuffle, output volume = sum of factors weighted by strata
    sizes. No epoch loop materialises the corpus N times — repetition is
    a generator the consumer streams."""
    for value, f in factors.items():
        if f < 0:
            raise ValueError(f"negative mix factor {f!r} for stratum {value!r}")
    if default_factor < 0:
        raise ValueError("default_factor must be >= 0")
    fm: Column = F.lit(int(round(default_factor * MICRO)))
    for value in sorted(factors):  # deterministic CASE order
        fm = F.when(
            F.col(strata_col) == value, F.lit(int(round(factors[value] * MICRO)))
        ).otherwise(fm)
    bucket = sample_bucket(key_col, seed=seed)
    n_copies = (fm / F.lit(MICRO)).cast("long") + (bucket < fm % MICRO).cast("long")
    return (
        df.withColumn("_nc", n_copies)
        .filter(F.col("_nc") > 0)
        .select(
            "*",
            F.explode(F.sequence(F.lit(0), (F.col("_nc") - 1).cast("int"))).alias(
                copy_col
            ),
        )
        .drop("_nc")
    )


def bigram_familiarity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_count: int = 3,
) -> DataFrame:
    """Corpus-familiarity fluency score — the LM-scoring-lite quality
    signal: per document, the fraction of its consecutive token bigrams
    (with multiplicity) whose CORPUS frequency reaches ``min_count``.
    Fluent running text repeats the corpus's common transitions; gibberish,
    mangled extractions and boilerplate-free keyword spam score low. The
    n-gram-LM idea without float log-probs: the score is an integer
    micro-ratio, so it is exactly reproducible on any engine.

    Output: (id, n_bigrams, common_micro); documents with fewer than two
    tokens have 0 bigrams and a NULL score.

    Scale shape: one explode of the token stream (bigram keys are md5-free
    strings, partial-agg combine on the count), one count join keyed on
    the bigram (hot bigrams are exactly what AQE skew-split handles), one
    per-doc re-aggregation. Nothing is ever all-pairs and no vocabulary
    is collected to the driver."""
    toks = tokens(text_col)

    def build(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(t) - 1)
        return F.when(F.size(t) < 2, F.array().cast("array<string>")).otherwise(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", F.element_at(t, i.cast("int")), F.element_at(t, (i + 1).cast("int"))
                ),
            )
        )

    bigrams = F.element_at(F.transform(F.array(toks), build), 1)
    bg = df.select(F.col(id_col), F.explode(bigrams).alias("_bg"))
    counts = bg.groupBy("_bg").agg(F.count(F.lit(1)).cast("long").alias("_c"))
    per_doc = (
        bg.join(counts, "_bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum((F.col("_c") >= min_count).cast("long")).alias("_common"),
        )
    )
    # explode emits nothing for docs with <2 tokens — rejoin so they keep
    # an explicit zero-bigram row instead of vanishing
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.when(
                F.col("n_bigrams").isNotNull(),
                micro_ratio(F.col("_common"), F.col("n_bigrams")),
            ).alias("common_micro"),
        )
    )


# ------------------------------------------------------------ vocabulary


def term_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    tokens_col: str | None = None,
) -> DataFrame:
    """(term, tf, df): corpus term frequency + document frequency.

    Two sequential partial-aggregated shuffles — (id, term) then (term) —
    instead of a single ``count + countDistinct`` aggregate, which would
    plan an Expand doubling the shuffle volume. ``tokens_col`` names an
    already-tokenized array column to reuse (a pipeline that persisted
    its token arrays skips the re-split)."""
    toks = F.col(tokens_col) if tokens_col else tokens(text_col)
    t = df.select(F.col(id_col), F.explode(toks).alias("term"))
    per_doc = t.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("_tf"))
    return per_doc.groupBy("term").agg(
        F.sum("_tf").cast("long").alias("tf"),
        F.count(F.lit(1)).cast("long").alias("df"),
    )


def vocab_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    top_n: int = 100,
    tokens_col: str | None = None,
    with_df: bool = True,
) -> DataFrame:
    """Top-N corpus terms by frequency, deterministically tie-broken
    (tf DESC, term ASC) so the result set is engine-stable. This is the
    vocabulary-building primitive for tokenizer training.

    ``with_df=False`` drops the document-frequency column and its per-doc
    pre-aggregation — ranking needs only tf, so a consumer that doesn't
    read ``df`` gets a single-shuffle plan (explode -> count per term)."""
    if with_df:
        counts = term_counts(df, text_col, id_col, tokens_col=tokens_col)
    else:
        toks = F.col(tokens_col) if tokens_col else tokens(text_col)
        counts = (
            df.select(F.explode(toks).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        )
    return counts.orderBy(F.col("tf").desc(), F.col("term").asc()).limit(top_n)


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_df: int = 1,
) -> DataFrame:
    """(id, term, tf, df, tfidf): per-document TF-IDF weights.

    tfidf = tf * ln(N / df) with N the corpus document count, carried as
    a broadcast 1-row aggregate (no driver collect, single job). Term
    document-frequencies join back by term — a shuffle join keyed on the
    term, skew-bounded because ``min_df`` prunes the head only if asked;
    stopword-scale terms stay uniform enough for AQE to split."""
    t = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    per_doc = t.groupBy(id_col, "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    doc_freq = per_doc.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    if min_df > 1:
        doc_freq = doc_freq.filter(F.col("df") >= min_df)
    n_docs = df.agg(F.countDistinct(id_col).cast("double").alias("_n"))
    return (
        per_doc.join(doc_freq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            (F.col("tf") * F.log(F.col("_n") / F.col("df"))).alias("tfidf"),
        )
    )


# -------------------------------------------------------------- chunking


def token_chunks(
    col: Column | str, *, chunk_size: int = 128, overlap: int = 32
) -> Column:
    """Overlapping token windows as array<struct<chunk_idx, chunk_text,
    n_tokens>> — the pre-training chunking primitive (split long documents
    into model-context-sized pieces, keep ``overlap`` tokens of continuity
    between neighbours).

    Chunk i covers tokens [i*stride, i*stride + chunk_size) with
    stride = chunk_size - overlap; the last chunk may be short; empty
    documents produce no chunks. Pure array expressions — one tokenizer
    run per document (bound via the one-element-transform trick), zero
    shuffle."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toks = tokens(col)

    def build(t: Column) -> Column:
        n = F.size(t)
        starts = F.filter(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
            lambda s: s < n,
        )
        return F.transform(
            starts,
            lambda s: F.struct(
                (s / stride).cast("long").alias("chunk_idx"),
                F.array_join(F.slice(t, s + 1, chunk_size), " ").alias("chunk_text"),
                F.least(F.lit(chunk_size).cast("long"), (n - s).cast("long")).alias(
                    "n_tokens"
                ),
            ),
        )

    return F.element_at(F.transform(F.array(toks), build), 1)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    chunk_size: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Explode documents into overlapping training chunks:
    (id, chunk_idx, chunk_text, n_tokens), one row per chunk.

    Narrow generator (explode of a per-row array) — no shuffle; output
    partitioning inherits the input, so a downstream repartition or
    write stays the only exchange."""
    ch = token_chunks(text_col, chunk_size=chunk_size, overlap=overlap)
    return df.select(F.col(id_col), F.explode(ch).alias("_c")).select(
        id_col, "_c.chunk_idx", "_c.chunk_text", "_c.n_tokens"
    )


# ------------------------------------------------------- decontamination


def ngram_contamination(
    df: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 3,
    min_overlap: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Train/test leakage detector: (doc_id, bench_id, n_shared) for every
    corpus document sharing >= ``min_overlap`` distinct n-gram shingles
    with a benchmark item — the standard decontamination pass before
    training on scraped data.

    Scale shape: benchmark sets are tiny relative to a 100 TB corpus, so
    the exploded benchmark shingles are BROADCAST; the corpus side stays
    a narrow explode feeding a broadcast hash join (zero shuffle of
    corpus data) and a (doc, bench) partial-agg count."""
    corpus_sh = df.select(
        F.col(id_col), F.explode(token_shingles(text_col, n)).alias("_sh")
    )
    bench_sh = benchmark.select(
        F.col(bench_id_col), F.explode(token_shingles(bench_text_col, n)).alias("_sh")
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), on="_sh")
        .groupBy(id_col, bench_id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )


# ------------------------------------------------------ sequence packing


def pack_chunks(
    chunks: DataFrame,
    *,
    budget: int,
    shards: int = 32,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tok_col: str = "n_tokens",
    shard_expr: Column | None = None,
) -> DataFrame:
    """Concat-and-chop sequence packing plan: assign every chunk a
    (shard, bin_id, tok_offset) so training examples are built by
    concatenating each bin's chunks in order — the standard pretraining
    packing that wastes no context ("chop at every ``budget`` tokens").

    Chunks are sharded deterministically (hash of the doc id mod
    ``shards``) and packed shard-locally with one window cumsum, so the
    only state is per-shard — at cluster scale each shard's window runs
    partition-local instead of forcing a single global ordering. A bin
    holds chunks from MANY documents (that is the point: short documents
    fill context that would otherwise be padding).

    Bin semantics: a chunk belongs to the bin its START offset falls in
    (``tok_offset // budget``), so a bin can exceed ``budget`` by up to
    chunk_size - 1 tokens when a chunk straddles the boundary — size the
    model context as budget + chunk_size (or let the consumer trim the
    tail). Exact cut-at-budget chopping would have to SPLIT chunks, which
    this planner deliberately never does.

    ``shard_expr`` overrides the shard hash (default xxhash64 — fastest
    JVM-side; pass a ``sample_bucket``-based expression when the plan
    must be replicated on an engine without xxhash64)."""
    if shard_expr is None:
        shard_expr = F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
    shard = shard_expr.cast("long").alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col), F.col(idx_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(tok_col).over(w), F.lit(0).cast("long"))
    return (
        chunks.select("*", shard)
        .withColumn("tok_offset", before)
        .withColumn("bin_id", (F.col("tok_offset") / budget).cast("long"))
    )


# ------------------------------------------- embedding near-dup pruning


def embedding_near_dups(
    df: DataFrame,
    *,
    threshold: float = 0.9,
    n_planes: int = 8,
    seed: int = 42,
    multi_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    scale: int = 6,
) -> DataFrame:
    """Semantic near-duplicates: (vec_id, dup_of, cosine) for every vector
    that shares an LSH bucket with a LOWER-id vector at cosine >=
    ``threshold``; ``dup_of`` is the lowest such neighbour. Dropping the
    returned ``vec_id`` rows keeps one canonical representative per
    detected near-dup pair — the SemDeDup-shaped pruning step.

    Scale shape: bucket ids from ``n_planes`` seeded hyperplanes are the
    equi-join key, so cosine is evaluated only inside buckets (plus
    Hamming-1 probes when ``multi_probe``), never all-pairs. Determinism:
    seeded hyperplane literals + half-up-stable rounding make the output
    exactly reproducible (and exactly oracle-checkable) despite LSH being
    an approximation of the all-pairs semantics."""
    if dim is None:
        probe = df.select(F.size(vec_col)).first()
        if probe is None or probe[0] is None:
            raise ValueError(
                "cannot infer embedding dim from an empty input — pass dim="
            )
        dim = int(probe[0])
    planes = hyperplanes(dim, n_planes, seed=seed)
    vecs = df.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).cast("array<double>").alias("n_vec"),
    )
    q = vecs.select(F.col("n_id").alias("q_id"), F.col("n_vec").alias("q_vec"))
    pairs = (
        lsh_bucket_join(q, vecs, planes, multi_probe=multi_probe)
        .filter(F.col("q_id") > F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), scale).alias("_cos"),
        )
        .filter(F.col("_cos") >= threshold)
        .distinct()  # multi-probe can surface the same pair via several buckets
    )
    return pairs.groupBy("q_id").agg(
        F.min("n_id").alias("dup_of"),
        F.min_by("_cos", "n_id").alias("cosine"),
    ).select(F.col("q_id").alias(id_col), "dup_of", "cosine")


def corpus_filter(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 16,
    max_tokens: int = 100_000,
    min_quality_micro: int = 520_000,
    min_stop_micro: int = 10_000,
    allowed_langs: tuple[str, ...] = ("en",),
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Composed C4/Gopher-style corpus filter: one narrow pass emitting
    every signal, the keep/drop verdict, and the ordered drop reasons.

    Rules (all integer micro-units — cross-engine exact):
    - token count within [min_tokens, max_tokens]
    - composite quality score >= min_quality_micro (text.quality_score)
    - stopword ratio >= min_stop_micro — Gopher's natural-language floor:
      running text HAS stopwords; keyword spam and tables don't
    - predicted language in ``allowed_langs``

    Returns (id, n_tokens, quality_micro, stop_micro, lang_pred,
    drop_reasons, keep); downstream materialises ``WHERE keep`` and keeps
    the reason histogram for pipeline observability. Single projection +
    no shuffle: every signal is a narrow expression over the text column,
    so the filter streams at scan speed on any corpus size.

    ``passthrough`` names input columns to carry into the output — a
    pipeline keeping the text of surviving docs then needs NO join back
    to the source (the join is a full-corpus shuffle the projection
    avoids for free)."""
    from dc43_spark.functions import text as tx

    langs = sorted(tx.LANG_MARKERS)
    # ONE bound pass over the token array computes every token-derived
    # signal: the array binds to a lambda variable (transform over a
    # one-element array, the token_shingles trick) so the tokenizer runs
    # once, and each marker set counts via array_contains membership on
    # the lowered tokens instead of a full-text regex scan. Semantics are
    # identical to the word_hits regex (a match IS a whitespace-delimited
    # token equal to a lowered marker — the DuckDB oracles already use
    # the token form); replacing the 6 regex passes (stopwords + 5
    # languages) with one array pass measured 1.95s -> 1.03s on the
    # sf0.1 keep-count probe.
    toks = tx.tokens(text_col)

    def _hits(low: Column, words: list[str]) -> Column:
        arr = F.array(*[F.lit(w) for w in sorted(words)])
        return F.size(F.filter(low, lambda x: F.array_contains(arr, x))).cast("long")

    def build(t: Column) -> Column:
        low = F.transform(t, lambda x: F.lower(x))
        return F.struct(
            F.size(t).cast("long").alias("n"),
            F.size(F.array_distinct(t)).cast("long").alias("dn"),
            _hits(low, tx.DEFAULT_STOPWORDS).alias("stop"),
            *[_hits(low, tx.LANG_MARKERS[lang]).alias(f"h_{lang}") for lang in langs],
        )

    s = F.element_at(F.transform(F.array(toks), build), 1)
    sig = df.select(
        F.col(id_col),
        s.alias("_s"),
        F.length(text_col).cast("long").alias("_tc"),
        F.length(
            F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", "")
        ).cast("long").alias("_pc"),
        *[F.col(c) for c in passthrough],
    )
    n = F.col("_s")["n"]
    dn = F.col("_s")["dn"]
    tc, pc = F.col("_tc"), F.col("_pc")
    minn = F.least(n, F.lit(256).cast("long"))
    qnum = F.lit(4) * minn * tc * n + F.lit(768) * (tc - pc) * n + F.lit(768) * dn * tc
    qden = F.lit(2560) * tc * n
    # argmax language with alphabetical tie-break (see text.lang_id)
    best = F.array_max(
        F.array(
            *[
                F.struct(F.col("_s")[f"h_{lang}"].alias("h"), F.lit(-i).alias("r"))
                for i, lang in enumerate(langs)
            ]
        )
    )
    lang_name = F.element_at(F.array(*[F.lit(lang) for lang in langs]), -best["r"] + 1)
    out = sig.select(
        F.col(id_col),
        n.alias("n_tokens"),
        micro_ratio(qnum, qden).alias("quality_micro"),
        micro_ratio(F.col("_s")["stop"], n).alias("stop_micro"),
        F.when(best["h"] > 0, lang_name).otherwise(F.lit("und")).alias("lang_pred"),
        *[F.col(c) for c in passthrough],
    )
    checks = [
        ("too_short", F.col("n_tokens") < min_tokens),
        ("too_long", F.col("n_tokens") > max_tokens),
        ("low_quality", F.col("quality_micro") < min_quality_micro),
        ("low_stopword", F.col("stop_micro") < min_stop_micro),
        ("lang", ~F.col("lang_pred").isin(*allowed_langs)),
    ]
    reasons = [F.when(cond, F.lit(name)) for name, cond in checks]
    # keep derives from the reasons STRING, not a second evaluation of the
    # conditions: projection collapse inlines every reference to the heavy
    # signal expressions (and the higher-order stopword/marker lambdas run
    # interpreted, so no codegen subexpression elimination rescues the
    # duplicates) — measured 30s -> ~20s on a 100k-doc probe from this
    # alone. The signal COLUMNS in the output still re-inline once each;
    # that is the documented cost of keeping the operator a pure
    # streaming-safe projection (no persist/checkpoint barrier).
    return out.select(
        "*",
        F.concat_ws(",", *reasons).alias("drop_reasons"),
    ).withColumn("keep", F.col("drop_reasons") == "")


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    *,
    top_n: int = 100,
) -> DataFrame:
    """Adjacent-symbol pair frequencies — the distributed kernel of BPE
    tokenizer training (each merge iteration recounts pairs; this operator
    is that count over a corpus).

    Pipeline: BPE pre-tokenization (letter runs / digit runs / single
    punctuation, text.BPE_TOKEN_RE) -> per-token adjacent character pairs
    (with multiplicity) -> global count. Two narrow explodes feeding ONE
    aggregation shuffle on the pair key: partial aggregation collapses the
    exploded stream map-side, and pair keys are high-cardinality/uniform,
    so the shuffle carries at most |vocab|^2 rows per partition regardless
    of corpus size. Top-N with a total tie-break (count desc, pair asc)
    keeps the output deterministic."""
    from dc43_spark.functions.text import BPE_TOKEN_RE

    # column-API regexp_extract_all, NOT an F.expr SQL literal: Spark's SQL
    # parser unescapes '\s' inside single quotes to a plain 's', silently
    # running a different regex than the documented pattern (r4 advice)
    toks = F.explode(
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0))
    ).alias("tok")
    # single-symbol tokens have no pairs; the CASE guard matters because
    # Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of being empty
    pairs = (
        df.select(toks)
        .filter(F.length("tok") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(tok) - 1),"
                    " i -> substring(tok, i, 2))"
                )
            ).alias("pair")
        )
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("pair", "n", F.col("rank").cast("long").alias("rank"))
    )


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    term_col: str = "term",
    unk_id: int = 0,
    literal_map_max: int = 65_536,
    tokens_col: str | None = None,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Encode each document's whitespace tokens to vocabulary ids — the
    terminal tokenization step turning a curated corpus into training
    token sequences. Ids are 1-based ranks in ``vocab`` order (row 1 ->
    id 1); out-of-vocabulary tokens encode as ``unk_id``.

    Two physical strategies, picked by vocabulary size:
    - up to ``literal_map_max`` terms: the vocab becomes a LITERAL map in
      the plan and encoding is `transform(tokens, t -> map[t])` — pure
      JVM projection, ZERO shuffle, streams at scan speed (tokenizer
      vocabularies are 32-128k entries, so this is the normal path);
    - larger: explode tokens with position, broadcast-join the vocab,
      regroup ordered by position — one shuffle on the doc id, still no
      corpus self-join.

    Output: (id, ids array<int>, n_tokens, n_unk). ``tokens_col`` names a
    pre-tokenized array column to encode instead of re-splitting
    ``text_col``; ``passthrough`` input columns are carried into the
    output (the literal-map path stays a pure projection, the join path
    carries them through the doc-id regroup)."""
    terms = [r[term_col] for r in vocab.select(term_col).collect()]
    toks = F.col(tokens_col) if tokens_col else tokens(text_col)
    if len(terms) <= literal_map_max:
        if terms:
            lookup = F.create_map(
                *[x for i, t in enumerate(terms) for x in (F.lit(t), F.lit(i + 1))]
            )
            ids = F.transform(toks, lambda t: F.coalesce(lookup[t], F.lit(unk_id)))
        else:  # empty vocabulary: create_map() is untyped — everything is unk
            ids = F.transform(toks, lambda t: F.lit(unk_id))
        return df.select(
            F.col(id_col),
            ids.cast("array<int>").alias("ids"),
            F.size(toks).cast("long").alias("n_tokens"),
            F.size(F.filter(ids, lambda i: i == unk_id)).cast("long").alias("n_unk"),
            *[F.col(c) for c in passthrough],
        )
    spark = df.sparkSession
    vocab_ids = local_df(
        spark,
        [(t, i + 1) for i, t in enumerate(terms)],
        f"{term_col} string, _vid int",
        coalesce=1,
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(toks).alias("_pos", term_col)
    )
    joined = exploded.join(F.broadcast(vocab_ids), term_col, "left").select(
        id_col, "_pos", F.coalesce("_vid", F.lit(unk_id)).alias("_vid")
    )
    grouped = (
        joined.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_pos", "_vid"))
            ).alias("_pv"),
        )
        .select(
            F.col(id_col),
            F.transform("_pv", lambda s: s["_vid"]).cast("array<int>").alias("ids"),
            F.size("_pv").cast("long").alias("n_tokens"),
            F.size(F.filter("_pv", lambda s: s["_vid"] == unk_id)).cast("long").alias("n_unk"),
        )
    )
    # explode emits nothing for token-less docs — join back so they keep
    # an empty sequence instead of vanishing (parity with the map path)
    return df.select(id_col, *passthrough).join(grouped, id_col, "left").select(
        F.col(id_col),
        F.coalesce("ids", F.array().cast("array<int>")).alias("ids"),
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("n_unk", F.lit(0)).cast("long").alias("n_unk"),
        *[F.col(c) for c in passthrough],
    )


# ----------------------------------------------------------- BPE training


def _merge_word(syms, left: str, right: str) -> list:
    """Greedy left-to-right application of one merge to a symbol list:
    'aaa' under (a,a) becomes ['aa', 'a'] (non-overlapping), matching the
    standard BPE reference behavior."""
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 50,
    min_count: int = 2,
    checkpoint_every: int = 10,
) -> list:
    """FULL distributed BPE tokenizer training (Sennrich et al. 2016) —
    the iterative loop whose single inner step is ``bpe_pair_counts``.

    Returns the learned merge list ``[(left, right, pair_count), ...]`` in
    merge order (the training artifact — bounded by ``n_merges``, so a
    driver-side list by definition, like k-means centroids).

    Distributed formulation (this is NOT the textbook driver-side trainer):
    the training state — one row per distinct pre-token with its corpus
    count and current symbol segmentation — stays a DataFrame end to end.
    Each iteration runs

    1. adjacent-pair count: narrow explode -> ONE partially-aggregated
       shuffle on the pair key (same shape as ``bpe_pair_counts``), then
       ``limit(1)`` — only the winning pair (ONE row) reaches the driver;
    2. merge application: Arrow-batched ``mapInPandas`` over the symbol
       arrays (greedy left-to-right, linear per word).

    The state is re-persisted each round and the previous round is
    unpersisted, so every pair count reads cached state instead of
    replaying all prior merges (a naive chained plan makes total work
    quadratic in ``n_merges``); every ``checkpoint_every`` rounds the
    lineage is truncated with an eager ``localCheckpoint``. At 100 TB the
    state size is the number of DISTINCT pre-tokens — sublinear in corpus
    bytes — and per-round cost is one bounded shuffle, so wall clock
    scales with ``n_merges``, not corpus size.

    Ties break deterministically: highest count, then lexicographically
    smallest (left, right) — UTF-8 binary order equals code-point order,
    so Spark's string sort agrees with the pure-Python reference trainer
    the tests compare against. Stops early when the best pair's count
    drops below ``min_count``.

    Beyond the reference engine (no tokenizer training exists there); the
    pre-tokenization is text.BPE_TOKEN_RE, identical to bpe_pair_counts.
    """
    from dc43_spark.functions.text import BPE_TOKEN_RE

    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0))
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # single-symbol pre-tokens never participate in any pair
        .filter(F.length("w") >= 2)
        # split between characters: not at start AND followed by one
        # (Spark's split keeps trailing empties — a bare (?!^) matches the
        # end-of-string position and appends an empty symbol)
        .select(F.split(F.col("w"), "(?!^)(?=.)").alias("syms"), "cnt")
    )
    cur = words.persist()
    cur.count()
    pair_struct = F.expr(
        "transform(sequence(0, size(syms) - 2),"
        " i -> struct(syms[i] AS l, syms[i + 1] AS r))"
    )
    merges: list = []
    for it in range(n_merges):
        top = (
            cur.filter(F.size("syms") >= 2)
            .select(F.explode(pair_struct).alias("p"), "cnt")
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or int(top[0]["c"]) < min_count:
            break
        left, right, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((left, right, c))

        def apply_merge(batches, left=left, right=right):
            for pdf in batches:
                pdf["syms"] = [list(_merge_word(s, left, right)) for s in pdf["syms"]]
                yield pdf

        nxt = cur.mapInPandas(apply_merge, "syms array<string>, cnt long")
        if (it + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
            nxt.count()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return merges


def bpe_segment(text: str, merges: list) -> list:
    """Apply learned merges to one string (driver-side helper for tests
    and inference spot checks): pre-tokenize with the training regex, then
    replay merges in rank order per token."""
    import re

    from dc43_spark.functions.text import BPE_TOKEN_RE

    out = []
    for tok in re.findall(BPE_TOKEN_RE, text):
        syms = list(tok)
        for left, right, _ in merges:
            syms = _merge_word(syms, left, right)
        out.extend(syms)
    return out


# ------------------------------------------ learned quality classifier


def feature_hash(token: Column, n_features: int) -> Column:
    """Deterministic hashed-feature index for a token: 28-bit md5 prefix
    mod ``n_features`` — engine-stable (same idiom as dedup.shingle_hash),
    so a model trained here scores identically anywhere md5 exists."""
    return (
        F.conv(F.substring(F.md5(token), 1, 7), 16, 10).cast("long")
        % n_features
    )


def train_quality_lr(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    *,
    n_features: int = 1024,
    iters: int = 20,
    learn_rate: float = 0.5,
) -> dict:
    """Distributed logistic-regression quality classifier over hashed
    bag-of-token counts — the fastText-style learned filter that replaces
    hand-tuned heuristics once weak labels exist (e.g. ``corpus_filter``
    verdicts, or "wiki=1 / crawl=0" reference corpora).

    Returns ``{"bias": float, "weights": [n_features floats],
    "n_features": int}`` — a driver-side artifact by definition (fixed
    size, like k-means centroids or BPE merges).

    Distributed formulation: the per-document SPARSE feature vectors
    (hashed token counts, L1-normalised by document length) are built once
    — one explode + one (id, idx) aggregation — and PERSISTED; each of the
    ``iters`` full-batch gradient steps is then

    1. margins: a zip_with/aggregate EXPRESSION against the current
       weights as a literal array — narrow, no shuffle, no Python;
    2. gradient: explode the sparse entries weighted by the per-doc
       residual, ONE partially-aggregated shuffle keyed on the feature
       index (at most ``n_features`` rows reach the driver).

    Per-round cost is one bounded shuffle — the train_bpe cost shape — and
    the state never leaves the cluster; only gradients (n_features
    doubles) move. Floats: gradient sums are doubles, so cross-run bit
    identity is not guaranteed (aggregation order) — tests pin agreement
    with an independent NumPy trainer to 1e-6, and scoring is exactly
    reproducible GIVEN a weight vector."""
    from dc43_spark.functions.text import tokens as _tokens

    n = F.size(_tokens(text_col)).cast("double")
    feats = (
        df.select(
            F.monotonically_increasing_id().alias("_rid"),
            F.col(label_col).cast("double").alias("_y"),
            _tokens(text_col).alias("_t"),
        )
        .filter(F.size("_t") > 0)
        .select(
            "_rid", "_y",
            F.explode("_t").alias("_tok"),
            F.size("_t").cast("double").alias("_n"),
        )
        .select(
            "_rid", "_y", feature_hash(F.col("_tok"), n_features).alias("_idx"), "_n"
        )
        .groupBy("_rid", "_y", "_idx")
        .agg((F.count(F.lit(1)) / F.first("_n")).alias("_v"))
        .groupBy("_rid", "_y")
        .agg(
            F.collect_list(F.struct("_idx", "_v")).alias("_sparse"),
        )
        .select(
            "_rid", "_y",
            F.transform("_sparse", lambda s: s["_idx"].cast("int")).alias("_idxs"),
            F.transform("_sparse", lambda s: s["_v"]).alias("_vals"),
        )
        .persist()
    )
    n_docs = feats.count()
    if n_docs == 0:
        raise ValueError("no non-empty documents to train on")

    import numpy as np

    w = np.zeros(n_features, dtype=np.float64)
    bias = 0.0
    for _ in range(iters):
        w_lit = F.lit([float(x) for x in w])
        margin = F.lit(bias) + F.aggregate(
            F.zip_with(
                "_idxs", "_vals",
                lambda i, v: F.element_at(w_lit, i + 1) * v,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        err = (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)) - F.col("_y")).alias("_e")
        scored = feats.select("_idxs", "_vals", err)
        grad_rows = (
            scored.select(
                F.explode(F.arrays_zip("_idxs", "_vals")).alias("_z"), "_e"
            )
            .groupBy(F.col("_z._idxs").alias("_idx"))
            .agg(F.sum(F.col("_z._vals") * F.col("_e")).alias("_g"))
            .collect()
        )
        bias_err = scored.agg(F.sum("_e").alias("_s")).collect()[0]["_s"]
        grad = np.zeros(n_features, dtype=np.float64)
        for r in grad_rows:
            grad[int(r["_idx"])] = float(r["_g"])
        w -= learn_rate * grad / n_docs
        bias -= learn_rate * float(bias_err) / n_docs
    feats.unpersist()
    return {
        "bias": float(bias),
        "weights": [float(x) for x in w],
        "n_features": n_features,
    }


def _quality_lr_score_col(model: dict, text_col: str) -> Column:
    """The scoring EXPRESSION shared by ``quality_lr_score`` and
    ``evaluate_quality_lr``: sigmoid of bias + mean over tokens of
    w[hash(token)] (identical to the training featurisation — hashed
    counts L1-normalised by length). Pure JVM against the weights as a
    literal array; NULL for empty documents."""
    from dc43_spark.functions.text import tokens as _tokens

    w_lit = F.lit([float(x) for x in model["weights"]])
    n_features = int(model["n_features"])
    toks = _tokens(text_col)

    def build(t: Column) -> Column:
        total = F.aggregate(
            F.transform(
                t, lambda tok: F.element_at(w_lit, (feature_hash(tok, n_features) + 1).cast("int"))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        margin = F.lit(float(model["bias"])) + total / F.size(t)
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))

    return F.when(
        F.size(toks) > 0, F.element_at(F.transform(F.array(toks), build), 1)
    )


def quality_lr_score(
    df: DataFrame,
    model: dict,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "quality_prob",
) -> DataFrame:
    """Score documents with a trained ``train_quality_lr`` model — zero
    shuffle, streams at scan speed; empty documents score NULL. See
    ``_quality_lr_score_col`` for the expression."""
    return df.select(
        F.col(id_col), _quality_lr_score_col(model, text_col).alias(score_col)
    )


def evaluate_quality_lr(
    df: DataFrame,
    model: dict,
    label_col: str,
    *,
    text_col: str = "text",
    n_bins: int = 1000,
    threshold: float = 0.5,
) -> dict:
    """Held-out evaluation of a ``train_quality_lr`` model — the missing
    half of the training loop: a classifier that gates a 100 TB corpus
    filter needs a measured ROC-AUC and operating-point precision/recall,
    not just weights.

    Distributed shape: ONE narrow pass scores the holdout (the same pure
    JVM expression as ``quality_lr_score``) and histograms (score-bin,
    label) into at most ``n_bins`` rows — a single bounded groupBy; the
    AUC/precision/recall arithmetic runs driver-side over that fixed-size
    histogram. This is the standard scalable formulation (thresholded ROC
    over binned scores, the Spark MLlib BinaryClassificationMetrics
    shape): exact up to bin resolution (1/n_bins on the sigmoid axis),
    independent of corpus size.

    Returns ``{"auc", "precision", "recall", "f1", "accuracy", "n_pos",
    "n_neg", "n_scored", "n_unscored", "threshold"}``; the rate fields
    are ``None`` when undefined (e.g. single-class holdout -> no AUC,
    zero predicted positives -> no precision)."""
    if n_bins <= 1:
        raise ValueError("n_bins must be > 1")
    score = _quality_lr_score_col(model, text_col)
    binned = (
        df.select(
            score.alias("_s"), F.col(label_col).cast("double").alias("_y")
        )
        .select(
            F.when(
                F.col("_s").isNotNull(),
                F.least(
                    F.floor(F.col("_s") * n_bins).cast("int"),
                    F.lit(n_bins - 1),
                ),
            ).alias("_b"),
            "_y",
        )
        .groupBy("_b")
        .agg(
            F.sum("_y").alias("_pos"),
            F.count(F.lit(1)).alias("_n"),
        )
        .collect()
    )
    n_unscored = sum(int(r["_n"]) for r in binned if r["_b"] is None)
    hist = {
        int(r["_b"]): (float(r["_pos"] or 0.0), int(r["_n"]))
        for r in binned
        if r["_b"] is not None
    }
    n_scored = sum(n for _, n in hist.values())
    n_pos = sum(p for p, _ in hist.values())
    n_neg = n_scored - n_pos

    # ROC sweep over bins in descending score order (trapezoid = correct
    # tie handling for everything sharing a bin)
    auc = None
    if n_pos > 0 and n_neg > 0:
        tp = fp = 0.0
        area = 0.0
        for b in sorted(hist, reverse=True):
            pos, n = hist[b]
            neg = n - pos
            area += neg * (tp + pos / 2.0)  # trapezoid in raw counts
            tp += pos
            fp += neg
        auc = area / (n_pos * n_neg)

    # operating point: predicted positive <=> score >= threshold, i.e.
    # bin >= floor(threshold * n_bins) (exact when the product is integral)
    cut = int(threshold * n_bins)
    pred_pos = {b: v for b, v in hist.items() if b >= cut}
    tp = sum(p for p, _ in pred_pos.values())
    fp = sum(n - p for p, n in pred_pos.values())
    fn = n_pos - tp
    tn = n_neg - fp
    precision = tp / (tp + fp) if (tp + fp) > 0 else None
    recall = tp / (tp + fn) if (tp + fn) > 0 else None
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision is not None
        and recall is not None
        and (precision + recall) > 0
        else None
    )
    accuracy = (tp + tn) / n_scored if n_scored > 0 else None
    return {
        "auc": auc,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "accuracy": accuracy,
        "n_pos": int(n_pos),
        "n_neg": int(n_neg),
        "n_scored": int(n_scored),
        "n_unscored": int(n_unscored),
        "threshold": float(threshold),
    }


def hashed_ngram_features(
    text_col: Column | str, *, n_features: int, ns: tuple[int, ...] = (1, 2)
) -> Column:
    """Array of hashed word-n-gram feature ids for a document (DSIR's
    feature space, Xie et al. 2023: hashed unigrams+bigrams by default).
    Lowered tokens; md5-based ``feature_hash`` so any engine with md5
    reproduces the ids bit-for-bit. Pure expression — no shuffle."""
    from dc43_spark.functions.text import tokens as _tokens

    low = F.transform(_tokens(text_col), lambda x: F.lower(x))

    def build(t: Column) -> Column:
        def make_gram(n: int):
            # closure factory: a default-arg lambda would read as a 2-arg
            # callback to transform(), which then passes the index as n
            def gram(i: Column) -> Column:
                return F.concat_ws(
                    " ", *[F.element_at(t, i + j + 1) for j in range(n)]
                )

            return gram

        parts = []
        for n in ns:
            if n == 1:
                grams = t
            else:
                grams = F.when(
                    F.size(t) >= n,
                    F.transform(F.sequence(F.lit(0), F.size(t) - n), make_gram(n)),
                ).otherwise(F.array().cast("array<string>"))
            parts.append(grams)
        all_grams = F.concat(*parts) if len(parts) > 1 else parts[0]
        return F.transform(all_grams, lambda g: feature_hash(g, n_features))

    return F.element_at(F.transform(F.array(low), build), 1)


def dsir_log_weights(
    source: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 4096,
    ns: tuple[int, ...] = (1, 2),
    smoothing: float = 1.0,
    weight_col: str = "log_weight",
) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance Resampling,
    Xie et al. 2023, public): score every SOURCE document by how much its
    hashed-n-gram distribution looks like the TARGET corpus rather than
    the source pool — ``log w(x) = sum_f count_f(x) * (log p_tgt(f) -
    log p_src(f))`` with add-``smoothing`` estimates of both feature
    distributions. The standard recipe for "select web data that looks
    like the (small) high-quality target" at pretraining scale.

    Distributed shape: each corpus's feature histogram is ONE
    explode+groupBy bounded at ``n_features`` rows to the driver (the
    vocab/BPE pattern); scoring is a zero-shuffle expression against the
    log-prob-difference literal array, streaming at scan speed. Returns
    (id, ``log_weight`` double); featureless documents score 0.0
    (neutral evidence)."""
    import math

    feats = hashed_ngram_features(text_col, n_features=n_features, ns=ns)

    def histogram(df: DataFrame) -> tuple[list[int], int]:
        rows = (
            df.select(F.explode(feats).alias("_f"))
            .groupBy("_f")
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        counts = [0] * n_features
        for r in rows:
            counts[int(r["_f"])] = int(r["_n"])
        return counts, sum(counts)

    tgt_counts, tgt_total = histogram(target)
    src_counts, src_total = histogram(source)
    if tgt_total == 0 or src_total == 0:
        raise ValueError("DSIR needs non-empty featurized source and target")
    denom_t = tgt_total + smoothing * n_features
    denom_s = src_total + smoothing * n_features
    diff = [
        math.log((tgt_counts[i] + smoothing) / denom_t)
        - math.log((src_counts[i] + smoothing) / denom_s)
        for i in range(n_features)
    ]
    diff_lit = F.lit(diff)
    score = F.aggregate(
        F.transform(
            feats, lambda f: F.element_at(diff_lit, f.cast("int") + 1)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return source.select(
        F.col(id_col), F.coalesce(score, F.lit(0.0)).alias(weight_col)
    )


def dsir_resample(
    weights: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    seed: str = "dc43-dsir",
) -> DataFrame:
    """Sample ``k`` documents WITHOUT replacement, proportional to
    exp(log_weight), via the Gumbel-top-k trick the DSIR paper uses:
    rank by ``log_weight + Gumbel(0,1)`` and keep the top k. The Gumbel
    draw is md5-derived from (id, seed) — fully deterministic, so the
    selection is reproducible and engine-portable.

    Scale shape: orderBy(...).limit(k) plans TakeOrderedAndProject —
    per-partition top-k then a driver merge of k-row heaps, never a
    global sort shuffle."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(seed))), 1, 15),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(16**15 + 2))  # uniform in (0,1)
    gumbel = -F.log(-F.log(u))
    return (
        weights.withColumn("_key", F.col(weight_col) + gumbel)
        .orderBy(F.col("_key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_key")
    )


def quality_eval_report_rows(spark, metrics: dict) -> DataFrame:
    """Render ``evaluate_quality_lr`` metrics as filter-report-shaped rows
    ``(reason string, n_docs long)`` so the classifier's held-out quality
    travels in the SAME observability channel as the drop-reason
    histogram: rates in integer micro-units under ``classifier_*_micro``
    reasons, counts verbatim. Union these with a ``corpus_filter`` reason
    histogram (or append them to the streaming curation report) and an
    operator sees '34% dropped for low_stopword' next to 'the learned
    gate doing the dropping holds AUC 0.998 on holdout'."""
    rows = []
    for key in ("auc", "precision", "recall", "f1", "accuracy"):
        value = metrics.get(key)
        if value is not None:
            rows.append(
                (f"classifier_{key}_micro", int(round(value * 1_000_000)))
            )
    for key in ("n_pos", "n_neg", "n_scored", "n_unscored"):
        rows.append((f"classifier_{key}", int(metrics.get(key, 0))))
    return local_df(spark, rows, "reason string, n_docs long", coalesce=1)
