"""Deduplication operators for 100 TB corpora.

Four tiers, cheapest first:

1. ``exact_dedup``        — hash-groupBy on a content fingerprint (one
                            shuffle on a short key; skew-free because md5 is
                            uniform).
2. ``ngram_jaccard_pairs``— exact n-gram-shingle Jaccard via an inverted
                            index self-join (explode shingles -> join on
                            shingle -> count). Quadratic in the worst case;
                            use on candidate subsets or small corpora.
3. ``minhash_*`` + LSH    — linear-scale near-dup: k-permutation MinHash
                            signatures (deterministic md5-based hash family,
                            no Python UDFs), banded LSH bucketing, candidate
                            pairs only where a band collides, then exact
                            Jaccard verification on the candidates.
4. ``simhash64``          — 60-bit SimHash per document from token hashes,
                            computed as 60 map-side aggregate sums (single
                            pass, no explode join); near-dups = small
                            Hamming distance.

Every step is pure Spark SQL expressions — deterministic, whole-stage
codegen, and reproducible in a DuckDB oracle for correctness gating.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dc43_spark.functions.text import fingerprint, tokens
from dc43_spark.localdf import local_df

# hash family domain: h in [0, 2^28) from a 7-hex-digit md5 prefix, then
# (a*h + b) mod MERSENNE31 — products stay < 2^59, no int64 overflow.
MERSENNE31 = 2147483647


def content_hash(col: Column | str) -> Column:
    """Raw md5 of the column (exact dedup key, no normalisation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    normalized: bool = False,
) -> DataFrame:
    """Collapse exact duplicates: one row per content hash with the smallest
    id as canonical plus the duplicate count.

    Cost shape: one shuffle on the 32-char hash (uniform, skew-free);
    map-side partial aggregation keeps the shuffle small.
    """
    fp = fingerprint(text_col) if normalized else content_hash(text_col)
    return (
        df.select(F.col(id_col), fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
        .select(id_col, "fp", "n_dups")
    )


def keep_canonical(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Return the full rows of one canonical document per duplicate group.

    Aggregate + semi-join, NOT a row_number window over the hash: the
    window routes every copy of a mega-duplicate (boilerplate repeated
    across millions of pages) into one partition, while the min-id
    aggregate partial-combines map-side and the join back is AQE-skew-
    splittable.

    The semi-join matches on (hash, id) PAIRS, not the id alone, so an id
    reused by rows with different text selects only the row that actually
    won its group (r4 advice: an id-only semi-join let one winning id drag
    in every row bearing it). Rows that are fully identical — same id AND
    same text — still all survive; deduplicate the id space first if that
    matters.

    NULL-text rows form one group and keep their min-id row: the join key
    coalesces the hash to a sentinel, because md5(NULL) = NULL never
    equals itself under plain join equality (r5 review: the raw hash key
    silently dropped every NULL-text row). The internal key column uses a
    collision-avoiding name and is dropped before returning.

    Precondition: ``id_col`` must be non-null — the id half of the
    composite join key has the same null-equality trap (min() skips
    NULLs, and a NULL id never matches the semi-join), so NULL-id rows
    are dropped. Assign ids before deduplicating."""
    fp = F.coalesce(content_hash(text_col), F.lit("\x00null"))
    keyed = df.withColumn("__dc43_fp", fp)
    canon = (
        keyed.select("__dc43_fp", F.col(id_col))
        .groupBy("__dc43_fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return keyed.join(canon, ["__dc43_fp", id_col], "left_semi").drop("__dc43_fp")


# ------------------------------------------------------------- shingling


def token_shingles(col: Column | str, n: int = 3, *, distinct: bool = True) -> Column:
    """n-token shingles (space-joined) as array<string> — distinct by default
    (the MinHash/Jaccard input), or with multiplicity (``distinct=False``,
    the repetition-analysis input).

    Documents shorter than ``n`` tokens yield a single shingle of the whole
    text so they still participate in hashing.

    The token array is bound to a lambda variable (``transform`` over a
    one-element array) so the regex tokenizer runs ONCE per document —
    referencing ``tokens(col)`` directly inside the shingle lambda would
    re-split the text for every ``element_at`` call whenever the expression
    falls back to interpreted evaluation."""
    return shingles_from_tokens(tokens(col), n, distinct=distinct)


def shingles_from_tokens(toks: Column, n: int = 3, *, distinct: bool = True) -> Column:
    """Shingle an already-tokenized array column (see ``token_shingles``)
    — pipelines that persist token arrays derive shingles without
    re-running the tokenizer."""

    def build(t: Column) -> Column:
        joined = F.array_join(t, " ")
        idx = F.sequence(F.lit(0), F.size(t) - n)
        shingled = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
        return F.when(F.size(t) < n, F.array(joined)).otherwise(
            F.array_distinct(shingled) if distinct else shingled
        )

    return F.element_at(F.transform(F.array(toks), build), 1)


def shingle_hash(shingle: Column) -> Column:
    """28-bit deterministic hash from a md5 prefix (cross-engine stable)."""
    return F.conv(F.substring(F.md5(shingle), 1, 7), 16, 10).cast("long")


def _hash_params(i: int) -> tuple[int, int]:
    """Deterministic well-spread affine constants for permutation ``i``.

    ``a`` is a 28-bit odd md5-derived multiplier so the 16 permutations are
    effectively independent (a tiny ``a`` like ``2i+1`` never wraps mod p for
    small hash values, making every permutation pick the same min shingle —
    one differing min shingle then flips the whole signature).
    ``a*h`` stays < 2^56, far from int64 overflow."""
    import hashlib

    a = int(hashlib.md5(f"minhash-a-{i}".encode()).hexdigest()[:7], 16) | 1
    b = int(hashlib.md5(f"minhash-b-{i}".encode()).hexdigest()[:8], 16) % MERSENNE31
    return a, b


def minhash_signature(col: Column | str, *, num_hashes: int = 16, shingle_size: int = 3) -> Column:
    """MinHash signature as array<bigint> of length ``num_hashes``.

    min over shingles of (a_i * h(shingle) + b_i) mod p — all computed with
    array transforms on the JVM; one pass over each document's shingles."""
    shingles = token_shingles(col, shingle_size)
    hashes = F.transform(shingles, lambda s: shingle_hash(s))

    def perm_min(a: int, b: int) -> Column:
        # unary lambda required: extra params are interpreted as the index
        return F.array_min(
            F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % MERSENNE31)
        )

    return F.array(*[perm_min(*_hash_params(i)) for i in range(num_hashes)])


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 16,
    shingle_size: int = 3,
    shingles_col: str | None = None,
) -> DataFrame:
    """Scalable MinHash: explode shingles -> hash each ONCE -> k partial-agg
    mins -> reassemble array.

    This is deliberately NOT ``select(minhash_signature(...))``: that inlines
    the tokenizer into every permutation's expression tree (k x shingles x
    element_at re-evaluations once the expression falls out of whole-stage
    codegen — ~50x slower measured at sf0.1). Here each shingle is hashed
    exactly once and the k permutation minimums are map-side-combined
    aggregates, so the shuffle carries one row per document.

    ``shingles_col`` names an already-computed distinct-shingle array
    column to hash instead of re-shingling ``text_col``."""
    shingled = (
        F.col(shingles_col)
        if shingles_col
        else token_shingles(text_col, shingle_size)
    )
    sh = df.select(F.col(id_col), F.explode(shingled).alias("_sh"))
    hashed = sh.select(id_col, shingle_hash(F.col("_sh")).alias("_h"))
    params = [_hash_params(i) for i in range(num_hashes)]
    mins = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % MERSENNE31).alias(f"_m{i}")
        for i, (a, b) in enumerate(params)
    ]
    return (
        hashed.groupBy(id_col)
        .agg(*mins)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("signature"),
        )
    )


def lsh_bands(
    signatures: DataFrame,
    *,
    rows_per_band: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Split signatures into bands and hash each band -> (id, band, band_hash).

    Near-dup candidates are ids sharing (band, band_hash); with k hashes and
    r rows/band the collision probability is ~1-(1-j^r)^(k/r)."""
    sig = F.col("signature")
    n_bands = F.size(sig) / rows_per_band
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), (n_bands - 1).cast("int")),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(sig, b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("bh"),
    )
    return banded.select(id_col, "bh.band", "bh.band_hash")


def lsh_candidate_pairs(
    signatures: DataFrame, *, rows_per_band: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one LSH band.

    The join key (band, band_hash) is uniform md5 output — no skew; the
    shuffle moves only (id, 34-byte key) pairs, not documents."""
    bands = lsh_bands(signatures, rows_per_band=rows_per_band, id_col=id_col)
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("doc_a"),
            F.col(f"r.{id_col}").alias("doc_b"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_size: int = 3,
    threshold: float = 0.8,
    scale: int = 6,
) -> DataFrame:
    """Exact shingle-Jaccard pairs >= threshold via inverted-index self-join.

    explode(distinct shingles) -> join on shingle -> |A∩B| per pair ->
    jaccard = inter / (|A|+|B|-inter). The shingle join is the scalable
    exact method (no doc x doc cross join); pair it with LSH candidates to
    bound the pair space on huge corpora."""
    # |A| rides the exploded rows (computed ONCE per doc off the distinct
    # array, before the generator): the pair aggregation then has both
    # set sizes in hand and the jaccard needs NO further join. Through r7
    # this was a separate corpus-wide groupBy for the sizes plus two
    # joins back onto the pairs — three extra shuffles for numbers the
    # pre-explode array always knew, and the dominant cold-start codegen
    # surface of the clustering gate.
    sh = df.select(
        F.col(id_col), token_shingles(text_col, shingle_size).alias("_arr")
    ).select(
        F.col(id_col),
        F.size("_arr").alias("n"),
        F.explode("_arr").alias("sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, on=[F.col("a.sh") == F.col("b.sh"),
                      F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.min(F.col("a.n")).alias("_na"),  # constant per doc
            F.min(F.col("b.n")).alias("_nb"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("_na") + F.col("_nb") - F.col("inter")), scale
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 16,
    rows_per_band: int = 4,
    shingle_size: int = 3,
    threshold: float = 0.8,
    shingles_col: str | None = None,
) -> DataFrame:
    """LSH-bucketed near-dup detection with exact verification.

    1. MinHash signatures (one narrow pass over documents)
    2. banded LSH -> candidate pairs (join on 34-byte band keys)
    3. exact shingle-Jaccard ONLY on candidates — each pair joins the two
       documents' distinct-shingle ARRAYS and intersects them in one JVM
       expression (``array_intersect``), instead of re-running the
       inverted-index self-join on the candidate subset (r4: that rewrite
       removed 4 stages; identical jaccard by construction since the
       arrays are the same distinct-shingle sets the index explodes)

    This is the 100 TB path: the expensive exact verification runs on the
    tiny candidate set instead of all pairs, and the candidate side is
    broadcast-small so the corpus-side shingle pass stays map-only.

    ``shingles_col`` names an already-computed distinct-shingle array
    column on ``df`` — a pipeline that persisted its shingles then pays
    ONE shingle computation total instead of three (signature pass +
    both verify sides)."""
    # sigs feeds both sides of the LSH band self-join; cache the tiny
    # (id, 16xlong) relation instead of re-tokenising the corpus twice.
    sigs = minhash_signatures(
        df,
        text_col,
        id_col,
        num_hashes=num_hashes,
        shingle_size=shingle_size,
        shingles_col=shingles_col,
    ).persist()
    candidates = lsh_candidate_pairs(sigs, rows_per_band=rows_per_band, id_col=id_col)
    shingled = (
        F.col(shingles_col)
        if shingles_col
        else token_shingles(text_col, shingle_size)
    )
    sh = df.select(F.col(id_col), shingled.alias("sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("_sa"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("long")
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("_inter", inter)
        .withColumn(
            "jaccard",
            F.round(
                F.col("_inter") / (F.size("_sa") + F.size("_sb") - F.col("_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --------------------------------------------------------------- simhash


def simhash_components(df: DataFrame, text_col: str, id_col: str, *, bits: int = 60) -> DataFrame:
    """Per-document signed bit sums: explode tokens (with multiplicity),
    hash each token to 60 bits, and for each bit sum +1/-1.

    Computed as ``bits`` aggregate expressions over one exploded pass —
    map-side combine collapses the shuffle to one row per document."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    tok = tok.select(id_col, h.alias("h"))
    # each aggregate parsed in ONE gateway call: the Column-builder form
    # (F.sum(F.when(...))) cost ~8 py4j round-trips per bit, putting
    # ~1.4 s of pure driver-side plan CONSTRUCTION in front of a ~1 s
    # execution at sf0.1 (r14; integer semantics identical, pinned by
    # the oracle gate). Same trick on the signature chain below.
    sums = [
        F.expr(
            f"sum(CASE WHEN (shiftright(h, {j}) & 1) = 1 "
            f"THEN 1 ELSE -1 END) AS s{j}"
        )
        for j in range(bits)
    ]
    return tok.groupBy(id_col).agg(*sums)


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", *, bits: int = 60
) -> DataFrame:
    """60-bit SimHash per document (fits in a signed int64)."""
    comp = simhash_components(df, text_col, id_col, bits=bits)
    sig = F.expr(
        " + ".join(
            f"shiftleft(CASE WHEN s{j} > 0 THEN CAST(1 AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END, {j})"
            for j in range(bits)
        )
    )
    return comp.select(F.col(id_col), sig.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 hashes (popcount via bin())."""
    x = a.bitwiseXOR(b)
    return F.length(F.regexp_replace(F.bin(x), "0", "")).cast("int")


# ------------------------------------------------- connected components


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct (u, v) with u > v — every edge points from the larger id to
    the smaller, self-loops dropped."""
    e = edges.select(
        F.greatest(F.col(src), F.col(dst)).alias("u"),
        F.least(F.col(src), F.col(dst)).alias("v"),
    )
    return e.filter(F.col("u") != F.col("v")).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to u's min neighborhood
    element (Kiveris et al., 'Connected Components in MapReduce and
    Beyond', large-star operation)."""
    sym = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.select("u", F.least("mn", "u").alias("m"))
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Link every neighbor <= u (and u itself) to the minimum of that set
    (small-star operation). Input edges must satisfy u > v."""
    m = edges.groupBy("u").agg(F.min("v").alias("m"))
    linked = (
        edges.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(m.select("u", F.col("m").alias("v")))
    )
    return linked.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 25,
    driver_threshold: int = 1_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """Component root (minimum member id) per node: alternating large-star /
    small-star (Kiveris et al.) — O(log n) rounds, each a constant number
    of shuffles, the published MapReduce-scale algorithm (label propagation
    needs diameter rounds and a 100 TB web-crawl graph has long chains).

    Returns (node, root) for every node appearing in ``edges``; nodes
    without edges are absent (callers coalesce to self).

    Each round ends in ``localCheckpoint`` — iterative DataFrame algorithms
    otherwise stack O(iterations) of plan lineage, and Catalyst re-analysis
    goes quadratic. Convergence is detected on a 3-field summary
    (count, xor-of-hash, min) instead of a full subtract: one tiny
    aggregate per round versus an extra shuffle of the edge set (bit_xor,
    not sum — ANSI mode makes a long-sum of hashes overflow-fatal).

    Small-graph fast path: when the deduped edge set fits comfortably on
    the driver (``driver_threshold`` edges, ~30 MB at the default), a
    union-find there replaces ~5 distributed rounds x 3 jobs each — near-dup
    graphs are tiny relative to their corpus (pairs, not documents), so
    even multi-TB corpora usually take this branch; the star iterations
    exist for the web-crawl-scale graphs that don't.

    ``stats``, when given, is populated in place with ``branch``
    ('driver' | 'distributed'), ``n_edges``, and — on the distributed
    branch — ``rounds``: the number of large-star/small-star iterations
    until the convergence signature stabilised (the empirical input to
    the rounds-vs-chain-length scale curve in SCALE.md)."""
    cur = _canonical_edges(edges, src, dst).localCheckpoint()
    n_edges = cur.count()
    if stats is not None:
        stats["n_edges"] = n_edges
        stats["branch"] = "driver" if n_edges <= driver_threshold else "distributed"
    if n_edges <= driver_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        rows = cur.collect()
        for r in rows:
            ra, rb = find(r["u"]), find(r["v"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        out = [(x, find(x)) for x in {v for r in rows for v in (r["u"], r["v"])}]
        spark = edges.sparkSession
        # schema derived from the edge columns (r4 advice: a hardcoded
        # 'node long, root long' crashed string ids on this branch only,
        # and returned a different type than the distributed branch)
        node_type = cur.schema["u"].dataType
        # nullable=True to match the distributed branch's coalesce output
        # (values are never actually null on either branch)
        schema = T.StructType(
            [
                T.StructField("node", node_type, True),
                T.StructField("root", node_type, True),
            ]
        )
        return local_df(spark, out, schema, coalesce=1)

    def _sig(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
            F.min("v").alias("mn"),
        ).collect()[0]
        return row["n"], row["h"], row["mn"]

    prev = _sig(cur)
    converged = False
    rounds = 0
    for _ in range(max_iterations):
        nxt = _small_star(_large_star(cur)).localCheckpoint()
        rounds += 1
        sig = _sig(nxt)
        cur = nxt
        if sig == prev:
            converged = True
            break
        prev = sig
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        # log-round convergence means the cap only binds on graphs with
        # > 2^max_iterations nodes — but a silent wrong answer is never ok
        import warnings

        warnings.warn(
            f"connected_components hit max_iterations={max_iterations} before "
            "the edge set stabilized; roots may span unmerged components — "
            "raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )
    # post-convergence the graph is a forest of stars: u > v == root for
    # every edge, except chains of stars collapsed in the last round — one
    # more min-propagation both directions makes roots total
    roots = cur.groupBy("u").agg(F.min("v").alias("root"))
    nodes = cur.select(F.col("u").alias("node")).union(cur.select("v")).distinct()
    out = (
        nodes.join(roots, nodes.node == roots.u, "left")
        .select("node", F.coalesce("root", "node").alias("root"))
    )
    return out


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Assign every document its near-dup cluster: cluster_id = the minimum
    doc id reachable through ``pairs``; singletons cluster as themselves.
    Downstream keeps one representative per cluster_id (the LLM-corpus
    dedup contract: drop all but one of each near-dup set).

    Precondition: every id in ``pairs`` appears in ``df`` (pairs are mined
    FROM the corpus) — sizes count component members, so a foreign pair id
    would inflate its cluster's size.

    Scale shape: ``comp`` holds only the docs that appear in a pair —
    pairs-scale, orders of magnitude smaller than the corpus — so cluster
    sizes aggregate over COMP (one tiny shuffle), not over the corpus, and
    the single corpus-side operation is one left join against that small
    relation (broadcast under AQE; through r5 this aggregated the full
    corpus and joined the sizes back — two corpus-wide shuffles for
    numbers derivable from the small side). Not a window over cluster_id
    either: a window forces every member of a mega-cluster into ONE
    partition; the join lets AQE split skew."""
    comp = connected_components(pairs, src=src, dst=dst)
    # every clustered doc is a node in comp, so component size == cluster
    # size; singletons (absent from comp) default to 1
    sizes = comp.groupBy("root").agg(
        F.count(F.lit(1)).cast("long").alias("_csize")
    )
    labeled = comp.join(sizes, "root").select(
        F.col("node"), F.col("root"), F.col("_csize")
    )
    return df.join(labeled, df[id_col] == labeled.node, "left").select(
        df["*"],
        F.coalesce(labeled.root, df[id_col]).alias("cluster_id"),
        F.coalesce(labeled._csize, F.lit(1).cast("long")).alias("cluster_size"),
    )


# ---------------------------------------------------- duplicated spans


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 3,
    min_occurrences: int = 2,
) -> DataFrame:
    """Exact duplicated-SPAN mining (the substring-level dedup signal of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): for every document, the maximal runs of consecutive
    k-token windows whose window text occurs at least ``min_occurrences``
    times in the WHOLE corpus (counting every occurrence, same-document
    repeats included). Near-dup detection asks "are these documents
    similar"; this asks "which exact passages are boilerplate" — the
    operator that finds licence headers, navigation chrome and copied
    paragraphs inside otherwise-unique documents.

    Output: (id, start_pos, n_windows, span_tokens) — ``start_pos`` is
    the 0-based token index of the first duplicated window, and the span
    covers ``span_tokens = n_windows + k - 1`` tokens. Downstream
    removal keeps one canonical occurrence and strips the rest (see
    ``strip_spans``); emitting the spans separately keeps the removal
    policy (keep-first, keep-random, drop-all) a caller decision.

    Scale shape: one narrow window-extraction pass (token array bound
    once per row, windows hashed with md5 so the grouping key is 16
    bytes however long the window text), ONE partially-aggregated
    shuffle keyed on the window hash, one join back (hash-keyed; hot
    boilerplate windows are exactly the skew AQE splits), and a per-doc
    gaps-and-islands window function whose partition is a single
    document — never the corpus. Nothing is quadratic; total work tracks
    the token stream."""
    from pyspark.sql import Window

    toks = tokens(text_col)

    def build(t: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(t) - k)
        return F.when(F.size(t) < k, F.array().cast("array<struct<pos:int,g:string>>")).otherwise(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.cast("int").alias("pos"),
                    F.md5(
                        F.concat_ws(" ", F.slice(t, i + 1, k))
                    ).alias("g"),
                ),
            )
        )

    wins = df.select(
        F.col(id_col),
        F.explode(F.element_at(F.transform(F.array(toks), build), 1)).alias("w"),
    ).select(id_col, F.col("w.pos").alias("pos"), F.col("w.g").alias("g"))
    counts = wins.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("_n"))
    dup = wins.join(counts.filter(F.col("_n") >= min_occurrences), "g").select(
        id_col, "pos"
    )
    # gaps-and-islands: consecutive duplicated positions collapse to one
    # maximal span per run
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = dup.withColumn("_grp", F.col("pos") - F.row_number().over(w))
    return (
        islands.groupBy(id_col, "_grp")
        .agg(
            F.min("pos").cast("long").alias("start_pos"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
        )
        .select(
            F.col(id_col),
            "start_pos",
            "n_windows",
            (F.col("n_windows") + k - 1).cast("long").alias("span_tokens"),
        )
    )


def strip_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove the tokens covered by ``spans`` (a ``duplicated_spans``
    result restricted to the occurrences the caller wants gone) and
    reassemble the text. Documents without spans pass through unchanged;
    a fully-covered document comes back with empty text (callers filter
    on ``n_tokens_after`` if empty docs should drop).

    Join + one bound array pass: the span list per doc collects to an
    array (spans per doc are few by construction), each token keeps
    itself unless some span covers its position."""
    agg_spans = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("start_pos", "span_tokens")).alias("_spans")
    )
    joined = df.join(agg_spans, id_col, "left")
    toks = tokens(text_col)

    def build(t: Column) -> Column:
        covered = lambda i: F.exists(  # noqa: E731
            F.col("_spans"),
            lambda s: (i >= s["start_pos"]) & (i < s["start_pos"] + s["span_tokens"]),
        )
        kept = F.filter(
            F.transform(t, lambda tok, i: F.struct(tok.alias("t"), i.alias("i"))),
            lambda s: ~covered(s["i"]),
        )
        return F.transform(kept, lambda s: s["t"])

    cleaned = F.when(
        F.col("_spans").isNull(), toks
    ).otherwise(F.element_at(F.transform(F.array(toks), build), 1))
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", cleaned).alias(text_col),
        F.size(cleaned).cast("long").alias("n_tokens_after"),
    )
