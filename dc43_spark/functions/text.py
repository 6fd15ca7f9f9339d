"""Text-analysis column functions for large-scale corpus pipelines.

All functions return Column expressions built from pyspark.sql.functions —
pure JVM/whole-stage-codegen, no Python UDFs in the hot path. They compose
with the contract engine (attachable as ``query`` rules) and with the dedup
operators.

Design notes for 100 TB:
- every function is a narrow projection (no shuffle);
- tokenisation is a single regex split; downstream counts/ratios are
  arithmetic on the token array, computed once per row;
- deterministic (no rand/now), so results are reproducible and
  oracle-checkable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny per-language stopword/marker table for n-gram-free language ID.
# Heuristic (not a trained model): count marker-token hits per language,
# pick the argmax with deterministic alphabetical tie-break.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "it"],
    "es": ["el", "la", "los", "las", "es", "y", "de", "que"],
    "fr": ["le", "la", "les", "et", "est", "de", "que", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3"],
}

DEFAULT_STOPWORDS = LANG_MARKERS["en"]


def tokens(col: Column | str, *, pattern: str = r"\s+") -> Column:
    """Whitespace tokenisation -> array<string> (empty string -> empty array)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, pattern)
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c).cast("long")


def avg_token_length(col: Column | str, *, scale: int = 6) -> Column:
    """Mean token length, rounded for cross-engine stability."""
    toks = tokens(col)
    total_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.round(total_chars / F.size(toks), scale)


def punct_ratio(col: Column | str, *, scale: int = 6) -> Column:
    """Fraction of characters that are not alphanumeric/whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[A-Za-z0-9\s]", "")
    return F.round(F.length(stripped) / F.length(c), scale)


def word_hits(col: Column | str, words: list[str]) -> Column:
    r"""How many whitespace-delimited tokens of ``col`` equal (case-folded)
    one of ``words`` — counted WITH multiplicity.

    Implemented as ONE regex pass over the lowered text instead of a
    higher-order ``filter(lambda)`` over the token array: lambda
    expressions run interpreted (outside whole-stage codegen, no
    subexpression elimination), which made every composed consumer pay the
    array scan repeatedly — measured 3x on corpus_filter at 100k docs.
    ``(?:^|\s)`` consumes the left boundary (so adjacent hits still both
    match), the lookahead right boundary consumes nothing; a token with
    attached punctuation ("the,") does NOT match — identical semantics to
    the exact token comparison, which the DuckDB oracles still use (the
    parity gates prove the equivalence on real data)."""
    for w in words:
        if not w.replace("_", "").isalnum():
            raise ValueError(f"word_hits expects plain words, got {w!r}")
    c = F.col(col) if isinstance(col, str) else col
    pattern = "(?:^|\\s)(?:" + "|".join(sorted(words)) + ")(?=\\s|$)"
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pattern), F.lit(0)))


def stopword_ratio(
    col: Column | str, stopwords: list[str] | None = None, *, scale: int = 6
) -> Column:
    hits = word_hits(col, stopwords or DEFAULT_STOPWORDS)
    return F.round(hits / F.size(tokens(col)), scale)


def quality_score(col: Column | str, *, scale: int = 6) -> Column:
    """Composite document quality heuristic in [0,1]:

    0.4 * length_score (tokens/256 capped at 1)
    + 0.3 * (1 - punct_ratio)
    + 0.3 * lexical diversity (distinct tokens / tokens)
    """
    toks = tokens(col)
    n = F.size(toks)
    length_score = F.least(n / F.lit(256.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)) / n
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[A-Za-z0-9\s]", "")
    punct = F.length(stripped) / F.length(c)
    return F.round(
        F.lit(0.4) * length_score + F.lit(0.3) * (F.lit(1.0) - punct) + F.lit(0.3) * diversity,
        scale,
    )


# BPE-ish pre-tokenisation: letter runs, digit runs, and single punctuation
# marks — the classic byte-pair-encoding input segmentation (RE2/Java-regex
# compatible so oracles can replicate it verbatim).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def subword_count(col: Column | str, *, pattern: str = BPE_TOKEN_RE) -> Column:
    """Number of BPE-style subword units (letter/digit runs + punct marks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).cast("long")


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum,
    collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    stripped = F.regexp_replace(lowered, r"[^a-z0-9\s]", " ")
    collapsed = F.regexp_replace(stripped, r"\s+", " ")
    return F.trim(collapsed)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalised text."""
    return F.md5(normalize_text(col))


def lang_scores(col: Column | str, markers: dict[str, list[str]] | None = None) -> Column:
    """Struct of per-language marker-hit counts (one codegen regex pass per
    language — see word_hits for why not a higher-order filter)."""
    markers = markers or LANG_MARKERS
    return F.struct(
        *[word_hits(col, markers[lang]).alias(lang) for lang in sorted(markers)]
    )


def lang_id(col: Column | str, markers: dict[str, list[str]] | None = None) -> Column:
    """Argmax language by marker hits; 'und' (undetermined) when all zero.

    Ties break to the alphabetically-first language — deterministic and
    trivially replicated in SQL oracles."""
    markers = markers or LANG_MARKERS
    langs = sorted(markers)
    # LINEAR expression tree: each language's hit count appears exactly
    # once, inside array_max over (hits, -index) structs — struct ordering
    # gives max hits with ties to the smallest index (= alphabetically
    # first). The previous when-chain accumulator referenced each running
    # best TWICE per language, doubling the tree per language; the 2^n
    # blow-up pushed composed consumers (corpus_filter's keep predicate)
    # past the codegen size limit into interpreted evaluation — measured
    # 46s -> 3s on a 100k-doc probe from this rewrite alone.
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    word_hits(col, markers[lang]).alias("h"),
                    F.lit(-i).alias("r"),
                )
                for i, lang in enumerate(langs)
            ]
        )
    )
    name = F.element_at(F.array(*[F.lit(lang) for lang in langs]), -best["r"] + 1)
    return F.when(best["h"] > 0, name).otherwise(F.lit("und"))


# --------------------------------------------------------------- PII

#: conservative, cross-engine (Java regex == RE2) PII patterns. Ordered —
#: emails first so user@10.0.0.1-style hosts don't get half-eaten by the
#: IP rule first.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
]


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Match counts per PII kind (before redaction), as BIGINT columns."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).cast("long")
        for kind, pattern, _ in PII_PATTERNS
    }


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its placeholder token, in pattern
    order. Pure JVM regexp_replace chain — streams at scan speed; the
    pattern list is the policy surface (extend with SSNs, IBANs, ... as
    the jurisdiction requires)."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c
