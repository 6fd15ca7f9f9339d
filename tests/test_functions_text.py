from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dc43_spark.functions import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "der Hund und die Katze sind nicht da"),
        (3, "el gato y el perro es de la casa"),
        (4, "xyzzy plugh"),
        (5, "Hello, World!!  Multiple   spaces; and Punct."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _one(df, col):
    return {r["doc_id"]: r["v"] for r in df.select("doc_id", col.alias("v")).collect()}


def test_token_count(docs):
    v = _one(docs, tx.token_count("text"))
    assert v[1] == 9 and v[4] == 2 and v[5] == 6


def test_empty_string_tokens(spark):
    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    v = _one(df, tx.token_count("text"))
    assert v[1] == 0 and v[2] == 0


def test_punct_and_stopword_ratio(docs):
    p = _one(docs, tx.punct_ratio("text"))
    assert p[1] == 0.0 and p[5] > 0.0
    s = _one(docs, tx.stopword_ratio("text"))
    assert s[1] == pytest.approx(round(2 / 9, 6), abs=1e-6)  # the, the
    assert s[4] == 0.0


def test_quality_score_bounds(docs):
    q = _one(docs, tx.quality_score("text"))
    assert all(0.0 <= v <= 1.0 for v in q.values())
    assert q[1] > q[5]  # same-diversity docs: punctuation drags the score down


def test_normalize_and_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "HELLO ... world")],
        "doc_id long, text string",
    )
    fp = _one(df, tx.fingerprint("text"))
    assert fp[1] == fp[2] == fp[3]  # all normalise to "hello world"
    norm = _one(df, tx.normalize_text("text"))
    assert norm[1] == "hello world"


def test_lang_id(docs):
    v = _one(docs, tx.lang_id("text"))
    assert v[1] == "en" and v[2] == "de" and v[3] == "es"
    assert v[4] == "und"  # no markers at all


def test_lang_id_tie_breaks_alphabetical(spark):
    # "la" is a marker for both es and fr -> tie at 1 hit each -> 'es' (alphabetical)
    df = spark.createDataFrame([(1, "la")], "doc_id long, text string")
    assert _one(df, tx.lang_id("text"))[1] == "es"


def test_avg_token_length(spark):
    df = spark.createDataFrame([(1, "ab abcd")], "doc_id long, text string")
    assert _one(df, tx.avg_token_length("text"))[1] == 3.0


def test_subword_count(spark):
    from dc43_spark.functions import text as tx
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Hello, world! abc123 def-ghi 42 foo.",), ("",)], "text string"
    )
    out = df.select(tx.subword_count("text").alias("n")).collect()
    # Hello , world ! abc 123 def - ghi 42 foo .  -> 12
    assert out[0].n == 12
    assert out[1].n == 0


def test_pii_redaction_and_counts(spark):
    from dc43_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail alice.smith+x@corp.example.org from 192.168.1.17 call +4915112345678"),
            (2, "no pii here, just text with version 1.2 and a plus + sign"),
            (3, "two mails a@b.io c@d.co one ip 8.8.8.8"),
        ],
        "doc_id long, text string",
    )
    counts = pii_counts("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            counts["email"].alias("e"),
            counts["ip"].alias("i"),
            counts["phone"].alias("p"),
            redact_pii("text").alias("clean"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["i"], out[1]["p"]) == (1, 1, 1)
    assert "<EMAIL>" in out[1]["clean"] and "<IP>" in out[1]["clean"] and "<PHONE>" in out[1]["clean"]
    assert "alice" not in out[1]["clean"] and "192.168" not in out[1]["clean"]
    # version numbers and bare plus signs are NOT PII
    assert (out[2]["e"], out[2]["i"], out[2]["p"]) == (0, 0, 0)
    assert out[2]["clean"].startswith("no pii here")
    assert (out[3]["e"], out[3]["i"]) == (2, 1)
