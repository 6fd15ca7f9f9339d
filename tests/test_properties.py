"""Property-based tests (hypothesis) for the driver-side algebra.

These cover the pure-Python layers (SemVer ordering, contract JSON
round-trip, predicate escaping) where the input space is too big for
example-based tests — mirroring the reference's weakest test tier
(SURVEY §5: no property-based testing existed)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from dc43_spark.contracts import Contract, QualityRule, SchemaObject, SchemaProperty
from dc43_spark.contracts.versioning import SemVer, is_semver, select_version
from dc43_spark.expectations.compiler import _sql_literal, sql_predicate

versions = st.builds(
    SemVer,
    major=st.integers(0, 99),
    minor=st.integers(0, 99),
    patch=st.integers(0, 99),
    prerelease=st.one_of(
        st.none(),
        st.from_regex(r"[0-9A-Za-z][0-9A-Za-z.-]{0,8}", fullmatch=True).filter(
            lambda s: all(p for p in s.split(".")) and not s.endswith("-")
        ),
    ),
)


@given(versions)
def test_semver_parse_str_roundtrip(v: SemVer):
    assert SemVer.parse(str(v)) == v
    assert is_semver(str(v))


@given(versions, versions, versions)
def test_semver_total_order(a: SemVer, b: SemVer, c: SemVer):
    assert (a < b) or (b < a) or (a == b)  # totality
    if a < b and b < c:
        assert a < c  # transitivity
    assert not (a < a)


@given(versions)
def test_semver_bump_monotonic(v: SemVer):
    assert v < v.bump("patch") or v.prerelease is not None
    assert v.bump("patch") < v.bump("minor")
    assert v.bump("minor") < v.bump("major")


@given(st.lists(versions, min_size=1, max_size=20, unique_by=str))
def test_select_version_latest_is_max_release(vs: list[SemVer]):
    texts = [str(v) for v in vs]
    chosen = select_version(texts, "latest")
    releases = [v for v in vs if v.prerelease is None]
    if releases:
        assert SemVer.parse(chosen) == max(releases)
    else:
        assert chosen is None or SemVer.parse(chosen) == max(vs)


@settings(max_examples=50)
@given(
    st.text(min_size=0, max_size=40).filter(lambda s: "\x00" not in s)
)
def test_sql_literal_escapes_quotes(s: str):
    lit = _sql_literal(s)
    assert lit.startswith("'") and lit.endswith("'")
    inner = lit[1:-1]
    # every single quote in the payload is doubled -> unescaping restores it
    assert inner.replace("''", "\x01").count("'") == 0
    assert inner.replace("''", "'") == s


@given(st.lists(st.text(max_size=10), min_size=1, max_size=5))
def test_enum_predicate_contains_all_values(values: list[str]):
    pred = sql_predicate("enum", "c", values)
    assert pred.startswith("`c` IN (")
    for v in values:
        assert _sql_literal(v) in pred


contracts = st.builds(
    lambda props, rules: Contract(
        id="prop.test",
        version="1.0.0",
        schema_objects=[
            SchemaObject(
                name="t",
                properties=[
                    SchemaProperty(
                        f"c{i}",
                        ptype,
                        required=req,
                        quality=[QualityRule("gt", 0)] if q else [],
                    )
                    for i, (ptype, req, q) in enumerate(props)
                ],
                quality=[QualityRule("query", "SELECT 1", name="r")] if rules else [],
            )
        ],
    ),
    props=st.lists(
        st.tuples(
            st.sampled_from(["string", "bigint", "double", "boolean", "date"]),
            st.booleans(),
            st.booleans(),
        ),
        min_size=1,
        max_size=6,
    ),
    rules=st.booleans(),
)


@given(contracts)
def test_contract_json_roundtrip(c: Contract):
    payload = json.dumps(c.to_dict())
    back = Contract.from_dict(json.loads(payload))
    assert back.to_dict() == c.to_dict()
    assert [p.name for p in back.schema_objects[0].properties] == [
        p.name for p in c.schema_objects[0].properties
    ]


# --------------------------------------------------------- media codecs

import numpy as np

from dc43_spark.functions import multimodal as mm


@st.composite
def _images(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    c = draw(st.sampled_from([1, 2, 3, 4]))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


@given(_images())
@settings(max_examples=40, deadline=None)
def test_png_codec_round_trip_property(px):
    payload = mm.png_encode(px)
    h, w, c = px.shape
    assert mm.png_header(payload) == (w, h, c, 8)
    np.testing.assert_array_equal(mm.png_decode(payload), px)


@given(
    st.integers(1, 65000), st.integers(1, 65000), st.integers(1, 4)
)
@settings(max_examples=40, deadline=None)
def test_jpeg_header_round_trip_property(w, h, c):
    assert mm.jpeg_header(mm.jpeg_encode_header(w, h, c)) == (w, h, c)


@given(
    st.integers(1, 2000),        # frames per channel
    st.sampled_from([8000, 16000, 22050, 44100]),
    st.integers(1, 2),
)
@settings(max_examples=40, deadline=None)
def test_wav_header_round_trip_property(frames, rate, channels):
    samples = np.zeros(frames * channels, np.int16)
    payload = mm.wav_encode(samples, sample_rate=rate, channels=channels)
    assert mm.wav_header(payload) == (rate, channels, 16, frames * 1000 // rate)


@given(st.binary(max_size=200))
@settings(max_examples=60, deadline=None)
def test_probing_arbitrary_bytes_never_raises(payload):
    """Parsers must classify or reject ANY byte string — a 100 TB lake of
    scraped binaries contains every malformed header imaginable."""
    mm.png_header(payload)
    mm.jpeg_header(payload)
    mm.wav_header(payload)


# ------------------------------------------------------ token encoding

_token_texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=24), min_size=1, max_size=8
)


@given(_token_texts)
@settings(max_examples=15, deadline=None)
def test_encode_tokens_strategies_agree_property(texts):
    """Literal-map and broadcast-join encoding must agree on arbitrary
    corpora, including empty/whitespace-only docs and OOV-only docs."""
    import pytest

    spark = _spark_session()
    from dc43_spark.functions.curation import encode_tokens, vocab_top_terms

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    vocab = vocab_top_terms(docs, top_n=2)
    a = {r["doc_id"]: (r["ids"], r["n_tokens"], r["n_unk"])
         for r in encode_tokens(docs, vocab).collect()}
    b = {r["doc_id"]: (r["ids"], r["n_tokens"], r["n_unk"])
         for r in encode_tokens(docs, vocab, literal_map_max=0).collect()}
    assert a == b


_SPARK = []


def _spark_session():
    if not _SPARK:
        from pyspark.sql import SparkSession

        _SPARK.append(
            SparkSession.builder.master("local[2]")
            .appName("dc43-prop")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
    return _SPARK[0]


@given(st.integers(1, 8000), st.integers(1, 8000), st.integers(0, 10**9))
@settings(max_examples=40, deadline=None)
def test_mp4_header_round_trip_property(w, h, dur):
    from dc43_spark.functions import multimodal as mm

    assert mm.mp4_header(mm.mp4_encode_header(w, h, dur)) == (w, h, dur)


@given(st.binary(max_size=200))
@settings(max_examples=60, deadline=None)
def test_mp4_probe_arbitrary_bytes_never_raises(payload):
    from dc43_spark.functions import multimodal as mm

    mm.mp4_header(payload)
