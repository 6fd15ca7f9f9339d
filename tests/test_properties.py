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
