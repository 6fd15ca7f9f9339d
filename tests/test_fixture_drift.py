"""Fixture-drift canary: fail ONE readable test when /root/testdata changes
shape, instead of 10 opaque driver gates.

Round 2 lost every events-derived gate (and the whole bench run) because the
driver silently regenerated ``events.parquet`` with ``ts`` as timestamp[us]
where it used to be timestamp[ns], and the loader assumed nanos. This module
pins, per table, (a) the exact column set and (b) the physical arrow dtype of
every column — with an explicit ALLOWED-VARIANTS set for columns the loaders
adapt to (events.ts) — and prints a side-by-side diff on mismatch.

pyarrow-only: no SparkSession, so the canary runs in milliseconds and fails
first in any pytest run that starts with a drifted fixture tree.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")

# column -> exact arrow dtype string, or a set of dtypes the loaders handle.
# events.ts: load_events/normalize_event_ts adapt to MICROS (native read),
# NANOS (nanosAsLong -> rebuild), and the raw int64 that conf produces.
EXPECTED = {
    "region": {"r_regionkey": "int64", "r_name": "string", "r_comment": "string"},
    "nation": {
        "n_nationkey": "int64",
        "n_name": "string",
        "n_regionkey": "int64",
        "n_comment": "string",
    },
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_address": "string",
        "c_nationkey": "int64",
        "c_phone": "string",
        "c_acctbal": "double",
        "c_mktsegment": "string",
        "c_comment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_address": "string",
        "s_nationkey": "int64",
        "s_phone": "string",
        "s_acctbal": "double",
        "s_comment": "string",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_mfgr": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int64",
        "p_container": "string",
        "p_retailprice": "double",
        "p_comment": "string",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
        "o_orderpriority": "string",
        "o_clerk": "string",
        "o_shippriority": "int64",
        "o_comment": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int64",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
        "l_commitdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
        "l_receiptdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
        "l_shipinstruct": "string",
        "l_shipmode": "string",
        "l_comment": "string",
    },
    "events": {
        "event_id": "int64",
        "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "url": "string",
        "lang": "string",
        "text": "string",
        "media_type": "string",
        "media_bytes": "binary",
        "media_meta": "string",
    },
    "embeddings": {
        "vec_id": "int64",
        "doc_id": "int64",
        "model": "string",
        "dim": "int64",
        "embedding": "list<element: float>",
    },
}


def _diff(table: str, actual: dict[str, str]) -> list[str]:
    expected = EXPECTED[table]
    lines = []
    for col, exp in expected.items():
        allowed = exp if isinstance(exp, set) else {exp}
        got = actual.get(col)
        if got is None:
            lines.append(f"  {table}.{col}: MISSING (expected {sorted(allowed)})")
        elif got not in allowed:
            lines.append(f"  {table}.{col}: got {got!r}, loader expects one of {sorted(allowed)}")
    for col in actual:
        if col not in expected:
            lines.append(f"  {table}.{col}: NEW column ({actual[col]!r}) not in loader contract")
    return lines


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema_matches_loader_contract(table: str) -> None:
    path = f"{TESTDATA}/{table}.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    schema = pq.read_schema(path)
    actual = {f.name: str(f.type) for f in schema}
    problems = _diff(table, actual)
    assert not problems, (
        f"FIXTURE DRIFT in {path} — the driver regenerated this table in a "
        f"shape the loaders don't expect (r2 lost 10 gates + the bench to "
        f"exactly this). Mismatches:\n" + "\n".join(problems)
    )
