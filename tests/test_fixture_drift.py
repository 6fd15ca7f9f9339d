"""Fixture-drift canary: fail ONE readable test when /root/testdata changes
shape, instead of 10 opaque driver gates.

Round 2 lost every events-derived gate (and the whole bench run) because the
driver silently regenerated ``events.parquet`` with ``ts`` as timestamp[us]
where it used to be timestamp[ns], and the loader assumed nanos.

Round-4 rewrite (the round-3 version pinned an idealized full-TPC-H shape the
fixtures never had, and failed 9/10 against the healthy tree): the canary now
pins ONLY the columns the loaders / gate queries actually consume, verified
against the live tree at authoring time. Rules:

- A pinned column that is MISSING or has a dtype outside its allowed set is a
  hard failure (a loader would break).
- Integer key/metric columns accept any of {int32, int64} — every loader goes
  through Spark, which widens transparently, and the driver has emitted both.
- Timestamp columns accept {timestamp[us], timestamp[ns], int64}: the loaders
  normalize all three encodings (``normalize_event_ts``).
- EXTRA columns the loaders never read are informational only (printed via a
  warning, never a failure): new driver columns are harmless to every query.

pyarrow-only: no SparkSession, so the canary runs in milliseconds and fails
first in any pytest run that starts with a drifted fixture tree.
"""

from __future__ import annotations

import os
import warnings

import pyarrow.parquet as pq
import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")

INT = {"int32", "int64"}
TS = {"timestamp[us]", "timestamp[ns]", "int64"}
FLOATVEC = {"list<element: float>", "list<item: float>", "list<element: double>"}

# table -> {column consumed by a loader/gate: allowed arrow dtypes}
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": INT, "r_name": {"string"}},
    "nation": {"n_nationkey": INT, "n_name": {"string"}, "n_regionkey": INT},
    "customer": {
        "c_custkey": INT,
        "c_name": {"string"},
        "c_nationkey": INT,
        "c_acctbal": {"double"},
        "c_mktsegment": {"string"},
    },
    "supplier": {
        "s_suppkey": INT,
        "s_name": {"string"},
        "s_nationkey": INT,
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": INT,
        "p_name": {"string"},
        "p_brand": {"string"},
        "p_type": {"string"},
        "p_size": INT,
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": INT,
        "o_custkey": INT,
        "o_orderstatus": {"string"},
        "o_totalprice": {"double"},
        "o_orderdate": TS | {"date32[day]"},
        "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": INT,
        "l_partkey": INT,
        "l_suppkey": INT,
        "l_linenumber": INT,
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": TS | {"date32[day]"},
    },
    "events": {
        "event_id": INT,
        "ts": TS,
        "user_id": INT,
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": INT,
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
        "n_chars": INT,
    },
    "embeddings": {
        "vec_id": INT,
        "embedding": FLOATVEC,
        "label": INT,
    },
}


def _diff(table: str, actual: dict[str, str]) -> tuple[list[str], list[str]]:
    expected = EXPECTED[table]
    hard, info = [], []
    for col, allowed in expected.items():
        got = actual.get(col)
        if got is None:
            hard.append(f"  {table}.{col}: MISSING (loader expects one of {sorted(allowed)})")
        elif got not in allowed:
            hard.append(f"  {table}.{col}: got {got!r}, loader expects one of {sorted(allowed)}")
    for col in actual:
        if col not in expected:
            info.append(f"  {table}.{col}: extra column ({actual[col]!r}) — no loader reads it")
    return hard, info


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema_matches_loader_contract(table: str) -> None:
    path = f"{TESTDATA}/{table}.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    schema = pq.read_schema(path)
    actual = {f.name: str(f.type) for f in schema}
    hard, info = _diff(table, actual)
    if info:
        warnings.warn("fixture has columns no loader reads:\n" + "\n".join(info))
    assert not hard, (
        f"FIXTURE DRIFT in {path} — the driver regenerated this table in a "
        f"shape the loaders don't expect (r2 lost 10 gates + the bench to "
        f"exactly this). Mismatches:\n" + "\n".join(hard)
    )
