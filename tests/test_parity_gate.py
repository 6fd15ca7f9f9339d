"""Local parity gate for queries the driver hasn't hash-checked yet.

The driver's correctness harness gates at most ~50 registry slots per round
(CORRECTNESS_r{N}.json). Any ``queries()`` entry absent from the LATEST
correctness file has no hard driver signal — this module is its in-tree
guard: the same row/column/value comparison against the DuckDB oracle, run
at sf0.001 so it stays cheap enough for every ``pytest`` invocation.

Run just these with ``pytest -m parity``.
"""

from __future__ import annotations

import json
import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import __spark_entry__ as entry  # noqa: E402
import check_parity  # noqa: E402


def _latest_correctness_keys() -> set:
    best, keys = -1, set()
    for fname in os.listdir(REPO):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if not m:
            continue
        rnd = int(m.group(1))
        if rnd > best:
            with open(os.path.join(REPO, fname)) as fh:
                data = json.load(fh)
            best, keys = rnd, set(data)
    return keys


def _ungated_queries() -> list:
    gated = _latest_correctness_keys()
    ungated = [name for name in entry.queries() if name not in gated]
    # extras were consolidated OUT of the driver's 50-slot registry, so
    # the driver never hash-checks them AGAIN — a stale row in an older
    # CORRECTNESS file doesn't cover today's code, so they are checked
    # unconditionally (r5 review: the consolidation silently removed all
    # verification for nine formerly-gated queries)
    ungated += list(entry.extra_queries())
    return ungated


UNGATED = _ungated_queries()


@pytest.fixture(scope="module")
def duck_con(sf_dir):
    con = check_parity.duckdb_connection(sf_dir)
    yield con
    con.close()


def test_dtype_gate_flags_hugeint_oracle(spark, duck_con, sf_dir):
    """The r8 failure class: an oracle whose bare SUM yields HUGEINT was
    rows/schema/string-green locally yet hash-red in the driver (its hash is
    dtype-sensitive). check_parity must fail such an oracle even when every
    stringified value matches."""
    def fn(sp, d):
        return sp.range(1).selectExpr("CAST(3 AS BIGINT) AS s")

    bare = "SELECT SUM(x) AS s FROM (VALUES (1),(1),(1)) t(x)"
    problems = check_parity.check_query(spark, duck_con, fn, bare, sf_dir)
    assert any("HUGEINT" in p for p in problems), problems

    cast = "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1),(1),(1)) t(x)"
    assert not check_parity.check_query(spark, duck_con, fn, cast, sf_dir)


def test_dtype_gate_flags_width_mismatch(spark, duck_con, sf_dir):
    def fn(sp, d):
        return sp.range(1).selectExpr("CAST(7 AS INT) AS v")

    problems = check_parity.check_query(
        spark, duck_con, fn, "SELECT CAST(7 AS BIGINT) AS v", sf_dir)
    assert any("dtype mismatch" in p for p in problems), problems


@pytest.mark.parity
@pytest.mark.parametrize("name", UNGATED or ["__all_gated__"])
def test_driver_ungated_query_matches_oracle(spark, duck_con, sf_dir, name):
    if name == "__all_gated__":
        pytest.skip("every registered query has a row in the latest CORRECTNESS file")
    fn = entry.queries().get(name) or entry.extra_queries()[name]
    sql = entry.oracle_sql().get(name) or entry.extra_oracle_sql().get(name)
    problems = check_parity.check_query(spark, duck_con, fn, sql, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)
