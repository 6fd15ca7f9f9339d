"""Driver-contract consistency: the queries()/oracle_sql() registries must
stay aligned — a gate without an oracle silently downgrades to a rows-only
check, and an oracle without a query is dead weight the driver never runs."""

from __future__ import annotations

import sys


def _entry():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    return e


def test_every_query_has_an_oracle_and_vice_versa():
    e = _entry()
    queries, oracles = e.queries(), e.oracle_sql()
    assert set(queries) == set(oracles), (
        sorted(set(queries) ^ set(oracles))
    )
    # the driver gates the first 50 registry entries (r4 verdict): stay at
    # EXACTLY <=50 so every registered gate gets a hard correctness row
    assert 49 <= len(queries) <= 50
    extras, extra_oracles = e.extra_queries(), e.extra_oracle_sql()
    assert set(extras) == set(extra_oracles), (
        sorted(set(extras) ^ set(extra_oracles))
    )
    assert not set(extras) & set(queries)


def test_previously_ungated_queries_lead_the_registry():
    """The queries with no CORRECTNESS_r04 row must merge first so the
    driver's 50-slot window always covers them."""
    e = _entry()
    n = len(e._GATE_FIRST)
    assert list(e.queries())[:n] == e._GATE_FIRST
    assert list(e.oracle_sql())[:n] == e._GATE_FIRST


def test_oracles_are_nonempty_sql():
    e = _entry()
    for name, sql in e.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_registries_have_no_duplicate_keys_across_modules():
    from dc43_spark import showcase, showcase_curation, showcase_governance
    from dc43_spark import showcase_io, showcase_scale

    groups = [
        showcase.QUERIES,
        showcase_scale.SCALE_QUERIES,
        showcase_io.IO_QUERIES,
        showcase_curation.CURATION_QUERIES,
        showcase_governance.GOVERNANCE_QUERIES,
    ]
    seen: set[str] = set()
    for g in groups:
        overlap = seen & set(g)
        assert not overlap, overlap  # later dicts would silently shadow
        seen |= set(g)


def test_bench_covers_every_gate():
    """BENCH and CORRECTNESS sets must stay converged: an unbenched gate
    has no perf signal, a benched non-gate has no correctness signal."""
    import bench

    e = _entry()
    # bench times the 50 driver gates PLUS the consolidated-out extras
    # (keeps r1-comparable names in BENCH_r{N}.json)
    assert set(bench.HEADLINE) == set(e.queries()) | set(e.extra_queries()), (
        sorted(set(bench.HEADLINE) ^ (set(e.queries()) | set(e.extra_queries())))
    )
    unknown = bench.COUNT_ONLY - set(bench.HEADLINE)
    assert not unknown, sorted(unknown)
