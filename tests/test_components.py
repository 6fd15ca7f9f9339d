"""Connected components (large-star/small-star) vs a union-find reference.

The Spark implementation must match a driver-side union-find on random
graphs of every shape that matters: chains (worst case for label
propagation), stars, cliques, and disconnected singletons.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dc43_spark.functions.dedup import connected_components, dedup_clusters


def _union_find_roots(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical root = min node id in the component
    comp = {}
    for x in range(n_nodes):
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for root, members in comp.items() for x in members}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["node"]: r["root"] for r in connected_components(df).collect()
    }


def test_chain_graph(spark):
    """A 40-node chain: label propagation would need 40 rounds; the
    alternating algorithm must converge inside its log-bound budget."""
    edges = [(i, i + 1) for i in range(40)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(41)}


def test_two_cliques_and_noise(spark):
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges += [(20, 21)]
    got = _run(spark, edges)
    assert {got[i] for i in range(5)} == {0}
    assert {got[i] for i in range(10, 14)} == {10}
    assert got[20] == got[21] == 20


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(45)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    expect = _union_find_roots(n, edges)
    got = _run(spark, edges)
    touched = {a for e in edges for a in e}
    assert got == {x: expect[x] for x in touched}


def test_reversed_and_duplicate_edges(spark):
    got = _run(spark, [(2, 1), (1, 2), (2, 3), (3, 2), (5, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_dedup_clusters_assigns_singletons_to_self(spark):
    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "doc_a long, doc_b long")
    out = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert [out[i]["cluster_id"] for i in range(6)] == [0, 1, 2, 0, 4, 0]
    assert out[0]["cluster_size"] == out[3]["cluster_size"] == out[5]["cluster_size"] == 3
    assert out[1]["cluster_size"] == 1
    # original columns survive
    assert out[4]["text"] == "text-4"


def test_string_node_ids_work_on_both_branches(spark):
    """The driver fast path must accept non-integer ids and agree with the
    distributed branch (r4 advice: a hardcoded 'node long' schema crashed
    string ids on the small-graph branch only)."""
    edges = [("b", "a"), ("b", "c"), ("x", "y")]
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    expect = {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    fast = {r["node"]: r["root"] for r in connected_components(df).collect()}
    dist = {
        r["node"]: r["root"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert fast == expect
    assert dist == expect
    # both branches return the SAME schema, derived from the edge columns
    assert (
        connected_components(df).schema
        == connected_components(df, driver_threshold=0).schema
    )


@settings(max_examples=12, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)),
        min_size=1,
        max_size=40,
    )
)
def test_distributed_rounds_match_union_find(spark, raw):
    """Property: the large-star/small-star iterations (driver_threshold=0,
    so the fast path CANNOT mask them) compute exactly the union-find
    roots on arbitrary small graphs — chains, cliques, self-loops,
    duplicates, whatever hypothesis shrinks to."""
    edges = [e for e in raw if e[0] != e[1]]
    if not edges:
        return
    expect = _union_find_roots(25, edges)
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["root"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    touched = {a for e in edges for a in e}
    assert got == {x: expect[x] for x in touched}


def test_iteration_cap_warns_instead_of_silent_wrong_answer(spark):
    import warnings as w

    from dc43_spark.functions.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a long, doc_b long"
    )
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        connected_components(edges, max_iterations=1, driver_threshold=0).collect()
    assert any("max_iterations" in str(x.message) for x in caught)
