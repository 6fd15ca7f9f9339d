from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import SparkSession

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("dc43-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="dc43_wh_"))
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(autouse=True)
def _delta_protocol_conformance(request, tmp_path_factory):
    """Protocol conformance gate (VERDICT r10 #6): after EVERY test,
    structurally validate each ``_delta_log`` the test left under its
    tmp dirs against the PROTOCOL.md action shapes
    (io/delta_conformance.py) — every commit the writer / DML /
    OPTIMIZE / RESTORE / CLONE paths emitted anywhere in the suite gets
    machine-checked, the class of gate that catches b1eb905's
    tuple-list partitionValues structurally. Tests that deliberately
    author BROKEN logs opt out with @pytest.mark.nonconformant_log."""
    root = (
        str(request.getfixturevalue("tmp_path"))
        if "tmp_path" in request.fixturenames
        else None
    )
    yield
    if root is None or request.node.get_closest_marker("nonconformant_log"):
        return
    from dc43_spark.io.delta_conformance import validate_tree

    validate_tree(root)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TESTDATA


@pytest.fixture(scope="session")
def orders_df(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="session")
def customer_df(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


def executed_metrics(df) -> list[dict]:
    """Materialise ``df`` and return one dict per physical node with its
    runtime SQL metrics — the ground truth for scale-shape assertions
    (files read, partitions after pruning, shuffle bytes). Walks into the
    AQE final plan so post-reoptimization nodes are covered."""
    df.collect()
    out: list[dict] = []

    def walk(node) -> None:
        entry = {"node": node.nodeName()}
        try:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                entry[kv._1()] = kv._2().value()
        except Exception:
            pass
        out.append(entry)
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        if node.nodeName() == "AdaptiveSparkPlan":
            walk(node.executedPlan())
        # broadcast/shuffle query stages wrap their subtree
        for attr in ("plan", "broadcast", "shuffle"):
            try:
                walk(getattr(node, attr)())
            except Exception:
                pass

    walk(df._jdf.queryExecution().executedPlan())
    return out


def metric_sum(metrics: list[dict], node_substr: str, key: str) -> int:
    return sum(
        int(m.get(key, 0)) for m in metrics if node_substr in m["node"] and key in m
    )
