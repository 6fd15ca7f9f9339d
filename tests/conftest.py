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
