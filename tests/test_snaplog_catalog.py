"""Named-table catalog + SQL over snaplog (io/catalog.py)."""

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.catalog import SnaplogCatalog


def test_create_list_read_write_drop(spark, tmp_path):
    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    assert cat.tables() == []
    orders = cat.table("orders")
    orders.write(
        spark.createDataFrame([(1, 10.0), (2, 5.0)], "k long, amt double").coalesce(1),
        mode="overwrite",
    )
    cat.table("customers").write(
        spark.createDataFrame([(1, "ann"), (2, "bo")], "k long, name string").coalesce(1),
        mode="overwrite",
    )
    assert cat.tables() == ["customers", "orders"]
    assert cat.exists("orders") and not cat.exists("nope")
    # the same name resolves to the same table (full surface available)
    assert cat.table("orders").read().count() == 2
    cat.table("orders").create_tag("r1")
    assert cat.table("orders").tags == {"r1": 0}

    with pytest.raises(ValueError, match="purge=True"):
        cat.drop("orders")
    cat.drop("orders", purge=True)
    assert cat.tables() == ["customers"]
    with pytest.raises(ValueError, match="no table"):
        cat.drop("orders", purge=True)
    with pytest.raises(ValueError, match="identifier"):
        cat.table("../escape")


def test_sql_over_views_with_pushdown(spark, tmp_path):
    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    cat.table("orders").write(
        spark.range(100)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("cust"),
            (F.col("id") * 2.0).alias("amt"),
        )
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k"),
        mode="overwrite",
    )
    cat.table("customers").write(
        spark.createDataFrame(
            [(c, f"c{c}") for c in range(7)], "cust long, name string"
        ).coalesce(1),
        mode="overwrite",
    )
    got = {
        (r.name, r.total)
        for r in cat.sql(
            """
            SELECT c.name, CAST(SUM(o.amt) AS BIGINT) AS total
            FROM orders o JOIN customers c USING (cust)
            GROUP BY c.name
            """
        ).collect()
    }
    want = {
        (f"c{c}", sum(i * 2 for i in range(100) if i % 7 == c)) for c in range(7)
    }
    assert got == want
    # pushdown-capable path: the views read through the snaplog data
    # source (BatchScan in the plan, not a raw parquet multi-scan); the
    # file-pruning of pushed filters is unit-pinned in
    # test_snaplog_source — here pin that SQL actually routes there
    cat.register_views()
    pruned = spark.sql("SELECT * FROM orders WHERE k = 50")
    assert pruned.count() == 1
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan snaplog" in plan
    from dc43_spark.io.snaplog_source import SnaplogPushdownBatchReader
    from pyspark.sql.datasource import EqualTo

    r = SnaplogPushdownBatchReader(cat._path("orders"), {})
    assert len(r.partitions()) == 4
    r.pushFilters([EqualTo(("k",), 50)])
    assert len(r.partitions()) == 1  # the filter SQL pushes prunes to 1


def test_catalog_defaults_flow_to_tables(spark, tmp_path):
    cat = SnaplogCatalog(spark, str(tmp_path / "wh"), change_feed=True)
    t = cat.table("events")
    t.write(
        spark.createDataFrame([(1, "a")], "k long, v string").coalesce(1),
        mode="overwrite",
    )
    t.delete([("k", "=", 1)])  # row-level op requires the feed
    assert t.table_changes(0).count() >= 2  # insert + delete events
    # per-call override wins
    t2 = cat.table("events", change_feed=False)
    assert t2.change_feed  # persisted table property still on
