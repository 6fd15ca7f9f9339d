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


def test_sql_registers_only_referenced_tables(spark, tmp_path):
    """A single-table query on an N-table catalog registers ONE view —
    at warehouse scale (1000s of tables) per-query registration of the
    whole catalog would be the dominant query-planning cost."""
    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    for name in ("t_alpha", "t_beta", "t_gamma"):
        cat.table(name).write(
            spark.createDataFrame([(1, name)], "k long, v string").coalesce(1),
            mode="overwrite",
        )
    for name in ("t_alpha", "t_beta", "t_gamma"):
        spark.catalog.dropTempView(name)
    assert cat.sql("SELECT v FROM t_alpha").collect()[0].v == "t_alpha"
    views = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    assert "t_alpha" in views and "t_beta" not in views and "t_gamma" not in views
    # explicit pinning beats inference
    spark.catalog.dropTempView("t_alpha")
    cat.sql("SELECT v FROM t_beta", tables=["t_beta"]).collect()
    views = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    assert "t_beta" in views and "t_alpha" not in views


def test_sql_ddl_passthrough(spark, tmp_path):
    """The catalog as the single SQL entry point: CREATE (empty + CTAS +
    partitioned CTAS), INSERT INTO, DROP ... PURGE."""
    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    cat.table("src").write(
        spark.createDataFrame(
            [(i, i % 2, float(i)) for i in range(10)], "k long, p long, amt double"
        ).coalesce(1),
        mode="overwrite",
    )

    st = cat.sql("CREATE TABLE empty_t (k LONG, v STRING)").collect()[0]
    assert st.table == "empty_t" and st.version == 0
    assert cat.table("empty_t").read().count() == 0
    assert [f.name for f in cat.table("empty_t").read().schema.fields] == ["k", "v"]
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("CREATE TABLE empty_t (k LONG)")
    cat.sql("CREATE TABLE IF NOT EXISTS empty_t (k LONG)")  # no-op

    cat.sql("CREATE TABLE big AS SELECT k, amt FROM src WHERE k >= 5")
    assert {r.k for r in cat.table("big").read().collect()} == {5, 6, 7, 8, 9}

    cat.sql(
        "CREATE TABLE by_p PARTITIONED BY (p) AS SELECT * FROM src"
    )
    assert cat.table("by_p").snapshot(0).partition_by == ("p",)
    assert cat.table("by_p").read(filters=[("p", "=", 1)]).count() == 5

    st = cat.sql("INSERT INTO big SELECT k, amt FROM src WHERE k < 2").collect()[0]
    assert st.version == 1
    assert cat.table("big").read().count() == 7
    with pytest.raises(ValueError, match="no table"):
        cat.sql("INSERT INTO nope SELECT * FROM src")

    with pytest.raises(ValueError, match="PURGE"):
        cat.sql("DROP TABLE big")
    cat.sql("DROP TABLE big PURGE")
    assert not cat.exists("big")
    cat.sql("DROP TABLE IF EXISTS big PURGE")  # no-op
    with pytest.raises(ValueError, match="no table"):
        cat.sql("DROP TABLE big PURGE")


def test_mixed_catalog_spans_snaplog_and_delta(spark, tmp_path):
    """One catalog root, both formats: a jar-less Delta table (a real
    _delta_log) lists, registers through the deltalog source, JOINs
    against snaplog tables in one SQL, takes INSERT INTO through
    delta_write, and drops with the same purge discipline."""
    from dc43_spark.io.delta_log import delta_write

    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    cat.table("dims").write(
        spark.createDataFrame([(0, "even"), (1, "odd")], "p long, name string")
        .coalesce(1),
        mode="overwrite",
    )
    delta_write(
        spark,
        spark.range(10).select(F.col("id").alias("k"),
                               (F.col("id") % 2).alias("p")),
        cat._path("facts"),
    )

    assert cat.tables() == ["dims", "facts"]
    assert cat.format_of("facts") == "delta" and cat.format_of("dims") == "snaplog"
    with pytest.raises(ValueError, match="delta_table"):
        cat.table("facts")
    assert cat.delta_table("facts").read().count() == 10

    got = {
        (r.name, r.n)
        for r in cat.sql(
            "SELECT d.name, COUNT(*) AS n FROM facts f "
            "JOIN dims d USING (p) GROUP BY d.name"
        ).collect()
    }
    assert got == {("even", 5), ("odd", 5)}

    st = cat.sql("INSERT INTO facts SELECT CAST(100 AS BIGINT) AS k, CAST(0 AS BIGINT) AS p").collect()[0]
    assert st.version == 1
    assert cat.delta_table("facts").read().count() == 11

    with pytest.raises(ValueError, match="PURGE"):
        cat.sql("DROP TABLE facts")
    cat.sql("DROP TABLE facts PURGE")
    assert cat.tables() == ["dims"]


def test_sql_delete_and_update_route_to_both_formats(spark, tmp_path):
    """DELETE FROM / UPDATE ... SET over catalog.sql(): snaplog tables
    take the copy-on-write path, Delta tables the jar-less DML path;
    assignments with function-call commas parse; WHERE is optional."""
    import os

    from dc43_spark.io.catalog import SnaplogCatalog
    from dc43_spark.io.delta_log import DeltaLogTable, delta_write

    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    cat.sql("CREATE TABLE s AS SELECT id AS k, id * 10 AS amt "
            "FROM range(8)")
    delta_write(
        spark,
        spark.range(8).selectExpr("id AS k", "id * 10 AS amt").coalesce(1),
        os.path.join(cat.root, "d"), checkpoint_interval=None,
    )

    cat.sql("DELETE FROM s WHERE k >= 6")
    assert {r.k for r in cat.sql("SELECT k FROM s").collect()} == set(range(6))
    cat.sql("UPDATE s SET amt = greatest(amt, 25), k = k + 100 WHERE k < 2")
    got = {(r.k, r.amt) for r in cat.sql("SELECT * FROM s").collect()}
    assert got == {(100, 25), (101, 25), (2, 20), (3, 30), (4, 40), (5, 50)}

    cat.sql("DELETE FROM d WHERE k IN (0, 7)")
    d = DeltaLogTable(spark, os.path.join(cat.root, "d"))
    assert {r.k for r in d.read().collect()} == {1, 2, 3, 4, 5, 6}
    cat.sql("UPDATE d SET amt = amt + 1 WHERE k = 1")
    assert (1, 11) in {(r.k, r.amt) for r in d.read().collect()}
    # WHERE-less delete empties the table (explicit, like SQL)
    cat.sql("DELETE FROM d")
    assert d.read().count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no table"):
        cat.sql("DELETE FROM nope WHERE k = 1")
    with _pytest.raises(ValueError, match="unparseable"):
        cat.sql("UPDATE s SET 5 = k")


def test_snaplog_where_predicates_direct(spark, tmp_path):
    """delete(where=)/update(where=) take raw SQL predicates (delta-
    spark's condition spelling): row-exact with no DNF translation, and
    composable with filters (filters prune, where refines)."""
    from dc43_spark.io.snaplog import SnaplogTable

    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(
        spark.range(10).selectExpr("id AS k", "id * 10 AS amt",
                                   "CAST(id % 2 AS STRING) AS par")
        .coalesce(1),
        mode="overwrite",
    )
    t.delete(where="k % 3 = 0 AND amt < 70")  # 0, 3, 6
    assert {r.k for r in t.read().collect()} == {1, 2, 4, 5, 7, 8, 9}
    t.update(set={"amt": "amt + 1"}, where="par = '1'")
    got = {(r.k, r.amt) for r in t.read().collect()}
    assert got == {(1, 11), (2, 20), (4, 40), (5, 51), (7, 71),
                   (8, 80), (9, 91)}
    # both spellings compose: filters prune, where refines row-exactly
    t.delete([("k", ">=", 8)], where="amt > 85")
    assert {r.k for r in t.read().collect()} == {1, 2, 4, 5, 7, 8}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="filters= .*where=|where="):
        t.delete()


def test_sql_merge_into_both_formats(spark, tmp_path):
    """MERGE INTO over catalog.sql(): the updateAll/insertAll subset with
    delete/insert predicates, routed to snaplog's COW merge and the
    jar-less Delta DML merge; unsupported grammar refuses with pointers
    to the APIs."""
    import os

    from dc43_spark.io.catalog import SnaplogCatalog
    from dc43_spark.io.delta_log import DeltaLogTable, delta_write

    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    cat.sql("CREATE TABLE tgt AS SELECT id AS k, id * 10 AS amt "
            "FROM range(6)")
    cat.sql("CREATE TABLE src AS "
            "SELECT id AS k, id * 1000 AS amt FROM range(4, 9)")
    delta_write(
        spark,
        spark.range(6).selectExpr("id AS k", "id * 10 AS amt").coalesce(1),
        os.path.join(cat.root, "dtgt"), checkpoint_interval=None,
    )

    # snaplog target: update + conditional insert
    cat.sql(
        "MERGE INTO tgt t USING src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED AND s.k < 8 THEN INSERT *"
    )
    got = {(r.k, r.amt) for r in cat.sql("SELECT * FROM tgt").collect()}
    assert got == {(0, 0), (1, 10), (2, 20), (3, 30),
                   (4, 4000), (5, 5000), (6, 6000), (7, 7000)}

    # delta target: subquery source + matched-delete predicate
    cat.sql(
        "MERGE INTO dtgt t USING "
        "(SELECT id AS k, id * 100 AS amt FROM range(3, 8)) s "
        "ON t.k = s.k "
        "WHEN MATCHED AND s.amt >= 500 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    d = DeltaLogTable(spark, os.path.join(cat.root, "dtgt"))
    got = {(r.k, r.amt) for r in d.read().collect()}
    # 5 deleted (500), 3,4 updated, 6,7 inserted, 0-2 kept
    assert got == {(0, 0), (1, 10), (2, 20), (3, 300), (4, 400),
                   (6, 600), (7, 700)}

    with pytest.raises(ValueError, match="key-join subset"):
        cat.sql("MERGE INTO tgt t USING src s ON t.k > s.k "
                "WHEN MATCHED THEN UPDATE SET *")

    # r11: column-level SET, conditional UPDATE, unconditional matched
    # DELETE, and BY SOURCE clauses all parse and execute (VERDICT r10 #2)
    cat.sql(
        "MERGE INTO tgt t USING src s ON t.k = s.k "
        "WHEN MATCHED AND t.k = 4 THEN UPDATE SET amt = s.amt + t.amt "
        "WHEN NOT MATCHED BY SOURCE AND t.k = 0 THEN DELETE"
    )
    got = {(r.k, r.amt) for r in cat.sql("SELECT * FROM tgt").collect()}
    # k=4: 4000 (src) + 4000 (tgt after first merge) = 8000; k=0 removed
    assert got == {(1, 10), (2, 20), (3, 30),
                   (4, 8000), (5, 5000), (6, 6000), (7, 7000)}
    cat.sql(
        "MERGE INTO tgt t USING src s ON t.k = s.k "
        "WHEN MATCHED THEN DELETE"
    )
    assert {r.k for r in cat.sql("SELECT * FROM tgt").collect()} == {1, 2, 3}
    cat.sql(
        "MERGE INTO tgt t USING src s ON t.k = s.k "
        "WHEN NOT MATCHED AND s.k = 8 THEN "
        "INSERT (k, amt) VALUES (s.k + 100, s.amt % 7)"
    )
    got = {(r.k, r.amt) for r in cat.sql("SELECT * FROM tgt").collect()}
    assert (108, 8000 % 7) in got  # VALUES exprs evaluated over s


def test_sql_merge_refuses_unrecognized_when_clauses(spark, tmp_path):
    """A WHEN spelling outside the supported grammar must refuse, not
    silently execute the merge without it (review r10)."""
    from dc43_spark.io.catalog import SnaplogCatalog

    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    cat.sql("CREATE TABLE t2 AS SELECT id AS k, id AS amt FROM range(3)")
    cat.sql("CREATE TABLE s2 AS SELECT id AS k, id AS amt FROM range(2, 5)")
    with pytest.raises(ValueError, match="unsupported MERGE clause"):
        cat.sql(
            "MERGE INTO t2 t USING s2 s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED BY TARGET THEN INSERT *"
        )
    # r12: multiple same-kind clauses are legal (first-match-wins), but
    # an UNCONDITIONAL clause before another of its kind refuses — the
    # later clause would be dead (delta-spark's rule)
    with pytest.raises(ValueError, match="LAST 'when matched'"):
        cat.sql(
            "MERGE INTO t2 t USING s2 s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN MATCHED AND t.k = 2 THEN UPDATE SET amt = 0"
        )
    with pytest.raises(ValueError, match="BY SOURCE"):
        cat.sql(
            "MERGE INTO t2 t USING s2 s ON t.k = s.k "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *"
        )
    # nothing executed
    assert cat.sql("SELECT * FROM t2").count() == 3
    # r11: WHEN NOT MATCHED BY SOURCE THEN DELETE is now real grammar
    cat.sql(
        "MERGE INTO t2 t USING s2 s ON t.k = s.k "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    assert {r.k for r in cat.sql("SELECT * FROM t2").collect()} == {2}


def test_sql_update_where_inside_string_literal(spark, tmp_path):
    """The SET/WHERE split is quote-aware: a literal containing 'WHERE'
    doesn't truncate the assignment (review r10)."""
    from dc43_spark.io.catalog import SnaplogCatalog

    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    cat.sql("CREATE TABLE t3 AS SELECT id AS k, CAST(id AS STRING) AS v "
            "FROM range(3)")
    cat.sql("UPDATE t3 SET v = 'a WHERE b'")
    assert {r.v for r in cat.sql("SELECT v FROM t3").collect()} == {"a WHERE b"}
    cat.sql("UPDATE t3 SET v = 'x WHERE y' WHERE k = 1")
    got = {(r.k, r.v) for r in cat.sql("SELECT * FROM t3").collect()}
    assert got == {(0, "a WHERE b"), (1, "x WHERE y"), (2, "a WHERE b")}


def test_sql_merge_case_when_inside_set_expression(spark, tmp_path):
    """A CASE WHEN inside an UPDATE SET expression must not be mistaken
    for a clause boundary (the boundary lookahead requires WHEN [NOT]
    MATCHED) — r11 parser regression pin."""
    from dc43_spark.io.catalog import SnaplogCatalog

    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    cat.sql("CREATE TABLE t3 AS SELECT id AS k, id * 10 AS amt FROM range(4)")
    cat.sql("CREATE TABLE s3 AS SELECT id AS k, id AS amt FROM range(2, 6)")
    cat.sql(
        "MERGE INTO t3 t USING s3 s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET "
        "  amt = CASE WHEN s.amt > 2 THEN -1 ELSE t.amt + 100 END "
        "WHEN NOT MATCHED THEN INSERT (k, amt) "
        "  VALUES (s.k, CASE WHEN s.k = 5 THEN 555 ELSE 0 END)"
    )
    got = {(r.k, r.amt) for r in cat.sql("SELECT * FROM t3").collect()}
    assert got == {(0, 0), (1, 10), (2, 120), (3, -1), (4, 0), (5, 555)}


def test_sql_merge_parser_hardening(spark, tmp_path):
    """Review r11 fixes: (a) whitespace inside string literals in SET /
    VALUES bodies passes through verbatim (the keyword-matching copy is
    collapsed, the body is not); (b) duplicate INSERT columns refuse;
    (c) an identifier starting with 'matched' inside CASE WHEN is not a
    clause boundary; (d, rewritten for r12 multi-clause) UPDATE written
    before DELETE evaluates in WRITTEN order — a row matching the
    earlier UPDATE clause never reaches the later DELETE."""
    from dc43_spark.io.catalog import SnaplogCatalog

    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    cat.sql("CREATE TABLE t4 AS SELECT id AS k, 'x' AS v FROM range(3)")
    cat.sql("CREATE TABLE s4 AS SELECT id AS k, id AS matched_flag "
            "FROM range(2, 5)")

    # (a) multi-space literal survives
    cat.sql("MERGE INTO t4 t USING s4 s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = 'a  b'")
    assert {r.v for r in cat.sql("SELECT v FROM t4 WHERE k = 2").collect()} \
        == {"a  b"}

    # (c) CASE WHEN <identifier starting with "matched"> parses
    cat.sql("MERGE INTO t4 t USING s4 s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET "
            "v = CASE WHEN s.matched_flag > 2 THEN 'hi' ELSE 'lo' END")
    got = {(r.k, r.v) for r in cat.sql("SELECT k, v FROM t4").collect()}
    assert (2, "lo") in got and (0, "x") in got

    # (b) duplicate INSERT column refuses
    with pytest.raises(ValueError, match="more than once"):
        cat.sql("MERGE INTO t4 t USING s4 s ON t.k = s.k "
                "WHEN NOT MATCHED THEN INSERT (k, k) VALUES (s.k, 0)")

    # (d) r12: UPDATE before DELETE is legal and evaluates in written
    # order — k=2 hits the first clause (updated, NOT deleted); no other
    # key matches, so the trailing DELETE fires on nothing
    cat.sql("MERGE INTO t4 t USING s4 s ON t.k = s.k "
            "WHEN MATCHED AND s.k = 2 THEN UPDATE SET v = 'kept' "
            "WHEN MATCHED THEN DELETE")
    got = {(r.k, r.v) for r in cat.sql("SELECT k, v FROM t4").collect()}
    assert got == {(0, "x"), (1, "x"), (2, "kept")}


def test_sql_maintenance_statements_both_formats(spark, tmp_path):
    """r11: OPTIMIZE [ZORDER BY] / VACUUM [RETAIN n HOURS] [DRY RUN] /
    RESTORE TABLE ... TO VERSION AS OF / DESCRIBE HISTORY route to the
    snaplog table API and the jar-less Delta maintenance functions."""
    import os

    from dc43_spark.io.catalog import SnaplogCatalog
    from dc43_spark.io.delta_log import DeltaLogTable, delta_write

    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    # snaplog: several small commits to give OPTIMIZE something to pack
    cat.sql("CREATE TABLE st AS SELECT id AS k, id * 2 AS amt FROM range(4)")
    cat.sql("INSERT INTO st SELECT id AS k, id AS amt FROM range(10, 14)")
    cat.sql("INSERT INTO st SELECT id AS k, id AS amt FROM range(20, 24)")
    hist = cat.sql("DESCRIBE HISTORY st").collect()
    assert [r.version for r in hist] == [0, 1, 2]
    assert hist[0].operation in ("overwrite", "write")

    st = cat.sql("OPTIMIZE st").collect()[0]
    assert st.version == 3
    assert cat.sql("SELECT * FROM st").count() == 12  # rows unchanged

    dry = cat.sql("VACUUM st RETAIN 0 HOURS DRY RUN").collect()[0]
    assert dry.dry_run and dry.files >= 0
    cat.sql("RESTORE TABLE st TO VERSION AS OF 0")
    assert {r.k for r in cat.sql("SELECT * FROM st").collect()} == {0, 1, 2, 3}

    # delta: same statements through the jar-less functions
    delta_write(
        spark,
        spark.range(4).selectExpr("id AS k", "id AS amt").coalesce(2),
        os.path.join(cat.root, "dt"), checkpoint_interval=None,
    )
    cat.sql("INSERT INTO dt SELECT id AS k, id AS amt FROM range(50, 54)")
    assert [r.version for r in cat.sql("DESCRIBE HISTORY dt").collect()] == [0, 1]
    cat.sql("OPTIMIZE dt")
    d = DeltaLogTable(spark, os.path.join(cat.root, "dt"))
    assert d.read().count() == 8
    out = cat.sql("VACUUM dt RETAIN 0 HOURS DRY RUN").collect()[0]
    assert out.dry_run
    cat.sql("RESTORE TABLE dt TO VERSION AS OF 0")
    assert {r.k for r in d.read().collect()} == {0, 1, 2, 3}
    with pytest.raises(ValueError, match="no table"):
        cat.sql("OPTIMIZE ghost")


def test_sql_vacuum_default_keeps_time_travel(spark, tmp_path):
    """Review r11 fix: a bare VACUUM (no RETAIN) uses the same 168-hour
    safety default on BOTH formats — it must not strip time travel the
    instant it runs."""
    from dc43_spark.io.catalog import SnaplogCatalog

    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    cat.sql("CREATE TABLE vt AS SELECT id AS k FROM range(3)")
    cat.sql("INSERT INTO vt SELECT id AS k FROM range(10, 13)")
    out = cat.sql("VACUUM vt").collect()[0]
    assert out.files == 0  # nothing old enough to sweep
    cat.sql("RESTORE TABLE vt TO VERSION AS OF 0")  # time travel intact
    assert {r.k for r in cat.sql("SELECT * FROM vt").collect()} == {0, 1, 2}


def test_sql_alter_table_both_formats(spark, tmp_path):
    """r11: ALTER TABLE through catalog.sql — RENAME/DROP COLUMN and
    ADD/DROP CONSTRAINT on both formats; ALTER COLUMN TYPE (protocol
    type widening) and SET/UNSET TBLPROPERTIES on Delta; unknown ALTER
    spellings and snaplog-impossible lifecycles refuse loudly."""
    import os

    from dc43_spark.io.catalog import SnaplogCatalog
    from dc43_spark.io.delta_log import DeltaLogTable, delta_write

    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))

    # snaplog: rename + constraint lifecycle
    cat.sql("CREATE TABLE st AS SELECT id AS k, id * 2 AS amt FROM range(4)")
    cat.sql("ALTER TABLE st RENAME COLUMN amt TO total")
    assert set(cat.sql("SELECT * FROM st").columns) == {"k", "total"}
    cat.sql("ALTER TABLE st ADD CONSTRAINT pos CHECK (total >= 0)")
    with pytest.raises(Exception, match="pos"):
        cat.sql("INSERT INTO st SELECT id AS k, CAST(-1 AS BIGINT) AS total "
                "FROM range(1)")
    cat.sql("ALTER TABLE st DROP CONSTRAINT pos")
    cat.sql("INSERT INTO st SELECT id AS k, CAST(-1 AS BIGINT) AS total "
            "FROM range(90, 91)")
    cat.sql("ALTER TABLE st DROP COLUMN total")
    assert cat.sql("SELECT * FROM st").columns == ["k"]
    with pytest.raises(ValueError, match="Delta-protocol"):
        cat.sql("ALTER TABLE st ALTER COLUMN k TYPE decimal(30,0)")
    with pytest.raises(ValueError, match="Delta-protocol"):
        cat.sql("ALTER TABLE st SET TBLPROPERTIES ('a' = 'b')")

    # delta: widening + properties + constraint through the same grammar
    delta_write(
        spark,
        spark.range(4).selectExpr(
            "CAST(id AS INT) AS k", "id AS amt"
        ).coalesce(1),
        os.path.join(cat.root, "dt"), checkpoint_interval=None,
    )
    cat.sql("ALTER TABLE dt ALTER COLUMN k TYPE bigint")
    d = DeltaLogTable(spark, os.path.join(cat.root, "dt"))
    assert d.read().schema["k"].dataType.simpleString() == "bigint"
    cat.sql(
        "ALTER TABLE dt SET TBLPROPERTIES "
        "('delta.enableInCommitTimestamps' = 'true', 'custom.tag' = 'x')"
    )
    snap = d.snapshot()
    assert snap.configuration["custom.tag"] == "x"
    assert snap.configuration["delta.enableInCommitTimestamps"] == "true"
    # the enablement commit itself carries the marker properties + ICT
    import json as _json

    with open(os.path.join(
        cat.root, "dt", "_delta_log", f"{snap.version:020d}.json"
    )) as fh:
        first = _json.loads(fh.readline())
    assert "inCommitTimestamp" in first["commitInfo"]
    cat.sql("ALTER TABLE dt UNSET TBLPROPERTIES ('custom.tag')")
    assert "custom.tag" not in DeltaLogTable(
        spark, os.path.join(cat.root, "dt")
    ).snapshot().configuration
    cat.sql("ALTER TABLE dt ADD CONSTRAINT amt_pos CHECK (amt >= 0)")
    with pytest.raises(Exception, match="amt_pos"):
        cat.sql("INSERT INTO dt SELECT CAST(9 AS BIGINT) AS k, "
                "CAST(-5 AS BIGINT) AS amt FROM range(1)")
    cat.sql("ALTER TABLE dt DROP CONSTRAINT amt_pos")
    # rename needs column mapping (delta-spark's own precondition)
    with pytest.raises(Exception, match="column mapping"):
        cat.sql("ALTER TABLE dt RENAME COLUMN amt TO total")
    from dc43_spark.io.delta_log import delta_enable_column_mapping

    delta_enable_column_mapping(spark, os.path.join(cat.root, "dt"))
    cat.sql("ALTER TABLE dt RENAME COLUMN amt TO total")
    assert set(d.read().columns) >= {"k", "total"}
    with pytest.raises(ValueError, match="unsupported ALTER"):
        cat.sql("ALTER TABLE dt CLUSTER BY (k)")


def test_sql_add_column(spark, tmp_path):
    """r11: ALTER TABLE ADD COLUMN through catalog.sql — a metadata-only
    commit on Delta (old files null-fill); feature-demanding types
    (variant/ntz) pull their protocol features in the same commit;
    snaplog points at merge_schema appends."""
    import json as _json
    import os

    from dc43_spark.io.catalog import SnaplogCatalog
    from dc43_spark.io.delta_log import DeltaLogTable, delta_write

    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    delta_write(
        spark, spark.range(3).selectExpr("id AS k").coalesce(1),
        os.path.join(cat.root, "dt"), checkpoint_interval=None,
    )
    cat.sql("ALTER TABLE dt ADD COLUMN note string")
    d = DeltaLogTable(spark, os.path.join(cat.root, "dt"))
    assert [r.note for r in d.read().collect()] == [None, None, None]
    cat.sql("ALTER TABLE dt ADD COLUMN payload variant")
    snap = DeltaLogTable(spark, os.path.join(cat.root, "dt")).snapshot()
    assert snap.schema["payload"].dataType.simpleString() == "variant"
    log = os.path.join(cat.root, "dt", "_delta_log")
    protocols = []
    for n in sorted(os.listdir(log)):
        if n.endswith(".json") and not n.startswith("_"):
            with open(os.path.join(log, n)) as fh:
                for line in fh:
                    a = _json.loads(line)
                    if "protocol" in a:
                        protocols.append(a["protocol"])
    assert "variantType" in protocols[-1]["readerFeatures"]

    cat.sql("CREATE TABLE st AS SELECT id AS k FROM range(3)")
    with pytest.raises(ValueError, match="merge_schema"):
        cat.sql("ALTER TABLE st ADD COLUMN note string")


def test_sql_add_column_parenthesized_and_decimal(spark, tmp_path):
    """Finding-class: the parenthesized ADD COLUMNS spelling and types
    carrying their own parens must both parse."""
    import os

    from dc43_spark.io.catalog import SnaplogCatalog
    from dc43_spark.io.delta_log import DeltaLogTable, delta_write

    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    delta_write(
        spark, spark.range(2).selectExpr("id AS k").coalesce(1),
        os.path.join(cat.root, "dt"), checkpoint_interval=None,
    )
    cat.sql("ALTER TABLE dt ADD COLUMNS (note string)")
    cat.sql("ALTER TABLE dt ADD COLUMN price decimal(10,2)")
    cat.sql("ALTER TABLE dt ADD COLUMNS (tags array<string>)")
    snap = DeltaLogTable(spark, os.path.join(cat.root, "dt")).snapshot()
    types = {f.name: f.dataType.simpleString() for f in snap.schema.fields}
    assert types["note"] == "string"
    assert types["price"] == "decimal(10,2)"
    assert types["tags"] == "array<string>"


def test_sql_merge_multi_clause_first_match_wins(spark, tmp_path):
    """r12 (VERDICT r11 #2): the grammar accepts ANY number of clauses
    per kind and the engines evaluate them first-match-wins in statement
    order — two matched updates, two conditional inserts, and a
    by-source delete+update pair in ONE statement."""
    from dc43_spark.io.catalog import SnaplogCatalog

    cat = SnaplogCatalog(spark, str(tmp_path / "wh"))
    # target k 0..5 (v = k*10); source k 4..9 (v = k*100)
    cat.sql("CREATE TABLE tgt AS SELECT id AS k, id * 10 AS v FROM range(6)")
    cat.sql("CREATE TABLE src AS SELECT id AS k, id * 100 AS v "
            "FROM range(4, 10)")
    cat.sql(
        "MERGE INTO tgt t USING src s ON t.k = s.k "
        # matched: k=4 hits the first clause, k=5 falls to the second
        "WHEN MATCHED AND s.k = 4 THEN UPDATE SET v = s.v + 1 "
        "WHEN MATCHED THEN UPDATE SET v = -1 "
        # inserts: k=6 hits the VALUES clause, 7..9 fall to INSERT *
        "WHEN NOT MATCHED AND s.k = 6 THEN INSERT (k, v) VALUES (s.k, 0) "
        "WHEN NOT MATCHED THEN INSERT * "
        # by source: k<2 deletes, the rest (k=2,3) update
        "WHEN NOT MATCHED BY SOURCE AND t.k < 2 THEN DELETE "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = t.v + 5"
    )
    got = {(r.k, r.v) for r in cat.sql("SELECT * FROM tgt").collect()}
    assert got == {
        (2, 25), (3, 35),          # by-source second clause
        (4, 401), (5, -1),         # matched first-match-wins
        (6, 0),                    # conditional VALUES insert
        (7, 700), (8, 800), (9, 900),  # insertAll fallback
    }
