"""Generated columns (Delta's GENERATED ALWAYS AS) on snaplog: writes
compute the column when absent and validate it when provided; the rule
map is versioned metadata (time travel / restore / clone / publish see
it); rename/drop refuse columns a generation rule depends on."""

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.snaplog import SnaplogTable, SnapshotConflictError


def _df(spark, rows, schema="k long, amount double"):
    return spark.createDataFrame(rows, schema).coalesce(1)


def test_compute_when_absent_validate_when_provided(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, 10.0)]), mode="overwrite")
    t.set_generated_column("cents", "CAST(amount * 100 AS BIGINT)")

    # absent -> computed (schema evolves on this append)
    t.write(_df(spark, [(2, 2.5)]), mode="append", merge_schema=True)
    got = {r.k: r.cents for r in t.read().collect()}
    assert got[2] == 250
    assert got[1] is None  # pre-rule rows are untouched history

    # provided and correct -> accepted
    t.write(
        _df(spark, [(3, 1.25, 125)], "k long, amount double, cents bigint"),
        mode="append",
    )
    # provided and WRONG -> the write fails, nothing lands
    with pytest.raises(ValueError, match="generated column"):
        t.write(
            _df(spark, [(4, 1.0, 999)], "k long, amount double, cents bigint"),
            mode="append",
        )
    assert {r.k for r in t.read().collect()} == {1, 2, 3}
    # null-safe: NULL amount generates NULL cents, provided NULL passes
    t.write(
        _df(spark, [(5, None, None)], "k long, amount double, cents bigint"),
        mode="append",
    )
    assert {r.k: r.cents for r in t.read().collect()}[5] is None


def test_set_validates_existing_rows_and_guards(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(
        _df(spark, [(1, 2.0, 200), (2, 3.0, 999)],
            "k long, amount double, cents bigint"),
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="1 row"):
        t.set_generated_column("cents", "CAST(amount * 100 AS BIGINT)")
    assert t.generated_columns == {}  # nothing registered

    t.update([("k", "=", 2)], set={"cents": F.lit(300).cast("bigint")})
    t.set_generated_column("cents", "CAST(amount * 100 AS BIGINT)")
    assert t.generated_columns == {"cents": "CAST(amount * 100 AS BIGINT)"}
    with pytest.raises(ValueError, match="already generated"):
        t.set_generated_column("cents", "amount")
    # rename/drop of the source or the generated column refuse
    with pytest.raises(ValueError, match="generated column"):
        t.rename_column("amount", "amt")
    with pytest.raises(ValueError, match="generated column"):
        t.drop_column("cents")
    t.drop_generated_column("cents")
    assert t.generated_columns == {}
    t.rename_column("amount", "amt")  # free again


def test_merge_computes_for_inserts_and_validates(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(
        _df(spark, [(1, 1.0, 100)], "k long, amount double, cents bigint"),
        mode="overwrite",
    )
    t.set_generated_column("cents", "CAST(amount * 100 AS BIGINT)")
    t.merge(_df(spark, [(1, 5.0), (2, 7.0)]), ["k"])  # computed
    got = {r.k: (r.amount, r.cents) for r in t.read().collect()}
    assert got == {1: (5.0, 500), 2: (7.0, 700)}
    with pytest.raises(ValueError, match="generated column"):
        t.merge(
            _df(spark, [(3, 1.0, 42)], "k long, amount double, cents bigint"),
            ["k"],
        )


def test_versioned_metadata_time_travel_restore_clone(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"), checkpoint_interval=3)
    t.write(_df(spark, [(1, 1.0)]), mode="overwrite")       # v0
    t.set_generated_column("cents", "CAST(amount * 100 AS BIGINT)")  # v1
    for i in range(2, 6):  # cross a checkpoint
        t.write(_df(spark, [(i, float(i))]), mode="append", merge_schema=True)
    assert t.snapshot(0).generated == {}
    assert SnaplogTable(spark, str(tmp_path / "t")).generated_columns != {}
    assert t.describe_detail()["generated_columns"] == {
        "cents": "CAST(amount * 100 AS BIGINT)"
    }
    # restore to v0 rolls the rule back wholesale
    t.restore(version_as_of=0)
    assert t.generated_columns == {}
    # clone carries the rule
    t.set_generated_column("c2", "k * 2")
    c = t.clone(str(tmp_path / "c"))
    assert c.generated_columns == {"c2": "k * 2"}
    c.write(_df(spark, [(9, 9.0)]), mode="append", merge_schema=True)
    assert {r.k: r.c2 for r in c.read().collect()}[9] == 18


def test_concurrent_rule_change_aborts_in_flight_append(spark, tmp_path):
    """An append computed under the OLD rule set must not land after a
    concurrent set_generated_column (it would silently carry stale or
    missing values)."""
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, 1.0)]), mode="overwrite")

    orig = t._stage_files
    def race(df, **kw):
        staged = orig(df, **kw)
        if not hasattr(race, "fired"):
            race.fired = True
            SnaplogTable(t.spark, t.path).set_generated_column(
                "cents", "CAST(amount * 100 AS BIGINT)"
            )
        return staged

    t._stage_files = race
    with pytest.raises(SnapshotConflictError, match="generated columns"):
        t.write(_df(spark, [(2, 2.0)]), mode="append")


def test_generated_partition_column_prunes(spark, tmp_path):
    """Delta's partition-by-derived-column: generate the day from a
    timestamp, partition by it, filter on it — exact pruning."""
    import datetime

    t = SnaplogTable(spark, str(tmp_path / "t"))
    rows = [
        (datetime.datetime(2026, 3, d, 12), d * 1.0) for d in (1, 1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, amount double")
    df = df.withColumn("day", F.to_date("ts"))
    t.write(df.repartition("day"), mode="overwrite", partition_by=["day"])
    t.set_generated_column("day", "to_date(ts)")
    # absent day on the next append: computed, landing in the right dir
    t.write(
        spark.createDataFrame(
            [(datetime.datetime(2026, 3, 2, 9), 9.0)], "ts timestamp, amount double"
        ).coalesce(1),
        mode="append",
    )
    # date stats serialize as ISO strings in the manifest; the string
    # literal prunes exactly and Spark's residual filter casts it back
    pruned = t.read(filters=[("day", "=", "2026-03-02")])
    assert pruned.count() == 2
    assert len(pruned.inputFiles()) == 2  # only day=2's two files
    assert t.snapshot().num_files > 2

def test_update_recomputes_generated_and_refuses_direct_set(spark, tmp_path):
    """Delta's UPDATE rule: setting a source column recomputes dependent
    generated columns from the post-update row; setting the generated
    column directly is refused."""
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(
        _df(spark, [(1, 2.0, 200), (2, 3.0, 300)],
            "k long, amount double, cents bigint"),
        mode="overwrite",
    )
    t.set_generated_column("cents", "CAST(amount * 100 AS BIGINT)")
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS"):
        t.update([("k", "=", 1)], set={"cents": F.lit(999)})
    t.update([("k", "=", 1)], set={"amount": F.lit(9.0)})
    got = {r.k: (r.amount, r.cents) for r in t.read().collect()}
    assert got == {1: (9.0, 900), 2: (3.0, 300)}


def test_write_txn_computes_and_validates_generated(spark, tmp_path):
    """The exactly-once sink path enforces generated columns too — a
    streaming writer cannot bypass the invariant."""
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(
        _df(spark, [(1, 1.0, 100)], "k long, amount double, cents bigint"),
        mode="overwrite",
    )
    t.set_generated_column("cents", "CAST(amount * 100 AS BIGINT)")
    t.write_txn(_df(spark, [(2, 2.5)], "k long, amount double"),
                app_id="s", version=0)
    assert {r.k: r.cents for r in t.read().collect()}[2] == 250
    with pytest.raises(ValueError, match="generated column"):
        t.write_txn(
            _df(spark, [(3, 1.0, 999)], "k long, amount double, cents bigint"),
            app_id="s", version=1,
        )


def test_multi_clause_merge_recomputes_generated_per_fate(spark, tmp_path):
    """r12: under multi-clause merges, generated columns recompute from
    each row's FINAL values — whichever SET clause won — and SET maps
    still refuse to touch a generated column directly."""
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(
        _df(spark, [(1, 10.0, 1000), (2, 20.0, 2000), (3, 30.0, 3000)],
            "k long, amount double, cents bigint"),
        mode="overwrite",
    )
    t.set_generated_column("cents", "CAST(amount * 100 AS BIGINT)")

    src = _df(spark, [(1, 5.0), (2, 7.0), (9, 9.0)])
    t.merge(
        src, ["k"],
        matched_clauses=[
            {"action": "update", "condition": "s.amount < 6",
             "set": {"amount": "s.amount + 0.5"}},
            {"action": "update", "set": {"amount": "s.amount"}},
        ],
        not_matched_clauses=[{"action": "insert"}],
    )
    got = {r.k: (r.amount, r.cents) for r in t.read().collect()}
    assert got[1] == (5.5, 550)    # first clause won; cents recomputed
    assert got[2] == (7.0, 700)    # fallback clause; cents recomputed
    assert got[3] == (30.0, 3000)  # untouched
    assert got[9] == (9.0, 900)    # insertAll computed the column

    with pytest.raises(ValueError, match="generated"):
        t.merge(
            src, ["k"],
            matched_clauses=[
                {"action": "update", "set": {"cents": "0"}},
            ],
            not_matched_clauses=[],
        )
