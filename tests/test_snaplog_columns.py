"""RENAME COLUMN / DROP COLUMN via column mapping (Delta's
columnMapping mode=name): metadata-only commits, zero files rewritten.
Physical (in-file) names are frozen at first write; logical names live
in versioned metadata, so time travel and RESTORE see each version's
own names and every write path translates at the boundary.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.snaplog import SnaplogTable, SnapshotConflictError


def _df(spark, rows, schema="id long, v long"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def table(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, 10), (2, 20), (3, 30)]))
    return t


def _data_files(t):
    return sorted(os.listdir(os.path.join(t.path, "data")))


def test_rename_is_metadata_only(spark, table):
    before = _data_files(table)
    table.rename_column("v", "amount")
    assert _data_files(table) == before  # zero files rewritten
    got = {r["id"]: r["amount"] for r in table.read().collect()}
    assert got == {1: 10, 2: 20, 3: 30}
    assert table.read().columns == ["id", "amount"]


def test_rename_roundtrip_appends_and_reads(spark, table):
    table.rename_column("v", "amount")
    table.write(_df(spark, [(4, 40)], "id long, amount long"))
    # old column name is gone from the write surface
    with pytest.raises(ValueError, match="schema mismatch"):
        table.write(_df(spark, [(5, 50)]))
    got = {r["id"]: r["amount"] for r in table.read().collect()}
    assert got == {1: 10, 2: 20, 3: 30, 4: 40}
    # filters prune under the NEW name (stats stay keyed physically)
    sel = table.read(filters=[("amount", "=", 40)])
    assert [r["id"] for r in sel.collect()] == [4]
    # rename back: mapping collapses to identity
    table.rename_column("amount", "v")
    assert table.snapshot().column_mapping == {}
    assert {r["id"]: r["v"] for r in table.read().collect()} == {
        1: 10, 2: 20, 3: 30, 4: 40,
    }


def test_rename_pruning_opens_one_file(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(spark.range(0, 50).select(F.col("id"), F.col("id").alias("k")).coalesce(1))
    t.write(spark.range(50, 100).select(F.col("id"), F.col("id").alias("k")).coalesce(1))
    t.rename_column("k", "key")
    sel = t.read(filters=[("key", "<", 10)])
    assert len(sel.inputFiles()) == 1  # stats pruning through the mapping
    assert sel.count() == 10


def test_merge_update_delete_after_rename(spark, table):
    table.rename_column("v", "amount")
    table.merge(_df(spark, [(1, 100), (9, 90)], "id long, amount long"), ["id"])
    table.update([("id", "=", 2)], {"amount": F.lit(200)})
    table.delete([("id", "=", 3)])
    got = {r["id"]: r["amount"] for r in table.read().collect()}
    assert got == {1: 100, 2: 200, 9: 90}


def test_rename_time_travel_and_restore(spark, table):
    v0 = table.version()
    table.rename_column("v", "amount")
    # the old version still answers under its OLD name
    old = table.read(version_as_of=v0)
    assert old.columns == ["id", "v"]
    assert {r["id"]: r["v"] for r in old.collect()} == {1: 10, 2: 20, 3: 30}
    table.restore(version_as_of=v0)
    assert table.read().columns == ["id", "v"]
    assert table.snapshot().column_mapping == {}


def test_drop_column_free_and_retired(spark, table):
    before = _data_files(table)
    table.drop_column("v")
    assert _data_files(table) == before
    assert table.read().columns == ["id"]
    # re-adding the retired physical slot is refused (old files would
    # resurrect their dropped values under by-name resolution)
    with pytest.raises(ValueError, match="retired"):
        table.write(_df(spark, [(9, 9)]), merge_schema=True)
    # a DIFFERENT name is fine
    table.write(
        spark.createDataFrame([(9, 9.5)], "id long, w double"), merge_schema=True
    )
    got = {r["id"]: r["w"] for r in table.read().collect()}
    assert got[9] == 9.5 and got[1] is None


def test_drop_then_rename_onto_retired_refused(spark, table):
    table.write(_df(spark, [(4, 4)]).withColumn("w", F.lit(7)), merge_schema=True)
    table.drop_column("v")
    with pytest.raises(ValueError, match="retired"):
        table.rename_column("w", "v")


def test_guards(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 2).alias("p"), F.lit(1).alias("v")
    )
    t.write(df, partition_by=["p"])
    with pytest.raises(ValueError, match="partition"):
        t.rename_column("p", "bucket")
    with pytest.raises(ValueError, match="partition"):
        t.drop_column("p")
    t.add_check_constraint("v_pos", "v > 0")
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("v", "val")
    with pytest.raises(ValueError, match="constraint"):
        t.drop_column("v")
    t.drop_check_constraint("v_pos")
    t.rename_column("v", "val")  # now fine
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("val", "id")
    with pytest.raises(ValueError, match="identifier"):
        t.rename_column("val", "bad name")


def test_bloom_column_rename_refused(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"), bloom_columns=["id"])
    t.write(_df(spark, [(1, 1)]))
    with pytest.raises(ValueError, match="bloom"):
        t.rename_column("id", "key")


def test_cdf_serves_head_names_across_rename(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"), change_feed=True)
    t.write(_df(spark, [(1, 10)]))
    t.rename_column("v", "amount")
    t.merge(_df(spark, [(1, 11)], "id long, amount long"), ["id"])
    ch = t.table_changes(0)
    assert "amount" in ch.columns and "v" not in ch.columns
    rows = {(r["_change_type"], r["id"], r["amount"]) for r in ch.collect()}
    assert ("insert", 1, 10) in rows  # pre-rename commit, head names
    assert ("update_postimage", 1, 11) in rows


def test_source_reads_through_mapping(spark, tmp_path):
    from dc43_spark.io.snaplog_source import SnaplogDataSource

    spark.dataSource.register(SnaplogDataSource)
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(spark.range(0, 50).select(F.col("id"), F.col("id").alias("k")).coalesce(1))
    t.write(spark.range(50, 100).select(F.col("id"), F.col("id").alias("k")).coalesce(1))
    t.rename_column("k", "key")
    df = spark.read.format("snaplog").load(t.path)
    assert df.columns == ["id", "key"]
    assert df.count() == 100
    sel = df.filter(F.col("key") == 7)
    assert [r["id"] for r in sel.collect()] == [7]


def test_concurrent_rename_conflicts_pinned_op(spark, tmp_path, monkeypatch):
    from tests.test_snaplog_concurrency import inject_before_next_commit

    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(i, i) for i in range(10)]))
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch, lambda: other.rename_column("v", "amount")
    )
    with pytest.raises(SnapshotConflictError):
        t.delete([("id", "<", 3)])


def test_clone_carries_mapping(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, 10)]))
    t.rename_column("v", "amount")
    c = t.clone(str(tmp_path / "c"))
    assert c.read().columns == ["id", "amount"]
    assert {r["amount"] for r in c.read().collect()} == {10}


def test_mapping_survives_checkpoint(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "cp"), checkpoint_interval=2)
    t.write(_df(spark, [(1, 1)]))
    t.rename_column("v", "amount")
    for i in range(2, 6):
        t.write(_df(spark, [(i, i)], "id long, amount long"))
    fresh = SnaplogTable(spark, t.path, checkpoint_interval=2)
    assert fresh.read().columns == ["id", "amount"]
    assert fresh.read().count() == 5
    # old physical files and new (post-rename) files both resolve:
    # post-rename appends stage under the frozen PHYSICAL name
    got = {r["id"]: r["amount"] for r in fresh.read().collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 4, 5: 5}
