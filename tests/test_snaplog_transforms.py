"""Hidden partitioning (Iceberg's partition transforms): days/months/
years/hours(col), bucket(n, col), truncate(w, col). Queries filter on
the SOURCE column; pruning translates to the derived partition values
automatically — the fix for Hive's "forgot the partition predicate"
full-scan failure mode.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.snaplog import (
    SnaplogTable,
    augment_groups_for_partitions,
    parse_partition_spec,
    transform_literal,
)


def _events(spark, n=120):
    # 4 days of hourly events, ~30 per day
    return spark.createDataFrame(
        [
            (
                i,
                datetime.datetime(2024, 3, 1 + i // 30, (i % 30) % 24, 5),
                f"u{i % 7}",
            )
            for i in range(n)
        ],
        "id long, ts timestamp, user string",
    )


def test_parse_spec():
    fields = parse_partition_spec(["days(ts)", "bucket(8, user)", "p", "truncate(4, s)"])
    assert [(f.kind, f.source, f.name) for f in fields] == [
        ("days", "ts", "_pt_days_ts"),
        ("bucket", "user", "_pt_bucket8_user"),
        ("identity", "p", "p"),
        ("truncate", "s", "_pt_trunc4_s"),
    ]
    with pytest.raises(ValueError, match="unsupported"):
        parse_partition_spec(["upper(ts)"])
    with pytest.raises(ValueError, match="positive"):
        parse_partition_spec(["bucket(0, x)"])


def test_days_layout_and_source_filter_prunes(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_events(spark), partition_by=["days(ts)"])
    # hive layout under the HIDDEN column name
    days = sorted(os.listdir(os.path.join(t.path, "data")))
    assert all(d.startswith("_pt_days_ts=") for d in days)
    assert len(days) == 4
    # the hidden column never leaks into reads
    assert t.read().columns == ["id", "ts", "user"]
    assert t.read().count() == 120
    # a filter on the SOURCE column opens only the matching day's files
    sel = t.read(
        filters=[("ts", ">=", datetime.datetime(2024, 3, 3, 0, 0))]
    )
    assert sel.count() == 60
    opened = {p.split("_pt_days_ts=")[1].split("/")[0] for p in sel.inputFiles()}
    assert opened == {str((datetime.date(2024, 3, 3) - datetime.date(1970, 1, 1)).days),
                      str((datetime.date(2024, 3, 4) - datetime.date(1970, 1, 1)).days)}
    # equality on a single day opens one partition
    one = t.read(filters=[("ts", "=", datetime.datetime(2024, 3, 2, 1, 5))])
    opened = {p.split("_pt_days_ts=")[1].split("/")[0] for p in one.inputFiles()}
    assert len(opened) == 1


def test_bucket_pruning_matches_spark_hash(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_events(spark), partition_by=["bucket(4, user)"])
    buckets = sorted(os.listdir(os.path.join(t.path, "data")))
    assert all(b.startswith("_pt_bucket4_user=") for b in buckets)
    sel = t.read(filters=[("user", "=", "u3")])
    assert sel.count() == _events(spark).filter(F.col("user") == "u3").count()
    opened = {p.split("_pt_bucket4_user=")[1].split("/")[0] for p in sel.inputFiles()}
    assert len(opened) == 1  # exactly the bucket u3 hashes into
    # driver-side literal transform == Spark's pmod(xxhash64(user), 4)
    f = parse_partition_spec(["bucket(4, user)"])[0]
    want = (
        _events(spark)
        .select(F.pmod(F.xxhash64(F.col("user")), F.lit(4)).alias("b"))
        .filter(F.col("user").isNull() | True)  # keep plan simple
        .limit(0)
    )
    got = transform_literal(f, "u3")
    spark_b = (
        spark.createDataFrame([("u3",)], "user string")
        .select(F.pmod(F.xxhash64("user"), F.lit(4)).alias("b"))
        .first()["b"]
    )
    assert got == spark_b


def test_truncate_int_and_string(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "ti"))
    df = spark.range(100).select(F.col("id").cast("long"), F.lit("x").alias("v"))
    t.write(df, partition_by=["truncate(25, id)"])
    sel = t.read(filters=[("id", ">=", 80)])
    assert sel.count() == 20
    opened = {p.split("_pt_trunc25_id=")[1].split("/")[0] for p in sel.inputFiles()}
    assert opened == {"75"}
    f = parse_partition_spec(["truncate(3, s)"])[0]
    assert transform_literal(f, "abcdef") == "abc"
    assert transform_literal(f, 7) == 6


def test_merge_prunes_by_transform(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_events(spark), partition_by=["days(ts)"])
    n_before = t.snapshot().num_files
    src = spark.createDataFrame(
        [(5, datetime.datetime(2024, 3, 1, 5, 5), "UPDATED")],
        "id long, ts timestamp, user string",
    )
    stats = t.merge(src, ["ts", "id"])
    # stats-level pruning kept the merge inside one day's partition
    assert stats.candidates_after_stats < n_before
    got = {r["id"]: r["user"] for r in t.read().collect()}
    assert got[5] == "UPDATED" and len(got) == 120
    # partition layout preserved by the rewrite
    assert all(
        d.startswith("_pt_days_ts=")
        for d in os.listdir(os.path.join(t.path, "data"))
    )


def test_delete_and_time_travel(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_events(spark), partition_by=["days(ts)"])
    v0 = t.version()
    stats = t.delete([("ts", "<", datetime.datetime(2024, 3, 2, 0, 0))])
    assert stats.candidates_after_stats < t.snapshot(v0).num_files + 1
    assert t.read().count() == 90
    assert t.read(version_as_of=v0).count() == 120


def test_append_inherits_transform_spec(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_events(spark, 60), partition_by=["days(ts)"])
    more = spark.createDataFrame(
        [(500, datetime.datetime(2024, 3, 9, 1, 0), "u0")],
        "id long, ts timestamp, user string",
    )
    t.write(more)  # append: spec inherited
    assert t.read().count() == 61
    day = (datetime.date(2024, 3, 9) - datetime.date(1970, 1, 1)).days
    assert os.path.isdir(os.path.join(t.path, "data", f"_pt_days_ts={day}"))


def test_rename_of_transform_source_refused(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_events(spark, 30), partition_by=["days(ts)"])
    with pytest.raises(ValueError, match="partition spec"):
        t.rename_column("ts", "event_time")
    with pytest.raises(ValueError, match="partition spec"):
        t.drop_column("ts")
    t.rename_column("user", "u")  # non-source columns stay renameable


def test_source_pushdown_through_transform(spark, tmp_path):
    from dc43_spark.io.snaplog_source import SnaplogDataSource

    spark.dataSource.register(SnaplogDataSource)
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_events(spark), partition_by=["days(ts)"])
    df = spark.read.format("snaplog").load(t.path)
    assert df.columns == ["id", "ts", "user"]
    sel = df.filter(F.col("ts") >= datetime.datetime(2024, 3, 4, 0, 0))
    assert sel.count() == 30


def test_compact_within_transform_partitions(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_events(spark, 60), partition_by=["days(ts)"])
    t.write(
        spark.createDataFrame(
            [(900, datetime.datetime(2024, 3, 1, 9, 0), "u1")],
            "id long, ts timestamp, user string",
        )
    )
    v = t.compact(target_file_mb=64, cluster_by=["id"])
    assert v is not None
    assert t.read().count() == 61
    # layout preserved: every file still lives under a day directory
    for root, _dirs, names in os.walk(os.path.join(t.path, "data")):
        for n in names:
            assert "_pt_days_ts=" in os.path.join(root, n)
    # and source-column pruning still works post-compaction
    sel = t.read(filters=[("ts", "<", datetime.datetime(2024, 3, 2, 0, 0))])
    assert sel.count() == 31


def test_cdf_excludes_hidden_columns(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"), change_feed=True)
    t.write(_events(spark, 30), partition_by=["days(ts)"])
    t.delete([("id", "=", 3)])
    ch = t.table_changes(0)
    assert not any(c.startswith("_pt_") for c in ch.columns)
    assert {r["_change_type"] for r in ch.collect()} == {"insert", "delete"}


def test_augment_groups_pure():
    groups = [[("ts", ">=", datetime.datetime(2024, 3, 3, 12, 0))]]
    out = augment_groups_for_partitions(groups, ("days(ts)",))
    day = (datetime.date(2024, 3, 3) - datetime.date(1970, 1, 1)).days
    assert out == [[("ts", ">=", datetime.datetime(2024, 3, 3, 12, 0)),
                    ("_pt_days_ts", ">=", day)]]
    # untranslatable literals skip, original conditions stay
    out = augment_groups_for_partitions([[("ts", ">=", 123)]], ("days(ts)",))
    assert out == [[("ts", ">=", 123)]]
    # identity specs add nothing
    assert augment_groups_for_partitions(groups, ("p",)) == groups
