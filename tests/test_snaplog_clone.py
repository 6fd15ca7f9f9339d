"""Snaplog CLONE (Delta's CLONE TABLE): shallow = metadata-only
zero-copy references to the source's files; deep = self-contained copy.
Either way the clone is an independent table from v0 — writes, deletes,
compaction and vacuum on one side never disturb the other.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.snaplog import SnaplogTable


def _df(spark, lo, hi, val="x"):
    return spark.range(lo, hi).select(
        F.col("id").cast("long"), F.lit(val).alias("v")
    ).repartition(1)


def ids(t, **kw):
    return sorted(r["id"] for r in t.read(**kw).collect())


def test_shallow_clone_zero_copy_reads(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"))
    src.write(_df(spark, 0, 10))
    src.write(_df(spark, 10, 20))
    c = src.clone(str(tmp_path / "c"))
    assert ids(c) == list(range(20))
    # zero copy: the clone's data dir holds NOTHING
    assert not os.path.isdir(os.path.join(c.path, "data")) or not os.listdir(
        os.path.join(c.path, "data")
    )
    # and reads resolve to the SOURCE's files
    assert all(f.startswith("file:" + src.path) or src.path in f for f in c.read().inputFiles())
    # history does not carry over: clone starts at v0
    assert c.version() == 0
    assert [h.operation for h in c.history()] == ["clone"]


def test_clone_divergence_is_isolated(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"))
    src.write(_df(spark, 0, 10))
    c = src.clone(str(tmp_path / "c"))
    c.delete([("id", "<", 5)])
    c.write(_df(spark, 100, 103))
    src.write(_df(spark, 50, 52))
    assert ids(c) == [*range(5, 10), 100, 101, 102]
    assert ids(src) == [*range(10), 50, 51]
    # the clone's rewrite landed in its OWN data dir; source files intact
    assert os.listdir(os.path.join(c.path, "data"))


def test_clone_as_of_version(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"))
    src.write(_df(spark, 0, 5))
    v0 = src.version()
    src.write(_df(spark, 5, 10))
    c = src.clone(str(tmp_path / "c"), version_as_of=v0)
    assert ids(c) == list(range(5))


def test_clone_carries_dvs_and_constraints(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"))
    src.write(_df(spark, 0, 10))
    src.add_check_constraint("v_set", "v IS NOT NULL")
    src.delete([("id", "<", 3)], strategy="merge_on_read")
    c = src.clone(str(tmp_path / "c"))
    assert ids(c) == list(range(3, 10))  # DV subtraction active on the clone
    assert c.check_constraints == {"v_set": "v IS NOT NULL"}
    from dc43_spark.io.snaplog import ConstraintViolationError

    with pytest.raises(ConstraintViolationError):
        c.write(
            spark.createDataFrame([(99, None)], "id long, v string")
        )


def test_clone_vacuum_isolation(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"))
    src.write(_df(spark, 0, 10))
    c = src.clone(str(tmp_path / "c"))
    c.write(_df(spark, 10, 15))
    c.compact(target_file_mb=64)
    c.vacuum(keep_versions=1)  # sweeps ONLY the clone's own dirs
    assert ids(src) == list(range(10))  # source files untouched
    assert ids(c) == list(range(15))


def test_deep_clone_is_self_contained(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"))
    src.write(_df(spark, 0, 10))
    src.delete([("id", ">=", 8)], strategy="merge_on_read")
    c = src.clone(str(tmp_path / "c"), shallow=False)
    assert ids(c) == list(range(8))
    shutil.rmtree(src.path)  # source gone entirely
    assert ids(c) == list(range(8))  # deep clone unaffected


def test_deep_clone_partitioned(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"))
    df = spark.range(20).select(
        F.col("id").cast("long"),
        (F.col("id") % 2).cast("long").alias("p"),
    )
    src.write(df, partition_by=["p"])
    with pytest.raises(ValueError, match="shallow clone"):
        src.clone(str(tmp_path / "c0"))
    c = src.clone(str(tmp_path / "c"), shallow=False)
    assert c.snapshot().partition_by == ("p",)
    got = c.read(filters=[("p", "=", 1)])
    assert sorted(r["id"] for r in got.collect()) == list(range(1, 20, 2))


def test_deep_clone_keeps_bloom_index(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"), bloom_columns=["id"])
    big = spark.range(4000).select(
        F.col("id").cast("long"), F.md5(F.col("id").cast("string")).alias("v")
    ).repartition(4, F.col("id") % 4)  # interleaved: stats can't prune
    src.write(big)
    c = src.clone(str(tmp_path / "c"), shallow=False)
    # property carried: the clone knows its bloom columns
    assert c.bloom_columns == ("id",)
    looked = c.read(filters=[("id", "=", 2001)])
    assert [r["id"] for r in looked.collect()] == [2001]
    assert len(looked.inputFiles()) == 1  # sidecars survived the copy


def test_shallow_clone_of_shallow_clone_and_deepen(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"))
    src.write(_df(spark, 0, 6))
    c1 = src.clone(str(tmp_path / "c1"))
    c2 = c1.clone(str(tmp_path / "c2"))  # abs paths stay abs
    assert ids(c2) == list(range(6))
    deep = c2.clone(str(tmp_path / "deep"), shallow=False)
    shutil.rmtree(src.path)
    assert ids(deep) == list(range(6))


def test_clone_refuses_existing_destination(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"))
    src.write(_df(spark, 0, 3))
    src.clone(str(tmp_path / "c"))
    with pytest.raises(ValueError, match="already exists"):
        src.clone(str(tmp_path / "c"))


def test_clone_change_feed_property_carries(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"), change_feed=True)
    src.write(_df(spark, 0, 4))
    c = src.clone(str(tmp_path / "c"))
    assert c.change_feed
    off = c.version()
    c.write(_df(spark, 4, 6))
    changes, _ = c.changes_since(off)
    assert changes.count() == 2  # the feed is live on the clone
