"""Write-audit-publish branches (Iceberg's WAP pattern on snaplog):
branch_out = shallow clone + provenance, publish = one atomic
fast-forward commit adopting branch files by hard link."""

import os

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.snaplog import SnaplogTable, SnapshotConflictError


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string").coalesce(1)


def test_full_wap_loop(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"))
    src.write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), mode="overwrite")

    branch = src.branch_out(str(tmp_path / "staging"))
    branch.write(_df(spark, [(4, "d")]), mode="append")          # write
    branch.merge(_df(spark, [(2, "B2")]), ["k"])
    audit = {r.k: r.v for r in branch.read().collect()}          # audit
    assert audit == {1: "a", 2: "B2", 3: "c", 4: "d"}
    # the source never saw any of it
    assert {r.k: r.v for r in src.read().collect()} == {1: "a", 2: "b", 3: "c"}

    v = src.publish(branch)                                      # publish
    assert {r.k: r.v for r in src.read().collect()} == audit
    assert src.history()[-1].operation == "publish"
    assert src.read(version_as_of=v - 1).count() == 3  # history intact
    # adopted files are hard links into the source data dir (zero copy)
    adopted = [
        f for f in src.snapshot().files
        if os.stat(os.path.join(src.path, f.path)).st_nlink >= 2
    ]
    assert adopted  # at least the branch-written files


def test_publish_is_fast_forward_only(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"))
    src.write(_df(spark, [(1, "a")]), mode="overwrite")
    branch = src.branch_out(str(tmp_path / "b"))
    branch.write(_df(spark, [(2, "b")]), mode="append")
    src.write(_df(spark, [(9, "z")]), mode="append")  # source advanced
    before = {(r.k, r.v) for r in src.read().collect()}
    with pytest.raises(SnapshotConflictError):
        src.publish(branch)
    assert {(r.k, r.v) for r in src.read().collect()} == before


def test_publish_guards(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"))
    src.write(_df(spark, [(1, "a")]), mode="overwrite")
    other = SnaplogTable(spark, str(tmp_path / "other"))
    other.write(_df(spark, [(5, "e")]), mode="overwrite")

    plain_clone = src.clone(str(tmp_path / "c"))
    with pytest.raises(ValueError, match="not a branch"):
        src.publish(plain_clone)

    foreign = other.branch_out(str(tmp_path / "fb"))
    with pytest.raises(ValueError, match="forked from"):
        src.publish(foreign)

    # no branch commits: no-op, no new source version
    idle = src.branch_out(str(tmp_path / "idle"))
    assert src.publish(idle) == src.version()

    # active deletion vectors must be materialized before publishing
    b = src.branch_out(str(tmp_path / "dv"))
    b.write(_df(spark, [(2, "b"), (3, "c")]), mode="append")
    b.delete([("k", "=", 2)], strategy="merge_on_read")
    with pytest.raises(ValueError, match="deletion vectors"):
        src.publish(b)
    b.materialize_deletes()
    src.publish(b)
    assert {r.k for r in src.read().collect()} == {1, 3}

    # a branch publishes at most once
    with pytest.raises(ValueError, match="already published"):
        src.publish(b)


def test_publish_feeds_the_change_feed_and_views(spark, tmp_path):
    """A publish derives coarse delete+insert events (overwrite-like), so
    CDC consumers — here an IVM view — stay exact across it."""
    from dc43_spark.io.ivm import refresh_sum_view, sum_view_select

    src = SnaplogTable(spark, str(tmp_path / "src"), change_feed=True)
    view = SnaplogTable(spark, str(tmp_path / "view"))
    src.write(_df(spark, [(1, "a"), (2, "a"), (3, "b")]), mode="overwrite")
    refresh_sum_view(view, src, keys=["v"], sums={"s": "k"})

    branch = src.branch_out(str(tmp_path / "b"))
    branch.merge(_df(spark, [(2, "b")]), ["k"])   # moves k=2 from a to b
    branch.write(_df(spark, [(10, "a")]), mode="append")
    src.publish(branch)
    refresh_sum_view(view, src, keys=["v"], sums={"s": "k"})

    got = {(r.v,): (r.s, r.n_rows) for r in sum_view_select(view, ["s"]).collect()}
    want = {
        (r.v,): (r.s, r.n)
        for r in src.read()
        .groupBy("v")
        .agg(F.sum("k").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_schema_evolution_on_branch_carries_over(spark, tmp_path):
    src = SnaplogTable(spark, str(tmp_path / "src"))
    src.write(_df(spark, [(1, "a")]), mode="overwrite")
    branch = src.branch_out(str(tmp_path / "b"))
    evolved = spark.createDataFrame([(2, "b", 7.5)], "k long, v string, w double")
    branch.write(evolved.coalesce(1), mode="append", merge_schema=True)
    src.publish(branch)
    got = {(r.k, r.v, r.w) for r in src.read().collect()}
    assert got == {(1, "a", None), (2, "b", 7.5)}


def test_publish_on_a_shallow_clone_source(spark, tmp_path):
    """A branch of a SHALLOW CLONE references origin-absolute files; a
    branch merge that rewrites one must publish back into the clone
    (remove-by-verbatim-path), leaving the ORIGIN untouched."""
    origin = SnaplogTable(spark, str(tmp_path / "origin"))
    origin.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    clone = origin.clone(str(tmp_path / "clone"))

    branch = clone.branch_out(str(tmp_path / "b"))
    branch.merge(_df(spark, [(1, "patched")]), ["k"])
    clone.publish(branch)
    assert {r.k: r.v for r in clone.read().collect()} == {1: "patched", 2: "b"}
    assert {r.k: r.v for r in origin.read().collect()} == {1: "a", 2: "b"}
