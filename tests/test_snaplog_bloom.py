"""Bloom-filter data skipping on snaplog tables (io/bloom.py).

The scenario min/max stats cannot solve: commits append HIGH-CARDINALITY
keys in arrival order, so every file's [min, max] envelope straddles any
probe value — stats pruning keeps everything, blooms cut the scan to the
file(s) actually holding the key. Pins:

- the pure-Python XXH64 probe hash is bit-exact vs Spark's ``xxhash64``
  (longs, strings, the chained (value, 1) second hash) — the contract
  that makes zero-Spark-job probe planning sound,
- ``read(filters=[(k,=,v)])`` opens ~1 file where stats alone open all
  (``inputFiles`` is the observable), and results stay row-exact,
- checkpoints consolidate sidecars, vacuum sweeps dead ones, merges
  rebuild blooms for rewritten files, schema-evolution gaps degrade to
  conservative keeps,
- the registered data source prunes partitions through the same blooms.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dc43_spark.io import bloom as B
from dc43_spark.io.snaplog import BLOOM_DIR, SnaplogTable
from dc43_spark.io.snaplog_source import SnaplogDataSource

MASK = (1 << 64) - 1


def _signed(u: int) -> int:
    return ((u + (1 << 63)) & MASK) - (1 << 63)


# ---------------------------------------------------------------- hashes


def test_xxh64_matches_spark_longs(spark):
    vals = [0, 1, -1, 42, 2**62, -(2**62), (1 << 63) - 1, -(1 << 63), 777]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    assert got == [_signed(B.xxh64_long(v)) for v in vals]


def test_xxh64_matches_spark_strings(spark):
    vals = ["", "a", "abcdefg", "x" * 8, "y" * 31, "z" * 32, "w" * 100, "üñîçødé €"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    assert got == [_signed(B.xxh64(v.encode("utf-8"))) for v in vals]


def test_xxh64_chained_second_hash_matches_spark(spark):
    vals = [3, -9, 123456789]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [
        r[0] for r in df.select(F.xxhash64("v", F.lit(1).cast("long"))).collect()
    ]
    assert got == [_signed(B.xxh64_long(1, B.xxh64_long(v))) for v in vals]


def test_probe_hashes_types():
    assert B.probe_hashes(None) is None
    assert B.probe_hashes(True) is None  # bools are not bloom canon
    assert B.probe_hashes(1.5) is None
    h = B.probe_hashes(7)
    assert h is not None and h[1] & 1 == 1  # odd stride


# ------------------------------------------------------- build and probe


def _interleaved(spark, path, *, files=6, keys_per_file=50, bloom=True, **kw):
    """Each commit holds keys {i, files+i, 2*files+i, ...}: every file's
    min/max straddles every probe, only blooms can discriminate."""
    t = SnaplogTable(
        spark, path, bloom_columns=["k"] if bloom else None, **kw
    )
    for i in range(files):
        ks = [i + files * j for j in range(keys_per_file)]
        df = spark.createDataFrame([(k, f"u-{k}") for k in ks], "k long, name string")
        t.write(df.coalesce(1), mode="append")
    return t


def test_point_lookup_opens_one_file(spark, tmp_path):
    t = _interleaved(spark, str(tmp_path / "b"))
    probe = 2 + 6 * 17  # lives in commit 2's file only
    df = t.read(filters=[("k", "=", probe)])
    assert [r["name"] for r in df.collect()] == [f"u-{probe}"]
    assert len(df.inputFiles()) == 1
    # same data WITHOUT blooms: stats keep every file
    t2 = _interleaved(spark, str(tmp_path / "nb"), bloom=False)
    df2 = t2.read(filters=[("k", "=", probe)])
    assert len(df2.inputFiles()) == 6
    assert [r["name"] for r in df2.collect()] == [f"u-{probe}"]


def test_absent_key_opens_zero_files(spark, tmp_path):
    t = _interleaved(spark, str(tmp_path / "b"))
    df = t.read(filters=[("k", "=", 10_000_019)])
    assert df.count() == 0
    assert len(df.inputFiles()) == 0  # bloom proves absence everywhere


def test_string_bloom_and_in_filter(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "s"), bloom_columns=["name"])
    for i in range(4):
        df = spark.createDataFrame(
            [(i * 100 + j, f"user-{i * 100 + j}") for j in range(100)],
            "k long, name string",
        )
        t.write(df.coalesce(1), mode="append")
    one = t.read(filters=[("name", "=", "user-250")])
    assert len(one.inputFiles()) == 1
    assert [r["k"] for r in one.collect()] == [250]
    # IN spanning two files -> exactly those two
    two = t.read(filters=[("name", "in", ["user-5", "user-305"])])
    assert len(two.inputFiles()) == 2
    assert sorted(r["k"] for r in two.collect()) == [5, 305]


def test_range_filters_bypass_blooms(spark, tmp_path):
    t = _interleaved(spark, str(tmp_path / "b"))
    df = t.read(filters=[("k", ">=", 0)])
    assert df.count() == 300  # blooms never tested, result exact
    # mixed AND group: range passes, equality prunes
    df2 = t.read(filters=[("k", "=", 8), ("k", ">=", 0)])
    assert len(df2.inputFiles()) == 1
    assert df2.count() == 1


def test_or_groups_union_files(spark, tmp_path):
    t = _interleaved(spark, str(tmp_path / "b"))
    # DNF: two OR groups probing different files
    df = t.read(filters=[[("k", "=", 1)], [("k", "=", 2)]])
    assert len(df.inputFiles()) == 2
    assert sorted(r["k"] for r in df.collect()) == [1, 2]


def test_checkpoint_consolidates_sidecars(spark, tmp_path):
    t = _interleaved(
        spark, str(tmp_path / "b"), files=9, checkpoint_interval=4
    )
    snap = t.snapshot()
    # v8 checkpoint consolidated commits 0..8 into one sidecar; only
    # the tail commit(s) past the checkpoint add more
    assert len(snap.bloom) <= 2
    assert any(os.path.basename(p).startswith("cp-") for p in snap.bloom)
    probe = 7 + 9 * 23
    df = t.read(filters=[("k", "=", probe)])
    assert len(df.inputFiles()) == 1
    assert df.count() == 1
    # time travel before the checkpoint still probes (old sidecars live)
    old = t.read(version_as_of=2, filters=[("k", "=", 1)])
    assert len(old.inputFiles()) == 1


def test_vacuum_sweeps_dead_and_orphan_sidecars(spark, tmp_path):
    path = str(tmp_path / "b")
    t = _interleaved(spark, path, files=5, checkpoint_interval=4)
    orphan = os.path.join(path, BLOOM_DIR, "deadbeef.parquet")
    B.write_sidecar(orphan, [
        {"path": "data/x.parquet", "col": "k", "n": 1, "m": 64, "k": 3,
         "bits": b"\0" * 8}
    ])
    t.vacuum(keep_versions=1)
    assert not os.path.exists(orphan)
    live = t.snapshot().bloom
    on_disk = {
        f"{BLOOM_DIR}/{n}" for n in os.listdir(os.path.join(path, BLOOM_DIR))
    }
    assert on_disk == set(live)
    df = t.read(filters=[("k", "=", 3)])
    assert len(df.inputFiles()) == 1 and df.count() == 1


def test_merge_rebuilds_blooms_for_rewritten_files(spark, tmp_path):
    t = _interleaved(spark, str(tmp_path / "b"), files=4, keys_per_file=25)
    src = spark.createDataFrame(
        [(2, "u-2-new"), (777, "u-777")], "k long, name string"
    )
    t.merge(src, keys=["k"])
    hit = t.read(filters=[("k", "=", 2)])
    assert [r["name"] for r in hit.collect()] == ["u-2-new"]
    assert len(hit.inputFiles()) <= 2  # rewritten + possibly the insert file
    ins = t.read(filters=[("k", "=", 777)])
    assert [r["name"] for r in ins.collect()] == ["u-777"]
    assert len(ins.inputFiles()) == 1


def test_schema_evolution_gap_is_conservative(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "b"), bloom_columns=["extra"])
    t.write(spark.createDataFrame([(1,)], "k long"), mode="append")  # no col yet
    t.write(
        spark.createDataFrame([(2, "e-2")], "k long, extra string"),
        mode="append",
        merge_schema=True,
    )
    df = t.read(filters=[("extra", "=", "e-2")])
    # old file has no bloom on `extra` -> kept (conservative); new file hit
    assert df.count() == 1
    assert len(df.inputFiles()) == 2


def test_property_persists_to_new_handles(spark, tmp_path):
    path = str(tmp_path / "b")
    t = SnaplogTable(spark, path, bloom_columns=["k"])
    t.write(spark.createDataFrame([(1, "a")], "k long, v string"), mode="append")
    # an independently-constructed handle (no bloom option) keeps building
    t2 = SnaplogTable(spark, path)
    assert t2.bloom_columns == ("k",)
    t2.write(spark.createDataFrame([(2, "b")], "k long, v string"), mode="append")
    df = t2.read(filters=[("k", "=", 2)])
    assert len(df.inputFiles()) == 1 and df.count() == 1


def test_unsupported_bloom_type_raises(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "b"), bloom_columns=["x"])
    with pytest.raises(ValueError, match="unsupported type"):
        t.write(spark.createDataFrame([(1.5,)], "x double"), mode="append")


def test_source_pushdown_prunes_through_blooms(spark, tmp_path):
    spark.dataSource.register(SnaplogDataSource)
    path = str(tmp_path / "b")
    _interleaved(spark, path)
    df = (
        spark.read.format("snaplog").load(path).filter(F.col("k") == 2 + 6 * 11)
    )
    assert df.count() == 1
    plain = spark.read.format("snaplog").load(path)
    assert plain.count() == 300


def test_fpp_stays_low_at_width(spark, tmp_path):
    """With 10 bits/key the expected fpp is under 1%: probing 40 absent
    keys across 8 files (320 bloom tests) should keep nearly all files
    closed — allow a small number of false-positive opens."""
    t = _interleaved(spark, str(tmp_path / "b"), files=8, keys_per_file=100)
    opened = 0
    for probe in range(900_001, 900_041):
        opened += len(t.read(filters=[("k", "=", probe)]).inputFiles())
    assert opened <= 8  # 320 probes, <=2.5% apparent fpp
