"""Z-order clustering: interleave math vs a Python reference, and the
point of it all — footer-stats file pruning on EVERY z-ordered column,
where linear clustering only serves the leading one."""

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.snaplog import SnaplogTable
from dc43_spark.io.zorder import with_zorder_key, zorder_repartition


def _interleave(vals: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_zorder_key_matches_python_interleave(spark):
    # envelope [0,3] with bits=2 makes bucket == value (scaled*4, clamped)
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r._zorder_key
        for r in with_zorder_key(df, ["x", "y"], bits=2).collect()
    }
    for (x, y), z in got.items():
        assert z == _interleave([x, y], 2), (x, y, z)
    # adjacent cells differ in few low bits: the curve is locality-preserving
    assert got[(0, 0)] == 0 and got[(3, 3)] == 15


def test_zorder_handles_nulls_strings_and_constants(spark):
    df = spark.createDataFrame(
        [("apple", None, 7), ("banana", 2, 7), (None, 9, 7)],
        "s string, n long, const long",
    )
    out = with_zorder_key(df, ["s", "n", "const"], bits=4).collect()
    assert all(r._zorder_key is not None for r in out)
    # string prefix order survives the projection: apple < banana
    by_s = {r.s: r._zorder_key for r in out}
    s_bits = {k: v for k, v in by_s.items() if k is not None}
    assert s_bits["apple"] <= s_bits["banana"]


def test_zorder_validation(spark):
    df = spark.createDataFrame([(1, [1, 2])], "x long, arr array<long>")
    with pytest.raises(ValueError, match="not z-orderable"):
        with_zorder_key(df, ["arr"])
    with pytest.raises(ValueError, match="not in frame"):
        with_zorder_key(df, ["nope"])
    with pytest.raises(ValueError, match="key bits"):
        with_zorder_key(df, ["x"], bits=63)
    with pytest.raises(ValueError, match="at least one"):
        with_zorder_key(df, [])


def _grid_table(spark, path, layout):
    """64x64 (x, y) grid in 16 files, laid out per ``layout``."""
    df = (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )
    t = SnaplogTable(spark, path)
    if layout == "zorder":
        t.write(zorder_repartition(df, ["x", "y"], 16), mode="overwrite")
    else:  # linear: range-cluster by (x, y) lexicographically
        t.write(
            df.repartitionByRange(16, "x", "y").sortWithinPartitions("x", "y"),
            mode="overwrite",
        )
    return t


def test_zorder_prunes_both_columns_linear_only_leading(spark, tmp_path):
    zt = _grid_table(spark, str(tmp_path / "z"), "zorder")
    lt = _grid_table(spark, str(tmp_path / "l"), "linear")
    total = 16
    assert len(zt.snapshot().files) == total
    assert len(lt.snapshot().files) == total

    # same rows whatever the layout or pruning
    for t in (zt, lt):
        got = sorted(r.payload for r in t.read(filters=[("x", "<", 8)]).collect())
        assert got == [p for p in range(64 * 64) if p % 64 < 8]

    # leading column: both layouts prune
    z_x = len(zt.read(filters=[("x", "<", 8)]).inputFiles())
    l_x = len(lt.read(filters=[("x", "<", 8)]).inputFiles())
    assert z_x < total and l_x < total

    # trailing column: ONLY the z-ordered layout prunes — every linear
    # file spans the full y range
    z_y = len(zt.read(filters=[("y", "<", 8)]).inputFiles())
    l_y = len(lt.read(filters=[("y", "<", 8)]).inputFiles())
    # (>= total-1 rather than == total: range-partition boundary sampling
    # can leave one edge file with a partial y span)
    assert l_y >= total - 1
    assert z_y <= total // 2, f"zorder should prune most files on y, read {z_y}"

    # a 2-D box is where the hypercube layout shines
    box = zt.read(filters=[("x", "<", 16), ("y", "<", 16)])
    assert len(box.inputFiles()) <= total // 4
    assert box.count() == 16 * 16


def test_compact_zorder_by_routes_through_log(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    df = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    # many small appends -> fragmented table
    for i in range(4):
        t.write(df, mode="append")
    v = t.compact(target_file_mb=1, zorder_by=["x", "y"])
    assert v is not None
    assert t.history()[-1].operation == "compact"
    assert t.read().count() == 4096
    with pytest.raises(ValueError, match="not both"):
        t.compact(cluster_by=["x"], zorder_by=["y"])


def test_string_projection_is_length_order_safe(spark):
    """Review finding: the unpadded hex prefix projected 'aa' above 'b'.
    The padded projection must keep lexicographic order across lengths."""
    words = ["a", "aa", "ab", "b", "ba", "z", "zz"]
    df = spark.createDataFrame([(w,) for w in sorted(words)], "s string")
    keyed = with_zorder_key(df, ["s"], bits=6)
    got = [r.s for r in keyed.orderBy("_zorder_key", "s").collect()]
    assert got == sorted(words)
