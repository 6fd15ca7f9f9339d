"""Z-order (Morton) clustering for multi-column data skipping.

``compact(cluster_by=[a, b])`` range-clusters lexicographically: files
get tight ``a`` envelopes but every file spans the full ``b`` range, so
footer-stats pruning (snaplog ``read(filters=...)``) only helps the
leading column. Z-ordering interleaves the bits of per-column bucket
ids into one sort key, so each output file covers a small HYPERCUBE of
the key space and min/max pruning works on EVERY z-ordered column —
the same trade Databricks' ``OPTIMIZE ZORDER BY`` makes (range-bucket
each column, interleave the bucket bits, range-partition by the
interleaved key).

Mechanics here, all JVM-side expressions (no UDFs):

1. Project each column to a double that preserves its order: numerics/
   dates cast directly; strings take their first 7 bytes as a base-16
   integer (lexicographic prefix order survives).
2. Bucket the projection uniformly into ``2**bits`` cells between the
   column's observed min/max (one driver agg for the envelope). Uniform
   — not quantile — cells: skew degrades pruning EFFICIENCY only;
   correctness always comes from footer stats + the residual filter.
3. Interleave the bucket bits: ``z = Σ bit_i(bucket_j) << (i*ncols+j)``
   — a fixed ``bits × ncols``-term integer expression.
4. ``repartitionByRange`` + ``sortWithinPartitions`` on the key.

Z-ordering is a LAYOUT choice consumed by the existing stats pruning;
nothing at read time knows or cares that the table was z-ordered.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAX_KEY_BITS = 62  # interleaved key must fit a signed 64-bit long


def _order_projection(col: str, dtype: T.DataType):
    """An order-preserving double projection of ``col`` (NULLs -> NULL,
    handled at bucket time)."""
    c = F.col(col)
    if isinstance(dtype, (T.NumericType, T.BooleanType)):
        return c.cast("double")
    if isinstance(dtype, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return c.cast("timestamp").cast("double")
    if isinstance(dtype, T.StringType):
        # first 7 bytes as a big-endian integer, RIGHT-padded with zero
        # bytes: without the pad, 'aa' (0x6161) would project above 'b'
        # (0x62) and scatter lexicographic neighbors across buckets
        return F.conv(
            F.rpad(F.substring(F.hex(F.encode(c, "UTF-8")), 1, 14), 14, "0"), 16, 10
        ).cast("double")
    raise ValueError(
        f"column {col!r} of type {dtype.simpleString()} is not z-orderable "
        "(numeric/date/timestamp/string/boolean only)"
    )


def with_zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 8,
    key_col: str = "_zorder_key",
) -> DataFrame:
    """Append the interleaved-bit z-order key for ``cols``.

    Runs ONE small driver aggregate (per-column min/max of the order
    projection) to fix the bucket envelopes; everything else is a pure
    column expression. NULLs and constant columns land in bucket 0.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits < 1 or bits * len(cols) > _MAX_KEY_BITS:
        raise ValueError(
            f"bits={bits} x {len(cols)} columns exceeds {_MAX_KEY_BITS} key bits"
        )
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    missing = sorted(c for c in cols if c not in dtypes)
    if missing:
        raise ValueError(f"zorder columns not in frame: {missing}")
    projs = {c: _order_projection(c, dtypes[c]) for c in cols}
    env = df.select(
        *[F.min(projs[c]).alias(f"_lo_{i}") for i, c in enumerate(cols)],
        *[F.max(projs[c]).alias(f"_hi_{i}") for i, c in enumerate(cols)],
    ).first()

    n_cells = 1 << bits
    buckets = []
    for i, c in enumerate(cols):
        lo, hi = env[f"_lo_{i}"], env[f"_hi_{i}"]
        if lo is None or hi is None or hi <= lo:
            buckets.append(F.lit(0).cast("long"))
            continue
        scaled = (projs[c] - F.lit(float(lo))) / F.lit(float(hi) - float(lo))
        b = F.floor(scaled * n_cells).cast("long")
        buckets.append(
            F.coalesce(F.least(F.greatest(b, F.lit(0)), F.lit(n_cells - 1)), F.lit(0))
        )

    ncols = len(cols)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            key = key + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * ncols + j
            )
    return df.withColumn(key_col, key)


def zorder_repartition(
    df: DataFrame,
    cols: Sequence[str],
    n_files: int,
    *,
    bits: int = 8,
    prefix_cols: Sequence[str] = (),
) -> DataFrame:
    """Lay ``df`` out as ``n_files`` z-ordered files: range-partition on
    the interleaved key (one shuffle), sort within each partition, drop
    the key. Footer min/max stats then bound every z-ordered column per
    file, which is what snaplog ``read(filters=...)`` prunes on.

    ``prefix_cols`` (hive partition columns) lead the range key and the
    sort, so rows stay grouped by partition and each partition's files
    cover contiguous z-ranges — Delta's OPTIMIZE ZORDER within
    partitions. Bucket envelopes stay GLOBAL (one driver aggregate, not
    one per partition): keys are coarser inside narrow partitions but
    never wrong, and pruning exactness comes from the footer stats, not
    the key."""
    keyed = with_zorder_key(df, cols, bits=bits)
    lead = [F.col(c) for c in prefix_cols]
    out = keyed.repartitionByRange(max(1, n_files), *lead, F.col("_zorder_key"))
    out = out.sortWithinPartitions(*lead, "_zorder_key")
    return out.drop("_zorder_key")
