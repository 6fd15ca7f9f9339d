"""Dataset maintenance: small-file compaction with optional clustering.

Streaming sinks and incremental appends (foreachBatch parquet appends,
index appends, merge initial writes) accrete small files; at 100 TB the
file-listing and task-scheduling overhead of millions of tiny files
dominates scan time. ``compact_dataset`` rewrites a parquet dataset into
size-targeted files — optionally range-clustered on given columns so
min/max row-group statistics become selective for those predicates —
using the same atomic temp-dir swap as the parquet MERGE fallback
(readers never observe a half-compacted dataset; crash mid-swap leaves
either the old or the new dataset intact).

Delta/Iceberg deployments should prefer the table format's native
OPTIMIZE/rewrite (transactional, concurrent-writer-safe); this is the
format-agnostic fallback, and like the MERGE fallback it assumes a
single maintainer per dataset directory.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile
from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import SparkSession


@dataclass
class CompactionResult:
    path: str
    files_before: int
    files_after: int
    bytes_before: int
    rows: int


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    return out


def compact_dataset(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: int = 128,
    cluster_by: Optional[Sequence[str]] = None,
    partition_by: Optional[Sequence[str]] = None,
    min_files: int = 2,
) -> CompactionResult:
    """Rewrite ``path`` into ~``target_file_mb`` parquet files.

    File count derives from the CURRENT on-disk bytes (compressed), so
    the target tracks real size, not row counts. ``cluster_by`` sorts
    the rewrite with ``repartitionByRange`` + ``sortWithinPartitions``:
    each output file then covers a narrow range of the cluster columns,
    which makes parquet min/max row-group statistics selective for
    predicates on them (the poor man's OPTIMIZE ZORDER for one
    dimension-ordered column set). ``partition_by`` preserves a hive
    layout (``col=value`` directories): rows co-locate per partition
    value before the partitioned write, so each partition dir collapses
    to a few files and file-level partition pruning is unchanged. A
    dataset already at or under ``min_files`` files is left untouched.

    Snaplog tables route to ``SnaplogTable.compact`` — the rewrite commits
    THROUGH the log (transactional, conflict-checked, history-preserving)
    instead of swapping directories under readers' feet."""
    from dc43_spark.io.snaplog import SnaplogTable

    if SnaplogTable.is_snaplog(path):
        if partition_by:
            raise ValueError("snaplog compaction does not take partition_by")
        t = SnaplogTable(spark, path)
        pre = t.snapshot()
        files_before = len(pre.files)
        bytes_before = sum(f.bytes for f in pre.files)
        t.compact(
            target_file_mb=target_file_mb, cluster_by=cluster_by, min_files=min_files
        )
        post = t.snapshot()
        return CompactionResult(
            path, files_before, len(post.files), bytes_before, post.rows
        )
    files = _parquet_files(path)
    bytes_before = sum(os.path.getsize(f) for f in files)
    if len(files) <= min_files:
        return CompactionResult(path, len(files), len(files), bytes_before, -1)

    n_files = max(1, math.ceil(bytes_before / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if partition_by:
        out = df.repartition(*partition_by)
        if cluster_by:
            out = out.sortWithinPartitions(*partition_by, *cluster_by)
    elif cluster_by:
        out = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        out = df.repartition(n_files)

    parent = os.path.dirname(path.rstrip("/")) or "."
    tmp_dir = tempfile.mkdtemp(prefix="dc43_compact_", dir=parent)
    try:
        writer = out.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp_dir)
        rows = spark.read.parquet(tmp_dir).count()
        backup = path.rstrip("/") + "._pre_compact"
        os.rename(path, backup)
        os.rename(tmp_dir, path)
        shutil.rmtree(backup)
    except BaseException:
        shutil.rmtree(tmp_dir, ignore_errors=True)
        raise
    return CompactionResult(
        path, len(files), len(_parquet_files(path)), bytes_before, rows
    )


def compact_embedding_index(spark: SparkSession, path: str, **kwargs) -> CompactionResult:
    """Maintenance for the persisted embedding near-dup index: every
    append adds files to the probed buckets; compaction collapses each
    ``bucket=`` partition back to a few files while preserving the
    partition layout the probe's pruning depends on. Probe results are
    unchanged (same rows, same buckets)."""
    return compact_dataset(
        spark, f"{path.rstrip('/')}/vectors", partition_by=["bucket"], **kwargs
    )


def compact_minhash_index(spark: SparkSession, path: str, **kwargs) -> CompactionResult:
    """Maintenance for the persisted LSH text index: compacts the bands
    relation (clustered on band_hash so probes touch few row groups) and
    the shingles relation. Probe results are unchanged."""
    base = path.rstrip("/")
    bands = compact_dataset(spark, f"{base}/bands", cluster_by=["band_hash"], **kwargs)
    shingles = compact_dataset(spark, f"{base}/shingles", **kwargs)
    return CompactionResult(
        path=base,
        files_before=bands.files_before + shingles.files_before,
        files_after=bands.files_after + shingles.files_after,
        bytes_before=bands.bytes_before + shingles.bytes_before,
        rows=max(bands.rows, -1) if bands.rows < 0 else bands.rows,
    )
