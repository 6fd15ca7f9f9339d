"""Driver-local DataFrames without the Python-worker scan.

``SparkSession.createDataFrame(rows)`` on a local list ships the rows as
a *pickled RDD* split into ``defaultParallelism`` slices; every action
over the frame then launches one Python worker task per slice — 32
near-empty tasks for a 2-row metadata frame on a 32-core host, each
paying the JVM->Python handshake (and, cold, the worker's pandas/pyarrow
imports).  The table-format gates build many such frames (file-identity
frames, touched-file lists, DV descriptors), so this overhead dominated
their measured executor run time (run >> cpu, guide §4).

``local_df`` builds a ``pyarrow.Table`` driver-side instead and hands it
to ``SparkSession.createDataFrame``, which routes it through
``_create_from_arrow_table``: the rows cross to the JVM as Arrow batches
once, at creation, and every scan is pure JVM (no Python eval node, no
Python workers).  Partitioning comes out as ``min(n_rows,
defaultParallelism)`` — scale-adaptive, never empty — and consumers that
want a single partition (collect/broadcast metadata) pass
``coalesce=1``.

Any conversion the Arrow path cannot express (exotic nested types,
mismatched values) falls back to the legacy pickle path with identical
semantics.
"""

from __future__ import annotations

import logging
from typing import Iterable, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["local_df"]

_log = logging.getLogger(__name__)

#: count of silent legacy-path fallbacks since import (r15, VERDICT r14
#: #9): the Arrow path is the whole point of this module — a type change
#: that knocks a call site back to the pickled-RDD path would silently
#: reintroduce 32-task metadata scans. The counter (plus a WARNING log
#: per distinct schema) makes that regression observable; a test pins
#: every shipped call-site schema to the Arrow path.
_FALLBACKS = 0
_WARNED_SCHEMAS: set = set()


def _as_struct(spark: SparkSession, schema: Union[StructType, str]) -> StructType:
    if isinstance(schema, StructType):
        return schema
    # DDL string ("a string, b long"); parsed by the session's parser so
    # it accepts everything createDataFrame itself would
    return StructType.fromDDL(schema)


def local_df(
    spark: SparkSession,
    rows: Iterable[Sequence],
    schema: Union[StructType, str],
    *,
    coalesce: Optional[int] = None,
) -> DataFrame:
    """A DataFrame over driver-local ``rows`` that scans JVM-only.

    ``rows``: iterable of tuples (one per row, positional against
    ``schema``).  ``schema``: StructType or DDL string — required; this
    helper never infers.  ``coalesce=1`` for frames consumed by a single
    collect/broadcast; leave ``None`` for frames feeding per-row
    executor work (mapInPandas kernels) to keep one row per task up to
    ``defaultParallelism``.
    """
    rows = [tuple(r) for r in rows]
    struct = _as_struct(spark, schema)
    df: Optional[DataFrame] = None
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        aschema = to_arrow_schema(struct)
        cols = list(zip(*rows)) if rows else [() for _ in struct.fields]
        arrays = [
            pa.array(list(c), type=f.type) for c, f in zip(cols, aschema)
        ]
        table = pa.Table.from_arrays(arrays, schema=aschema)
        df = spark.createDataFrame(table, struct)
    except Exception as exc:
        global _FALLBACKS
        _FALLBACKS += 1
        key = struct.simpleString()
        if key not in _WARNED_SCHEMAS:
            _WARNED_SCHEMAS.add(key)
            _log.warning(
                "local_df fell back to the pickled-RDD path for schema %s "
                "(%s: %s) — scans of this frame run one Python task per "
                "core instead of JVM-only",
                key, type(exc).__name__, exc,
            )
        df = None
    if df is None:
        # legacy pickle path — semantics identical, just slower to scan
        df = spark.createDataFrame(rows, struct)
    if coalesce is not None and len(rows) > 0:
        df = df.coalesce(coalesce)
    return df
