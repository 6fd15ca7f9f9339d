"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()``   — (spark, sf_dir) -> DataFrame per implemented operator.
``oracle_sql()``— DuckDB-equivalent SQL per query key (correctness gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dc43_spark import (
    showcase,
    showcase_curation,
    showcase_governance,
    showcase_io,
    showcase_scale,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: single-pass contract validation metrics over orders."""
    return showcase.q_metrics_orders(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        **showcase.QUERIES,
        **showcase_scale.SCALE_QUERIES,
        **showcase_io.IO_QUERIES,
        **showcase_curation.CURATION_QUERIES,
        **showcase_governance.GOVERNANCE_QUERIES,
    }


def oracle_sql() -> dict[str, str]:
    return {
        **showcase.ORACLES,
        **showcase_scale.SCALE_ORACLES,
        **showcase_io.IO_ORACLES,
        **showcase_curation.CURATION_ORACLES,
        **showcase_governance.GOVERNANCE_ORACLES,
    }
