"""Showcase contracts + gate queries over the driver's synthetic tables.

Each public ``q_*`` function takes ``(spark, sf_dir)`` and returns a
DataFrame; ``ORACLES`` holds the equivalent DuckDB SQL. They are wired into
``__spark_entry__.py`` for the driver's correctness gate (CORRECTNESS_r{N})
and reused by ``bench.py``.

Cross-engine determinism rules used throughout:
- violation counts / row counts -> BIGINT on both sides
- money values -> BIGINT integer cents, never DECIMAL or DOUBLE: DOUBLE
  drifts by ulps, and DECIMAL trailing-zero values ('123.40') stringify
  differently between the driver's Spark and DuckDB readers (r1: 8
  hash-fails from exactly this, with row-identical values)
- every computed column aliased identically in Spark and SQL
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dc43_spark.contracts.model import Contract, QualityRule, SchemaObject, SchemaProperty
from dc43_spark.engine.metrics import compute_metrics, metrics_dataframe
from dc43_spark.engine.validation import apply_contract
from dc43_spark.expectations.compiler import expectation_specs, row_predicates
from dc43_spark.localdf import local_df


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _scan_splits(spark: SparkSession, df: DataFrame) -> int:
    """Upper-bound estimate of the scan's partition count WITHOUT touching
    ``df.rdd`` (the Python-RDD conversion costs ~0.8s per call): Spark packs
    files into splits of at most ``spark.sql.files.maxPartitionBytes``, so
    sum(ceil(size/maxPB)) bounds the split count. File listing + getsize is
    driver-side metadata only — no Spark job."""
    import os
    import re
    from urllib.parse import urlparse

    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")).lower()
    m = re.fullmatch(r"(\d+)\s*([kmgt]?)b?", raw)
    mult = {"": 1, "k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    max_pb = int(m.group(1)) * mult[m.group(2)] if m else 128 * 1024**2
    splits = 0
    for f in df.inputFiles():
        path = urlparse(f).path or f
        try:
            size = os.path.getsize(path)
        except OSError:  # non-local FS — count the file as one split
            size = 0
        splits += max(1, -(-size // max_pb))
    return splits


def load_spread(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    *,
    columns=None,
    pin: bool = False,
) -> DataFrame:
    """Load + repartition to all cores IF the scan is under-partitioned.

    The driver's tables are single-row-group parquet files, which Spark can
    only scan as ONE partition — every downstream map-side operator would
    run on one core. The conditional keeps this a no-op on properly-split
    datasets (a real 100 TB input has thousands of splits, and shuffling it
    here would be a disaster).

    WHEN to use it (r3 verdict: 4 queries went >2x from over-use): only
    before CPU-heavy per-row work (shingling, hashing, Pandas UDFs) on a
    table small enough that the spreading shuffle is cheap — there the
    parallelism is real. A bare scan->aggregate or scan->projection must
    use plain ``load``: partial aggregation already runs inside the scan
    stage, so the full-table shuffle moves every row to save work that is
    smaller than the shuffle itself (measured at sf0.1: metrics_orders
    2.4s plain vs 5.4s spread; pricing_summary 1.3s vs 5.8s).

    ``pin=True`` (r15): the repartition alone does NOT guarantee the
    parallelism — the optimizer pushes deterministic per-row projections,
    generators and filters back BELOW the round-robin exchange (fewer
    shuffled bytes, guide §2.3), which on a one-split scan moves the
    expensive tokenize/regex/hash compute onto the single scan task
    (measured: corpus_filter's whole signal pass ran serially, 1.08 s vs
    0.32 s parallel). A ``persist`` after the spread is the barrier:
    the cached relation materializes from the scan+exchange subtree, so
    downstream compute sits above it and runs on the spread partitions.
    persist (not localCheckpoint) because ``clearCache``/unpersist can
    free it — checkpointed RDDs accumulate in block storage for the
    session's lifetime, which measurably degraded later queries in a
    long multi-query run. Only applied when the spread itself applies,
    so a properly-split dataset never materializes anything; pass
    ``columns`` with it so the cache (which defeats scan column pruning)
    carries only what the query reads."""
    df = load(spark, sf_dir, table)
    if columns is not None:
        df = df.select(*columns)
    par = spark.sparkContext.defaultParallelism
    if _scan_splits(spark, df) < par:
        df = df.repartition(par)
        if pin:
            from pyspark.storagelevel import StorageLevel

            df = df.persist(StorageLevel.MEMORY_AND_DISK)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Rebuild ``ts`` as TIMESTAMP_NTZ ONLY when parquet delivered it as
    nanos-as-long (TIMESTAMP(NANOS) files read under
    ``spark.sql.legacy.parquet.nanosAsLong``); MICROS-encoded files already
    arrive as TIMESTAMP_NTZ and pass through untouched (r2: an
    unconditional rebuild died at analysis time when the fixture flipped
    ns->us). Both branches now emit the SAME type, so downstream
    date_trunc/window semantics can't depend on the physical encoding.

    The nanos->NTZ conversion interprets the long as UTC-epoch nanos and
    renders the UTC wall clock (the cast goes through the session tz, which
    every session in this repo pins to UTC); run non-UTC sessions with a
    UTC tz when loading nanos-encoded files."""
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        # integer `div`, NOT `/`: epoch-nanos (~1.7e18) exceed double's 2^53
        # exact-integer range, so float division is off by a microsecond
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events loader robust to the table's timestamp physical encoding.

    The legacy conf makes Spark 4 read TIMESTAMP(NANOS) parquet as long
    instead of erroring outright; ``normalize_event_ts`` then rebuilds the
    column only when that path was actually taken, so MICROS-encoded files
    (the current fixtures) load natively."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))


# ---------------------------------------------------------------- contracts

ORDER_STATUS = ["F", "O", "P"]
ORDER_PRIORITY_RE = "^[1-5]-[A-Z ]+$"
MKT_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def orders_contract() -> Contract:
    """dc43-style contract over driver ``orders`` (FIXTURES.md F1 mapping)."""
    return Contract(
        id="driver.orders",
        version="0.1.0",
        schema_objects=[
            SchemaObject(
                name="orders",
                properties=[
                    SchemaProperty("o_orderkey", "bigint", required=True, unique=True),
                    SchemaProperty("o_custkey", "bigint", required=True),
                    SchemaProperty(
                        "o_orderstatus", "string", required=True,
                        quality=[QualityRule("enum", ORDER_STATUS)],
                    ),
                    SchemaProperty(
                        "o_totalprice", "double", required=True,
                        quality=[QualityRule("gt", 0.0)],
                    ),
                    SchemaProperty("o_orderdate", "timestamp", required=True),
                    SchemaProperty(
                        "o_orderpriority", "string", required=True,
                        quality=[QualityRule("regex", ORDER_PRIORITY_RE)],
                    ),
                ],
            )
        ],
    )


def customer_contract() -> Contract:
    """Full-rule-coverage contract (FIXTURES.md F2): every compiler branch."""
    return Contract(
        id="driver.customer",
        version="0.1.0",
        schema_objects=[
            SchemaObject(
                name="customer",
                properties=[
                    SchemaProperty("c_custkey", "bigint", required=True, unique=True),
                    SchemaProperty(
                        "c_name", "string", required=True,
                        quality=[QualityRule("regex", "^Customer#[0-9]+$")],
                    ),
                    SchemaProperty(
                        "c_acctbal", "double", required=True,
                        quality=[QualityRule("ge", -1000.0), QualityRule("le", 10000.0)],
                    ),
                    SchemaProperty(
                        "c_mktsegment", "string", required=True,
                        quality=[QualityRule("enum", MKT_SEGMENTS)],
                    ),
                    SchemaProperty(
                        "c_nationkey", "int",
                        quality=[QualityRule("ge", 0, severity="warning")],
                    ),
                ],
                quality=[
                    QualityRule(
                        "query",
                        "SELECT count(*) FROM _dc43_dq_tmp WHERE c_acctbal < -999",
                        name="deep_debt",
                    )
                ],
            )
        ],
    )


def events_contract() -> Contract:
    """Streaming fixture contract (FIXTURES.md F4) used in batch gate form."""
    return Contract(
        id="driver.events",
        version="0.1.0",
        schema_objects=[
            SchemaObject(
                name="events",
                properties=[
                    SchemaProperty("event_id", "bigint", required=True, unique=True),
                    SchemaProperty("ts", "timestamp", required=True),
                    SchemaProperty("user_id", "bigint", required=True),
                    SchemaProperty(
                        "event_type", "string", required=True,
                        quality=[QualityRule("enum", EVENT_TYPES)],
                    ),
                    SchemaProperty("value", "double", quality=[QualityRule("gt", 0.0)]),
                    SchemaProperty("props", "string"),
                ],
            )
        ],
    )


def aligned_orders_contract() -> Contract:
    """apply_contract fixture: reorder + decimal cast + missing col + prune."""
    return Contract(
        id="driver.orders_aligned",
        version="0.1.0",
        schema_objects=[
            SchemaObject(
                name="orders",
                properties=[
                    SchemaProperty("o_orderkey", "bigint", required=True),
                    SchemaProperty("o_custkey", "bigint", required=True),
                    SchemaProperty("o_totalprice", "decimal(12,2)", required=True),
                    SchemaProperty("o_orderstatus", "string", required=True),
                    SchemaProperty("o_orderdate", "timestamp", required=True),
                    SchemaProperty("o_clerk", "string"),  # missing -> typed NULL
                ],
            )
        ],
    )


# ------------------------------------------------- SQL fragments (oracles)

def _not_null_v(col: str) -> str:
    return f"CAST(sum(CASE WHEN NOT ({col} IS NOT NULL) THEN 1 ELSE 0 END) AS BIGINT)"


def _pred_v(pred: str) -> str:
    return f"CAST(sum(CASE WHEN NOT ({pred}) THEN 1 ELSE 0 END) AS BIGINT)"


def _unique_v(col: str) -> str:
    # total - distinct-including-NULL (reference distinct().count() semantics)
    return (
        f"CAST(count(*) - (count(DISTINCT {col}) + "
        f"CASE WHEN count(*) - count({col}) > 0 THEN 1 ELSE 0 END) AS BIGINT)"
    )


ORDERS_PRED_SQL = {
    "enum_o_orderstatus": "o_orderstatus IN ('F', 'O', 'P')",
    "gt_o_totalprice": "o_totalprice > 0.0",
    "regex_o_orderpriority": f"regexp_matches(o_orderpriority, '{ORDER_PRIORITY_RE}')",
}

_METRICS_ORDERS_SQL = f"""
SELECT
  CAST(count(*) AS BIGINT) AS row_count,
  {_not_null_v('o_orderkey')} AS v_not_null_o_orderkey,
  {_unique_v('o_orderkey')} AS v_unique_o_orderkey,
  {_not_null_v('o_custkey')} AS v_not_null_o_custkey,
  {_not_null_v('o_orderstatus')} AS v_not_null_o_orderstatus,
  {_pred_v(ORDERS_PRED_SQL['enum_o_orderstatus'])} AS v_enum_o_orderstatus,
  {_not_null_v('o_totalprice')} AS v_not_null_o_totalprice,
  {_pred_v(ORDERS_PRED_SQL['gt_o_totalprice'])} AS v_gt_o_totalprice,
  {_not_null_v('o_orderdate')} AS v_not_null_o_orderdate,
  {_not_null_v('o_orderpriority')} AS v_not_null_o_orderpriority,
  {_pred_v(ORDERS_PRED_SQL['regex_o_orderpriority'])} AS v_regex_o_orderpriority
FROM orders
"""

_METRICS_CUSTOMER_SQL = f"""
SELECT
  CAST(count(*) AS BIGINT) AS row_count,
  {_not_null_v('c_custkey')} AS v_not_null_c_custkey,
  {_unique_v('c_custkey')} AS v_unique_c_custkey,
  {_not_null_v('c_name')} AS v_not_null_c_name,
  {_pred_v("regexp_matches(c_name, '^Customer#[0-9]+$')")} AS v_regex_c_name,
  {_not_null_v('c_acctbal')} AS v_not_null_c_acctbal,
  {_pred_v('c_acctbal >= -1000.0')} AS v_ge_c_acctbal,
  {_pred_v('c_acctbal <= 10000.0')} AS v_le_c_acctbal,
  {_not_null_v('c_mktsegment')} AS v_not_null_c_mktsegment,
  {_pred_v("c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY')")} AS v_enum_c_mktsegment,
  {_pred_v('c_nationkey >= 0')} AS v_ge_c_nationkey,
  (SELECT CAST(count(*) AS BIGINT) FROM customer WHERE c_acctbal < -999) AS query_deep_debt
FROM customer
"""

_METRICS_EVENTS_SQL = f"""
SELECT
  CAST(count(*) AS BIGINT) AS row_count,
  {_not_null_v('event_id')} AS v_not_null_event_id,
  {_unique_v('event_id')} AS v_unique_event_id,
  {_not_null_v('ts')} AS v_not_null_ts,
  {_not_null_v('user_id')} AS v_not_null_user_id,
  {_not_null_v('event_type')} AS v_not_null_event_type,
  {_pred_v("event_type IN ('click', 'error', 'purchase', 'signup', 'view')")} AS v_enum_event_type,
  {_pred_v('value > 0.0')} AS v_gt_value
FROM events
"""

_ORDERS_VALID_PRED_SQL = " AND ".join(
    [
        "o_orderkey IS NOT NULL",
        "o_custkey IS NOT NULL",
        "o_orderstatus IS NOT NULL",
        ORDERS_PRED_SQL["enum_o_orderstatus"],
        "o_totalprice IS NOT NULL",
        ORDERS_PRED_SQL["gt_o_totalprice"],
        "o_orderdate IS NOT NULL",
        "o_orderpriority IS NOT NULL",
        ORDERS_PRED_SQL["regex_o_orderpriority"],
    ]
)

_APPLY_CONTRACT_SQL = """
SELECT
  CAST(o_orderkey AS BIGINT) AS o_orderkey,
  CAST(o_custkey AS BIGINT) AS o_custkey,
  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS o_totalprice_cents,
  o_orderstatus,
  o_orderdate,
  CAST(NULL AS VARCHAR) AS o_clerk
FROM orders
"""

_FLAG_ORDERS_SQL = """
SELECT
  o_orderkey,
  concat_ws(',',
    CASE WHEN NOT (o_orderstatus IN ('F', 'O', 'P')) THEN 'enum_o_orderstatus' END,
    CASE WHEN NOT (o_totalprice > 0.0) THEN 'gt_o_totalprice' END,
    CASE WHEN NOT (regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')) THEN 'regex_o_orderpriority' END
  ) AS corrupted_rules,
  CAST(
    (CASE WHEN NOT (o_orderstatus IN ('F', 'O', 'P')) THEN 1 ELSE 0 END
     + CASE WHEN NOT (o_totalprice > 0.0) THEN 1 ELSE 0 END
     + CASE WHEN NOT (regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')) THEN 1 ELSE 0 END
    ) > 0 AS BOOLEAN) AS has_violations
FROM orders
"""


# ---------------------------------------------------------------- queries

def q_metrics_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass validation metrics for the orders contract (one agg job
    instead of the reference's job-per-rule, data_quality.py:116-156)."""
    return metrics_dataframe(load(spark, sf_dir, "orders"), orders_contract())


def q_metrics_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full kernel incl. raw-SQL query rule: compute_metrics -> 1-row DF."""
    m = compute_metrics(load(spark, sf_dir, "customer"), customer_contract())
    cols = [k for k in m]
    row = [int(m[k]) for k in cols]
    aliased = [c.replace("violations.", "v_") for c in cols]
    schema = ", ".join(f"`{c}` long" for c in aliased)
    return local_df(spark, [tuple(row)], schema, coalesce=1)


def q_metrics_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metrics_dataframe(load_events(spark, sf_dir), events_contract())


def q_apply_contract_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema align/cast: reorder, decimal(12,2) cast, missing col -> typed
    NULL, extra col pruned (ref validation.py:20-60).

    The gate projects the contract's decimal(12,2) column to exact integer
    cents (decimal * 100 is exact; the value is integral so cast semantics
    can't diverge) — the decimal cast itself is still exercised, but no
    DECIMAL leaves the query (driver-hash trap, see module docstring)."""
    df = apply_contract(load(spark, sf_dir, "orders"), aligned_orders_contract())
    return df.select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") * 100).cast("long").alias("o_totalprice_cents"),
        "o_orderstatus",
        "o_orderdate",
        "o_clerk",
    )


def _orders_valid_predicate() -> str:
    specs = expectation_specs(orders_contract())
    return " AND ".join(row_predicates(specs).values())


def q_split_valid_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split strategy valid side: conjunction of all row-level predicates
    (ref violation_strategy.py:285)."""
    return load(spark, sf_dir, "orders").filter(_orders_valid_predicate())


def q_split_reject_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split strategy reject side: NOT(conjunction) — NULL-predicate rows are
    in neither subset, mirroring the reference (violation_strategy.py:297)."""
    return load(spark, sf_dir, "orders").filter(f"NOT ({_orders_valid_predicate()})")


def q_split_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both split-strategy outputs in ONE gate (single scan): each row is
    labelled 'valid' (conjunction true) or 'reject' (conjunction false);
    NULL-predicate rows land in neither side, mirroring the reference
    (violation_strategy.py:285,297). Consolidates the r1-r4
    split_valid/split_reject gate pair so the driver's 50-slot correctness
    window covers every registered query; the per-side gates remain in
    EXTRA_QUERIES for bench comparability and local parity."""
    pred = _orders_valid_predicate()
    side = F.when(F.expr(pred), F.lit("valid")).when(
        ~F.expr(pred), F.lit("reject")
    )
    return (
        load(spark, sf_dir, "orders")
        .withColumn("side", side)
        .filter(F.col("side").isNotNull())
    )


def q_flag_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag strategy row view: per-row violated-rule list (ref
    violation_strategy.py:499-522; array projected to a CSV string for a
    stable cross-engine hash)."""
    df = load(spark, sf_dir, "orders")
    specs = expectation_specs(orders_contract())
    preds = {k: p for k, p in row_predicates(specs).items() if not k.startswith("not_null_")}
    flags = [F.when(~F.expr(p), F.lit(k)) for k, p in preds.items()]
    n_violated = sum(
        (F.when(~F.expr(p), F.lit(1)).otherwise(F.lit(0)) for p in preds.values()),
        start=F.lit(0),
    )
    return df.select(
        F.col("o_orderkey"),
        F.concat_ws(",", *flags).alias("corrupted_rules"),
        (n_violated > 0).alias("has_violations"),
    )


QUERIES = {
    "metrics_orders": q_metrics_orders,
    "metrics_customer": q_metrics_customer,
    "metrics_events": q_metrics_events,
    "apply_contract_orders": q_apply_contract_orders,
    "split_orders": q_split_orders,
    "flag_orders": q_flag_orders,
}

ORACLES = {
    "metrics_orders": _METRICS_ORDERS_SQL,
    "metrics_customer": _METRICS_CUSTOMER_SQL,
    "metrics_events": _METRICS_EVENTS_SQL,
    "apply_contract_orders": _APPLY_CONTRACT_SQL,
    "split_orders": (
        "SELECT *, CASE WHEN {p} THEN 'valid' ELSE 'reject' END AS side "
        "FROM orders WHERE ({p}) IS NOT NULL"
    ).format(p=_ORDERS_VALID_PRED_SQL),
    "flag_orders": _FLAG_ORDERS_SQL,
}

#: gates OUTSIDE the driver's 50-slot correctness window — still run by
#: bench.py (r1-comparable names) and by the `pytest -m parity` local gate.
EXTRA_QUERIES = {
    "split_valid_orders": q_split_valid_orders,
    "split_reject_orders": q_split_reject_orders,
}

EXTRA_ORACLES = {
    "split_valid_orders": f"SELECT * FROM orders WHERE {_ORDERS_VALID_PRED_SQL}",
    "split_reject_orders": f"SELECT * FROM orders WHERE NOT ({_ORDERS_VALID_PRED_SQL})",
}
