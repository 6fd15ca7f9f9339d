"""Gate query for the governance orchestration surface: a full
``GovernanceService.evaluate_dataset`` round-trip (metrics kernel ->
verdict -> status/link/activity persisted to stores -> read back),
emitted as rows a static DuckDB oracle over ``orders`` predicts exactly.

r1 left §2.7 driver-gate-free; this puts the orchestrator itself under
the oracle. Two evaluations run per invocation:

- ``orders_read``  — the standard orders contract on READ. Clean data at
  gate SFs, so the verdict path exercised is rule-pass -> ok.
- ``orders_write`` — a deliberately strict contract on WRITE (enum
  narrowed to F/O, price floor 100000, an optional-severity priority
  regex). Rule violations escalate to errors on write (ref
  governance/backend/local.py:1958-2016 asymmetry) -> block, while the
  optional rule lands in warnings.

The oracle re-derives every output column from the violation counts with
the same verdict algebra, so it stays correct at ANY scale factor — the
gate pins behaviour, not a frozen answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dc43_spark.contracts.model import Contract, QualityRule, SchemaObject, SchemaProperty
from dc43_spark.governance.orchestrator import GovernanceService
from dc43_spark.showcase import ORDER_STATUS, ORDERS_PRED_SQL, load, orders_contract
from dc43_spark.localdf import local_df

STRICT_ENUM = ["F", "O"]  # 'P' rows violate
STRICT_PRICE_FLOOR = 100000.0
STRICT_PRIORITY_RE = "^1-URGENT$"


def strict_orders_contract() -> Contract:
    """Write-side contract engineered to trip the verdict asymmetry."""
    return Contract(
        id="driver.orders.strict",
        version="0.1.0",
        schema_objects=[
            SchemaObject(
                name="orders",
                properties=[
                    SchemaProperty("o_orderkey", "bigint", required=True, unique=True),
                    SchemaProperty(
                        "o_orderstatus", "string", required=True,
                        quality=[QualityRule("enum", STRICT_ENUM)],
                    ),
                    SchemaProperty(
                        "o_totalprice", "double", required=True,
                        quality=[QualityRule("gt", STRICT_PRICE_FLOOR)],
                    ),
                    SchemaProperty(
                        "o_orderpriority", "string", required=True,
                        quality=[
                            QualityRule("regex", STRICT_PRIORITY_RE, severity="warning")
                        ],
                    ),
                ],
            )
        ],
    )


def q_governance_verdict_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orchestrate three dataset evaluations end-to-end and surface what the
    governance STORE recorded (not the in-flight objects): one row per
    evaluation, every column re-derivable from SQL over ``orders``.

    The third evaluation runs with ``draft_on_block=True``: the blocked
    strict-contract write must auto-draft a contract that would accept the
    observed data (enum widened, violated range/regex rules dropped, the
    two observed extra columns appended) and persist it to the contract
    store — draft columns verify the STORED draft, not the return value.
    Draft versions embed a timestamp+uuid, so the gate pins the draft's
    deterministic shape (change counts), never the version string."""
    df = load(spark, sf_dir, "orders")
    svc = GovernanceService()
    drafting_svc = GovernanceService(draft_on_block=True)
    outcomes = {
        "orders_read": (
            svc,
            svc.evaluate_dataset(
                df, orders_contract(), dataset_id="orders_read", operation="read"
            ),
        ),
        "orders_write": (
            svc,
            svc.evaluate_dataset(
                df, strict_orders_contract(), dataset_id="orders_write",
                operation="write",
            ),
        ),
        "orders_draft": (
            drafting_svc,
            drafting_svc.evaluate_dataset(
                df, strict_orders_contract(), dataset_id="orders_draft",
                operation="write",
            ),
        ),
    }
    rows = []
    for dataset_id in sorted(outcomes):
        service, outcome = outcomes[dataset_id]
        stored = service.dataset_status(dataset_id, "latest")  # store read-back
        link = service.dataset_contract(dataset_id)
        draft = outcome.draft
        stored_draft = (
            service.contract_store.get(outcome.contract_id, draft.contract.version)
            if draft is not None
            else None
        )
        changes = draft.changes if draft is not None else []
        rows.append(
            (
                dataset_id,
                stored["operation"],
                link["contract_id"] if link is not None else stored["contract_id"],
                stored["status"],
                bool(stored["ok"]),
                len(stored["errors"]),
                len(stored["warnings"]),
                int(outcome.validation.details["blocking_violations"]),
                int(stored["metrics"]["row_count"]),
                stored_draft is not None and stored_draft.status == "draft",
                len(changes),
                sum(1 for c in changes if c.kind == "added_column"),
            )
        )
    return local_df(
        spark,
        rows,
        "dataset_id string, operation string, contract_id string, status string, "
        "ok boolean, n_errors long, n_warnings long, blocking_violations long, "
        "row_count long, draft_created boolean, n_draft_changes long, "
        "n_added_columns long",
        coalesce=1,
    )


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling (the contract-bootstrap input): one aggregate pass
    over a bigint/string projection of orders — null counts, cardinality,
    uniqueness, min/max, enum-candidate value sets. Money is pre-projected
    to integer cents so every profiled value is BIGINT or string and the
    oracle comparison never touches floats."""
    from pyspark.sql import functions as F

    from dc43_spark.contracts.profiling import profile_columns
    from dc43_spark.showcase_scale import _cents

    df = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        _cents(F.col("o_totalprice")).alias("o_totalprice_cents"),
        "o_orderpriority",
    )
    # sketches=False: the gate emits null/distinct/unique/min/max/enum
    # only — the drift sketches (quantiles + hash hists) never reach the
    # output, and their pass was ~half the gate's steady cost (r14)
    profile = profile_columns(df, enum_max_card=8, sketches=False)
    rows = []
    for name in sorted(profile.columns):
        cp = profile.columns[name]
        is_str = isinstance(cp.min_value, str)
        rows.append(
            (
                name,
                cp.n_nulls,
                cp.n_distinct,
                cp.is_unique,
                None if is_str else cp.min_value,
                None if is_str else cp.max_value,
                cp.min_value if is_str else None,
                cp.max_value if is_str else None,
                ",".join(cp.enum_values) if cp.enum_values is not None else None,
            )
        )
    return local_df(
        spark,
        rows,
        "col_name string, n_nulls long, n_distinct long, is_unique boolean, "
        "min_long long, max_long long, min_str string, max_str string, "
        "enum_csv string",
        coalesce=1,
    )


_CENTS_EXPR = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _profile_orders_sql() -> str:
    """Per-column profile rows from ONE wide aggregate CTE."""
    cols = {
        "o_orderkey": "o_orderkey",
        "o_custkey": "o_custkey",
        "o_orderstatus": "o_orderstatus",
        "o_totalprice_cents": _CENTS_EXPR,
        "o_orderpriority": "o_orderpriority",
    }
    strings = {"o_orderstatus", "o_orderpriority"}
    aggs, selects = ["count(*) AS rc"], []
    for name, expr in cols.items():
        aggs += [
            f"sum(CASE WHEN {expr} IS NULL THEN 1 ELSE 0 END) AS nn_{name}",
            f"count(DISTINCT {expr}) AS nd_{name}",
            f"min({expr}) AS mi_{name}",
            f"max({expr}) AS ma_{name}",
        ]
        if name in strings:
            aggs.append(
                f"array_to_string(list_sort(list(DISTINCT {expr})), ',') AS ev_{name}"
            )
        mi_long = "NULL" if name in strings else f"mi_{name}"
        ma_long = "NULL" if name in strings else f"ma_{name}"
        mi_str = f"mi_{name}" if name in strings else "NULL"
        ma_str = f"ma_{name}" if name in strings else "NULL"
        enum_csv = (
            f"CASE WHEN nd_{name} <= 8 THEN ev_{name} ELSE NULL END"
            if name in strings
            else "NULL"
        )
        selects.append(
            f"SELECT '{name}' AS col_name, CAST(nn_{name} AS BIGINT) AS n_nulls, "
            f"CAST(nd_{name} AS BIGINT) AS n_distinct, "
            f"nd_{name} > 0 AND nd_{name} = rc - nn_{name} AS is_unique, "
            f"CAST({mi_long} AS BIGINT) AS min_long, "
            f"CAST({ma_long} AS BIGINT) AS max_long, "
            f"CAST({mi_str} AS VARCHAR) AS min_str, "
            f"CAST({ma_str} AS VARCHAR) AS max_str, "
            f"CAST({enum_csv} AS VARCHAR) AS enum_csv FROM a"
        )
    return "WITH a AS (SELECT " + ", ".join(aggs) + " FROM orders)\n" + \
        "\nUNION ALL\n".join(selects)


def _governance_verdict_sql() -> str:
    """Verdict algebra in SQL: count violated KEYS by class, then apply the
    same escalation rules as evaluate_contract (validation.py:96-119)."""
    enum_all = ", ".join(f"'{s}'" for s in ORDER_STATUS)
    strict_enum = ", ".join(f"'{s}'" for s in STRICT_ENUM)
    not_nulls = [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ]
    nn_counts = " + ".join(
        f"CASE WHEN sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) > 0 THEN 1 ELSE 0 END"
        for c in not_nulls
    )
    # the strict contract declares only these four columns not-null
    nn_counts_w = " + ".join(
        f"CASE WHEN sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) > 0 THEN 1 ELSE 0 END"
        for c in ("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    )
    uniq = (
        "count(*) - (count(DISTINCT o_orderkey) + "
        "CASE WHEN count(*) - count(o_orderkey) > 0 THEN 1 ELSE 0 END)"
    )
    # per-rule violated-ROW counts for both contracts
    base = f"""
  SELECT count(*) AS rc,
    {nn_counts} AS nn_keys,
    {uniq} AS v_uq,
    sum(CASE WHEN NOT ({ORDERS_PRED_SQL['enum_o_orderstatus']}) THEN 1 ELSE 0 END) AS v_enum_r,
    sum(CASE WHEN NOT ({ORDERS_PRED_SQL['gt_o_totalprice']}) THEN 1 ELSE 0 END) AS v_gt_r,
    sum(CASE WHEN NOT ({ORDERS_PRED_SQL['regex_o_orderpriority']}) THEN 1 ELSE 0 END) AS v_rx_r,
    sum(CASE WHEN NOT (o_orderstatus IN ({strict_enum})) THEN 1 ELSE 0 END) AS v_enum_w,
    sum(CASE WHEN NOT (o_totalprice > {STRICT_PRICE_FLOOR}) THEN 1 ELSE 0 END) AS v_gt_w,
    sum(CASE WHEN NOT (regexp_matches(o_orderpriority, '{STRICT_PRIORITY_RE}')) THEN 1 ELSE 0 END) AS v_rx_w,
    {nn_counts_w} AS nn_keys_w
  FROM orders
"""
    # the constant +1 warning / forced-warn floor: the parquet o_orderdate is
    # TIMESTAMP_NTZ while the contract declares timestamp — a type-widening
    # warning by design (types.py), present at every scale factor.
    read_row = """
SELECT 'orders_read' AS dataset_id, 'read' AS operation,
  'driver.orders' AS contract_id,
  CASE WHEN nn_keys > 0 THEN 'block' ELSE 'warn' END AS status,
  nn_keys = 0 AS ok,
  CAST(nn_keys AS BIGINT) AS n_errors,
  CAST(1 + CASE WHEN v_uq > 0 THEN 1 ELSE 0 END
     + CASE WHEN v_enum_r > 0 THEN 1 ELSE 0 END
     + CASE WHEN v_gt_r > 0 THEN 1 ELSE 0 END
     + CASE WHEN v_rx_r > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_warnings,
  CAST(v_uq + v_enum_r + v_gt_r + v_rx_r AS BIGINT) AS blocking_violations,
  CAST(rc AS BIGINT) AS row_count,
  false AS draft_created,
  CAST(0 AS BIGINT) AS n_draft_changes,
  CAST(0 AS BIGINT) AS n_added_columns
FROM m
"""
    # on WRITE every violated non-optional rule key is an error; not-null
    # failures on the strict contract's 4 declared columns escalate too.
    write_row = """
SELECT 'orders_write' AS dataset_id, 'write' AS operation,
  'driver.orders.strict' AS contract_id,
  CASE WHEN (nn_keys_w
           + CASE WHEN v_uq > 0 THEN 1 ELSE 0 END
           + CASE WHEN v_enum_w > 0 THEN 1 ELSE 0 END
           + CASE WHEN v_gt_w > 0 THEN 1 ELSE 0 END) > 0 THEN 'block'
       WHEN v_rx_w > 0 THEN 'warn'
       ELSE 'ok' END AS status,
  (nn_keys_w
 + CASE WHEN v_uq > 0 THEN 1 ELSE 0 END
 + CASE WHEN v_enum_w > 0 THEN 1 ELSE 0 END
 + CASE WHEN v_gt_w > 0 THEN 1 ELSE 0 END) = 0 AS ok,
  CAST(nn_keys_w
     + CASE WHEN v_uq > 0 THEN 1 ELSE 0 END
     + CASE WHEN v_enum_w > 0 THEN 1 ELSE 0 END
     + CASE WHEN v_gt_w > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_errors,
  CAST(CASE WHEN v_rx_w > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_warnings,
  CAST(v_uq + v_enum_w + v_gt_w AS BIGINT) AS blocking_violations,
  CAST(rc AS BIGINT) AS row_count,
  false AS draft_created,
  CAST(0 AS BIGINT) AS n_draft_changes,
  CAST(0 AS BIGINT) AS n_added_columns
FROM m
"""
    # draft changes: one relaxed_required per null-violated declared column,
    # widened enum + dropped gt rule + dropped regex rule (one per VIOLATED
    # rule — any severity) + the 2 observed extra columns (o_custkey,
    # o_orderdate are absent from the strict contract's schema); unique
    # violations alter no flags and produce no change entries. A draft is
    # created iff the write BLOCKS (errors from rules OR not-null keys).
    draft_row = write_row.replace("'orders_write'", "'orders_draft'").replace(
        """  false AS draft_created,
  CAST(0 AS BIGINT) AS n_draft_changes,
  CAST(0 AS BIGINT) AS n_added_columns""",
        """  (nn_keys_w + CASE WHEN v_uq > 0 THEN 1 ELSE 0 END
 + CASE WHEN v_enum_w > 0 THEN 1 ELSE 0 END
 + CASE WHEN v_gt_w > 0 THEN 1 ELSE 0 END) > 0 AS draft_created,
  CAST(CASE WHEN (nn_keys_w + v_uq + v_enum_w + v_gt_w) > 0 THEN
    2 + nn_keys_w
      + CASE WHEN v_enum_w > 0 THEN 1 ELSE 0 END
      + CASE WHEN v_gt_w > 0 THEN 1 ELSE 0 END
      + CASE WHEN v_rx_w > 0 THEN 1 ELSE 0 END
  ELSE 0 END AS BIGINT) AS n_draft_changes,
  CAST(CASE WHEN (nn_keys_w + v_uq + v_enum_w + v_gt_w) > 0 THEN 2 ELSE 0 END
    AS BIGINT) AS n_added_columns""",
    )
    return (
        f"WITH m AS ({base})\n{read_row}\nUNION ALL\n{write_row}"
        f"\nUNION ALL\n{draft_row}"
    )


GOVERNANCE_QUERIES = {
    "governance_verdict_orders": q_governance_verdict_orders,
    "profile_orders": q_profile_orders,
}

GOVERNANCE_ORACLES = {
    "governance_verdict_orders": _governance_verdict_sql(),
    "profile_orders": _profile_orders_sql(),
}
