"""DQ-engine seam: registry + native/GE/Soda adapters agree on verdicts
(ref dc43-service-backends data_quality/backend/engines.py:27-212)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dc43_spark.contracts.schema import schema_snapshot
from dc43_spark.engine.engines import (
    ENGINE_REGISTRY,
    GreatExpectationsEngine,
    NativeDQEngine,
    ObservationPayload,
    SodaEngine,
    ge_summary_from_metrics,
    get_engine,
)
from dc43_spark.engine.metrics import compute_metrics
from dc43_spark.engine.validation import apply_contract
from dc43_spark.showcase import orders_contract


def _payload(df, contract):
    # evaluate the contract-aligned frame (the driver parquet stores
    # timestamp_ntz; alignment casts it to the contract's timestamp)
    aligned = apply_contract(df, contract)
    return ObservationPayload(
        schema=schema_snapshot(aligned), metrics=compute_metrics(aligned, contract)
    )


def test_registry_resolves_all_engines():
    assert sorted(ENGINE_REGISTRY) == ["great_expectations", "native", "soda"]
    for name in ENGINE_REGISTRY:
        engine = get_engine(name)
        assert hasattr(engine, "evaluate") and hasattr(engine, "describe_expectations")


def test_native_engine_matches_direct_evaluation(orders_df):
    contract = orders_contract()
    payload = _payload(orders_df, contract)
    result = NativeDQEngine(operation="write").evaluate(contract, payload)
    assert result.status == "ok"
    assert result.details["expectation_plan"]  # plan attached (ref merge_details)
    assert "gt_o_totalprice" in result.details["expectation_predicates"]


def test_native_engine_blocks_on_violations(orders_df):
    contract = orders_contract()
    bad = orders_df.withColumn(
        "o_totalprice", F.when(F.col("o_orderkey") % 100 == 0, -5.0).otherwise(F.col("o_totalprice"))
    )
    result = NativeDQEngine(operation="write").evaluate(contract, _payload(bad, contract))
    assert result.status == "block" and not result.ok


def test_ge_adapter_agrees_with_native_on_real_metrics(orders_df):
    """End-to-end seam proof: our single-pass metrics -> GE-style summary ->
    GE adapter verdict must match the native engine's verdict."""
    contract = orders_contract()
    native = NativeDQEngine(operation="write")
    ge = GreatExpectationsEngine()
    for df in (
        orders_df,
        orders_df.withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 50 == 0, "X").otherwise(F.col("o_orderstatus")),
        ),
    ):
        payload = _payload(df, contract)
        summary = ge_summary_from_metrics(contract, payload.metrics)
        ge_payload = ObservationPayload(
            schema=payload.schema,
            metrics={**payload.metrics, "great_expectations": summary},
        )
        assert (
            ge.evaluate(contract, ge_payload).status
            == native.evaluate(contract, payload).status
        )


def test_ge_adapter_unknown_without_summary(orders_df):
    contract = orders_contract()
    result = GreatExpectationsEngine().evaluate(contract, ObservationPayload())
    assert result.status == "unknown"
    assert result.details["reason"] == "missing-great-expectations-summary"


def test_ge_adapter_explicit_failure_reason():
    contract = orders_contract()
    payload = ObservationPayload(
        metrics={
            "great_expectations": {
                "success": False,
                "exception_info": {"exception_message": "boom"},
            }
        }
    )
    result = GreatExpectationsEngine().evaluate(contract, payload)
    assert result.status == "block" and "boom" in result.errors[0]


def test_soda_adapter_outcomes():
    contract = orders_contract()
    soda = SodaEngine()
    assert soda.evaluate(contract, ObservationPayload()).status == "unknown"
    ok = ObservationPayload(metrics={"soda": {"status": "passed"}})
    assert soda.evaluate(contract, ok).status == "ok"
    bad = ObservationPayload(metrics={"soda": {"outcome": "block", "error": "row count drop"}})
    result = soda.evaluate(contract, bad)
    assert result.status == "block" and "row count drop" in result.errors[0]


def test_suite_file_overrides_describe_expectations(tmp_path):
    contract = orders_contract()
    suite = [{"expectation_type": "expect_column_values_to_not_be_null", "column": "o_orderkey"}]
    path = tmp_path / "suite.json"
    path.write_text(json.dumps(suite))
    engine = GreatExpectationsEngine(suite_path=path)
    assert list(engine.describe_expectations(contract)) == suite
    # without a suite file the compiled contract plan is the description
    assert GreatExpectationsEngine().describe_expectations(contract) == (
        NativeDQEngine().describe_expectations(contract)
    )
