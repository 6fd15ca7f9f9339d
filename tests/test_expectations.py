from __future__ import annotations

from dc43_spark.contracts import Contract, QualityRule, SchemaObject, SchemaProperty
from dc43_spark.expectations import expectation_plan, expectation_specs, sql_predicate
from dc43_spark.expectations.compiler import row_predicates


def full_rule_contract() -> Contract:
    """FIXTURES.md F2 — one of every rule kind over driver `customer`."""
    return Contract(
        id="test.customer",
        version="0.1.0",
        schema_objects=[
            SchemaObject(
                name="customer",
                properties=[
                    SchemaProperty("c_custkey", "bigint", required=True, unique=True),
                    SchemaProperty(
                        "c_name", "string", required=True,
                        quality=[QualityRule("regex", r"^Customer#[0-9]+$")],
                    ),
                    SchemaProperty(
                        "c_acctbal", "double", required=True,
                        quality=[QualityRule("ge", -1000.0), QualityRule("le", 10000.0)],
                    ),
                    SchemaProperty(
                        "c_mktsegment", "string", required=True,
                        quality=[
                            QualityRule(
                                "enum",
                                ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
                            )
                        ],
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


def test_predicates():
    assert sql_predicate("not_null", "c") == "`c` IS NOT NULL"
    assert sql_predicate("gt", "amount", 0.0) == "`amount` > 0.0"
    assert sql_predicate("ge", "x", 5) == "`x` >= 5"
    assert sql_predicate("lt", "x", 5) == "`x` < 5"
    assert sql_predicate("le", "x", 5) == "`x` <= 5"
    assert sql_predicate("enum", "cur", ["EUR", "USD"]) == "`cur` IN ('EUR', 'USD')"
    assert sql_predicate("regex", "name", "^a.*$") == "`name` RLIKE '^a.*$'"
    assert sql_predicate("unique", "id") is None
    assert sql_predicate("enum", "c", ["O'Brien"]) == "`c` IN ('O''Brien')"


def test_spec_keys_match_reference_naming():
    specs = expectation_specs(full_rule_contract())
    keys = [s.key for s in specs]
    # exact key set from FIXTURES.md F2 (reference data_quality.py:136 naming)
    assert keys == [
        "not_null_c_custkey",
        "unique_c_custkey",
        "not_null_c_name",
        "regex_c_name",
        "not_null_c_acctbal",
        "ge_c_acctbal",
        "le_c_acctbal",
        "not_null_c_mktsegment",
        "enum_c_mktsegment",
        "ge_c_nationkey",
        "query_deep_debt",
    ]


def test_optional_flag_from_severity():
    specs = {s.key: s for s in expectation_specs(full_rule_contract())}
    assert specs["ge_c_nationkey"].optional is True
    assert specs["ge_c_acctbal"].optional is False


def test_plan_serialisation():
    plan = expectation_plan(full_rule_contract())
    entry = next(e for e in plan if e["key"] == "enum_c_mktsegment")
    assert entry["rule"] == "enum"
    assert entry["predicate"].startswith("`c_mktsegment` IN (")
    q = next(e for e in plan if e["key"] == "query_deep_debt")
    assert q["predicate"] is None and "SELECT" in q["query"]


def test_row_predicates_excludes_metric_only():
    specs = expectation_specs(full_rule_contract())
    preds = row_predicates(specs)
    assert "unique_c_custkey" not in preds
    assert "query_deep_debt" not in preds
    assert "ge_c_nationkey" not in preds  # optional excluded by default
    assert "ge_c_nationkey" in row_predicates(specs, include_optional=True)


def test_dedup_by_key():
    c = Contract(
        id="t.d", version="0.1.0",
        schema_objects=[
            SchemaObject(
                name="d",
                properties=[
                    SchemaProperty(
                        "x", "int", required=True, unique=True,
                        quality=[QualityRule("unique")],  # duplicate unique rule
                    )
                ],
            )
        ],
    )
    keys = [s.key for s in expectation_specs(c)]
    assert keys == ["not_null_x", "unique_x"]
