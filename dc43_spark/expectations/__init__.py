from dc43_spark.expectations.compiler import (
    ExpectationSpec,
    expectation_plan,
    expectation_specs,
    sql_predicate,
)

__all__ = ["ExpectationSpec", "expectation_plan", "expectation_specs", "sql_predicate"]
