from dc43_spark.contracts.model import (
    Contract,
    QualityRule,
    SchemaObject,
    SchemaProperty,
    contract_from_dict,
    contract_to_dict,
)
from dc43_spark.contracts.schema import (
    contract_to_struct_type,
    property_to_spark_type,
    schema_snapshot,
)
from dc43_spark.contracts.types import (
    canonical_type,
    odcs_to_spark_type,
    spark_to_odcs_type,
)

__all__ = [
    "Contract",
    "QualityRule",
    "SchemaObject",
    "SchemaProperty",
    "contract_from_dict",
    "contract_to_dict",
    "contract_to_struct_type",
    "property_to_spark_type",
    "schema_snapshot",
    "canonical_type",
    "odcs_to_spark_type",
    "spark_to_odcs_type",
]
