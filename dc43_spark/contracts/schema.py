"""Contract <-> Spark schema materialisation.

ref: dc43-integrations spark/contracts.py:193-254
(``dataframe_schema_from_contract``) and spark/data_quality.py:78-91
(``schema_snapshot``).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from dc43_spark.contracts.model import Contract, SchemaProperty
from dc43_spark.contracts.types import odcs_to_spark_type, spark_to_odcs_type


def property_to_spark_type(prop: SchemaProperty) -> T.DataType:
    """Build the Spark type for one property, recursing into struct/array."""
    if prop.properties:  # nested struct
        return T.StructType(
            [
                T.StructField(p.name, property_to_spark_type(p), nullable=not p.required)
                for p in prop.properties
            ]
        )
    if prop.items is not None:  # array
        return T.ArrayType(property_to_spark_type(prop.items), containsNull=not prop.items.required)
    return odcs_to_spark_type(prop.physical_type)


def contract_to_struct_type(contract: Contract) -> T.StructType:
    """Full Spark schema for the contract's canonical schema object."""
    return T.StructType(
        [
            T.StructField(p.name, property_to_spark_type(p), nullable=not p.required)
            for p in contract.schema_object.properties
        ]
    )


def schema_snapshot(df: DataFrame) -> dict[str, dict[str, Any]]:
    """Observed schema -> ``{name: {backend_type, odcs_type, nullable}}``.

    Same payload shape as the reference's snapshot (data_quality.py:78-91) so
    evaluation logic downstream is drop-in comparable.
    """
    out: dict[str, dict[str, Any]] = {}
    for f in df.schema.fields:
        out[f.name] = {
            "backend_type": f.dataType.simpleString(),
            "odcs_type": spark_to_odcs_type(f.dataType),
            "nullable": f.nullable,
        }
    return out
