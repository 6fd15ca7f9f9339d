"""ODCS <-> Spark type mapping.

Mirrors the reference's canonical type table (ref: dc43-integrations
spark/data_quality.py:20-75 ``SPARK_TYPES`` and the synonym table in
data_quality/backend/engine.py:13-34) and FIXES its known gap: the reference
drops decimal precision/scale (spark/contracts.py:236-237); here
``decimal(p,s)`` is parsed properly.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import types as T

_DECIMAL_RE = re.compile(r"^(?:decimal|numeric)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?$")

# canonical ODCS name -> Spark type factory
_SIMPLE_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "bigint": T.LongType(),
    "int": T.IntegerType(),
    "smallint": T.ShortType(),
    "tinyint": T.ByteType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "binary": T.BinaryType(),
}

# alias -> canonical (ref engine.py:13-34)
_ALIASES: dict[str, str] = {
    "varchar": "string",
    "text": "string",
    "str": "string",
    "long": "bigint",
    "integer": "int",
    "short": "smallint",
    "byte": "tinyint",
    "real": "float",
    "bool": "boolean",
    "datetime": "timestamp",
    "number": "double",
}


def canonical_type(name: str) -> str:
    """Normalise an ODCS/user-supplied type name to its canonical form.

    ``decimal(12,2)`` canonicalises to itself (precision kept); bare
    ``decimal``/``numeric`` to ``decimal(10,0)`` (Spark default).
    """
    n = (name or "string").strip().lower()
    m = _DECIMAL_RE.match(n)
    if m:
        p = int(m.group(1)) if m.group(1) else 10
        s = int(m.group(2)) if m.group(2) else 0
        return f"decimal({p},{s})"
    return _ALIASES.get(n, n)


def odcs_to_spark_type(name: str) -> T.DataType:
    """Map an ODCS physical/logical type name to a Spark DataType."""
    canon = canonical_type(name)
    m = _DECIMAL_RE.match(canon)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2) or 0))
    dt = _SIMPLE_TYPES.get(canon)
    if dt is None:
        raise ValueError(f"unsupported ODCS type: {name!r} (canonical {canon!r})")
    return dt


def spark_to_odcs_type(dtype: T.DataType) -> str:
    """Map a Spark DataType back to the canonical ODCS name (ref :65-75)."""
    if isinstance(dtype, T.DecimalType):
        return f"decimal({dtype.precision},{dtype.scale})"
    reverse = {
        T.StringType: "string",
        T.LongType: "bigint",
        T.IntegerType: "int",
        T.ShortType: "smallint",
        T.ByteType: "tinyint",
        T.FloatType: "float",
        T.DoubleType: "double",
        T.BooleanType: "boolean",
        T.DateType: "date",
        T.TimestampType: "timestamp",
        T.TimestampNTZType: "timestamp_ntz",
        T.BinaryType: "binary",
    }
    name = reverse.get(type(dtype))
    if name:
        return name
    if isinstance(dtype, T.ArrayType):
        return f"array<{spark_to_odcs_type(dtype.elementType)}>"
    if isinstance(dtype, T.StructType):
        return "object"
    return dtype.simpleString()


def types_compatible(expected: str, observed: str, *, strict: bool = False) -> bool:
    """Type check by canonical-name comparison (ref engine.py:232-253).

    Non-strict mode tolerates safe widening (int->bigint, float->double,
    anything->string is NOT tolerated — that mirrors the reference, which
    compares canonical names only and flags mismatches).
    """
    ce, co = canonical_type(expected), canonical_type(observed)
    if ce == co:
        return True
    if strict:
        return False
    widening: dict[str, set[str]] = {
        "bigint": {"int", "smallint", "tinyint"},
        "int": {"smallint", "tinyint"},
        "smallint": {"tinyint"},
        "double": {"float"},
        # Spark 4 reads parquet TIMESTAMP (isAdjustedToUTC=false) as
        # TIMESTAMP_NTZ; the two differ only in zone semantics, so either
        # satisfies a contract declaring the other — surfaced as a widening
        # warning by evaluate_contract, never a block.
        "timestamp": {"timestamp_ntz"},
        "timestamp_ntz": {"timestamp"},
    }
    return co in widening.get(ce, set())


def parse_decimal(name: str) -> Optional[tuple[int, int]]:
    m = _DECIMAL_RE.match((name or "").strip().lower())
    if not m:
        return None
    return (int(m.group(1) or 10), int(m.group(2) or 0))
