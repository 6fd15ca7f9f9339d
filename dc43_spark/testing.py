"""Contract-driven synthetic DataFrame generation.

Rebuilds the reference's test-data factory (dc43-integrations
integrations/testing/datasets.py:204+) Spark-first: instead of a driver-side
Faker loop materialising Python rows, build ``spark.range(n)`` plus
deterministic column expressions honouring the contract's types, enums,
numeric bounds, and required flags. Fully distributed (no driver data), so
the same generator that seeds a unit test can produce a 10 TB load-test
dataset by changing ``n_rows``.

Determinism: every pseudo-random draw is ``xxhash64(id, seed, col)`` —
same seed, same rows, on any cluster layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dc43_spark.contracts.model import Contract, SchemaProperty


def _draw(seed: int, salt: str, mod: int) -> Column:
    """Uniform-ish deterministic integer in [0, mod) per row."""
    return F.pmod(F.xxhash64(F.col("_id"), F.lit(seed), F.lit(salt)), F.lit(mod))


def _numeric_bounds(prop: SchemaProperty) -> tuple[float | None, float | None]:
    lo = hi = None
    for rule in prop.quality:
        if rule.rule == "gt":
            lo = float(rule.value) + 1e-6
        elif rule.rule == "ge":
            lo = float(rule.value)
        elif rule.rule == "lt":
            hi = float(rule.value) - 1e-6
        elif rule.rule == "le":
            hi = float(rule.value)
    return lo, hi


def _column_expr(prop: SchemaProperty, seed: int, *, unique_base: bool) -> Column:
    t = prop.physical_type.lower()
    enum_rule = next((r for r in prop.quality if r.rule == "enum"), None)
    if enum_rule:
        values = list(enum_rule.value)
        arr = F.array(*[F.lit(v) for v in values])
        pick = arr[_draw(seed, prop.name, len(values)).cast("int")]
        return pick.cast("string") if t in ("string", "varchar") else pick

    if t in ("bigint", "long", "int", "integer", "smallint", "short", "tinyint", "byte"):
        lo, hi = _numeric_bounds(prop)
        if unique_base or any(r.rule == "unique" for r in prop.quality):
            base = F.col("_id") + F.lit(int(lo) if lo is not None else 1)
        else:
            span = int((hi - lo) if (lo is not None and hi is not None) else 1_000_000)
            base = _draw(seed, prop.name, max(span, 1)) + F.lit(int(lo or 0))
        return base.cast(
            {"smallint": "smallint", "short": "smallint", "tinyint": "tinyint",
             "byte": "tinyint", "int": "int", "integer": "int"}.get(t, "bigint")
        )
    if t in ("double", "float", "real") or t.startswith("decimal") or t in ("numeric",):
        lo, hi = _numeric_bounds(prop)
        lo = 0.0 if lo is None else lo
        hi = lo + 1000.0 if hi is None else hi
        frac = _draw(seed, prop.name, 1_000_000) / F.lit(1_000_000.0)
        val = F.lit(lo) + frac * F.lit(hi - lo)
        if t.startswith("decimal") or t == "numeric":
            return val.cast(prop.physical_type if "(" in t else "decimal(18,4)")
        return val.cast("float" if t in ("float", "real") else "double")
    if t in ("boolean", "bool"):
        return (_draw(seed, prop.name, 2) == 1).alias(prop.name)
    if t == "date":
        return F.date_add(F.lit("2020-01-01").cast("date"), _draw(seed, prop.name, 3650).cast("int"))
    if t == "timestamp":
        base = F.lit("2020-01-01 00:00:00").cast("timestamp")
        return F.timestamp_seconds(
            F.unix_timestamp(base) + _draw(seed, prop.name, 365 * 24 * 3600)
        )
    if t == "binary":
        return F.to_binary(F.md5(F.concat(F.lit(prop.name), F.col("_id"))), F.lit("hex"))
    # strings and anything regex-constrained: name-prefixed deterministic text
    return F.concat(F.lit(f"{prop.name}_"), F.col("_id").cast("string"))


def synthetic_dataframe(
    spark: SparkSession,
    contract: Contract,
    n_rows: int = 100,
    *,
    seed: int = 42,
    null_fraction: float = 0.0,
    violation_fraction: float = 0.0,
) -> DataFrame:
    """Rows that satisfy ``contract`` (ref datasets.py:204+ semantics).

    ``null_fraction`` nulls out that share of each NON-required column;
    ``violation_fraction`` deliberately corrupts that share of rows in
    rule-carrying columns (nulls in required columns, out-of-enum strings,
    below-bound numerics) — handy for exercising violation strategies."""
    obj = contract.schema_objects[0]
    df = spark.range(n_rows).withColumnRenamed("id", "_id")
    denom = 1_000_000
    for prop in obj.properties:
        expr = _column_expr(prop, seed, unique_base=False)
        if violation_fraction > 0 and (prop.required or prop.quality):
            bad = _draw(seed, f"viol_{prop.name}", denom) < int(violation_fraction * denom)
            t = prop.physical_type.lower()
            if prop.required:
                corrupt = F.lit(None)
            elif any(r.rule == "enum" for r in prop.quality):
                corrupt = F.lit("__INVALID__")
            elif any(r.rule in ("gt", "ge") for r in prop.quality):
                lo, _ = _numeric_bounds(prop)
                corrupt = F.lit((lo or 0.0) - 1000.0)
            else:
                corrupt = F.lit(None)
            expr = F.when(bad, corrupt).otherwise(expr)
        elif null_fraction > 0 and not prop.required:
            isnull = _draw(seed, f"null_{prop.name}", denom) < int(null_fraction * denom)
            expr = F.when(isnull, F.lit(None)).otherwise(expr)
        df = df.withColumn(prop.name, expr)
    return df.select(*[p.name for p in obj.properties])
