"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, and an
order-insensitive value comparison (column-name-sorted, stringified rows).

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from decimal import Decimal

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, Decimal):
        # VERBATIM — no normalize(). The driver's hasher distinguishes
        # '123.40' from '123.4'; a lenient local gate green-lights queries
        # the driver then hash-fails (r1 lesson: 8 such false-greens).
        return str(v)
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if v is None:
        return "NULL"
    return str(v)


def _rowset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)


# --- dtype families -------------------------------------------------------
# The driver's value hash is dtype-sensitive: a DuckDB HUGEINT (int128)
# column hash-diverges from Spark's BIGINT even when every value is equal
# (r8 lesson: `ivm_cdc_orders` was rows/schema-green locally and hash-red in
# the driver because one oracle's SUM wasn't CAST to BIGINT). Stringified
# comparison is blind to that, so parity also requires each name-matched
# column to land in the same type FAMILY on both engines.

_SPARK_FAMILY = {
    "bigint": "BIGINT", "long": "BIGINT", "int": "INTEGER",
    "integer": "INTEGER", "smallint": "SMALLINT", "tinyint": "TINYINT",
    "double": "DOUBLE", "float": "FLOAT", "string": "VARCHAR",
    "boolean": "BOOLEAN", "date": "DATE", "binary": "BLOB",
    "timestamp": "TIMESTAMP", "timestamp_ntz": "TIMESTAMP",
}

_DUCK_FAMILY = {
    "BIGINT": "BIGINT", "INTEGER": "INTEGER", "SMALLINT": "SMALLINT",
    "TINYINT": "TINYINT", "UBIGINT": "HUGEINT", "UINTEGER": "BIGINT",
    "DOUBLE": "DOUBLE", "FLOAT": "FLOAT", "VARCHAR": "VARCHAR",
    "BOOLEAN": "BOOLEAN", "DATE": "DATE", "BLOB": "BLOB",
    "TIMESTAMP": "TIMESTAMP", "TIMESTAMP WITH TIME ZONE": "TIMESTAMP",
    "TIMESTAMP_NS": "TIMESTAMP", "TIMESTAMP_MS": "TIMESTAMP",
    # int128: Spark has no corresponding type — always a mismatch, which is
    # the point (bare SUM / integer `//` over BIGINT in DuckDB yields this)
    "HUGEINT": "HUGEINT",
}


def _spark_family(simple: str) -> str:
    simple = simple.lower()
    if simple.startswith("decimal"):
        # precision/scale differences are value-visible and caught by the
        # stringified row compare; the family check only needs the kind
        return "DECIMAL"
    if simple.startswith("array<") and simple.endswith(">"):
        return _spark_family(simple[6:-1]) + "[]"
    return _SPARK_FAMILY.get(simple, simple.upper())


def _duck_family(type_str: str) -> str:
    type_str = type_str.upper()
    if type_str.startswith("DECIMAL"):
        return "DECIMAL"
    if type_str.endswith("[]"):
        return _duck_family(type_str[:-2]) + "[]"
    return _DUCK_FAMILY.get(type_str, type_str)


def dtype_problems(sdf, rel) -> list:
    """Name-matched column type-family mismatches between Spark and DuckDB."""
    spark_types = {f.name: _spark_family(f.dataType.simpleString())
                   for f in sdf.schema.fields}
    problems = []
    for name, dtype in zip(rel.columns, rel.types):
        want = spark_types.get(name)
        got = _duck_family(str(dtype))
        if want is not None and want != got:
            problems.append(
                f"dtype mismatch on '{name}': spark {want} vs duckdb {got}"
                + (" (wrap the oracle expression in CAST(... AS BIGINT))"
                   if got == "HUGEINT" else "")
            )
    return problems


def duckdb_connection(sf_dir: str):
    """DuckDB connection with the driver's table views registered."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def check_query(spark, con, fn, sql, sf_dir: str) -> list:
    """Compare one queries() entry against its oracle.

    Returns a list of problem strings (empty = parity). Mirrors the driver's
    gate: row count, column-name set, and order-insensitive value comparison
    over column-name-sorted stringified rows. With ``sql=None`` only checks
    that the Spark side executes (rows-only, like the driver's weak check).
    """
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        return []
    rel = con.sql(sql)
    dcols = list(rel.columns)
    drows = rel.fetchall()
    problems = []
    if len(srows) != len(drows):
        problems.append(f"row count {len(srows)} vs {len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns {sorted(scols)} vs {sorted(dcols)}")
    problems += dtype_problems(sdf, rel)
    if not problems:
        a, b = _rowset(scols, srows), _rowset(dcols, drows)
        if a != b:
            diff = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), -1)
            problems.append(
                f"values differ (first diff at sorted idx {diff}):\n"
                f"    spark : {a[diff][:300]}\n    duckdb: {b[diff][:300]}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("parity")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb_connection(sf_dir)

    # extras (consolidated out of the driver's 50 slots) are checkable
    # here too; registered gates win on name clashes
    queries = {**e.extra_queries(), **e.queries()}
    oracles = {**e.extra_oracle_sql(), **e.oracle_sql()}
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sql = oracles.get(name)
        try:
            problems = check_query(spark, con, fn, sql, sf_dir)
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if problems:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
        elif sql is None:
            print(f"ok?  {name} ({dt:.1f}s): no oracle — rows-only check")
        else:
            print(f"PASS {name} ({dt:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
