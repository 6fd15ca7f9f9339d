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
