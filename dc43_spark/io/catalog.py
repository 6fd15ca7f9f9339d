"""Named-table catalog over snaplog: one root directory, one table per
name, and temp-view registration so ``spark.sql`` speaks to the format.

The reference addresses datasets by contract-derived paths (ref
dc43-integrations spark/io locators); this adds the warehouse-style
naming layer a SQL user expects: ``catalog.table("orders")`` for the
programmatic surface, ``catalog.sql("SELECT ... FROM orders JOIN
customers ...")`` for the declarative one. Views read through the
registered snaplog data source (io/snaplog_source.py), so Catalyst
keeps filter pushdown -> stats/partition pruning on every view, and
any spark.sql plan over the views composes with the rest of the
session (joins against parquet, UDFs, window functions).

Driver cost: listing is one readdir; registration is one handle per
table, no data IO. No central metastore process — the filesystem IS
the catalog, which is the same deployment story as the table format
itself (object store + conditional-put claimer)."""

from __future__ import annotations

import os
import re
import shutil
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from dc43_spark.io.snaplog import SnaplogTable
from dc43_spark.localdf import local_df

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class SnaplogCatalog:
    """Handle on a catalog root; tables live at ``<root>/<name>``."""

    def __init__(self, spark: SparkSession, root: str, **table_defaults) -> None:
        self.spark = spark
        self.root = os.path.abspath(root.rstrip("/"))
        self.table_defaults = table_defaults
        os.makedirs(self.root, exist_ok=True)

    def _path(self, name: str) -> str:
        if not _NAME_RE.match(name):
            raise ValueError(f"table name {name!r} must be an identifier")
        return os.path.join(self.root, name)

    def format_of(self, name: str) -> Optional[str]:
        """``"snaplog"`` / ``"delta"`` (a ``_delta_log`` directory — read
        through the jar-less protocol reader) / None when absent. The
        catalog root can hold BOTH formats side by side; SQL spans them."""
        path = self._path(name)
        if SnaplogTable.is_snaplog(path):
            return "snaplog"
        if os.path.isdir(os.path.join(path, "_delta_log")):
            return "delta"
        return None

    def table(self, name: str, **overrides) -> SnaplogTable:
        """Snaplog handle for ``name`` (created lazily on first write,
        like any snaplog path). ``overrides`` beat the catalog-level
        defaults. Delta tables get ``delta_table``."""
        if self.format_of(name) == "delta":
            raise ValueError(
                f"{name!r} is a Delta table; use delta_table({name!r})"
            )
        kw = {**self.table_defaults, **overrides}
        return SnaplogTable(self.spark, self._path(name), **kw)

    def delta_table(self, name: str):
        """Jar-less Delta handle for ``name`` (io/delta_log.py)."""
        from dc43_spark.io.delta_log import DeltaLogTable

        if self.format_of(name) != "delta":
            raise ValueError(f"no Delta table {name!r} in {self.root}")
        return DeltaLogTable(self.spark, self._path(name))

    def tables(self) -> list:
        return sorted(
            n
            for n in os.listdir(self.root)
            if _NAME_RE.match(n) and self.format_of(n) is not None
        )

    def exists(self, name: str) -> bool:
        return self.format_of(name) is not None

    def drop(self, name: str, *, purge: bool = False) -> None:
        """Remove a table (either format). Data deletion is explicit:
        without ``purge`` a table that still holds commits is refused."""
        path = self._path(name)
        if self.format_of(name) is None:
            raise ValueError(f"no table {name!r} in {self.root}")
        if not purge:
            raise ValueError(
                f"drop {name!r} would delete its data and history; pass "
                "purge=True to confirm"
            )
        shutil.rmtree(path)

    def register_views(
        self, names: Optional[Sequence[str]] = None, *, prefix: str = ""
    ) -> list:
        """Create one temp view per table through the snaplog data source
        (pushdown-capable); returns the registered view names. Views are
        session-scoped and head-pinned at FIRST USE per query — pin a
        version explicitly with ``spark.read.format("snaplog")
        .option("versionAsOf", n)`` when you need repeatable reads."""
        from dc43_spark.io.snaplog_source import SnaplogDataSource

        self.spark.dataSource.register(SnaplogDataSource)
        out = []
        for name in names if names is not None else self.tables():
            path = self._path(name)
            fmt = self.format_of(name)
            if fmt is None:
                raise ValueError(f"no table {name!r} in {self.root}")
            if fmt == "delta":
                from dc43_spark.io.delta_source import DeltaLogDataSource

                self.spark.dataSource.register(DeltaLogDataSource)
                source = "deltalog"
            else:
                source = "snaplog"
            view = f"{prefix}{name}"
            self.spark.read.format(source).load(path).createOrReplaceTempView(
                view
            )
            out.append(view)
        return out

    # ---------------- SQL entry point

    def _referenced_tables(self, query: str) -> list:
        """Catalog tables whose names appear as identifiers in ``query``.
        Conservative overapproximation (a column sharing a table's name
        registers one extra view — a metadata handle, no data IO); the
        win is the common case: a single-table query on a 1000-table
        catalog registers ONE view, not 1000."""
        words = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", query))
        return [t for t in self.tables() if t in words]

    def sql(self, query: str, *, tables: Optional[Sequence[str]] = None) -> DataFrame:
        """One SQL entry point over the catalog. Queries register ONLY the
        referenced tables as pushdown-capable views (pass ``tables=`` to
        pin the set explicitly); DDL/DML statements route to the table
        API:

        - ``CREATE TABLE [IF NOT EXISTS] t (col type, ...)`` — empty table
        - ``CREATE TABLE [IF NOT EXISTS] t [PARTITIONED BY (c, ...)] AS
          SELECT ...`` — CTAS through a snaplog overwrite
        - ``INSERT INTO t SELECT ...`` — transactional append
        - ``DELETE FROM t [WHERE pred]`` — row-level delete (snaplog
          copy-on-write; jar-less deletion-vector/COW on Delta tables)
        - ``UPDATE t SET col = expr[, ...] [WHERE pred]`` — row-level
          update on either format (generated columns recompute; SET on
          one refuses)
        - ``MERGE INTO t t USING <table | (subquery)> s ON t.k = s.k
          [AND ...]`` followed by ANY NUMBER of
          ``WHEN MATCHED [AND p] THEN DELETE | UPDATE SET * |
          UPDATE SET c = expr, ...``, ``WHEN NOT MATCHED [AND p] THEN
          INSERT * | INSERT (cols) VALUES (exprs)``, and ``WHEN NOT
          MATCHED BY SOURCE [AND p] THEN DELETE | UPDATE SET c = expr``
          clauses — delta-spark's full MULTI-clause surface (r12),
          evaluated first-match-wins per kind in statement order
          (standard SQL MERGE); only the last clause of a kind may omit
          ``AND p``. Aliases are fixed ``t``/``s``; ON takes equality
          conjuncts on shared key names
        - ``DROP TABLE [IF EXISTS] t PURGE`` — drop (PURGE is mandatory,
          mirroring ``drop()``'s explicit-data-deletion contract)
        - maintenance (r11, both formats): ``OPTIMIZE t [ZORDER BY
          (c, ...)]``, ``VACUUM t [RETAIN n HOURS] [DRY RUN]`` (returns
          (table, files, dry_run)), ``RESTORE TABLE t TO VERSION AS OF n
          | TO TIMESTAMP AS OF 'iso'``, ``DESCRIBE HISTORY t`` (returns
          (version, timestamp, operation) rows)
        - ``ALTER TABLE t ...`` (r11): ``RENAME COLUMN a TO b`` /
          ``DROP COLUMN c`` / ``ADD CONSTRAINT n CHECK (expr)`` /
          ``DROP CONSTRAINT [IF EXISTS] n`` on both formats;
          ``ALTER COLUMN c TYPE <wider>`` (protocol type widening) and
          ``SET/UNSET TBLPROPERTIES (...)`` on Delta tables

        DDL/DML return a one-row status frame (table, version)."""
        m = _DDL_CREATE_AS.match(query)
        if m:
            if_not_exists, name, part, select = m.groups()
            if self.exists(name):
                if if_not_exists:
                    return self._status(name, self.table(name).version())
                raise ValueError(f"table {name!r} already exists")
            df = self.sql(select, tables=tables)
            spec = [c.strip() for c in part.split(",")] if part else None
            v = self.table(name).write(df, mode="overwrite", partition_by=spec)
            return self._status(name, v)
        m = _DDL_CREATE.match(query)
        if m:
            if_not_exists, name, cols = m.groups()
            if self.exists(name):
                if if_not_exists:
                    return self._status(name, self.table(name).version())
                raise ValueError(f"table {name!r} already exists")
            empty = local_df(self.spark, [], cols)
            return self._status(name, self.table(name).write(empty, mode="overwrite"))
        m = _DDL_INSERT.match(query)
        if m:
            name, select = m.groups()
            if not self.exists(name):
                raise ValueError(f"no table {name!r} in {self.root}")
            df = self.sql(select, tables=tables)
            if self.format_of(name) == "delta":
                from dc43_spark.io.delta_log import delta_write

                return self._status(
                    name,
                    delta_write(self.spark, df, self._path(name), mode="append"),
                )
            return self._status(name, self.table(name).write(df, mode="append"))
        m = _DML_MERGE.match(query)
        if m:
            name, source_sql, on_cond, whens = m.groups()
            if not self.exists(name):
                raise ValueError(f"no table {name!r} in {self.root}")
            src_sql = source_sql.strip()
            if src_sql.startswith("("):
                src_df = self.sql(src_sql[1:-1], tables=tables)
            else:
                src_df = self.sql(f"SELECT * FROM {src_sql}", tables=tables)
            keys = _merge_on_keys(on_cond)
            clauses = _merge_when_clauses(whens)
            if self.format_of(name) == "delta":
                from dc43_spark.io.delta_dml import delta_merge

                delta_merge(
                    self.spark, src_df, self._path(name), keys, **clauses
                )
                return self._status(name, self.delta_table(name).version())
            t = self.table(name)
            t.merge(src_df, keys, **clauses)
            return self._status(name, t.version())
        m = _DML_DELETE.match(query)
        if m:
            name, where = m.groups()
            if not self.exists(name):
                raise ValueError(f"no table {name!r} in {self.root}")
            if self.format_of(name) == "delta":
                from dc43_spark.io.delta_dml import delta_delete

                delta_delete(self.spark, self._path(name), where)
                return self._status(
                    name, self.delta_table(name).version()
                )
            t = self.table(name)
            t.delete(where=where if where is not None else "true")
            return self._status(name, t.version())
        m = _DML_UPDATE.match(query)
        if m:
            name, rest = m.groups()
            assignments, where = _split_top_where(rest)
            if not self.exists(name):
                raise ValueError(f"no table {name!r} in {self.root}")
            sets = _parse_assignments(assignments)
            if self.format_of(name) == "delta":
                from dc43_spark.io.delta_dml import delta_update

                delta_update(self.spark, self._path(name), sets, where)
                return self._status(
                    name, self.delta_table(name).version()
                )
            t = self.table(name)
            t.update(set=sets, where=where if where is not None else "true")
            return self._status(name, t.version())
        m = _DDL_OPTIMIZE.match(query)
        if m:
            name, zcols = m.groups()
            if not self.exists(name):
                raise ValueError(f"no table {name!r} in {self.root}")
            z = (
                [c.strip().strip("`") for c in zcols.split(",")]
                if zcols else None
            )
            if self.format_of(name) == "delta":
                from dc43_spark.io.delta_log import delta_optimize

                delta_optimize(self.spark, self._path(name), zorder_by=z)
                return self._status(name, self.delta_table(name).version())
            t = self.table(name)
            t.compact(zorder_by=z)
            return self._status(name, t.version())
        m = _DDL_VACUUM.match(query)
        if m:
            name, hours, dry = m.groups()
            if not self.exists(name):
                raise ValueError(f"no table {name!r} in {self.root}")
            dry_run = bool(dry)
            if self.format_of(name) == "delta":
                from dc43_spark.io.delta_log import delta_vacuum

                removed = delta_vacuum(
                    self.spark, self._path(name),
                    retain_hours=float(hours) if hours else 168.0,
                    dry_run=dry_run,
                )
                n = len(removed)
            else:
                # same safety default as the delta branch (168 h): a bare
                # VACUUM must not strip time travel the instant it runs
                out = self.table(name).vacuum(
                    retention_hours=float(hours) if hours else 168.0,
                    dry_run=dry_run,
                )
                n = len(out) if isinstance(out, list) else int(out)
            return local_df(
                self.spark,
                [(name, n, dry_run)],
                "table string, files long, dry_run boolean",
                coalesce=1,
            )
        m = _DDL_RESTORE.match(query)
        if m:
            name, ver, ts = m.groups()
            if not self.exists(name):
                raise ValueError(f"no table {name!r} in {self.root}")
            ts_val = None
            if ts is not None:
                from dc43_spark.io.delta_log import _iso_ts

                ts_val = _iso_ts(ts)  # naive stamps are UTC (repo convention)
            if self.format_of(name) == "delta":
                from dc43_spark.io.delta_log import delta_restore

                delta_restore(
                    self.spark, self._path(name),
                    version=int(ver) if ver is not None else None,
                    timestamp=ts_val,
                )
                return self._status(name, self.delta_table(name).version())
            t = self.table(name)
            t.restore(
                version_as_of=int(ver) if ver is not None else None,
                timestamp_as_of=ts_val,
            )
            return self._status(name, t.version())
        m = _DDL_HISTORY.match(query)
        if m:
            name = m.group(1)
            if not self.exists(name):
                raise ValueError(f"no table {name!r} in {self.root}")
            if self.format_of(name) == "delta":
                rows = [
                    (int(v), float(ts), op)
                    for v, ts, op in self.delta_table(name).history()
                ]
            else:
                rows = [
                    (int(c.version), float(c.timestamp), c.operation)
                    for c in self.table(name).history()
                ]
            return local_df(
                self.spark,
                rows,
                "version long, timestamp double, operation string",
                coalesce=1,
            )
        m = _DDL_ALTER.match(query)
        if m:
            name, rest = m.groups()
            if not self.exists(name):
                raise ValueError(f"no table {name!r} in {self.root}")
            return self._sql_alter(name, rest.strip())
        m = _DDL_DROP.match(query)
        if m:
            if_exists, name, purge = m.groups()
            if not self.exists(name) and if_exists:
                return self._status(name, None)
            if not purge:
                raise ValueError(
                    f"DROP TABLE {name} would delete its data and history; "
                    "add PURGE to confirm"
                )
            self.drop(name, purge=True)
            self.spark.catalog.dropTempView(name)
            return self._status(name, None)
        self.register_views(
            tables if tables is not None else self._referenced_tables(query)
        )
        return self.spark.sql(query)

    def _status(self, name: str, version) -> DataFrame:
        return local_df(
            self.spark,
            [(name, version)],
            "table string, version long",
            coalesce=1,
        )

    def _sql_alter(self, name: str, rest: str) -> DataFrame:
        """``ALTER TABLE <name> <rest>`` on either format: RENAME/DROP
        COLUMN and ADD/DROP CONSTRAINT map to both engines; ALTER COLUMN
        TYPE (widening) and SET/UNSET TBLPROPERTIES are Delta-protocol
        lifecycles and refuse on snaplog with a pointer. Unknown ALTER
        spellings refuse rather than fall through to Spark (which would
        silently no-op against a temp view)."""
        path = self._path(name)
        is_delta = self.format_of(name) == "delta"

        m = re.match(
            r"^ALTER\s+COLUMN\s+`?(\w+)`?\s+TYPE\s+(.+?)\s*$",
            rest, re.IGNORECASE,
        )
        if m:
            col, new_type = m.groups()
            if not is_delta:
                raise ValueError(
                    "ALTER COLUMN TYPE (type widening) is a Delta-protocol "
                    "lifecycle; snaplog tables have no widening commit"
                )
            from dc43_spark.io.delta_log import delta_widen_column_type

            v = delta_widen_column_type(self.spark, path, col, new_type)
            return self._status(name, v)
        m = re.match(
            r"^RENAME\s+COLUMN\s+`?(\w+)`?\s+TO\s+`?(\w+)`?$",
            rest, re.IGNORECASE,
        )
        if m:
            old, new = m.groups()
            if is_delta:
                from dc43_spark.io.delta_log import delta_rename_column

                v = delta_rename_column(self.spark, path, old, new)
            else:
                v = self.table(name).rename_column(old, new)
            return self._status(name, v)
        m = re.match(r"^ADD\s+COLUMNS?\s+(.+)$", rest,
                     re.IGNORECASE | re.DOTALL)
        if m:
            body = m.group(1).strip()
            if body.startswith("(") and body.endswith(")"):
                # the parenthesized spelling: ADD COLUMNS (c type)
                body = body[1:-1].strip()
            m2 = re.match(r"^`?(\w+)`?\s+(.+?)\s*$", body, re.DOTALL)
            if not m2:
                raise ValueError(
                    f"unparseable ADD COLUMN clause {body!r}; expected "
                    "ADD COLUMN <name> <type>"
                )
            col, dtype = m2.groups()
            if not is_delta:
                raise ValueError(
                    "ADD COLUMN on snaplog evolves through merge_schema "
                    "appends (write the new column with merge_schema=True)"
                )
            from dc43_spark.io.delta_log import delta_add_column

            v = delta_add_column(self.spark, path, col, dtype)
            return self._status(name, v)
        m = re.match(r"^DROP\s+COLUMN\s+`?(\w+)`?$", rest, re.IGNORECASE)
        if m:
            col = m.group(1)
            if is_delta:
                from dc43_spark.io.delta_log import delta_drop_column

                v = delta_drop_column(self.spark, path, col)
            else:
                v = self.table(name).drop_column(col)
            return self._status(name, v)
        m = re.match(
            r"^ADD\s+CONSTRAINT\s+`?(\w+)`?\s+CHECK\s*\((.+)\)\s*$",
            rest, re.IGNORECASE | re.DOTALL,
        )
        if m:
            cname, expr = m.groups()
            if is_delta:
                from dc43_spark.io.delta_log import delta_add_constraint

                v = delta_add_constraint(self.spark, path, cname, expr)
            else:
                v = self.table(name).add_check_constraint(cname, expr)
            return self._status(name, v)
        m = re.match(
            r"^DROP\s+CONSTRAINT\s+(IF\s+EXISTS\s+)?`?(\w+)`?$",
            rest, re.IGNORECASE,
        )
        if m:
            if_exists, cname = m.group(1) is not None, m.group(2)
            if is_delta:
                from dc43_spark.io.delta_log import delta_drop_constraint

                v = delta_drop_constraint(
                    self.spark, path, cname, if_exists=if_exists
                )
            else:
                v = self.table(name).drop_check_constraint(cname)
            return self._status(name, v)
        m = re.match(
            r"^(UN)?SET\s+TBLPROPERTIES\s*(?:(IF\s+EXISTS)\s*)?\((.+)\)\s*$",
            rest, re.IGNORECASE | re.DOTALL,
        )
        if m:
            unset, if_exists, body = m.groups()
            if not is_delta:
                raise ValueError(
                    "SET/UNSET TBLPROPERTIES is a Delta-protocol "
                    "lifecycle; snaplog table options are fixed at create"
                )
            if unset:
                from dc43_spark.io.delta_log import delta_unset_properties

                keys = [
                    k.strip().strip("'\"`")
                    for k in _split_top_level(body)
                ]
                v = delta_unset_properties(
                    self.spark, path, keys, if_exists=if_exists is not None
                )
            else:
                from dc43_spark.io.delta_log import delta_set_properties

                props = {}
                for item in _split_top_level(body):
                    km = re.match(
                        r"^\s*['\"`]?([\w.]+)['\"`]?\s*=\s*(.+?)\s*$",
                        item, re.DOTALL,
                    )
                    if not km:
                        raise ValueError(
                            f"unparseable TBLPROPERTIES entry {item!r}"
                        )
                    val = km.group(2).strip()
                    if (
                        len(val) >= 2
                        and val[0] == val[-1]
                        and val[0] in "'\""
                    ):
                        val = val[1:-1]
                    props[km.group(1)] = val
                v = delta_set_properties(self.spark, path, props)
            return self._status(name, v)
        raise ValueError(
            f"unsupported ALTER TABLE clause {rest!r}; supported: ALTER "
            "COLUMN t TYPE, RENAME COLUMN, DROP COLUMN, ADD/DROP "
            "CONSTRAINT, SET/UNSET TBLPROPERTIES"
        )


_DDL_ALTER = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+(.+?);?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DDL_CREATE_AS = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?([A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+PARTITIONED\s+BY\s*\(([^)]+)\))?\s+AS\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)
_DDL_CREATE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?([A-Za-z_][A-Za-z0-9_]*)"
    r"\s*\((.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DDL_INSERT = re.compile(
    r"^\s*INSERT\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)
_DML_MERGE = re.compile(
    # fixed aliases t / s keep the grammar honest: predicates inside the
    # WHEN clauses reference s.<col> exactly like the merge APIs expect
    r"^\s*MERGE\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)\s+(?:AS\s+)?t\s+"
    r"USING\s+(\(.*\)|[A-Za-z_][A-Za-z0-9_]*)\s+(?:AS\s+)?s\s+"
    r"ON\s+(.+?)\s+(WHEN\s+.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_WHEN_RE = re.compile(
    # the clause-boundary lookahead requires WHEN **[NOT] MATCHED** — a
    # bare \s+WHEN\s would truncate SET expressions containing CASE WHEN
    r"WHEN\s+(?:(NOT)\s+)?MATCHED(\s+BY\s+SOURCE)?(?:\s+AND\s+(.+?))?\s+THEN\s+"
    r"(DELETE|UPDATE\s+SET\s+.+?|INSERT\s+\*"
    r"|INSERT\s*\(.+?\)\s*VALUES\s*\(.+?\))"
    r"(?=\s+WHEN\s+(?:NOT\s+)?MATCHED\b|\s*;?\s*$)",
    re.IGNORECASE | re.DOTALL,
)


def _split_top_level(text: str) -> list:
    """Split on commas OUTSIDE parens/brackets/quotes (SET lists and
    VALUES tuples carry function calls and string literals)."""
    parts, cur, depth, quote = [], [], 0, None
    for ch in text:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _parse_set_map(text: str, kind: str) -> dict:
    """``c = expr, t.d = expr`` -> {col: expr} (the merge APIs' SET map;
    expressions pass through verbatim — they may reference t./s.)."""
    out: dict = {}
    for a in _split_top_level(text):
        m = re.match(r"^\s*(?:t\.)?`?(\w+)`?\s*=\s*(.+)$", a, re.DOTALL)
        if not m:
            raise ValueError(f"unsupported {kind} SET assignment {a!r}")
        col = m.group(1)
        if col in out:
            raise ValueError(f"{kind} SET assigns {col!r} twice")
        out[col] = m.group(2).strip()
    return out


def _merge_on_keys(cond: str) -> list:
    """ON equality conjuncts -> shared key names. Supported shape:
    ``t.k = s.k [AND t.k2 <=> s.k2 ...]`` (either side order); anything
    else refuses — a non-equi merge condition has no key-join plan."""
    keys = []
    for part in re.split(r"\s+AND\s+", cond.strip(), flags=re.IGNORECASE):
        m = re.match(
            r"^\s*(?:t\.`?(\w+)`?\s*(?:=|<=>)\s*s\.`?(\w+)`?"
            r"|s\.`?(\w+)`?\s*(?:=|<=>)\s*t\.`?(\w+)`?)\s*$",
            part,
        )
        if not m:
            raise ValueError(
                f"unsupported MERGE ON conjunct {part.strip()!r}: use "
                "t.<col> = s.<col> equality (the key-join subset)"
            )
        a, b = (m.group(1), m.group(2)) if m.group(1) else (m.group(4), m.group(3))
        if a != b:
            raise ValueError(
                f"MERGE ON joins different column names ({a!r} vs {b!r}); "
                "the SQL surface covers same-name keys — use the merge "
                "API for renamed joins"
            )
        keys.append(a)
    return keys


def _merge_when_clauses(whens: str) -> dict:
    """WHEN clause list -> ordered merge-API clause lists — delta-spark's
    full MULTI-clause surface (r12, VERDICT r11 #2): any number of
    clauses per kind, evaluated first-match-wins in the statement's
    order (standard SQL MERGE semantics):

    - ``WHEN MATCHED [AND p] THEN DELETE``
    - ``WHEN MATCHED [AND p] THEN UPDATE SET *`` (updateAll) or
      ``UPDATE SET c = expr, ...`` (column-level; exprs over t./s.)
    - ``WHEN NOT MATCHED [AND p] THEN INSERT *`` (insertAll) or
      ``INSERT (c, ...) VALUES (expr, ...)`` (unlisted columns NULL)
    - ``WHEN NOT MATCHED BY SOURCE [AND p] THEN DELETE`` or
      ``UPDATE SET c = expr, ...`` (exprs over t.)

    Per delta-spark's rule (enforced by normalize_merge_clauses at
    execution), only the LAST clause of a kind may omit ``AND p``. The
    WHOLE clause text must be consumed by recognized clauses — an
    unknown spelling refuses instead of silently executing the merge
    without it."""
    out = {
        "matched_clauses": [],
        "not_matched_clauses": [],
        "not_matched_by_source_clauses": [],
    }
    matches = list(_WHEN_RE.finditer(whens))
    last = 0
    gaps = []
    for m in matches:
        gaps.append(whens[last:m.start()])
        last = m.end()
    gaps.append(whens[last:])
    leftover = "".join(gaps).strip().strip(";").strip()
    if leftover:
        raise ValueError(
            f"unsupported MERGE clause text {leftover!r}; see the "
            "catalog.sql docstring for the supported WHEN clause forms"
        )

    for not_m, by_src, pred, action in (m.groups() for m in matches):
        # collapse whitespace ONLY in the keyword-matching copy — SET /
        # VALUES bodies pass through verbatim (a collapsed copy would
        # silently rewrite multi-space/newline content inside string
        # literals in the expressions)
        raw = action.strip()
        act_u = re.sub(r"\s+", " ", raw).upper()
        pred = pred.strip() if pred else None

        def _body(keyword: str) -> str:
            m2 = re.match(rf"{keyword}\s+(.*)$", raw,
                          re.IGNORECASE | re.DOTALL)
            return m2.group(1).strip()
        if by_src:
            if not not_m:
                raise ValueError("MATCHED BY SOURCE is not a clause; use "
                                 "WHEN NOT MATCHED BY SOURCE")
            if act_u == "DELETE":
                out["not_matched_by_source_clauses"].append(
                    {"action": "delete", "condition": pred}
                )
            elif act_u.startswith("UPDATE SET"):
                body = _body(r"UPDATE\s+SET")
                if body == "*":
                    raise ValueError(
                        "UPDATE SET * is meaningless BY SOURCE (there is "
                        "no source row); list the assignments"
                    )
                out["not_matched_by_source_clauses"].append({
                    "action": "update", "condition": pred,
                    "set": _parse_set_map(body, "WHEN NOT MATCHED BY SOURCE"),
                })
            else:
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE supports THEN DELETE or "
                    "THEN UPDATE SET c = expr, ..."
                )
            continue
        if not_m:
            if act_u == "INSERT *":
                out["not_matched_clauses"].append(
                    {"action": "insert", "condition": pred}
                )
            elif act_u.startswith("INSERT"):
                m2 = re.match(
                    r"^INSERT\s*\((.+?)\)\s*VALUES\s*\((.+)\)\s*$",
                    raw, re.IGNORECASE | re.DOTALL,
                )
                if not m2:
                    raise ValueError(
                        "WHEN NOT MATCHED supports INSERT * or "
                        "INSERT (cols) VALUES (exprs)"
                    )
                cols = [
                    re.sub(r"^`?(\w+)`?$", r"\1", c)
                    for c in _split_top_level(m2.group(1))
                ]
                vals = _split_top_level(m2.group(2))
                if len(cols) != len(vals):
                    raise ValueError(
                        f"INSERT lists {len(cols)} columns but "
                        f"{len(vals)} values"
                    )
                dup = sorted({c for c in cols if cols.count(c) > 1})
                if dup:
                    raise ValueError(
                        f"INSERT lists column(s) {dup} more than once"
                    )
                out["not_matched_clauses"].append({
                    "action": "insert", "condition": pred,
                    "values": dict(zip(cols, vals)),
                })
            else:
                raise ValueError("WHEN NOT MATCHED supports THEN INSERT")
            continue
        if act_u == "DELETE":
            out["matched_clauses"].append(
                {"action": "delete", "condition": pred}
            )
        elif act_u == "UPDATE SET *":
            out["matched_clauses"].append(
                {"action": "update", "condition": pred}
            )
        elif act_u.startswith("UPDATE SET"):
            out["matched_clauses"].append({
                "action": "update", "condition": pred,
                "set": _parse_set_map(_body(r"UPDATE\s+SET"), "WHEN MATCHED"),
            })
        else:
            raise ValueError(
                "WHEN MATCHED supports THEN DELETE or THEN UPDATE SET"
            )
    if not any(out.values()):
        raise ValueError("MERGE needs at least one WHEN clause")
    return out


_DML_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+([A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DML_UPDATE = re.compile(
    r"^\s*UPDATE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _split_top_where(s: str):
    """(assignments, where_or_None) at the FIRST top-level WHERE keyword
    — outside quotes and parens, word-bounded — so a string literal
    containing 'where' never splits the statement."""
    depth, quote, i, n = 0, None, 0, len(s)
    up = s.upper()
    while i < n:
        ch = s[i]
        if quote:
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and up.startswith("WHERE", i)
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (i + 5 >= n or not (s[i + 5].isalnum() or s[i + 5] == "_"))
        ):
            return s[:i].rstrip(), s[i + 5:].strip()
        i += 1
    return s, None


def _parse_assignments(raw: str) -> dict:
    """``col = expr, col2 = expr2`` -> {col: expr}: split on commas at
    paren/quote depth zero (function calls and string literals keep
    their commas), then take the FIRST top-level '=' of each part."""
    parts, buf, depth, quote = [], [], 0, None
    for ch in raw:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    if buf:
        parts.append("".join(buf))
    out: dict = {}
    for part in parts:
        m = re.match(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+?)\s*$",
                     part, re.DOTALL)
        if not m:
            raise ValueError(f"unparseable SET assignment: {part.strip()!r}")
        col, expr = m.groups()
        if col in out:
            raise ValueError(f"column {col!r} assigned twice in SET")
        out[col] = expr
    return out


_DDL_DROP = re.compile(
    r"^\s*DROP\s+TABLE\s+(?:(IF\s+EXISTS)\s+)?([A-Za-z_][A-Za-z0-9_]*)"
    r"\s*(PURGE)?\s*;?\s*$",
    re.IGNORECASE,
)
_DDL_OPTIMIZE = re.compile(
    r"^\s*OPTIMIZE\s+([A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$",
    re.IGNORECASE,
)
_DDL_VACUUM = re.compile(
    r"^\s*VACUUM\s+([A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?(\s+DRY\s+RUN)?\s*;?\s*$",
    re.IGNORECASE,
)
_DDL_RESTORE = re.compile(
    r"^\s*RESTORE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+TO\s+"
    r"(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']+)')"
    r"\s*;?\s*$",
    re.IGNORECASE,
)
_DDL_HISTORY = re.compile(
    r"^\s*DESCRIBE\s+HISTORY\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$",
    re.IGNORECASE,
)
