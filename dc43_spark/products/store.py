"""Persistent data-product stores + port registration.

ref: dc43-service-backends data_products/backend/stores/{memory,filesystem,
sql}.py (same memory/FS/SQL tiering as the contract stores) and
interface.py:53-75 (``register_input_port`` / ``register_output_port``
evolving the product to a bumped version when a port is added). Delta-table
and Collibra product backends are deployment variants of the same protocol;
the SQLite store stands in for the reference's SQLAlchemy engines exactly
like ``contracts/sql_store.py`` does.
"""

from __future__ import annotations

import json
import os
import re
import sqlite3
import threading
from pathlib import Path
from typing import Optional, Protocol

from dc43_spark.contracts.versioning import SemVer
from dc43_spark.products.odps import DataProduct, Port


class ProductStore(Protocol):
    def put(self, product: DataProduct) -> None: ...
    def get(self, product_id: str, version: str) -> Optional[DataProduct]: ...
    def versions(self, product_id: str) -> list[str]: ...
    def list_ids(self) -> list[str]: ...


class _LatestMixin:
    def latest(self, product_id: str) -> Optional[DataProduct]:
        versions = self.versions(product_id)
        return self.get(product_id, versions[-1]) if versions else None


class MemoryProductStore(_LatestMixin):
    def __init__(self) -> None:
        self._docs: dict[tuple[str, str], DataProduct] = {}

    def put(self, product: DataProduct) -> None:
        self._docs[(product.id, product.version)] = product

    def get(self, product_id: str, version: str) -> Optional[DataProduct]:
        return self._docs.get((product_id, version))

    def versions(self, product_id: str) -> list[str]:
        return sorted(
            (v for (pid, v) in self._docs if pid == product_id), key=SemVer.parse
        )

    def list_ids(self) -> list[str]:
        return sorted({pid for (pid, _) in self._docs})


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9._-]", "_", name)


class FSProductStore(_LatestMixin):
    """One JSON document per (product, version):
    ``<root>/<product_id>/<version>.json`` (ODPS dict shape)."""

    def __init__(self, root: str | Path) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _dir(self, product_id: str) -> Path:
        return self.root / _safe(product_id)

    def put(self, product: DataProduct) -> None:
        d = self._dir(product.id)
        d.mkdir(parents=True, exist_ok=True)
        tmp = d / f".{_safe(product.version)}.json.tmp"
        tmp.write_text(json.dumps(product.to_dict(), indent=2))
        os.replace(tmp, d / f"{_safe(product.version)}.json")

    def get(self, product_id: str, version: str) -> Optional[DataProduct]:
        path = self._dir(product_id) / f"{_safe(version)}.json"
        if not path.exists():
            return None
        return DataProduct.from_dict(json.loads(path.read_text()))

    def versions(self, product_id: str) -> list[str]:
        d = self._dir(product_id)
        if not d.is_dir():
            return []
        out = []
        for p in d.glob("*.json"):
            try:
                out.append(json.loads(p.read_text())["version"])
            except (json.JSONDecodeError, KeyError):
                continue
        return sorted(out, key=SemVer.parse)

    def list_ids(self) -> list[str]:
        out = set()
        for d in self.root.iterdir():
            if d.is_dir():
                for p in d.glob("*.json"):
                    try:
                        out.add(json.loads(p.read_text())["id"])
                        break
                    except (json.JSONDecodeError, KeyError):
                        continue
        return sorted(out)


class SQLProductStore(_LatestMixin):
    """Products as JSON rows keyed (product_id, version) — SQLite via
    stdlib, ANSI enough to port by swapping the connection factory."""

    def __init__(self, db_path: str = ":memory:") -> None:
        self._conn = sqlite3.connect(db_path, check_same_thread=False)
        self._lock = threading.Lock()
        with self._lock:
            self._conn.execute(
                "CREATE TABLE IF NOT EXISTS data_products ("
                " product_id TEXT NOT NULL, version TEXT NOT NULL,"
                " document TEXT NOT NULL, PRIMARY KEY (product_id, version))"
            )
            self._conn.commit()

    def put(self, product: DataProduct) -> None:
        with self._lock:
            self._conn.execute(
                "INSERT OR REPLACE INTO data_products (product_id, version, document)"
                " VALUES (?, ?, ?)",
                (product.id, product.version, json.dumps(product.to_dict())),
            )
            self._conn.commit()

    def get(self, product_id: str, version: str) -> Optional[DataProduct]:
        row = self._conn.execute(
            "SELECT document FROM data_products WHERE product_id = ? AND version = ?",
            (product_id, version),
        ).fetchone()
        return DataProduct.from_dict(json.loads(row[0])) if row else None

    def versions(self, product_id: str) -> list[str]:
        rows = self._conn.execute(
            "SELECT version FROM data_products WHERE product_id = ?", (product_id,)
        ).fetchall()
        return sorted((r[0] for r in rows), key=SemVer.parse)

    def list_ids(self) -> list[str]:
        rows = self._conn.execute(
            "SELECT DISTINCT product_id FROM data_products ORDER BY product_id"
        ).fetchall()
        return [r[0] for r in rows]


class SparkTableProductStore(_LatestMixin):
    """Data products in a Spark catalog table ``(id, version, document)``
    — the analogue of the reference's Delta product store (data_products/
    backend/stores/delta.py:23-165), format-agnostic exactly like
    ``SparkTableContractStore``: delta when the runtime provides it,
    parquet otherwise. Same catalog table shape as the contract twin so a
    deployment keeps one storage convention for both document kinds."""

    def __init__(self, spark, table: str, *, format: str = "parquet") -> None:
        self.spark = spark
        self.table = table
        self.format = format
        self._has_seq: Optional[bool] = None

    def _ensure(self) -> None:
        # append-only with a put sequence: re-putting an (id, version)
        # appends a newer row and readers take the highest seq — put acts
        # as REPLACE like every other store tier (a plain INSERT left the
        # stale row winning get()'s limit(1) nondeterministically, which
        # broke the draft-approve flow that re-puts with status flipped).
        # Pre-seq 3-column tables are migrated in place (see
        # contracts/store.py ensure_versioned_doc_table + MIGRATION.md).
        if self._has_seq is None:
            from dc43_spark.contracts.store import ensure_versioned_doc_table

            self._has_seq = ensure_versioned_doc_table(
                self.spark, self.table, self.format
            )

    def put(self, product: DataProduct) -> None:
        self._ensure()
        doc = json.dumps(product.to_dict(), sort_keys=True).replace("'", "''")
        pid = product.id.replace("'", "''")
        ver = product.version.replace("'", "''")
        import time

        seq = f", {time.time_ns()}" if self._has_seq else ""
        self.spark.sql(
            f"INSERT INTO {self.table} VALUES ('{pid}', '{ver}', '{doc}'{seq})"
        )

    def get(self, product_id: str, version: str) -> Optional[DataProduct]:
        self._ensure()
        pid = product_id.replace("'", "''")
        ver = version.replace("'", "''")
        df = self.spark.table(self.table).where(
            f"id = '{pid}' AND version = '{ver}'"
        )
        if self._has_seq:
            df = df.orderBy("seq", ascending=False)  # latest put wins
        rows = df.select("document").limit(1).collect()
        if not rows:
            return None
        return DataProduct.from_dict(json.loads(rows[0][0]))

    def versions(self, product_id: str) -> list[str]:
        self._ensure()
        pid = product_id.replace("'", "''")
        rows = (
            self.spark.table(self.table)
            .where(f"id = '{pid}'")
            .select("version")
            .distinct()
            .collect()
        )
        return sorted((r[0] for r in rows), key=SemVer.parse)

    def list_ids(self) -> list[str]:
        self._ensure()
        return sorted(
            r[0]
            for r in self.spark.table(self.table).select("id").distinct().collect()
        )


def _bump(version: str, bump: str) -> str:
    return str(SemVer.parse(version).bump(bump))


def edit_product(
    store: ProductStore,
    contract_store,
    product_id: str,
    base_version: str,
    changes: dict,
    *,
    bump: str = "minor",
) -> DataProduct:
    """Edit = author a NEW version from an existing one with ``changes``
    overlaid (ref contracts-app ``/data-products/{id}/{version}/edit``)
    — products are immutable per version, like contracts, so editing
    never touches the base. ``changes`` replaces top-level document
    sections (``inputPorts`` / ``outputPorts`` / ``status``); id and
    version are managed here and cannot be overridden. Port bindings
    revalidate against the contract store before the new version lands
    (the same gate authoring passes through)."""
    base = store.get(product_id, base_version)
    if base is None:
        raise LookupError(f"product {product_id}:{base_version} not found")
    doc = base.to_dict()
    for key, value in changes.items():
        if key in ("id", "version"):
            raise ValueError(f"edit cannot override {key!r}")
        doc[key] = value
    # bump PAST every stored version so an edit of an older base can't
    # collide with (or silently shadow) a newer document
    newest = max(
        (SemVer.parse(v) for v in store.versions(product_id)),
        default=SemVer.parse(base_version),
    )
    doc["version"] = str(newest.bump(bump))
    edited = DataProduct.from_dict(doc)
    from dc43_spark.products.odps import ProductRegistry

    try:
        ProductRegistry(contract_store, store).register(edited)
    except LookupError as exc:
        # distinguish a bad BINDING (caller error -> 400) from the
        # missing-base LookupError above (-> 404)
        raise ValueError(str(exc)) from exc
    return edited


def register_port(
    store: ProductStore,
    product_id: str,
    port: Port,
    *,
    kind: str = "output",
    bump: str = "minor",
) -> DataProduct:
    """Ensure ``port`` is attached to the product's latest version (ref
    interface.py:53-75): a no-op when an identical port already exists, a
    version-bumped NEW product document when the port is added or changed
    (products are immutable per version, like contracts), and a fresh
    ``0.1.0`` product when the id is unknown. Returns the version that now
    carries the port."""
    if kind not in ("input", "output"):
        raise ValueError(f"kind must be input|output, got {kind!r}")
    current = store.latest(product_id) if hasattr(store, "latest") else None
    if current is None:
        product = DataProduct(
            id=product_id,
            version="0.1.0",
            input_ports=[port] if kind == "input" else [],
            output_ports=[port] if kind == "output" else [],
        )
        store.put(product)
        return product
    ports = current.input_ports if kind == "input" else current.output_ports
    existing = next((p for p in ports if p.name == port.name), None)
    if existing is not None and existing.to_dict() == port.to_dict():
        return current
    new_ports = [p for p in ports if p.name != port.name] + [port]
    evolved = DataProduct(
        id=current.id,
        version=_bump(current.version, bump),
        status=current.status,
        input_ports=new_ports if kind == "input" else list(current.input_ports),
        output_ports=new_ports if kind == "output" else list(current.output_ports),
    )
    store.put(evolved)
    return evolved
