"""Contract stores: versioned JSON documents keyed (id, version).

ref: dc43-service-backends contracts/backend/stores/filesystem.py:19 (layout:
one JSON doc per (id, version)) and delta.py:23-165 (table-backed store).
The Spark-table store keeps the same two-column (id, version) key but writes
through a catalog table so contracts live next to the data at cluster scale.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Optional, Protocol

from dc43_spark.contracts.model import Contract
from dc43_spark.contracts.versioning import select_version


class ContractStore(Protocol):
    def put(self, contract: Contract) -> None: ...
    def get(self, contract_id: str, version: str) -> Optional[Contract]: ...
    def versions(self, contract_id: str) -> list[str]: ...
    def list_ids(self) -> list[str]: ...

    def resolve(self, contract_id: str, selector: str = "latest") -> Optional[Contract]: ...


class _ResolveMixin:
    def resolve(self, contract_id: str, selector: str = "latest") -> Optional[Contract]:
        chosen = select_version(self.versions(contract_id), selector)
        return self.get(contract_id, chosen) if chosen else None


class MemoryContractStore(_ResolveMixin):
    def __init__(self) -> None:
        self._docs: dict[tuple[str, str], Contract] = {}

    def put(self, contract: Contract) -> None:
        self._docs[(contract.id, contract.version)] = contract

    def get(self, contract_id: str, version: str) -> Optional[Contract]:
        return self._docs.get((contract_id, version))

    def versions(self, contract_id: str) -> list[str]:
        return sorted(v for (cid, v) in self._docs if cid == contract_id)

    def list_ids(self) -> list[str]:
        return sorted({cid for (cid, _) in self._docs})


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9._-]", "_", name)


class FSContractStore(_ResolveMixin):
    """``<root>/<contract_id>/<version>.json`` — one document per version."""

    def __init__(self, root: str | Path) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _dir(self, contract_id: str) -> Path:
        return self.root / _safe(contract_id)

    def put(self, contract: Contract) -> None:
        d = self._dir(contract.id)
        d.mkdir(parents=True, exist_ok=True)
        path = d / f"{_safe(contract.version)}.json"
        path.write_text(json.dumps(contract.to_dict(), indent=2, sort_keys=True))

    def get(self, contract_id: str, version: str) -> Optional[Contract]:
        path = self._dir(contract_id) / f"{_safe(version)}.json"
        if not path.exists():
            return None
        return Contract.from_dict(json.loads(path.read_text()))

    def versions(self, contract_id: str) -> list[str]:
        d = self._dir(contract_id)
        if not d.exists():
            return []
        return sorted(p.stem for p in d.glob("*.json"))

    def list_ids(self) -> list[str]:
        return sorted(p.name for p in self.root.iterdir() if p.is_dir())


def ensure_versioned_doc_table(spark, table: str, format: str) -> bool:
    """Create the 4-column ``(id, version, document, seq)`` store table if
    absent; MIGRATE a pre-seq 3-column table in place via ``ALTER TABLE
    ADD COLUMNS`` (CREATE IF NOT EXISTS alone would leave the old layout,
    making every INSERT fail on arity and ``orderBy(seq)`` unresolvable).
    Legacy rows read ``seq`` as NULL and sort LAST under the seq-DESC
    latest-wins read, so historical puts stay visible and any re-put
    wins. Returns whether ``seq`` is available; False (a catalog/format
    that cannot evolve) degrades to seq-less first-row-wins — see
    MIGRATION.md."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} "
        f"(id STRING, version STRING, document STRING, seq BIGINT) "
        f"USING {format}"
    )
    cols = [f.name.lower() for f in spark.table(table).schema.fields]
    if "seq" in cols:
        return True
    try:
        spark.sql(f"ALTER TABLE {table} ADD COLUMNS (seq BIGINT)")
        spark.catalog.refreshTable(table)
        return "seq" in [f.name.lower() for f in spark.table(table).schema.fields]
    except Exception:
        return False


class SparkTableContractStore(_ResolveMixin):
    """Contracts in a Spark catalog table ``(id, version, document)``.

    The analogue of the reference's Delta store (stores/delta.py:23-165),
    format-agnostic: any catalog-supported format works (delta when the
    runtime provides it, parquet otherwise).
    """

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
        # broke the draft-approve flow that re-puts with status flipped)
        if self._has_seq is None:
            self._has_seq = ensure_versioned_doc_table(
                self.spark, self.table, self.format
            )

    def put(self, contract: Contract) -> None:
        self._ensure()
        doc = json.dumps(contract.to_dict(), sort_keys=True).replace("'", "''")
        cid = contract.id.replace("'", "''")
        ver = contract.version.replace("'", "''")
        import time

        seq = f", {time.time_ns()}" if self._has_seq else ""
        self.spark.sql(
            f"INSERT INTO {self.table} VALUES ('{cid}', '{ver}', '{doc}'{seq})"
        )

    def get(self, contract_id: str, version: str) -> Optional[Contract]:
        self._ensure()
        cid = contract_id.replace("'", "''")
        ver = version.replace("'", "''")
        df = self.spark.table(self.table).where(
            f"id = '{cid}' AND version = '{ver}'"
        )
        if self._has_seq:
            df = df.orderBy("seq", ascending=False)  # latest put wins
        rows = df.select("document").limit(1).collect()
        if not rows:
            return None
        return Contract.from_dict(json.loads(rows[0][0]))

    def versions(self, contract_id: str) -> list[str]:
        self._ensure()
        cid = contract_id.replace("'", "''")
        rows = (
            self.spark.table(self.table)
            .where(f"id = '{cid}'")
            .select("version")
            .distinct()
            .collect()
        )
        return sorted(r[0] for r in rows)

    def list_ids(self) -> list[str]:
        self._ensure()
        return sorted(
            r[0] for r in self.spark.table(self.table).select("id").distinct().collect()
        )
