"""SQL-backed contract + governance stores (SQLite via stdlib).

Rebuilds the reference's SQL store tier (dc43-service-backends
contracts/backend/stores/sql.py and governance/backend/stores/sql.py):
JSON documents keyed by (contract_id, version) in a relational table, with
the same ``ContractStore`` / ``GovernanceStore`` protocols as the FS and
memory implementations. SQLite (stdlib) stands in for the reference's
SQLAlchemy engines — the SQL is ANSI enough to port to Postgres/MySQL by
swapping the connection factory.
"""

from __future__ import annotations

import json
import sqlite3
import threading
from typing import Any, Optional

from dc43_spark.contracts.model import Contract
from dc43_spark.contracts.store import _ResolveMixin


class SQLContractStore(_ResolveMixin):
    """Contracts as JSON rows keyed (contract_id, version)."""

    def __init__(self, db_path: str = ":memory:") -> None:
        self._conn = sqlite3.connect(db_path, check_same_thread=False)
        self._lock = threading.Lock()
        with self._lock:
            self._conn.execute(
                "CREATE TABLE IF NOT EXISTS contracts ("
                " contract_id TEXT NOT NULL, version TEXT NOT NULL,"
                " document TEXT NOT NULL, PRIMARY KEY (contract_id, version))"
            )
            self._conn.commit()

    def put(self, contract: Contract) -> None:
        with self._lock:
            self._conn.execute(
                "INSERT OR REPLACE INTO contracts (contract_id, version, document)"
                " VALUES (?, ?, ?)",
                (contract.id, contract.version, json.dumps(contract.to_dict())),
            )
            self._conn.commit()

    def get(self, contract_id: str, version: str) -> Optional[Contract]:
        row = self._conn.execute(
            "SELECT document FROM contracts WHERE contract_id = ? AND version = ?",
            (contract_id, version),
        ).fetchone()
        return Contract.from_dict(json.loads(row[0])) if row else None

    def versions(self, contract_id: str) -> list[str]:
        from dc43_spark.contracts.versioning import SemVer

        rows = self._conn.execute(
            "SELECT version FROM contracts WHERE contract_id = ?", (contract_id,)
        ).fetchall()
        return sorted((r[0] for r in rows), key=SemVer.parse)

    def list_ids(self) -> list[str]:
        rows = self._conn.execute(
            "SELECT DISTINCT contract_id FROM contracts ORDER BY contract_id"
        ).fetchall()
        return [r[0] for r in rows]


class SQLGovernanceStore:
    """Statuses / links / activity in three relational tables."""

    def __init__(self, db_path: str = ":memory:") -> None:
        self._conn = sqlite3.connect(db_path, check_same_thread=False)
        self._lock = threading.Lock()
        with self._lock:
            self._conn.executescript(
                """
                CREATE TABLE IF NOT EXISTS statuses (
                  dataset_id TEXT NOT NULL, dataset_version TEXT NOT NULL,
                  payload TEXT NOT NULL, PRIMARY KEY (dataset_id, dataset_version));
                CREATE TABLE IF NOT EXISTS links (
                  dataset_id TEXT PRIMARY KEY, contract_id TEXT NOT NULL,
                  contract_version TEXT NOT NULL);
                CREATE TABLE IF NOT EXISTS activity (
                  seq INTEGER PRIMARY KEY AUTOINCREMENT, dataset_id TEXT,
                  entry TEXT NOT NULL);
                """
            )
            self._conn.commit()

    def save_status(self, dataset_id: str, dataset_version: str, payload: dict[str, Any]) -> None:
        with self._lock:
            self._conn.execute(
                "INSERT OR REPLACE INTO statuses (dataset_id, dataset_version, payload)"
                " VALUES (?, ?, ?)",
                (dataset_id, dataset_version, json.dumps(payload)),
            )
            self._conn.commit()

    def load_status(self, dataset_id: str, dataset_version: str) -> Optional[dict[str, Any]]:
        row = self._conn.execute(
            "SELECT payload FROM statuses WHERE dataset_id = ? AND dataset_version = ?",
            (dataset_id, dataset_version),
        ).fetchone()
        return json.loads(row[0]) if row else None

    def link(self, dataset_id: str, contract_id: str, contract_version: str) -> None:
        with self._lock:
            self._conn.execute(
                "INSERT OR REPLACE INTO links (dataset_id, contract_id, contract_version)"
                " VALUES (?, ?, ?)",
                (dataset_id, contract_id, contract_version),
            )
            self._conn.commit()

    def get_link(self, dataset_id: str) -> Optional[dict[str, str]]:
        row = self._conn.execute(
            "SELECT contract_id, contract_version FROM links WHERE dataset_id = ?",
            (dataset_id,),
        ).fetchone()
        return {"contract_id": row[0], "contract_version": row[1]} if row else None

    def record_activity(self, entry: dict[str, Any]) -> None:
        with self._lock:
            self._conn.execute(
                "INSERT INTO activity (dataset_id, entry) VALUES (?, ?)",
                (entry.get("dataset_id"), json.dumps(entry)),
            )
            self._conn.commit()

    def activity(self, dataset_id: Optional[str] = None) -> list[dict[str, Any]]:
        if dataset_id is None:
            rows = self._conn.execute("SELECT entry FROM activity ORDER BY seq").fetchall()
        else:
            rows = self._conn.execute(
                "SELECT entry FROM activity WHERE dataset_id = ? ORDER BY seq",
                (dataset_id,),
            ).fetchall()
        return [json.loads(r[0]) for r in rows]

    def status_matrix(self, dataset_id: str) -> list[dict[str, Any]]:
        rows = self._conn.execute(
            "SELECT dataset_version, payload FROM statuses WHERE dataset_id = ?"
            " ORDER BY dataset_version",
            (dataset_id,),
        ).fetchall()
        return [
            {"dataset_version": r[0], **json.loads(r[1])} for r in rows
        ]
