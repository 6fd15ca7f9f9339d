"""Governance record stores: statuses, dataset<->contract links, activity.

ref: dc43-service-backends governance/backend/stores/{memory,filesystem}.py
(:30-353) — per-dataset status JSON, link records, pipeline activity log,
metric history. Keys are ``(dataset_id, dataset_version)``; dataset ids use
the ``table:<name>`` / ``path:<p>`` convention (spark/io/common.py:226-234).
"""

from __future__ import annotations

import json
import re
import threading
from dc43_spark.localdf import local_df
from pathlib import Path
from typing import Any, Optional, Protocol


class GovernanceStore(Protocol):
    def save_status(
        self, dataset_id: str, dataset_version: str, payload: dict[str, Any]
    ) -> None: ...
    def load_status(
        self, dataset_id: str, dataset_version: str
    ) -> Optional[dict[str, Any]]: ...
    def link(self, dataset_id: str, contract_id: str, contract_version: str) -> None: ...
    def get_link(self, dataset_id: str) -> Optional[dict[str, str]]: ...
    def record_activity(self, entry: dict[str, Any]) -> None: ...
    def activity(self, dataset_id: Optional[str] = None) -> list[dict[str, Any]]: ...
    def status_matrix(self, dataset_id: str) -> list[dict[str, Any]]: ...


def _metric_numeric(value: Any) -> Optional[float]:
    """Float hint for a metric value when it resembles a number (the
    reference's normalise_metric_value coercion, governance/backend/
    stores/_metrics.py) — lets stores filter/chart without parsing."""
    if isinstance(value, bool):
        return float(value)
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, str):
        try:
            return float(value.strip())
        except ValueError:
            return None
    return None


def _flatten_metrics(
    dataset_id: str, dataset_version: str, payload: dict[str, Any]
) -> list[dict[str, Any]]:
    """One record per metric key from a status payload (ref
    extract_metrics: the ``metrics`` mapping, falling back to
    details.metrics when a provider only attached them there)."""
    metrics = payload.get("metrics")
    if not isinstance(metrics, dict):
        details = payload.get("details")
        metrics = details.get("metrics") if isinstance(details, dict) else None
    if not isinstance(metrics, dict):
        return []
    return [
        {
            "dataset_id": dataset_id,
            "dataset_version": dataset_version,
            "contract_id": str(payload.get("contract_id", "")),
            "contract_version": str(payload.get("contract_version", "")),
            "recorded_at": str(payload.get("recorded_at", "")),
            "metric_key": str(k),
            "metric_value": json.dumps(v, sort_keys=True, default=str),
            "metric_numeric_value": _metric_numeric(v),
        }
        for k, v in metrics.items()
    ]


class MemoryGovernanceStore:
    def __init__(self) -> None:
        self._statuses: dict[tuple[str, str], dict[str, Any]] = {}
        self._links: dict[str, dict[str, str]] = {}
        self._activity: list[dict[str, Any]] = []
        self._lock = threading.Lock()

    def save_status(self, dataset_id, dataset_version, payload) -> None:
        with self._lock:
            self._statuses[(dataset_id, dataset_version)] = dict(payload)

    def load_status(self, dataset_id, dataset_version):
        return self._statuses.get((dataset_id, dataset_version))

    def link(self, dataset_id, contract_id, contract_version) -> None:
        with self._lock:
            self._links[dataset_id] = {
                "contract_id": contract_id,
                "contract_version": contract_version,
            }

    def get_link(self, dataset_id):
        return self._links.get(dataset_id)

    def record_activity(self, entry) -> None:
        with self._lock:
            self._activity.append(dict(entry))

    def activity(self, dataset_id=None):
        if dataset_id is None:
            return list(self._activity)
        return [e for e in self._activity if e.get("dataset_id") == dataset_id]

    def status_matrix(self, dataset_id):
        return [
            {"dataset_id": d, "dataset_version": v, **payload}
            for (d, v), payload in sorted(self._statuses.items())
            if d == dataset_id
        ]

    def list_datasets(self) -> list[str]:
        return sorted({d for d, _ in self._statuses.keys()})

    def load_metrics(
        self,
        dataset_id: str,
        *,
        dataset_version: Optional[str] = None,
        contract_id: Optional[str] = None,
        contract_version: Optional[str] = None,
    ) -> list[dict[str, Any]]:
        out = []
        for (d, v), payload in sorted(self._statuses.items()):
            if d != dataset_id or (dataset_version is not None and v != dataset_version):
                continue
            for rec in _flatten_metrics(d, v, payload):
                if contract_id is not None and rec["contract_id"] != contract_id:
                    continue
                if (
                    contract_version is not None
                    and rec["contract_version"] != contract_version
                ):
                    continue
                out.append(rec)
        return out


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9._-]", "_", name)


class FSGovernanceStore:
    """JSON-on-filesystem layout:

    ``<root>/status/<dataset>/<version>.json``
    ``<root>/links/<dataset>.json``
    ``<root>/activity.jsonl``
    """

    def __init__(self, root: str | Path) -> None:
        self.root = Path(root)
        (self.root / "status").mkdir(parents=True, exist_ok=True)
        (self.root / "links").mkdir(parents=True, exist_ok=True)
        self._lock = threading.Lock()

    def save_status(self, dataset_id, dataset_version, payload) -> None:
        d = self.root / "status" / _safe(dataset_id)
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{_safe(dataset_version)}.json").write_text(
            json.dumps(payload, indent=2, sort_keys=True, default=str)
        )

    def load_status(self, dataset_id, dataset_version):
        p = self.root / "status" / _safe(dataset_id) / f"{_safe(dataset_version)}.json"
        return json.loads(p.read_text()) if p.exists() else None

    def link(self, dataset_id, contract_id, contract_version) -> None:
        (self.root / "links" / f"{_safe(dataset_id)}.json").write_text(
            json.dumps(
                {"contract_id": contract_id, "contract_version": contract_version},
                indent=2,
            )
        )

    def get_link(self, dataset_id):
        p = self.root / "links" / f"{_safe(dataset_id)}.json"
        return json.loads(p.read_text()) if p.exists() else None

    def record_activity(self, entry) -> None:
        with self._lock:
            with open(self.root / "activity.jsonl", "a") as f:
                f.write(json.dumps(entry, sort_keys=True, default=str) + "\n")

    def activity(self, dataset_id=None):
        p = self.root / "activity.jsonl"
        if not p.exists():
            return []
        entries = [json.loads(line) for line in p.read_text().splitlines() if line.strip()]
        if dataset_id is None:
            return entries
        return [e for e in entries if e.get("dataset_id") == dataset_id]

    def status_matrix(self, dataset_id):
        d = self.root / "status" / _safe(dataset_id)
        if not d.exists():
            return []
        out = []
        for p in sorted(d.glob("*.json")):
            out.append(
                {"dataset_id": dataset_id, "dataset_version": p.stem, **json.loads(p.read_text())}
            )
        return out

    def list_datasets(self) -> list[str]:
        return sorted(p.name for p in (self.root / "status").iterdir() if p.is_dir())

    def load_metrics(
        self,
        dataset_id: str,
        *,
        dataset_version: Optional[str] = None,
        contract_id: Optional[str] = None,
        contract_version: Optional[str] = None,
    ) -> list[dict[str, Any]]:
        out = []
        for row in self.status_matrix(dataset_id):
            v = row["dataset_version"]
            if dataset_version is not None and v != dataset_version:
                continue
            for rec in _flatten_metrics(dataset_id, v, row):
                if contract_id is not None and rec["contract_id"] != contract_id:
                    continue
                if (
                    contract_version is not None
                    and rec["contract_version"] != contract_version
                ):
                    continue
                out.append(rec)
        return out


class SparkTableGovernanceStore:
    """Governance records in Spark catalog tables — the analogue of the
    reference's Delta-table governance store, format-agnostic (delta when the
    runtime provides it, parquet otherwise), so verdict history lives next to
    the data on the cluster instead of a driver-local filesystem.

    Layout (``<prefix>_status`` / ``<prefix>_links`` / ``<prefix>_activity``):
    append-only logs with a driver-side monotonic ``seq``; reads resolve
    LATEST-WINS per key. Append + latest-wins is deliberately the scalable
    shape — no read-modify-write on the hot path, history retained for free
    (and trivially replaced by a MERGE under Delta)."""

    def __init__(self, spark, prefix: str, *, format: str = "parquet") -> None:
        self.spark = spark
        self.prefix = prefix
        self.format = format
        self._seq = 0

    def _next_seq(self) -> int:
        self._seq += 1
        return self._seq

    @staticmethod
    def _esc(s: str) -> str:
        return s.replace("'", "''")

    def _ensure(self, name: str, schema: str) -> str:
        table = f"{self.prefix}_{name}"
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {table} ({schema}) USING {self.format}"
        )
        return table

    # -- statuses ---------------------------------------------------------
    def _status_table(self) -> str:
        return self._ensure(
            "status",
            "dataset_id STRING, dataset_version STRING, payload STRING, seq BIGINT",
        )

    def save_status(self, dataset_id, dataset_version, payload) -> None:
        t = self._status_table()
        doc = self._esc(json.dumps(payload, sort_keys=True, default=str))
        self.spark.sql(
            f"INSERT INTO {t} VALUES ('{self._esc(dataset_id)}', "
            f"'{self._esc(dataset_version)}', '{doc}', {self._next_seq()})"
        )
        self._append_metrics(dataset_id, dataset_version, payload)

    # -- metrics (ref governance/backend/stores/delta.py dq_metrics tier):
    # one row per metric key so history charts/filters never parse payloads
    def _metrics_table(self) -> str:
        return self._ensure(
            "metrics",
            "dataset_id STRING, dataset_version STRING, contract_id STRING, "
            "contract_version STRING, recorded_at STRING, metric_key STRING, "
            "metric_value STRING, metric_numeric_value DOUBLE, seq BIGINT",
        )

    def _append_metrics(self, dataset_id, dataset_version, payload) -> None:
        recs = _flatten_metrics(dataset_id, dataset_version, payload)
        if not recs:
            return
        t = self._metrics_table()
        seq = self._next_seq()
        df = local_df(
            self.spark,
            [
                (
                    r["dataset_id"], r["dataset_version"], r["contract_id"],
                    r["contract_version"], r["recorded_at"], r["metric_key"],
                    r["metric_value"], r["metric_numeric_value"], seq,
                )
                for r in recs
            ],
            "dataset_id string, dataset_version string, contract_id string, "
            "contract_version string, recorded_at string, metric_key string, "
            "metric_value string, metric_numeric_value double, seq bigint",
        )
        df.write.insertInto(t)

    def load_metrics(
        self,
        dataset_id: str,
        *,
        dataset_version: Optional[str] = None,
        contract_id: Optional[str] = None,
        contract_version: Optional[str] = None,
    ) -> list[dict[str, Any]]:
        """Metric observations for a dataset (latest write wins per
        (dataset_version, metric_key)), ordered by recorded_at then key."""
        t = self._metrics_table()
        df = self.spark.table(t).where(
            f"dataset_id = '{self._esc(dataset_id)}'"
        )
        if dataset_version is not None:
            df = df.where(f"dataset_version = '{self._esc(dataset_version)}'")
        if contract_id is not None:
            df = df.where(f"contract_id = '{self._esc(contract_id)}'")
        if contract_version is not None:
            df = df.where(f"contract_version = '{self._esc(contract_version)}'")
        rows = df.orderBy("seq").collect()
        latest: dict[tuple, dict[str, Any]] = {}
        for r in rows:  # later seq overwrites: latest-wins re-validation
            d = r.asDict()
            d.pop("seq")
            latest[(d["dataset_version"], d["metric_key"])] = d
        return sorted(
            latest.values(), key=lambda d: (d["recorded_at"], d["metric_key"])
        )

    def list_datasets(self) -> list[str]:
        t = self._status_table()
        return [
            r["dataset_id"]
            for r in self.spark.table(t)
            .select("dataset_id")
            .distinct()
            .orderBy("dataset_id")
            .collect()
        ]

    def load_status(self, dataset_id, dataset_version):
        t = self._status_table()
        rows = (
            self.spark.table(t)
            .where(
                f"dataset_id = '{self._esc(dataset_id)}' "
                f"AND dataset_version = '{self._esc(dataset_version)}'"
            )
            .orderBy("seq", ascending=False)
            .limit(1)
            .collect()
        )
        return json.loads(rows[0]["payload"]) if rows else None

    # -- links ------------------------------------------------------------
    def _links_table(self) -> str:
        return self._ensure(
            "links",
            "dataset_id STRING, contract_id STRING, contract_version STRING, seq BIGINT",
        )

    def link(self, dataset_id, contract_id, contract_version) -> None:
        t = self._links_table()
        self.spark.sql(
            f"INSERT INTO {t} VALUES ('{self._esc(dataset_id)}', "
            f"'{self._esc(contract_id)}', '{self._esc(contract_version)}', "
            f"{self._next_seq()})"
        )

    def get_link(self, dataset_id):
        t = self._links_table()
        rows = (
            self.spark.table(t)
            .where(f"dataset_id = '{self._esc(dataset_id)}'")
            .orderBy("seq", ascending=False)
            .limit(1)
            .collect()
        )
        if not rows:
            return None
        return {
            "contract_id": rows[0]["contract_id"],
            "contract_version": rows[0]["contract_version"],
        }

    # -- activity ---------------------------------------------------------
    def _activity_table(self) -> str:
        return self._ensure("activity", "dataset_id STRING, entry STRING, seq BIGINT")

    def record_activity(self, entry) -> None:
        t = self._activity_table()
        doc = self._esc(json.dumps(entry, sort_keys=True, default=str))
        ds = self._esc(str(entry.get("dataset_id", "")))
        self.spark.sql(
            f"INSERT INTO {t} VALUES ('{ds}', '{doc}', {self._next_seq()})"
        )

    def activity(self, dataset_id=None):
        t = self._activity_table()
        df = self.spark.table(t)
        if dataset_id is not None:
            df = df.where(f"dataset_id = '{self._esc(dataset_id)}'")
        return [json.loads(r["entry"]) for r in df.orderBy("seq").collect()]

    def status_matrix(self, dataset_id):
        t = self._status_table()
        rows = (
            self.spark.table(t)
            .where(f"dataset_id = '{self._esc(dataset_id)}'")
            .orderBy("seq")
            .collect()
        )
        latest: dict[str, dict[str, Any]] = {}
        for r in rows:  # later seq overwrites: latest-wins per version
            latest[r["dataset_version"]] = json.loads(r["payload"])
        return [
            {"dataset_id": dataset_id, "dataset_version": v, **latest[v]}
            for v in sorted(latest)
        ]
