"""OpenLineage-shaped run events + lightweight operation spans.

Rebuilds the reference's emitters (dc43-integrations
spark/open_data_lineage.py:1-356 and spark/open_telemetry.py:122-211) as
plain dict builders + pluggable collectors — no network dependency; an
HTTP transport can be layered by registering an emitter callable.

Determinism: clock and run-id providers are injectable (the reference's
uuid/now calls made events untestable — SURVEY §7.4).
"""

from __future__ import annotations

import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator, Optional

from dc43_spark.contracts.model import Contract

PRODUCER = "https://github.com/dc43-spark"
SCHEMA_URL = "https://openlineage.io/spec/1-0-5/OpenLineage.json"

Emitter = Callable[[dict[str, Any]], None]


def _default_now() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


def contract_facet(contract: Contract) -> dict[str, Any]:
    """Custom facet carrying the governing contract pin."""
    return {
        "_producer": PRODUCER,
        "contractId": contract.id,
        "contractVersion": contract.version,
        "status": contract.status,
    }


def schema_facet(contract: Contract) -> dict[str, Any]:
    """OpenLineage schema facet from the contract's declared schema."""
    fields = [
        {"name": prop.name, "type": prop.physical_type or "string"}
        for obj in contract.schema_objects
        for prop in obj.properties
    ]
    return {"_producer": PRODUCER, "fields": fields}


def dataset_ref(
    *,
    namespace: str = "default",
    name: str,
    contract: Optional[Contract] = None,
) -> dict[str, Any]:
    facets: dict[str, Any] = {}
    if contract is not None:
        facets["schema"] = schema_facet(contract)
        facets["dataContract"] = contract_facet(contract)
    return {"namespace": namespace, "name": name, "facets": facets}


def run_event(
    *,
    event_type: str,  # START | COMPLETE | FAIL
    job_name: str,
    job_namespace: str = "dc43_spark",
    run_id: Optional[str] = None,
    inputs: Optional[list[dict[str, Any]]] = None,
    outputs: Optional[list[dict[str, Any]]] = None,
    event_time: Optional[str] = None,
    facets: Optional[dict[str, Any]] = None,
) -> dict[str, Any]:
    """One OpenLineage RunEvent dict (ref open_data_lineage.py facets)."""
    return {
        "eventType": event_type,
        "eventTime": event_time or _default_now(),
        "producer": PRODUCER,
        "schemaURL": SCHEMA_URL,
        "run": {"runId": run_id or str(uuid.uuid4()), "facets": facets or {}},
        "job": {"namespace": job_namespace, "name": job_name},
        "inputs": inputs or [],
        "outputs": outputs or [],
    }


class LineageCollector:
    """Fan-out registry of emitters; default keeps events in memory."""

    def __init__(self, emitters: Optional[list[Emitter]] = None) -> None:
        self.events: list[dict[str, Any]] = []
        self._emitters = list(emitters or [])

    def add_emitter(self, emitter: Emitter) -> None:
        self._emitters.append(emitter)

    def emit(self, event: dict[str, Any]) -> None:
        self.events.append(event)
        for emitter in self._emitters:
            emitter(event)

    @contextmanager
    def governed_run(
        self,
        job_name: str,
        *,
        inputs: Optional[list[dict[str, Any]]] = None,
        outputs: Optional[list[dict[str, Any]]] = None,
        run_id: Optional[str] = None,
        now: Callable[[], str] = _default_now,
    ) -> Iterator[str]:
        """START/COMPLETE (or FAIL) event pair around a governed operation."""
        rid = run_id or str(uuid.uuid4())
        self.emit(run_event(
            event_type="START", job_name=job_name, run_id=rid,
            inputs=inputs, outputs=outputs, event_time=now(),
        ))
        try:
            yield rid
        except BaseException as exc:
            self.emit(run_event(
                event_type="FAIL", job_name=job_name, run_id=rid,
                inputs=inputs, outputs=outputs, event_time=now(),
                facets={"errorMessage": {"message": str(exc), "_producer": PRODUCER}},
            ))
            raise
        self.emit(run_event(
            event_type="COMPLETE", job_name=job_name, run_id=rid,
            inputs=inputs, outputs=outputs, event_time=now(),
        ))


# ------------------------------------------------------------------ spans


@dataclass
class Span:
    """Minimal OpenTelemetry-shaped span record (ref open_telemetry.py)."""

    name: str
    attributes: dict[str, Any] = field(default_factory=dict)
    start_ns: int = 0
    end_ns: int = 0
    status: str = "OK"
    error: Optional[str] = None

    @property
    def duration_ms(self) -> float:
        return (self.end_ns - self.start_ns) / 1e6


class SpanRecorder:
    """Collects spans per governed operation; injectable clock."""

    def __init__(self, clock_ns: Callable[[], int] = time.monotonic_ns) -> None:
        self.spans: list[Span] = []
        self._clock = clock_ns

    @contextmanager
    def span(self, name: str, **attributes: Any) -> Iterator[Span]:
        record = Span(name=name, attributes=attributes, start_ns=self._clock())
        try:
            yield record
        except BaseException as exc:
            record.status, record.error = "ERROR", str(exc)
            raise
        finally:
            record.end_ns = self._clock()
            self.spans.append(record)
