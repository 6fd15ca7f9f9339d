"""HTTP-backed contract store client with an injectable transport.

Rebuilds the reference's remote tier (dc43-service-clients
governance/client/remote.py + contracts HTTP store): the engine talks to a
governance service over a tiny JSON protocol. The transport is a callable
``(method, path, json_body) -> (status, json)`` so tests inject a fake and
deployments plug urllib/requests/httpx without this module importing any of
them.

Protocol (mirrors the reference's FastAPI surface, service-backends
server.py):

  GET  /contracts                        -> {"ids": [...]}
  GET  /contracts/{id}/versions          -> {"versions": [...]}
  GET  /contracts/{id}/{version}         -> contract document JSON
  PUT  /contracts/{id}/{version}         <- contract document JSON
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional

from dc43_spark.contracts.model import Contract
from dc43_spark.contracts.store import _ResolveMixin

Transport = Callable[[str, str, Optional[dict[str, Any]]], tuple[int, Any]]


def urllib_transport(
    base_url: str, *, timeout: float = 10.0, token: Optional[str] = None
) -> Transport:
    """Stdlib transport factory (no third-party HTTP client needed).
    ``token`` attaches ``Authorization: Bearer <token>`` to every call —
    the client half of the service's bearer auth (ref auth.py:28-76)."""
    import urllib.request

    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"

    def call(method: str, path: str, body: Optional[dict[str, Any]]) -> tuple[int, Any]:
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            base_url.rstrip("/") + path,
            data=data,
            method=method,
            headers=dict(headers),
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
                payload = resp.read()
                return resp.status, json.loads(payload) if payload else None
        except urllib.error.HTTPError as exc:
            try:  # error responses may carry a JSON body (e.g. 409 reasons)
                payload = exc.read()
                return exc.code, json.loads(payload) if payload else None
            except (ValueError, OSError):
                return exc.code, None

    return call


class HTTPContractStore(_ResolveMixin):
    """ContractStore over the JSON protocol above."""

    def __init__(self, transport: Transport) -> None:
        self._call = transport

    def put(self, contract: Contract) -> None:
        status, _ = self._call(
            "PUT", f"/contracts/{contract.id}/{contract.version}", contract.to_dict()
        )
        if status >= 400:
            raise RuntimeError(
                f"contract put failed: {contract.id}:{contract.version} -> HTTP {status}"
            )

    def get(self, contract_id: str, version: str) -> Optional[Contract]:
        status, payload = self._call("GET", f"/contracts/{contract_id}/{version}", None)
        if status == 404 or payload is None:
            return None
        if status >= 400:
            raise RuntimeError(f"contract get failed: HTTP {status}")
        return Contract.from_dict(payload)

    def versions(self, contract_id: str) -> list[str]:
        status, payload = self._call("GET", f"/contracts/{contract_id}/versions", None)
        if status == 404 or payload is None:
            return []
        if status >= 400:
            raise RuntimeError(f"contract versions failed: HTTP {status}")
        from dc43_spark.contracts.versioning import SemVer

        return sorted(payload.get("versions", []), key=SemVer.parse)

    def list_ids(self) -> list[str]:
        status, payload = self._call("GET", "/contracts", None)
        if status >= 400 or payload is None:
            return []
        return sorted(payload.get("ids", []))
