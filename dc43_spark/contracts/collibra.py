"""Collibra-backed contract store (Data Products REST API binding).

Re-expresses the reference's enterprise-catalog bridge (ref:
dc43-service-backends contracts/backend/stores/collibra.py:63-365) against
this repo's ``ContractStore`` protocol:

- :class:`CollibraAdapter` is the minimal Collibra surface dc43 needs —
  list/get/upsert contract versions, lifecycle status updates, and the
  "latest Validated" lookup the governance flow uses to pick a approved
  contract over newer drafts;
- :class:`CollibraContractStore` exposes any adapter through the store
  API (``put``/``get``/``versions``/``list_ids``/``resolve``), with an
  optional lifecycle-status filter so readers only ever see e.g.
  ``Validated`` versions;
- :class:`MemoryCollibraAdapter` is the faked Collibra catalog (tests,
  demos, offline dev) — the reference ships the same idea as its
  filesystem stub adapter;
- :class:`HttpCollibraAdapter` follows the Collibra Data Products REST
  shape (``/rest/2.0/dataproducts/{dp}/ports/{port}/contracts``) over the
  same injectable ``(method, path, body) -> (status, json)`` transport the
  HTTP contract store uses, so tests drive it with a fake transport and
  deployments plug stdlib urllib — no HTTP library import here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Mapping, Optional, Protocol

from dc43_spark.contracts.model import Contract
from dc43_spark.contracts.store import _ResolveMixin
from dc43_spark.contracts.versioning import SemVer


@dataclass(frozen=True)
class ContractSummary:
    """One contract version as Collibra catalogs it."""

    contract_id: str
    version: str
    status: str = "Draft"
    updated_at: Optional[str] = None  # ISO string; injectable via store clock


def _semver_key(version: str):
    try:
        return SemVer.parse(version)._cmp_key()
    except ValueError:
        # non-semver sorts below every real version, ordered by raw string
        # (same 4-tuple shape as _cmp_key so mixed lists stay comparable)
        return (-1, 0, 0, (1, ((1, 0, version),)))


class CollibraAdapter(Protocol):
    """Minimal Collibra operations dc43 depends on."""

    def list_contracts(self) -> list[str]: ...

    def list_versions(self, contract_id: str) -> list[ContractSummary]: ...

    def get_contract(self, contract_id: str, version: str) -> Mapping[str, Any]: ...

    def upsert_contract(self, document: Mapping[str, Any], *, status: str = "Draft") -> None: ...

    def update_status(self, contract_id: str, version: str, status: str) -> None: ...

    def get_validated_contract(self, contract_id: str) -> Mapping[str, Any]: ...


class CollibraContractStore(_ResolveMixin):
    """ContractStore over a Collibra adapter (ref collibra.py:63-110).

    ``status_filter`` narrows every listing (and therefore ``resolve``/
    ``latest``) to one lifecycle state; ``put`` lands as ``default_status``
    (``Draft`` by convention — promotion happens in Collibra, not here)."""

    def __init__(
        self,
        adapter: CollibraAdapter,
        *,
        default_status: str = "Draft",
        status_filter: Optional[str] = None,
    ) -> None:
        self._adapter = adapter
        self._default_status = default_status
        self._status_filter = status_filter

    def put(self, contract: Contract) -> None:
        if not contract.version:
            raise ValueError("contract version required for Collibra upsert")
        self._adapter.upsert_contract(contract.to_dict(), status=self._default_status)

    def submit_draft(self, contract: Contract) -> None:
        """Draft-on-violation hook target: always lands as ``Draft``."""
        self._adapter.upsert_contract(contract.to_dict(), status="Draft")

    def get(self, contract_id: str, version: str) -> Optional[Contract]:
        try:
            payload = self._adapter.get_contract(contract_id, version)
        except LookupError:
            return None
        return Contract.from_dict(dict(payload))

    def versions(self, contract_id: str) -> list[str]:
        summaries = self._adapter.list_versions(contract_id)
        if self._status_filter:
            summaries = [s for s in summaries if s.status == self._status_filter]
        return sorted((s.version for s in summaries), key=_semver_key)

    def list_ids(self) -> list[str]:
        return sorted(self._adapter.list_contracts())

    def update_status(self, contract_id: str, version: str, status: str) -> None:
        self._adapter.update_status(contract_id, version, status)

    def latest_validated(self, contract_id: str) -> Optional[Contract]:
        """The newest ``Validated`` version regardless of drafts above it —
        the lookup governed reads use when only approved contracts count."""
        try:
            payload = self._adapter.get_validated_contract(contract_id)
        except LookupError:
            return None
        return Contract.from_dict(dict(payload))


class MemoryCollibraAdapter:
    """Faked Collibra catalog: full adapter semantics, no service.

    The reference ships a filesystem stub for the same purpose; memory is
    enough here because persistence belongs to the real catalog."""

    def __init__(self, *, clock: Optional[Callable[[], str]] = None) -> None:
        self._docs: dict[tuple[str, str], dict[str, Any]] = {}
        self._meta: dict[tuple[str, str], ContractSummary] = {}
        self._clock = clock or (lambda: "1970-01-01T00:00:00+00:00")

    def list_contracts(self) -> list[str]:
        return sorted({cid for cid, _ in self._docs})

    def list_versions(self, contract_id: str) -> list[ContractSummary]:
        out = [s for (cid, _), s in self._meta.items() if cid == contract_id]
        return sorted(out, key=lambda s: _semver_key(s.version))

    def get_contract(self, contract_id: str, version: str) -> Mapping[str, Any]:
        key = (contract_id, version)
        if key not in self._docs:
            raise LookupError(f"contract {contract_id}:{version} not in Collibra")
        return dict(self._docs[key])

    def upsert_contract(self, document: Mapping[str, Any], *, status: str = "Draft") -> None:
        doc = dict(document)
        cid, ver = doc.get("id"), doc.get("version")
        if not cid or not ver:
            raise ValueError("contract document needs id and version")
        self._docs[(cid, ver)] = doc
        self._meta[(cid, ver)] = ContractSummary(cid, ver, status, self._clock())

    def update_status(self, contract_id: str, version: str, status: str) -> None:
        key = (contract_id, version)
        if key not in self._meta:
            raise LookupError(f"contract {contract_id}:{version} not in Collibra")
        old = self._meta[key]
        self._meta[key] = ContractSummary(contract_id, version, status, self._clock())
        del old

    def get_validated_contract(self, contract_id: str) -> Mapping[str, Any]:
        validated = [
            s
            for (cid, _), s in self._meta.items()
            if cid == contract_id and s.status == "Validated"
        ]
        if not validated:
            raise LookupError(f"no Validated contract for {contract_id}")
        best = max(validated, key=lambda s: _semver_key(s.version))
        return self.get_contract(contract_id, best.version)


Transport = Callable[[str, str, Optional[dict[str, Any]]], tuple[int, Any]]


class HttpCollibraAdapter:
    """Collibra Data Products REST binding (ref collibra.py:230-365).

    ``catalog`` maps contract_id -> (data_product, port) — the REST routes
    are addressed by product/port, not contract id. The transport is the
    repo-standard injectable callable; see http_store.urllib_transport for
    a stdlib implementation."""

    def __init__(
        self,
        transport: Transport,
        *,
        catalog: Mapping[str, tuple[str, str]],
        endpoint_template: str = "/rest/2.0/dataproducts/{data_product}/ports/{port}/contracts",
    ) -> None:
        self._call = transport
        self._catalog = dict(catalog)
        self._template = endpoint_template

    def _base(self, contract_id: str) -> str:
        if contract_id not in self._catalog:
            raise LookupError(f"no Collibra data-product/port mapping for {contract_id!r}")
        dp, port = self._catalog[contract_id]
        return self._template.format(data_product=dp, port=port)

    def list_contracts(self) -> list[str]:
        return sorted(self._catalog)

    def list_versions(self, contract_id: str) -> list[ContractSummary]:
        status, payload = self._call("GET", self._base(contract_id), None)
        if status != 200 or not payload:
            return []
        out = []
        for entry in payload.get("contracts", []):
            out.append(
                ContractSummary(
                    contract_id=contract_id,
                    version=str(entry.get("version", "")),
                    status=str(entry.get("status", "Draft")),
                    updated_at=entry.get("updatedAt"),
                )
            )
        return sorted(out, key=lambda s: _semver_key(s.version))

    def get_contract(self, contract_id: str, version: str) -> Mapping[str, Any]:
        status, payload = self._call(
            "GET", f"{self._base(contract_id)}/{version}", None
        )
        if status != 200 or payload is None:
            raise LookupError(f"contract {contract_id}:{version} not in Collibra")
        # Collibra wraps the ODCS document under "contract"
        return payload.get("contract", payload)

    def upsert_contract(self, document: Mapping[str, Any], *, status: str = "Draft") -> None:
        doc = dict(document)
        cid = doc.get("id")
        if not cid:
            raise ValueError("contract document needs an id")
        code, _ = self._call(
            "POST", self._base(cid), {"status": status, "contract": doc}
        )
        if code not in (200, 201, 204):
            raise RuntimeError(f"Collibra upsert failed with HTTP {code}")

    def update_status(self, contract_id: str, version: str, status: str) -> None:
        code, _ = self._call(
            "PATCH",
            f"{self._base(contract_id)}/{version}",
            {"status": status},
        )
        if code not in (200, 204):
            raise LookupError(f"contract {contract_id}:{version} not in Collibra")

    def get_validated_contract(self, contract_id: str) -> Mapping[str, Any]:
        validated = [
            s for s in self.list_versions(contract_id) if s.status == "Validated"
        ]
        if not validated:
            raise LookupError(f"no Validated contract for {contract_id}")
        return self.get_contract(contract_id, validated[-1].version)
