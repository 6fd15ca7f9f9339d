"""Collibra-backed data-product store: the product-side twin of
``contracts/collibra.py``.

ref: dc43-service-backends data_products/backend/collibra.py —
``CollibraDataProductAdapter`` (list_versions / get_data_product /
latest_data_product / upsert_data_product, lines 19-38) behind
``CollibraDataProductServiceBackend`` (lines 40-95), which stores ODPS
documents in the governance catalog with a lifecycle status and resolves
``latest`` through the catalog rather than local state. The reference
ships a filesystem stub adapter for tests (StubCollibraDataProductAdapter,
lines 98-160); here the memory adapter plays that role and the HTTP
adapter is the REST binding, both over the repo-standard injectable
transport so no network code lives in the store.

``CollibraProductStore`` satisfies the ``ProductStore`` protocol, so it
plugs straight into ``ProductRegistry`` — port-bound governed reads
(``read_with_contract(product=, port=, registry=)``) then resolve their
contracts through the faked (or real) catalog.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Mapping, Optional, Protocol

from dc43_spark.contracts.versioning import SemVer
from dc43_spark.products.odps import DataProduct


@dataclass(frozen=True)
class ProductSummary:
    product_id: str
    version: str
    status: str
    updated_at: Optional[str] = None


def _semver_key(version: str):
    try:
        return (0, SemVer.parse(version))
    except ValueError:
        return (1, version)


class CollibraProductAdapter(Protocol):
    """Minimal catalog surface for data products (ref collibra.py:19-38)."""

    def list_products(self) -> list[str]: ...

    def list_product_versions(self, product_id: str) -> list[ProductSummary]: ...

    def get_product(self, product_id: str, version: str) -> Mapping[str, Any]: ...

    def latest_product(self, product_id: str) -> Optional[Mapping[str, Any]]: ...

    def upsert_product(
        self, document: Mapping[str, Any], *, status: str = "Draft"
    ) -> None: ...


class CollibraProductStore:
    """Expose Collibra-managed data products through the ``ProductStore``
    protocol (ref collibra.py:40-95): documents live in the catalog, the
    store is a stateless veneer. ``put`` requires a version (products are
    immutable per version, like contracts) and forwards the product's own
    status when it has one, the store default otherwise."""

    def __init__(
        self, adapter: CollibraProductAdapter, *, default_status: str = "Draft"
    ) -> None:
        self._adapter = adapter
        self._default_status = default_status

    def put(self, product: DataProduct) -> None:
        if not product.version:
            raise ValueError("data product version is required")
        doc = product.to_dict()
        status = doc.get("status") or self._default_status
        doc["status"] = status
        self._adapter.upsert_product(doc, status=status)

    def get(self, product_id: str, version: str) -> Optional[DataProduct]:
        try:
            doc = self._adapter.get_product(product_id, version)
        except LookupError:
            return None
        return DataProduct.from_dict(dict(doc))

    def latest(self, product_id: str) -> Optional[DataProduct]:
        doc = self._adapter.latest_product(product_id)
        return DataProduct.from_dict(dict(doc)) if doc is not None else None

    def versions(self, product_id: str) -> list[str]:
        summaries = self._adapter.list_product_versions(product_id)
        return sorted((s.version for s in summaries), key=_semver_key)

    def list_ids(self) -> list[str]:
        return sorted(self._adapter.list_products())

    def update_status(self, product_id: str, version: str, status: str) -> None:
        doc = dict(self._adapter.get_product(product_id, version))
        doc["status"] = status
        self._adapter.upsert_product(doc, status=status)


class MemoryCollibraProductAdapter:
    """Faked Collibra data-product catalog — full adapter semantics, no
    service (the reference's filesystem stub, collibra.py:98-160, in
    memory: persistence belongs to the real catalog)."""

    def __init__(self, *, clock: Optional[Callable[[], str]] = None) -> None:
        self._docs: dict[tuple[str, str], dict[str, Any]] = {}
        self._meta: dict[tuple[str, str], ProductSummary] = {}
        self._clock = clock or (lambda: "1970-01-01T00:00:00+00:00")

    def list_products(self) -> list[str]:
        return sorted({pid for pid, _ in self._docs})

    def list_product_versions(self, product_id: str) -> list[ProductSummary]:
        out = [s for (pid, _), s in self._meta.items() if pid == product_id]
        return sorted(out, key=lambda s: _semver_key(s.version))

    def get_product(self, product_id: str, version: str) -> Mapping[str, Any]:
        key = (product_id, version)
        if key not in self._docs:
            raise LookupError(f"product {product_id}:{version} not in Collibra")
        return dict(self._docs[key])

    def latest_product(self, product_id: str) -> Optional[Mapping[str, Any]]:
        versions = self.list_product_versions(product_id)
        if not versions:
            return None
        return self.get_product(product_id, versions[-1].version)

    def upsert_product(
        self, document: Mapping[str, Any], *, status: str = "Draft"
    ) -> None:
        doc = dict(document)
        pid, ver = doc.get("id"), doc.get("version")
        if not pid or not ver:
            raise ValueError("product document needs id and version")
        self._docs[(pid, ver)] = doc
        self._meta[(pid, ver)] = ProductSummary(pid, ver, status, self._clock())


Transport = Callable[[str, str, Optional[dict[str, Any]]], tuple[int, Any]]


class HttpCollibraProductAdapter:
    """Collibra Data Products REST binding, product-document routes.

    Injectable transport like ``HttpCollibraAdapter`` / ``http_store
    .urllib_transport`` — ``(method, path, json_body) -> (status,
    payload)`` — so tests fake the catalog and deployments swap in a real
    HTTP client without touching the store."""

    def __init__(
        self,
        transport: Transport,
        *,
        endpoint_template: str = "/rest/2.0/dataproducts/{data_product}",
    ) -> None:
        self._call = transport
        self._template = endpoint_template

    def _base(self, product_id: str) -> str:
        return self._template.format(data_product=product_id)

    def list_products(self) -> list[str]:
        status, payload = self._call("GET", self._template.format(data_product=""), None)
        if status != 200 or not payload:
            return []
        return sorted(str(p) for p in payload.get("dataProducts", []))

    def list_product_versions(self, product_id: str) -> list[ProductSummary]:
        status, payload = self._call("GET", f"{self._base(product_id)}/versions", None)
        if status != 200 or not payload:
            return []
        out = [
            ProductSummary(
                product_id=product_id,
                version=str(entry.get("version", "")),
                status=str(entry.get("status", "Draft")),
                updated_at=entry.get("updatedAt"),
            )
            for entry in payload.get("versions", [])
        ]
        return sorted(out, key=lambda s: _semver_key(s.version))

    def get_product(self, product_id: str, version: str) -> Mapping[str, Any]:
        status, payload = self._call(
            "GET", f"{self._base(product_id)}/versions/{version}", None
        )
        if status != 200 or payload is None:
            raise LookupError(f"product {product_id}:{version} not in Collibra")
        return payload

    def latest_product(self, product_id: str) -> Optional[Mapping[str, Any]]:
        status, payload = self._call(
            "GET", f"{self._base(product_id)}/versions/latest", None
        )
        if status == 404:
            return None
        if status != 200:
            raise LookupError(
                f"Collibra latest_product({product_id}) failed: HTTP {status}"
            )
        return payload

    def upsert_product(
        self, document: Mapping[str, Any], *, status: str = "Draft"
    ) -> None:
        doc = dict(document)
        pid = doc.get("id")
        if not pid:
            raise ValueError("product document needs an id")
        doc["status"] = status
        code, _ = self._call("PUT", self._base(str(pid)), doc)
        if code not in (200, 201, 204):
            raise LookupError(f"Collibra upsert_product({pid}) failed: HTTP {code}")
