"""In-process HTTP service tier: contracts + governance over real sockets.

Rebuilds the reference's remote topology (dc43-service-backends
``server.py`` FastAPI app + dc43-service-clients remote clients) on the
stdlib only: a ``ThreadingHTTPServer`` JSON facade over any
``ContractStore`` + ``GovernanceStore``, and ``HTTPGovernanceStore`` — the
client half — speaking the same injectable ``Transport`` protocol as
``HTTPContractStore``. Everything here is driver-side metadata plumbing;
no Spark data ever moves through this channel (verdict payloads and
contract documents only), so the service adds zero load to the data path
at any scale.

Routes (mirror of the reference's service surface):

  GET  /contracts                                   -> {"ids": [...]}
  GET  /contracts/{id}/versions                     -> {"versions": [...]}
  GET  /contracts/{id}/{version}                    -> contract JSON
  PUT  /contracts/{id}/{version}                    <- contract JSON
  GET  /governance/status/{dataset}/{version}       -> status JSON | 404
  PUT  /governance/status/{dataset}/{version}       <- status JSON
  GET  /governance/links/{dataset}                  -> link JSON | 404
  PUT  /governance/links/{dataset}                  <- link JSON
  GET  /governance/activity[?dataset_id=...]        -> {"entries": [...]}
  POST /governance/activity                         <- entry JSON
  GET  /governance/status-matrix/{dataset}          -> {"rows": [...]}
  GET  /products                                    -> {"ids": [...]}
  GET  /products/{id}/versions                      -> {"versions": [...]}
  GET  /products/{id}/{version}                     -> ODPS product JSON
  POST /products                                    <- {"document": ODPS} | form
  POST /products/{id}/ports                         <- {"port", "kind", "bump"}
  POST /products/{id}/{version}/edit                <- {"changes", "bump"}

REST API for programmatic consumers (ref contracts-app /api/* routes;
payloads built in governance/api.py):

  GET  /api/contracts                               -> [catalog rows]
  GET  /api/contracts/{cid}/{ver}                   -> contract + datasets
                                                       + expectations
  POST /api/contracts/{cid}/{ver}/validate          -> {"status": ...}
  GET  /api/contracts/{cid}/{ver}/preview           -> governed sample
       ?limit=&dataset_version=                        rows (503 without
                                                       a SparkSession)
  GET  /api/datasets                                -> [dataset records]
  GET  /api/datasets/{dataset_id}                   -> link + matrix +
                                                       activity + contract
  GET  /api/integration-helper/contracts            -> {"contracts": []}
  GET  /api/integration-helper/data-products        -> {"data_products": []}
  GET  /api/integration-helper/contracts/{cid}/{ver}
  GET  /setup/export?integration=&format=&...        -> setup bundle ZIP
                                                        (400 on bad
                                                        selections)
  GET  /api/integration-helper/data-products/{pid}/{ver}
  POST /api/integration-helper/stub                 <- {"inputs", "outputs",
                                                       "format"} -> runnable
                                                       Spark script

Path segments are URL-quoted by clients (dataset ids contain ``:`` and
``/`` — the ``path:<p>`` convention).
"""

from __future__ import annotations

import hmac
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional
from urllib.parse import parse_qs, quote, unquote, urlparse

from dc43_spark.contracts.model import Contract
from dc43_spark.contracts.store import ContractStore, MemoryContractStore
from dc43_spark.governance.stores import GovernanceStore, MemoryGovernanceStore
from dc43_spark.contracts.http_store import Transport


def _segments(path: str) -> list[str]:
    return [unquote(s) for s in path.strip("/").split("/") if s]


class _Handler(BaseHTTPRequestHandler):
    server_version = "dc43-spark-service/0.1"

    # silence per-request stderr logging
    def log_message(self, *args: Any) -> None:  # noqa: D102
        pass

    # -- plumbing ---------------------------------------------------------
    def _send(self, status: int, payload: Any = None) -> None:
        body = json.dumps(payload, default=str).encode() if payload is not None else b""
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def _body(self) -> Optional[Any]:
        length = int(self.headers.get("Content-Length") or 0)
        if not length:
            return None
        raw = self.rfile.read(length)
        ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
        if ctype == "application/x-www-form-urlencoded":
            # the webui authoring form posts urlencoded fields; expose
            # them as a flat single-valued dict
            return {k: v[0] for k, v in parse_qs(raw.decode()).items()}
        return json.loads(raw)

    @property
    def _contracts(self) -> ContractStore:
        return self.server.contract_store  # type: ignore[attr-defined]

    @property
    def _products(self):
        return self.server.product_store  # type: ignore[attr-defined]

    @property
    def _gov(self) -> GovernanceStore:
        return self.server.governance_store  # type: ignore[attr-defined]

    def _authorized(self) -> bool:
        """Bearer-token check for every route (ref auth.py:28-76). The
        expected token lives on the server object; no token configured
        means an open service (local/dev topology)."""
        expected = getattr(self.server, "auth_token", None)
        if not expected:
            return True
        header = self.headers.get("Authorization") or ""
        scheme, _, presented = header.partition(" ")
        if scheme.lower() == "bearer" and hmac.compare_digest(
            presented.strip(), expected
        ):
            return True
        self._send(401, {"detail": "Invalid authentication credentials"})
        return False

    def _send_bytes(
        self, status: int, data: bytes, ctype: str,
        filename: Optional[str] = None,
    ) -> None:
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        if filename:
            self.send_header(
                "Content-Disposition", f'attachment; filename="{filename}"'
            )
        self.end_headers()
        self.wfile.write(data)

    def _send_html(self, status: int, html: Optional[str]) -> None:
        if html is None:
            return self._send(404)
        body = html.encode()
        self.send_response(status)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    # -- dispatch ---------------------------------------------------------
    def do_GET(self) -> None:  # noqa: N802
        if not self._authorized():
            return
        url = urlparse(self.path)
        seg = _segments(url.path)
        if seg and seg[0] == "ui":  # read-only HTML browser (webui.py)
            from dc43_spark.governance import webui

            if seg == ["ui"]:
                return self._send_html(
                    200,
                    webui.render_index(self._contracts, self._gov,
                                       self._products),
                )
            if seg == ["ui", "author"]:
                return self._send_html(200, webui.render_author_form())
            if seg == ["ui", "author-product"]:
                return self._send_html(200, webui.render_product_author_form())
            if len(seg) == 5 and seg[1] == "products" and seg[4] == "edit":
                return self._send_html(
                    200,
                    webui.render_product_edit_form(
                        self._products, seg[2], seg[3]
                    ),
                )
            if len(seg) == 3 and seg[1] == "products":
                return self._send_html(
                    200, webui.render_product(self._products, seg[2])
                )
            if len(seg) == 5 and seg[1] == "contracts" and seg[4] == "edit":
                return self._send_html(
                    200,
                    webui.render_edit_form(self._contracts, seg[2], seg[3]),
                )
            if len(seg) == 4 and seg[1] == "contracts" and seg[3] == "diff":
                q = parse_qs(url.query)
                v_from = (q.get("from") or [""])[0]
                v_to = (q.get("to") or [""])[0]
                return self._send_html(
                    200,
                    webui.render_contract_diff(
                        self._contracts, seg[2], v_from, v_to
                    ),
                )
            if len(seg) == 3 and seg[1] == "contracts":
                return self._send_html(
                    200, webui.render_contract(self._contracts, seg[2])
                )
            if seg == ["ui", "setup"]:
                return self._send_html(
                    200, webui.render_setup(parse_qs(url.query))
                )
            if seg == ["ui", "config"]:
                return self._send_html(
                    200,
                    webui.render_config(
                        self._contracts, self._gov, self._products,
                        parse_qs(url.query),
                    ),
                )
            if seg == ["ui", "datasets"]:
                return self._send_html(
                    200, webui.render_datasets_dashboard(self._gov)
                )
            if len(seg) == 3 and seg[1] == "datasets":
                return self._send_html(
                    200, webui.render_dataset(self._gov, seg[2])
                )
            return self._send(404)
        if seg == ["setup", "export"]:
            # downloadable setup bundle from the running app (ref
            # contracts-app /setup/export): same selections as /ui/setup
            # via the shared parser, streamed as a ZIP attachment
            from dc43_spark.governance.setup_bundle import (
                bundle_config_from_params,
                export_setup_zip,
            )

            try:
                name, data = export_setup_zip(
                    bundle_config_from_params(parse_qs(url.query))
                )
            except ValueError as exc:
                return self._send(400, {"error": str(exc)})
            return self._send_bytes(200, data, "application/zip", name)
        if seg and seg[0] == "api":
            from dc43_spark.governance import api

            if seg == ["api", "contracts"]:
                return self._send(200, api.contract_catalog(self._contracts))
            if len(seg) == 5 and seg[1] == "contracts" and seg[4] == "preview":
                q = parse_qs(url.query)
                try:
                    limit = int((q.get("limit") or ["100"])[0])
                except ValueError:
                    return self._send(400, {"detail": "limit must be an int"})
                try:
                    detail = api.contract_preview(
                        self._contracts,
                        self._gov,
                        getattr(self.server, "spark_session", None),
                        seg[2],
                        seg[3],
                        limit=limit,
                        dataset_version=(
                            q.get("dataset_version") or [None]
                        )[0],
                    )
                except api.PreviewUnavailable as exc:
                    return self._send(503, {"detail": str(exc)})
                return self._send(404 if detail is None else 200, detail)
            if len(seg) == 4 and seg[1] == "contracts":
                detail = api.contract_detail(
                    self._contracts, self._gov, seg[2], seg[3]
                )
                return self._send(404 if detail is None else 200, detail)
            if seg == ["api", "datasets"]:
                return self._send(200, api.dataset_catalog(self._gov))
            if len(seg) == 3 and seg[1] == "datasets":
                detail = api.dataset_detail(
                    self._gov, self._contracts, seg[2]
                )
                return self._send(404 if detail is None else 200, detail)
            if seg == ["api", "integration-helper", "contracts"]:
                return self._send(
                    200, {"contracts": api.contract_catalog(self._contracts)}
                )
            if seg == ["api", "integration-helper", "data-products"]:
                return self._send(
                    200,
                    {"data_products": api.product_catalog(self._products)},
                )
            if len(seg) == 5 and seg[1:3] == ["integration-helper",
                                              "contracts"]:
                detail = api.contract_detail(
                    self._contracts, self._gov, seg[3], seg[4]
                )
                return self._send(404 if detail is None else 200, detail)
            if len(seg) == 5 and seg[1:3] == ["integration-helper",
                                              "data-products"]:
                detail = api.product_detail(self._products, seg[3], seg[4])
                return self._send(404 if detail is None else 200, detail)
            return self._send(404)
        if seg == ["contracts"]:
            return self._send(200, {"ids": self._contracts.list_ids()})
        if len(seg) == 3 and seg[0] == "contracts" and seg[2] == "versions":
            return self._send(200, {"versions": self._contracts.versions(seg[1])})
        if len(seg) == 3 and seg[0] == "contracts":
            contract = self._contracts.get(seg[1], seg[2])
            return self._send(404 if contract is None else 200,
                              None if contract is None else contract.to_dict())
        if len(seg) == 4 and seg[:2] == ["governance", "status"]:
            payload = self._gov.load_status(seg[2], seg[3])
            return self._send(404 if payload is None else 200, payload)
        if len(seg) == 3 and seg[:2] == ["governance", "links"]:
            link = self._gov.get_link(seg[2])
            return self._send(404 if link is None else 200, link)
        if seg == ["governance", "activity"]:
            ds = parse_qs(url.query).get("dataset_id", [None])[0]
            return self._send(200, {"entries": self._gov.activity(ds)})
        if len(seg) == 3 and seg[:2] == ["governance", "status-matrix"]:
            return self._send(200, {"rows": self._gov.status_matrix(seg[2])})
        if seg == ["workflow", "drafts"]:
            from dc43_spark.governance.workflow import list_drafts

            return self._send(200, {"drafts": list_drafts(self._contracts)})
        if seg == ["products"]:
            return self._send(200, {"ids": self._products.list_ids()})
        if len(seg) == 3 and seg[0] == "products" and seg[2] == "versions":
            return self._send(200, {"versions": self._products.versions(seg[1])})
        if len(seg) == 3 and seg[0] == "products":
            product = self._products.get(seg[1], seg[2])
            return self._send(404 if product is None else 200,
                              None if product is None else product.to_dict())
        self._send(404)

    def do_PUT(self) -> None:  # noqa: N802
        if not self._authorized():
            return
        seg = _segments(urlparse(self.path).path)
        body = self._body()
        if len(seg) == 3 and seg[0] == "contracts" and body is not None:
            self._contracts.put(Contract.from_dict(body))
            return self._send(204)
        if len(seg) == 4 and seg[:2] == ["governance", "status"] and body is not None:
            self._gov.save_status(seg[2], seg[3], body)
            return self._send(204)
        if len(seg) == 3 and seg[:2] == ["governance", "links"] and body is not None:
            self._gov.link(seg[2], body["contract_id"], body["contract_version"])
            return self._send(204)
        self._send(404)

    def do_POST(self) -> None:  # noqa: N802
        if not self._authorized():
            return
        seg = _segments(urlparse(self.path).path)
        body = self._body()
        if seg and seg[0] == "api":
            from dc43_spark.governance import api

            if (
                len(seg) == 5
                and seg[1] == "contracts"
                and seg[4] == "validate"
            ):
                verdict = api.validate_contract(
                    self._contracts, seg[2], seg[3]
                )
                return self._send(404 if verdict is None else 200, verdict)
            if seg == ["api", "integration-helper", "stub"]:
                payload = dict(body or {})
                integration = str(
                    payload.get("integration") or "spark"
                ).lower()
                if integration != "spark":
                    return self._send(
                        400,
                        {"error": f"unsupported integration: {integration}"},
                    )
                try:
                    result = api.integration_stub(
                        self._contracts,
                        payload.get("inputs") or [],
                        payload.get("outputs") or [],
                        fmt=str(payload.get("format") or "parquet"),
                        project=str(
                            payload.get("project") or "dc43-integration"
                        ),
                    )
                except LookupError as exc:
                    return self._send(404, {"error": str(exc)})
                except ValueError as exc:
                    return self._send(422, {"error": str(exc)})
                return self._send(200, result)
            return self._send(404)
        if seg == ["governance", "activity"] and body is not None:
            self._gov.record_activity(body)
            return self._send(204)
        if seg == ["workflow", "contracts"] and body is not None:
            # authoring: JSON {"document": {...}} or the webui form's
            # urlencoded fields (contract_id/columns/description)
            from dc43_spark.governance.workflow import author_draft
            from dc43_spark.governance.webui import form_to_document

            payload = dict(body)
            document = payload.get("document")
            if document is None:
                try:
                    document = form_to_document(payload)
                except ValueError as exc:
                    return self._send(400, {"error": str(exc)})
            try:
                drafted = author_draft(
                    self._contracts,
                    self._gov,
                    document,
                    author=str(payload.get("author", "")),
                    note=str(payload.get("note", "")),
                )
            except ValueError as exc:
                return self._send(400, {"error": str(exc)})
            return self._send(
                201, {"contract_id": drafted.id, "version": drafted.version,
                      "status": drafted.status}
            )
        if (
            len(seg) == 5
            and seg[:2] == ["workflow", "contracts"]
            and seg[4] == "edit"
            and body is not None
        ):
            from dc43_spark.governance.workflow import edit_draft

            changes = body.get("changes")
            if isinstance(changes, str):
                # the webui edit form posts the overlay urlencoded as a
                # JSON string
                try:
                    changes = json.loads(changes)
                except ValueError as exc:
                    return self._send(400, {"error": f"invalid changes JSON: {exc}"})
            try:
                drafted = edit_draft(
                    self._contracts,
                    self._gov,
                    seg[2],
                    seg[3],
                    dict(changes or {}),
                    author=str(body.get("author", "")),
                    note=str(body.get("note", "")),
                )
            except LookupError:
                return self._send(404)
            except ValueError as exc:
                return self._send(400, {"error": str(exc)})
            return self._send(
                201, {"contract_id": drafted.id, "version": drafted.version,
                      "status": drafted.status}
            )
        if (
            len(seg) == 5
            and seg[:2] == ["workflow", "contracts"]
            and seg[4] in ("approve", "reject")
        ):
            from dc43_spark.governance.workflow import review_draft

            payload = body or {}
            try:
                reviewed = review_draft(
                    self._contracts,
                    self._gov,
                    seg[2],
                    seg[3],
                    decision=seg[4],
                    reviewer=str(payload.get("reviewer", "")),
                    note=str(payload.get("note", "")),
                    supersede=bool(payload.get("supersede", False)),
                )
            except LookupError:
                return self._send(404)
            except ValueError as exc:
                return self._send(409, {"error": str(exc)})
            return self._send(200, {"status": reviewed.status})
        if seg == ["products"] and body is not None:
            # authoring: JSON {"document": {...ODPS...}} or the webui
            # form's urlencoded fields (product_id/output_ports/...)
            from dc43_spark.governance.webui import form_to_product
            from dc43_spark.products.odps import DataProduct, ProductRegistry

            payload = dict(body)
            document = payload.get("document")
            if document is None:
                try:
                    document = form_to_product(payload)
                except ValueError as exc:
                    return self._send(400, {"error": str(exc)})
            try:
                product = DataProduct.from_dict(document)
            except (KeyError, TypeError, ValueError) as exc:
                return self._send(400, {"error": f"invalid product: {exc}"})
            registry = ProductRegistry(self._contracts, self._products)
            try:
                # registration validates every port binding resolves
                registry.register(product)
            except LookupError as exc:
                return self._send(400, {"error": str(exc)})
            return self._send(
                201, {"product_id": product.id, "version": product.version,
                      "status": product.status}
            )
        if (
            len(seg) == 4
            and seg[0] == "products"
            and seg[3] == "edit"
            and body is not None
        ):
            from dc43_spark.products.store import edit_product

            changes = body.get("changes")
            if isinstance(changes, str):
                # the webui edit form posts the overlay urlencoded as a
                # JSON string
                try:
                    changes = json.loads(changes)
                except ValueError as exc:
                    return self._send(
                        400, {"error": f"invalid changes JSON: {exc}"}
                    )
            try:
                edited = edit_product(
                    self._products,
                    self._contracts,
                    seg[1],
                    seg[2],
                    dict(changes or {}),
                    bump=str(body.get("bump", "minor")),
                )
            except LookupError as exc:
                return self._send(404, {"error": str(exc)})
            except (KeyError, TypeError, ValueError) as exc:
                return self._send(400, {"error": str(exc)})
            return self._send(
                201, {"product_id": edited.id, "version": edited.version,
                      "status": edited.status}
            )
        if (
            len(seg) == 3
            and seg[0] == "products"
            and seg[2] == "ports"
            and body is not None
        ):
            from dc43_spark.products.odps import Port
            from dc43_spark.products.store import register_port

            payload = dict(body)
            try:
                port = Port.from_dict(dict(payload.get("port") or {}))
            except (KeyError, TypeError) as exc:
                return self._send(400, {"error": f"invalid port: {exc}"})
            if port.contract_id and self._contracts.resolve(
                port.contract_id, port.contract_version
            ) is None:
                return self._send(
                    400,
                    {"error": f"port binds unknown contract "
                              f"{port.contract_id} {port.contract_version}"},
                )
            try:
                evolved = register_port(
                    self._products, seg[1], port,
                    kind=str(payload.get("kind", "output")),
                    bump=str(payload.get("bump", "minor")),
                )
            except ValueError as exc:
                return self._send(400, {"error": str(exc)})
            return self._send(
                201, {"product_id": evolved.id, "version": evolved.version}
            )
        self._send(404)


class GovernanceServiceServer:
    """Socket-backed service wrapping a contract store + governance store.

    ``with GovernanceServiceServer() as url:`` serves on an ephemeral
    localhost port from a daemon thread."""

    def __init__(
        self,
        contract_store: Optional[ContractStore] = None,
        governance_store: Optional[GovernanceStore] = None,
        *,
        product_store=None,
        host: str = "127.0.0.1",
        port: int = 0,
        auth_token: Optional[str] = None,
        spark_session=None,
    ) -> None:
        from dc43_spark.products.store import MemoryProductStore

        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self._httpd.contract_store = contract_store or MemoryContractStore()  # type: ignore[attr-defined]
        self._httpd.governance_store = governance_store or MemoryGovernanceStore()  # type: ignore[attr-defined]
        self._httpd.product_store = product_store or MemoryProductStore()  # type: ignore[attr-defined]
        self._httpd.auth_token = auth_token  # type: ignore[attr-defined]
        # optional: enables /api/contracts/{cid}/{ver}/preview (governed
        # sample rows need a live session; absent -> that route serves 503)
        self._httpd.spark_session = spark_session  # type: ignore[attr-defined]
        self._thread: Optional[threading.Thread] = None

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> str:
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self.url

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def __enter__(self) -> str:
        return self.start()

    def __exit__(self, *exc: Any) -> None:
        self.stop()


class HTTPGovernanceStore:
    """GovernanceStore client over the JSON protocol above (the remote half
    of the reference's governance client/backend split). Same injectable
    ``Transport`` as HTTPContractStore — tests use real sockets via
    ``urllib_transport``; deployments may swap any HTTP client."""

    def __init__(self, transport: Transport) -> None:
        self._call = transport

    @staticmethod
    def _q(segment: str) -> str:
        return quote(segment, safe="")

    def save_status(self, dataset_id: str, dataset_version: str, payload: dict[str, Any]) -> None:
        status, _ = self._call(
            "PUT", f"/governance/status/{self._q(dataset_id)}/{self._q(dataset_version)}", payload
        )
        if status >= 400:
            raise RuntimeError(f"save_status failed: HTTP {status}")

    def load_status(self, dataset_id: str, dataset_version: str) -> Optional[dict[str, Any]]:
        status, payload = self._call(
            "GET", f"/governance/status/{self._q(dataset_id)}/{self._q(dataset_version)}", None
        )
        return None if status == 404 else payload

    def link(self, dataset_id: str, contract_id: str, contract_version: str) -> None:
        status, _ = self._call(
            "PUT",
            f"/governance/links/{self._q(dataset_id)}",
            {"contract_id": contract_id, "contract_version": contract_version},
        )
        if status >= 400:
            raise RuntimeError(f"link failed: HTTP {status}")

    def get_link(self, dataset_id: str) -> Optional[dict[str, str]]:
        status, payload = self._call("GET", f"/governance/links/{self._q(dataset_id)}", None)
        return None if status == 404 else payload

    def record_activity(self, entry: dict[str, Any]) -> None:
        status, _ = self._call("POST", "/governance/activity", entry)
        if status >= 400:
            raise RuntimeError(f"record_activity failed: HTTP {status}")

    def activity(self, dataset_id: Optional[str] = None) -> list[dict[str, Any]]:
        path = "/governance/activity"
        if dataset_id is not None:
            path += f"?dataset_id={self._q(dataset_id)}"
        status, payload = self._call("GET", path, None)
        return list(payload.get("entries", [])) if payload else []

    def status_matrix(self, dataset_id: str) -> list[dict[str, Any]]:
        status, payload = self._call(
            "GET", f"/governance/status-matrix/{self._q(dataset_id)}", None
        )
        return list(payload.get("rows", [])) if payload else []


class HTTPProductStore:
    """ProductStore client over the /products JSON routes (the remote half
    of the reference's data-product client/backend split, ref
    dc43-service-clients data_products). Same injectable ``Transport``;
    plugs straight into ``ProductRegistry(product_store=...)`` so
    port-bound governed reads resolve over the wire."""

    def __init__(self, transport: Transport) -> None:
        self._call = transport

    @staticmethod
    def _q(segment: str) -> str:
        return quote(segment, safe="")

    def put(self, product) -> None:
        status, payload = self._call(
            "POST", "/products", {"document": product.to_dict()}
        )
        if status >= 400:
            raise RuntimeError(
                f"product put failed: HTTP {status} "
                f"{(payload or {}).get('error', '')}"
            )

    def get(self, product_id: str, version: str):
        from dc43_spark.products.odps import DataProduct

        status, payload = self._call(
            "GET", f"/products/{self._q(product_id)}/{self._q(version)}", None
        )
        return None if status == 404 else DataProduct.from_dict(payload)

    def versions(self, product_id: str) -> list:
        status, payload = self._call(
            "GET", f"/products/{self._q(product_id)}/versions", None
        )
        return list(payload.get("versions", [])) if payload else []

    def list_ids(self) -> list:
        status, payload = self._call("GET", "/products", None)
        return list(payload.get("ids", [])) if payload else []

    def latest(self, product_id: str):
        from dc43_spark.contracts.versioning import SemVer

        versions = self.versions(product_id)
        if not versions:
            return None
        best = max(versions, key=SemVer.parse)
        return self.get(product_id, best)
