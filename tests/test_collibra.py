"""Collibra contract store: adapter protocol, status lifecycle, REST shape
(ref collibra.py:63-365 re-expressed over this repo's ContractStore API)."""

from __future__ import annotations

import pytest

from dc43_spark.contracts.collibra import (
    CollibraContractStore,
    ContractSummary,
    HttpCollibraAdapter,
    MemoryCollibraAdapter,
)
from dc43_spark.contracts.model import Contract, SchemaObject, SchemaProperty


def _contract(version: str) -> Contract:
    return Contract(
        id="driver.orders",
        version=version,
        schema_objects=[
            SchemaObject(name="orders", properties=[SchemaProperty("o_orderkey", "bigint")])
        ],
    )


def test_put_get_versions_roundtrip():
    store = CollibraContractStore(MemoryCollibraAdapter())
    store.put(_contract("1.0.0"))
    store.put(_contract("1.1.0"))
    assert store.list_ids() == ["driver.orders"]
    assert store.versions("driver.orders") == ["1.0.0", "1.1.0"]
    got = store.get("driver.orders", "1.1.0")
    assert got.id == "driver.orders" and got.version == "1.1.0"
    assert got.schema_object.properties[0].name == "o_orderkey"
    assert store.get("driver.orders", "9.9.9") is None


def test_resolve_and_selectors_work_through_adapter():
    store = CollibraContractStore(MemoryCollibraAdapter())
    for v in ("1.0.0", "1.2.0", "0.9.0"):
        store.put(_contract(v))
    assert store.resolve("driver.orders").version == "1.2.0"
    assert store.resolve("driver.orders", "==1.0.0").version == "1.0.0"
    assert store.resolve("driver.orders", ">=1.1.0").version == "1.2.0"


def test_status_filter_narrows_listings():
    adapter = MemoryCollibraAdapter()
    store = CollibraContractStore(adapter, status_filter="Validated")
    writer = CollibraContractStore(adapter)
    writer.put(_contract("1.0.0"))
    writer.put(_contract("2.0.0"))
    adapter.update_status("driver.orders", "1.0.0", "Validated")
    # reader sees only the Validated version; latest resolves below 2.0.0
    assert store.versions("driver.orders") == ["1.0.0"]
    assert store.resolve("driver.orders").version == "1.0.0"


def test_latest_validated_ignores_newer_drafts():
    adapter = MemoryCollibraAdapter()
    store = CollibraContractStore(adapter)
    store.put(_contract("1.0.0"))
    store.put(_contract("1.5.0"))
    store.put(_contract("2.0.0"))  # newest, still Draft
    adapter.update_status("driver.orders", "1.0.0", "Validated")
    adapter.update_status("driver.orders", "1.5.0", "Validated")
    assert store.latest_validated("driver.orders").version == "1.5.0"
    assert store.latest_validated("missing.id") is None


def test_submit_draft_lands_as_draft_even_with_validated_default():
    adapter = MemoryCollibraAdapter()
    store = CollibraContractStore(adapter, default_status="Validated")
    store.put(_contract("1.0.0"))
    store.submit_draft(_contract("1.1.0"))
    by_ver = {s.version: s.status for s in adapter.list_versions("driver.orders")}
    assert by_ver == {"1.0.0": "Validated", "1.1.0": "Draft"}


def test_update_status_on_unknown_version_raises():
    adapter = MemoryCollibraAdapter()
    with pytest.raises(LookupError):
        adapter.update_status("driver.orders", "1.0.0", "Validated")


def test_http_adapter_rest_shape():
    """The REST adapter addresses contracts by data-product/port and speaks
    the Collibra wrapping ({'status', 'contract'}); a fake transport plays
    the service and records every call."""
    state: dict[str, dict] = {}
    calls: list[tuple[str, str]] = []

    def transport(method, path, body):
        calls.append((method, path))
        base = "/rest/2.0/dataproducts/sales/ports/gold/contracts"
        if not path.startswith(base):
            return 404, None
        tail = path[len(base):].lstrip("/")
        if method == "POST":
            doc = body["contract"]
            state[doc["version"]] = {"status": body["status"], "contract": doc}
            return 201, None
        if method == "PATCH":
            if tail not in state:
                return 404, None
            state[tail]["status"] = body["status"]
            return 204, None
        if method == "GET" and not tail:
            return 200, {
                "contracts": [
                    {"version": v, "status": e["status"]} for v, e in state.items()
                ]
            }
        if method == "GET":
            if tail not in state:
                return 404, None
            return 200, state[tail]
        return 405, None

    adapter = HttpCollibraAdapter(
        transport, catalog={"driver.orders": ("sales", "gold")}
    )
    store = CollibraContractStore(adapter)
    store.put(_contract("1.0.0"))
    store.put(_contract("2.0.0"))
    adapter.update_status("driver.orders", "1.0.0", "Validated")
    assert store.versions("driver.orders") == ["1.0.0", "2.0.0"]
    assert store.get("driver.orders", "1.0.0").version == "1.0.0"
    assert store.latest_validated("driver.orders").version == "1.0.0"
    assert adapter.list_contracts() == ["driver.orders"]
    with pytest.raises(LookupError):
        adapter.get_contract("driver.orders", "3.0.0")
    with pytest.raises(LookupError):
        HttpCollibraAdapter(transport, catalog={})._base("unmapped.id")
    assert ("POST", "/rest/2.0/dataproducts/sales/ports/gold/contracts") in calls


def test_governance_service_runs_on_collibra_store(spark, sf_dir):
    """End-to-end: GovernanceService resolves its contract out of the faked
    Collibra catalog and records the evaluation normally."""
    from dc43_spark.governance.orchestrator import GovernanceService
    from dc43_spark.showcase import orders_contract

    adapter = MemoryCollibraAdapter()
    store = CollibraContractStore(adapter)
    store.put(orders_contract())
    service = GovernanceService(contract_store=store)
    contract = service.resolve_contract("driver.orders")
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    outcome = service.evaluate_dataset(df, contract, dataset_id="table:orders")
    assert outcome.validation.status in ("ok", "warn")
    link = service.dataset_contract("table:orders")
    assert (link["contract_id"], link["contract_version"]) == (
        contract.id,
        contract.version,
    )


def test_non_semver_versions_sort_below_real_ones():
    adapter = MemoryCollibraAdapter()
    adapter.upsert_contract({"id": "x", "version": "legacy", "schema": []})
    adapter.upsert_contract({"id": "x", "version": "1.0.0", "schema": []})
    vs = [s.version for s in adapter.list_versions("x")]
    assert vs == ["legacy", "1.0.0"]


def test_http_collibra_adapter_over_real_sockets():
    """HttpCollibraAdapter + urllib transport against a live stdlib HTTP
    server speaking the Collibra Data Products REST shape — proves the
    binding end-to-end over sockets, not just against a fake callable."""
    import json as jsonlib
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from dc43_spark.contracts.http_store import urllib_transport

    state: dict[str, dict] = {}
    base = "/rest/2.0/dataproducts/sales/ports/gold/contracts"

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # silence request logging
            pass

        def _reply(self, code, payload=None):
            body = jsonlib.dumps(payload).encode() if payload is not None else b""
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return jsonlib.loads(self.rfile.read(n)) if n else None

        def do_GET(self):
            if self.path == base:
                self._reply(200, {"contracts": [
                    {"version": v, "status": e["status"]} for v, e in state.items()
                ]})
            elif self.path.startswith(base + "/"):
                ver = self.path[len(base) + 1:]
                if ver in state:
                    self._reply(200, state[ver])
                else:
                    self._reply(404)
            else:
                self._reply(404)

        def do_POST(self):
            if self.path != base:
                return self._reply(404)
            body = self._body()
            state[body["contract"]["version"]] = {
                "status": body["status"], "contract": body["contract"]
            }
            self._reply(201)

        def do_PATCH(self):
            ver = self.path[len(base) + 1:]
            if not self.path.startswith(base + "/") or ver not in state:
                return self._reply(404)
            state[ver]["status"] = self._body()["status"]
            self._reply(204)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        adapter = HttpCollibraAdapter(
            urllib_transport(url), catalog={"driver.orders": ("sales", "gold")}
        )
        store = CollibraContractStore(adapter)
        store.put(_contract("1.0.0"))
        store.put(_contract("1.1.0"))
        adapter.update_status("driver.orders", "1.0.0", "Validated")
        assert store.versions("driver.orders") == ["1.0.0", "1.1.0"]
        assert store.get("driver.orders", "1.1.0").version == "1.1.0"
        assert store.latest_validated("driver.orders").version == "1.0.0"
    finally:
        server.shutdown()
        server.server_close()


# ---------------------------------------------------------------------------
# data-product tier (ref data_products/backend/collibra.py)
# ---------------------------------------------------------------------------


def test_collibra_product_store_roundtrip_and_port_evolution():
    from dc43_spark.products.collibra import (
        CollibraProductStore,
        MemoryCollibraProductAdapter,
    )
    from dc43_spark.products.odps import Port
    from dc43_spark.products.store import register_port

    store = CollibraProductStore(MemoryCollibraProductAdapter())
    p1 = register_port(
        store, "sales.producer", Port(name="gold", contract_id="driver.orders")
    )
    assert p1.version == "0.1.0"
    # identical port: no-op, same version survives in the catalog
    p2 = register_port(
        store, "sales.producer", Port(name="gold", contract_id="driver.orders")
    )
    assert p2.version == "0.1.0" and store.versions("sales.producer") == ["0.1.0"]
    # changed binding: version-bumped NEW document
    p3 = register_port(
        store,
        "sales.producer",
        Port(name="gold", contract_id="driver.orders", contract_version="==0.1.0"),
    )
    assert p3.version == "0.2.0"
    assert store.versions("sales.producer") == ["0.1.0", "0.2.0"]
    assert store.latest("sales.producer").version == "0.2.0"
    assert store.list_ids() == ["sales.producer"]
    assert store.get("sales.producer", "0.1.0").output_ports[0].name == "gold"
    store.update_status("sales.producer", "0.2.0", "Validated")
    assert store.get("sales.producer", "0.2.0").status == "Validated"


def test_port_bound_governed_read_through_collibra_catalog(spark, tmp_path):
    """The verdict's round-trip: products live in the faked Collibra
    catalog, the consumer's input port resolves through it, and the
    governed read returns contract-aligned rows."""
    from dc43_spark.contracts.model import Server
    from dc43_spark.contracts.store import MemoryContractStore
    from dc43_spark.io.read import read_with_contract
    from dc43_spark.io.write import write_with_contract
    from dc43_spark.products import DataProduct, Port, ProductRegistry
    from dc43_spark.products.collibra import (
        CollibraProductStore,
        MemoryCollibraProductAdapter,
    )

    target = str(tmp_path / "orders")
    contract = _contract("1.0.0")
    contract.servers = [Server(path=target, format="parquet")]
    cs = MemoryContractStore()
    cs.put(contract)
    reg = ProductRegistry(
        cs, product_store=CollibraProductStore(MemoryCollibraProductAdapter())
    )
    reg.register(
        DataProduct(
            id="sales.producer",
            output_ports=[Port(name="gold", contract_id="driver.orders")],
        )
    )
    reg.register(
        DataProduct(
            id="ml.consumer",
            input_ports=[
                Port(name="orders_in", source_product="sales.producer", source_port="gold")
            ],
        )
    )
    df = spark.createDataFrame([(1,), (2,)], "o_orderkey long")
    wres = write_with_contract(
        df, product="sales.producer", port="gold", registry=reg, mode="overwrite"
    )
    assert wres.validation.ok
    out, rres = read_with_contract(
        spark, product="ml.consumer", port="orders_in", registry=reg
    )
    assert rres.ok and out.count() == 2
    assert out.columns == ["o_orderkey"]


def test_http_product_adapter_rest_shape():
    from dc43_spark.products.collibra import (
        CollibraProductStore,
        HttpCollibraProductAdapter,
    )
    from dc43_spark.products.odps import DataProduct, Port

    calls = []
    state: dict[str, dict] = {}

    def transport(method, path, body):
        calls.append((method, path))
        base = "/rest/2.0/dataproducts/sales.producer"
        if method == "PUT" and path == base:
            state[body["version"]] = dict(body)
            return 201, None
        if method == "GET" and path == f"{base}/versions":
            return 200, {
                "versions": [
                    {"version": v, "status": d.get("status", "Draft")}
                    for v, d in state.items()
                ]
            }
        if method == "GET" and path == f"{base}/versions/latest":
            if not state:
                return 404, None
            best = sorted(state)[-1]
            return 200, state[best]
        if method == "GET" and path.startswith(f"{base}/versions/"):
            ver = path.rsplit("/", 1)[1]
            return (200, state[ver]) if ver in state else (404, None)
        return 404, None

    store = CollibraProductStore(HttpCollibraProductAdapter(transport))
    store.put(
        DataProduct(
            id="sales.producer",
            version="1.0.0",
            output_ports=[Port(name="gold", contract_id="driver.orders")],
        )
    )
    assert store.versions("sales.producer") == ["1.0.0"]
    got = store.get("sales.producer", "1.0.0")
    assert got.output_ports[0].contract_id == "driver.orders"
    assert store.latest("sales.producer").version == "1.0.0"
    assert store.get("sales.producer", "9.9.9") is None
    assert ("PUT", "/rest/2.0/dataproducts/sales.producer") in calls
