"""REST API for programmatic consumers (governance/api.py +
server.py /api/* routes — ref contracts-app server.py:7652-7917) and the
integration-helper stub generator. The emitted stub is verified BY
EXECUTION against a temp filesystem store, matching the setup-bundle
precedent (tests/test_setup_bundle.py)."""

from __future__ import annotations

import json
import runpy
import urllib.error
import urllib.parse
import urllib.request

import pytest

from dc43_spark.contracts.model import (
    Contract,
    QualityRule,
    SchemaObject,
    SchemaProperty,
)
from dc43_spark.contracts.store import FSContractStore, MemoryContractStore
from dc43_spark.governance.server import GovernanceServiceServer
from dc43_spark.governance.stores import MemoryGovernanceStore
from dc43_spark.products.odps import DataProduct, Port
from dc43_spark.products.store import MemoryProductStore
from dc43_spark.showcase import orders_contract


def _get(url, path, token=None):
    req = urllib.request.Request(url + path)
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(req, timeout=5) as resp:
        return json.loads(resp.read().decode())


def _post(url, path, payload, token=None):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(req, timeout=5) as resp:
        return json.loads(resp.read().decode())


def test_rest_api_contracts_and_datasets():
    """/api/contracts, /api/contracts/{cid}/{ver}(+validate),
    /api/datasets, /api/datasets/{id}: same data the UI pages render,
    as JSON, with 404s on unknown resources and bearer auth enforced."""
    cs = MemoryContractStore()
    gs = MemoryGovernanceStore()
    contract = orders_contract()
    cs.put(contract)
    ds = "path:/data/orders"
    gs.save_status(ds, "v1", {"status": "ok"})
    gs.link(ds, contract.id, contract.version)
    gs.record_activity({"dataset_id": ds, "operation": "write",
                        "dataset_version": "v1", "status": "ok"})
    with GovernanceServiceServer(cs, gs) as url:
        catalog = _get(url, "/api/contracts")
        assert [c["id"] for c in catalog] == [contract.id]
        assert catalog[0]["versions"] == [contract.version]
        assert catalog[0]["field_count"] == 6

        detail = _get(url, f"/api/contracts/{contract.id}/{contract.version}")
        assert detail["contract"]["id"] == contract.id
        # compiled expectations ride along (enum/gt/regex + not_null)
        kinds = {e["rule"] for e in detail["expectations"]}
        assert {"enum", "gt", "regex", "not_null"} <= kinds
        # the linked dataset shows up with its matrix
        assert [d["dataset_id"] for d in detail["datasets"]] == [ds]
        assert detail["datasets"][0]["matrix"][0]["status"] == "ok"

        verdict = _post(
            url, f"/api/contracts/{contract.id}/{contract.version}/validate",
            {},
        )
        assert verdict == {"status": "active"}

        records = _get(url, "/api/datasets")
        assert records == [{
            "dataset_id": ds, "dataset_version": "v1", "status": "ok",
            "contract_id": contract.id,
            "contract_version": contract.version,
        }]
        dsq = urllib.parse.quote(ds, safe="")
        one = _get(url, f"/api/datasets/{dsq}")
        assert one["link"]["contract_id"] == contract.id
        assert one["contract"]["id"] == contract.id
        assert [e["operation"] for e in one["activity"]] == ["write"]

        for missing in ("/api/contracts/nope/1.0.0", "/api/datasets/nope",
                        "/api/nope"):
            with pytest.raises(urllib.error.HTTPError) as exc:
                _get(url, missing)
            assert exc.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(url, "/api/contracts/nope/1.0.0/validate", {})
        assert exc.value.code == 404

    # bearer auth guards the API tier like every other route
    with GovernanceServiceServer(cs, gs, auth_token="s3cret") as url:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(url, "/api/contracts")
        assert exc.value.code == 401
        assert [c["id"] for c in _get(url, "/api/contracts", token="s3cret")] \
            == [contract.id]


def _demo_contract(cid: str) -> Contract:
    return Contract(
        id=cid,
        version="1.0.0",
        status="active",
        schema_objects=[
            SchemaObject(
                name="rows",
                properties=[
                    SchemaProperty("k", "bigint", required=True,
                                   quality=[QualityRule("ge", 0)]),
                    SchemaProperty("v", "string", required=True),
                ],
            )
        ],
    )


def test_integration_helper_endpoints_and_stub_executes(
    spark, tmp_path, monkeypatch
):
    """The integration-helper surface (ref /api/integration-helper/*):
    catalogs, per-contract detail, and POST /stub returning a runnable
    governed pipeline — EXECUTED here against a temp filesystem store,
    the setup-bundle precedent."""
    croot = tmp_path / "contracts"
    cs = FSContractStore(str(croot))
    cs.put(_demo_contract("demo.orders"))
    cs.put(_demo_contract("demo.orders_gold"))
    ps = MemoryProductStore()
    ps.put(DataProduct(
        id="demo.product", version="0.1.0",
        output_ports=[Port(name="gold", contract_id="demo.orders_gold",
                           contract_version="1.0.0")],
    ))
    with GovernanceServiceServer(cs, MemoryGovernanceStore(),
                                 product_store=ps) as url:
        helper = _get(url, "/api/integration-helper/contracts")
        assert {c["id"] for c in helper["contracts"]} == {
            "demo.orders", "demo.orders_gold",
        }
        products = _get(url, "/api/integration-helper/data-products")
        assert products["data_products"][0]["id"] == "demo.product"
        assert products["data_products"][0]["output_ports"] == ["gold"]
        one = _get(url, "/api/integration-helper/contracts/demo.orders/1.0.0")
        assert one["summary"]["field_count"] == 2
        pd_detail = _get(
            url, "/api/integration-helper/data-products/demo.product/0.1.0"
        )
        assert pd_detail["data_product"]["id"] == "demo.product"

        out = _post(url, "/api/integration-helper/stub", {
            "integration": "spark",
            "inputs": [{"contract_id": "demo.orders", "version": "1.0.0"}],
            "outputs": [{"contract_id": "demo.orders_gold"}],
        })
        assert out["integration"] == "spark"
        assert out["contracts"]["inputs"][0]["id"] == "demo.orders"
        stub = out["stub"]
        assert "read_with_contract" in stub and "write_with_contract" in stub

        # refusal matrix: unsupported integration 400, empty selection
        # 422, unknown contract 404
        for payload, code in (
            ({"integration": "flink", "inputs": [{"contract_id": "x"}],
              "outputs": [{"contract_id": "y"}]}, 400),
            ({"inputs": [], "outputs": []}, 422),
            ({"inputs": [{"contract_id": "nope"}],
              "outputs": [{"contract_id": "demo.orders_gold"}]}, 404),
        ):
            with pytest.raises(urllib.error.HTTPError) as exc:
                _post(url, "/api/integration-helper/stub", payload)
            assert exc.value.code == code

    # EXECUTE the emitted stub against its own config.toml (the
    # setup-bundle precedent: scaffolds are verified by running them)
    bundle = tmp_path / "bundle"
    bundle.mkdir()
    (bundle / "integration.py").write_text(stub)
    (bundle / "config.toml").write_text(
        '[contract_store]\ntype = "filesystem"\n'
        f'root = "{croot}"\n\n'
        '[governance_store]\ntype = "filesystem"\n'
        f'root = "{tmp_path / "gstate"}"\n\n'
        "[service]\ndraft_on_block = true\n"
    )
    monkeypatch.chdir(bundle)
    mod = runpy.run_path(str(bundle / "integration.py"),
                         run_name="stub_under_test")
    verdicts = mod["main"]()
    assert verdicts == {"demo.orders_gold": "ok"}
    # the verdict persisted through the configured governance store
    from dc43_spark.governance.stores import FSGovernanceStore

    g = FSGovernanceStore(str(tmp_path / "gstate"))
    target = str(bundle / "data" / "demo.orders_gold")
    assert g.status_matrix(target)[-1]["status"] == "ok"
    # idempotent re-run (overwrite mode, stores already seeded)
    assert mod["main"]() == {"demo.orders_gold": "ok"}


def test_product_edit_ui_and_route():
    """r13 (VERDICT r12 #7): the data-product edit flow mirrors the r12
    contract edit — GET the pre-filled form, POST the changes overlay
    urlencoded, land a version-bumped NEW document after port bindings
    revalidate; bad bindings 400, unknown bases 404."""
    cs = MemoryContractStore()
    cs.put(_demo_contract("demo.orders_gold"))
    ps = MemoryProductStore()
    ps.put(DataProduct(
        id="demo.product", version="0.1.0",
        output_ports=[Port(name="gold", contract_id="demo.orders_gold",
                           contract_version="1.0.0")],
    ))
    with GovernanceServiceServer(cs, MemoryGovernanceStore(),
                                 product_store=ps) as url:
        def fetch(path):
            with urllib.request.urlopen(url + path, timeout=5) as resp:
                return resp.read().decode()

        # the product page links each version to its edit form
        page = fetch("/ui/products/demo.product")
        assert "/ui/products/demo.product/0.1.0/edit" in page

        form = fetch("/ui/products/demo.product/0.1.0/edit")
        assert "outputPorts" in form and "demo.orders_gold" in form
        assert "/products/demo.product/0.1.0/edit" in form
        assert "cannot be overridden" in form

        # POST urlencoded exactly as the form does: rename the port
        changes = {"outputPorts": [{
            "name": "gold_v2", "contractId": "demo.orders_gold",
            "version": "1.0.0",
        }]}
        body = urllib.parse.urlencode(
            {"changes": json.dumps(changes), "bump": "minor"}
        ).encode()
        req = urllib.request.Request(
            url + "/products/demo.product/0.1.0/edit", data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req, timeout=5) as resp:
            out = json.loads(resp.read().decode())
        assert out["version"] == "0.2.0"
        evolved = ps.get("demo.product", "0.2.0")
        assert [p.name for p in evolved.output_ports] == ["gold_v2"]
        # the base version is untouched (documents are immutable)
        assert [p.name for p in ps.get("demo.product", "0.1.0").output_ports] \
            == ["gold"]

        # a binding to an unknown contract refuses with 400
        bad = urllib.parse.urlencode({"changes": json.dumps({
            "outputPorts": [{"name": "x", "contractId": "nope",
                             "version": "9.9.9"}],
        })}).encode()
        req = urllib.request.Request(
            url + "/products/demo.product/0.2.0/edit", data=bad,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=5)
        assert exc.value.code == 400

        # unknown base version 404s on both the form and the route
        with pytest.raises(urllib.error.HTTPError) as exc:
            fetch("/ui/products/demo.product/9.9.9/edit")
        assert exc.value.code == 404
        req = urllib.request.Request(
            url + "/products/demo.product/9.9.9/edit",
            data=urllib.parse.urlencode(
                {"changes": json.dumps({})}
            ).encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=5)
        assert exc.value.code == 404


def test_contract_preview_route(spark, tmp_path):
    """/api/contracts/{cid}/{ver}/preview (r14 — VERDICT r13 #3, ref
    contracts-app api_contract_preview): governed sample rows through
    read_with_contract with limit honored; 404 on unknown contracts;
    503 when the service has no SparkSession wired."""
    from pyspark.sql import functions as F

    from dc43_spark.contracts.model import Server

    data_dir = str(tmp_path / "orders")
    spark.range(50).select(
        F.col("id").alias("order_id"), (F.col("id") * 2).alias("amount")
    ).write.parquet(data_dir)
    contract = Contract(
        id="orders.preview",
        version="1.0.0",
        schema_objects=[SchemaObject(
            name="orders",
            properties=[
                SchemaProperty("order_id", "bigint", required=True),
                SchemaProperty("amount", "bigint"),
            ],
        )],
        servers=[Server(format="parquet", path=data_dir)],
    )
    cs = MemoryContractStore()
    cs.put(contract)
    gs = MemoryGovernanceStore()
    gs.save_status("orders.preview", "latest", {"status": "ok"})

    with GovernanceServiceServer(cs, gs, spark_session=spark) as url:
        got = _get(
            url, f"/api/contracts/{contract.id}/{contract.version}/preview"
            "?limit=7"
        )
        assert got["limit"] == 7 and len(got["rows"]) == 7
        assert got["columns"] == ["order_id", "amount"]
        assert {r["amount"] for r in got["rows"]} <= {2 * i for i in range(50)}
        assert got["dataset_id"] == "orders.preview"
        assert got["status"] == {"status": "ok"}
        assert got["validation"]["ok"] is True

        # the ref clamps limit to 1..500
        got = _get(
            url, f"/api/contracts/{contract.id}/{contract.version}/preview"
            "?limit=100000"
        )
        assert got["limit"] == 500 and len(got["rows"]) == 50

        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(url, "/api/contracts/unknown/1.0.0/preview")
        assert exc.value.code == 404

    # no SparkSession wired -> 503, the ref's "pyspark is required" guard
    with GovernanceServiceServer(cs, gs) as url:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(url, f"/api/contracts/{contract.id}/{contract.version}/preview")
        assert exc.value.code == 503
