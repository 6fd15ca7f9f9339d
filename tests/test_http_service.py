"""HTTP service topology round-trip over real sockets: contracts +
governance served by GovernanceServiceServer, consumed by the HTTP store
clients, then a full GovernanceService evaluation running entirely against
the remote stores (ref dc43-service-backends server.py + service-clients
remote clients)."""

from __future__ import annotations

from dc43_spark.contracts.http_store import HTTPContractStore, urllib_transport
from dc43_spark.governance.orchestrator import GovernanceService
from dc43_spark.governance.server import GovernanceServiceServer, HTTPGovernanceStore
from dc43_spark.showcase import orders_contract


def test_contract_store_round_trip_real_sockets():
    with GovernanceServiceServer() as url:
        store = HTTPContractStore(urllib_transport(url))
        contract = orders_contract()
        assert store.get(contract.id, contract.version) is None
        assert store.list_ids() == []
        store.put(contract)
        fetched = store.get(contract.id, contract.version)
        assert fetched is not None and fetched.to_dict() == contract.to_dict()
        assert store.versions(contract.id) == [contract.version]
        assert store.list_ids() == [contract.id]
        assert store.resolve(contract.id, "latest").version == contract.version


def test_governance_store_round_trip_real_sockets():
    with GovernanceServiceServer() as url:
        gov = HTTPGovernanceStore(urllib_transport(url))
        ds = "path:/data/orders"  # colon+slash exercise URL quoting
        assert gov.load_status(ds, "1.0.0") is None
        gov.save_status(ds, "1.0.0", {"status": "ok", "ok": True})
        gov.save_status(ds, "1.1.0", {"status": "warn", "ok": True})
        assert gov.load_status(ds, "1.0.0")["status"] == "ok"
        gov.link(ds, "driver.orders", "0.1.0")
        assert gov.get_link(ds) == {
            "contract_id": "driver.orders",
            "contract_version": "0.1.0",
        }
        gov.record_activity({"dataset_id": ds, "operation": "read"})
        gov.record_activity({"dataset_id": "other", "operation": "write"})
        assert len(gov.activity()) == 2
        assert [e["dataset_id"] for e in gov.activity(ds)] == [ds]
        matrix = gov.status_matrix(ds)
        assert [r["dataset_version"] for r in matrix] == ["1.0.0", "1.1.0"]


def test_governance_service_over_remote_stores(spark, orders_df):
    """The orchestrator itself runs against the HTTP tier: evaluate a real
    DataFrame, verdict + link + activity all land behind the socket."""
    contract = orders_contract()
    with GovernanceServiceServer() as url:
        transport = urllib_transport(url)
        service = GovernanceService(
            contract_store=HTTPContractStore(transport),
            store=HTTPGovernanceStore(transport),
        )
        service.contract_store.put(contract)
        resolved = service.resolve_contract(contract.id, "latest")
        from dc43_spark.engine.validation import apply_contract

        outcome = service.evaluate_dataset(
            apply_contract(orders_df, resolved),
            resolved,
            dataset_id="path:/driver/orders",
            dataset_version="1.0.0",
            operation="read",
        )
        assert outcome.validation.status == "ok"
        status = service.dataset_status("path:/driver/orders", "1.0.0")
        assert status["status"] == "ok" and status["contract_id"] == contract.id
        assert service.dataset_contract("path:/driver/orders")["contract_version"] == contract.version
        assert len(service.pipeline_activity("path:/driver/orders")) == 1
        assert len(service.status_matrix("path:/driver/orders")) == 1
