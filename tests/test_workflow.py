"""Draft review workflow: the write half of the contracts-app surface
(ref dc43-contracts-app server.py review/validate routes) at engine
scope — list pending drafts, approve/reject with audit trail, supersede,
HTTP routes, and the full draft-on-violation -> review -> governed-read
loop."""

from __future__ import annotations

import pytest

from dc43_spark.contracts.model import Contract, SchemaObject, SchemaProperty
from dc43_spark.contracts.store import MemoryContractStore
from dc43_spark.governance.stores import MemoryGovernanceStore
from dc43_spark.governance.workflow import latest_active, list_drafts, review_draft


def _contract(version: str, status: str) -> Contract:
    return Contract(
        id="t.orders",
        version=version,
        status=status,
        schema_objects=[
            SchemaObject(
                name="orders",
                properties=[SchemaProperty("order_id", "bigint", required=True)],
            )
        ],
    )


def test_list_approve_reject_and_audit_trail():
    cs, gov = MemoryContractStore(), MemoryGovernanceStore()
    cs.put(_contract("1.0.0", "active"))
    cs.put(_contract("1.1.0", "draft"))
    cs.put(_contract("1.2.0", "draft"))
    assert list_drafts(cs) == [
        {"contract_id": "t.orders", "version": "1.1.0"},
        {"contract_id": "t.orders", "version": "1.2.0"},
    ]

    approved = review_draft(
        cs, gov, "t.orders", "1.1.0",
        decision="approve", reviewer="ana", note="looks right",
        clock=lambda: "2026-01-01T00:00:00+00:00",
    )
    assert approved.status == "active"
    assert cs.get("t.orders", "1.1.0").status == "active"

    rejected = review_draft(
        cs, gov, "t.orders", "1.2.0", decision="reject", reviewer="bo"
    )
    assert rejected.status == "rejected"
    assert list_drafts(cs) == []

    ops = [e for e in gov.activity() if e["operation"] == "contract_review"]
    assert [e["decision"] for e in ops] == ["approve", "reject"]
    assert ops[0]["reviewer"] == "ana" and ops[0]["note"] == "looks right"
    assert ops[0]["ts"] == "2026-01-01T00:00:00+00:00"

    # the review moved resolution: latest ACTIVE is now the approved draft
    assert latest_active(cs, "t.orders").version == "1.1.0"


def test_supersede_deprecates_prior_active_versions():
    cs, gov = MemoryContractStore(), MemoryGovernanceStore()
    cs.put(_contract("1.0.0", "active"))
    cs.put(_contract("1.5.0", "active"))
    cs.put(_contract("2.0.0", "draft"))
    review_draft(
        cs, gov, "t.orders", "2.0.0",
        decision="approve", reviewer="ana", supersede=True,
    )
    assert cs.get("t.orders", "1.0.0").status == "deprecated"
    assert cs.get("t.orders", "1.5.0").status == "deprecated"
    assert cs.get("t.orders", "2.0.0").status == "active"
    entry = gov.activity()[-1]
    assert sorted(entry["deprecated_versions"]) == ["1.0.0", "1.5.0"]
    assert latest_active(cs, "t.orders").version == "2.0.0"


def test_review_guards():
    cs, gov = MemoryContractStore(), MemoryGovernanceStore()
    cs.put(_contract("1.0.0", "active"))
    with pytest.raises(LookupError):
        review_draft(cs, gov, "t.orders", "9.9.9", decision="approve", reviewer="x")
    # not a draft: double-approve surfaces as an error, not a silent no-op
    with pytest.raises(ValueError, match="not a draft"):
        review_draft(cs, gov, "t.orders", "1.0.0", decision="approve", reviewer="x")
    with pytest.raises(ValueError, match="approve|reject"):
        review_draft(cs, gov, "t.orders", "1.0.0", decision="maybe", reviewer="x")
    assert gov.activity() == []  # failed reviews leave no audit entries


def test_workflow_routes_over_real_sockets():
    from dc43_spark.contracts.http_store import HTTPContractStore, urllib_transport
    from dc43_spark.governance.server import GovernanceServiceServer

    with GovernanceServiceServer() as url:
        transport = urllib_transport(url)
        store = HTTPContractStore(transport)
        store.put(_contract("1.0.0", "draft"))
        status, payload = transport("GET", "/workflow/drafts", None)
        assert status == 200
        assert payload["drafts"] == [
            {"contract_id": "t.orders", "version": "1.0.0"}
        ]
        status, payload = transport(
            "POST",
            "/workflow/contracts/t.orders/1.0.0/approve",
            {"reviewer": "ana", "note": "ok"},
        )
        assert status == 200 and payload == {"status": "active"}
        assert store.get("t.orders", "1.0.0").status == "active"
        # second approve: 409, document unchanged
        status, payload = transport(
            "POST", "/workflow/contracts/t.orders/1.0.0/approve", {"reviewer": "bo"}
        )
        assert status == 409 and "not a draft" in payload["error"]
        # unknown document: 404
        status, _ = transport(
            "POST", "/workflow/contracts/t.orders/9.9.9/reject", {"reviewer": "bo"}
        )
        assert status == 404


def test_draft_on_violation_review_loop(spark):
    """The full loop the workflow exists for: a blocked write drafts a
    relaxed contract; review approves it; the governed read then resolves
    the approved version where the draft was invisible."""
    from dc43_spark.governance.orchestrator import GovernanceService

    svc = GovernanceService(draft_on_block=True)
    svc.contract_store.put(_contract("1.0.0", "active"))
    bad = spark.createDataFrame([(1,), (None,)], "order_id long")  # null violates
    outcome = svc.evaluate_dataset(
        bad, svc.resolve_contract("t.orders"),
        dataset_id="path:/d/orders", dataset_version="1.0.0", operation="write",
    )
    assert outcome.validation.status == "block" and outcome.draft is not None
    draft_version = outcome.draft.contract.version
    assert {"contract_id": "t.orders", "version": draft_version} in list_drafts(
        svc.contract_store
    )
    reviewed = review_draft(
        svc.contract_store, svc.store, "t.orders", draft_version,
        decision="approve", reviewer="ana", supersede=True,
    )
    assert reviewed.status == "active"
    assert latest_active(svc.contract_store, "t.orders").version == draft_version
    # the previously-active 1.0.0 is out of circulation
    assert svc.contract_store.get("t.orders", "1.0.0").status == "deprecated"
    # and the approved contract now ACCEPTS the data that was blocked
    res = svc.evaluate_dataset(
        bad, reviewed,
        dataset_id="path:/d/orders", dataset_version="1.0.1", operation="write",
    )
    assert res.validation.status in ("ok", "warn")
