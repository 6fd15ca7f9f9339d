"""Unity-Catalog-style dataset<->contract tag propagation.

Covers the link-hook semantics the reference implements in
governance/unity_catalog.py:63-365 (hooked from governance/backend/
local.py:425-454): property/tag stamping on link, server-table resolution,
prefix fallback, reserved-key and bad-character normalization, skip lists,
and failure isolation — plus a REAL end-to-end pass against the local Spark
session catalog via ALTER TABLE DDL.
"""

from __future__ import annotations

import warnings

import pytest

from dc43_spark.contracts.model import Contract, SchemaObject, SchemaProperty, Server
from dc43_spark.governance.catalog_sync import (
    SparkSqlCatalogClient,
    UnityCatalogLinkHook,
    contract_server_tables,
    normalize_tag_key,
    prefix_table_resolver,
)
from dc43_spark.governance.orchestrator import GovernanceService


class FakeClient:
    def __init__(self, fail_on: set[str] | None = None):
        self.properties: dict[str, dict[str, str]] = {}
        self.tags: dict[str, dict[str, str]] = {}
        self.fail_on = fail_on or set()

    def set_properties(self, table, properties):
        if table in self.fail_on:
            raise RuntimeError("catalog down")
        self.properties.setdefault(table, {}).update(properties)

    def set_tags(self, table, tags, unset=()):
        if table in self.fail_on:
            raise RuntimeError("catalog down")
        bucket = self.tags.setdefault(table, {})
        bucket.update(tags)
        for k in unset:
            bucket.pop(k, None)


def _contract(tables: list[str] | None = None) -> Contract:
    servers = [Server(server="uc", type="databricks", table=t) for t in (tables or [])]
    return Contract(
        id="driver.orders",
        version="1.2.0",
        schema_objects=[
            SchemaObject(name="orders", properties=[SchemaProperty("o_orderkey", "bigint")])
        ],
        servers=servers,
    )


def test_link_stamps_properties_and_tags_on_prefix_resolved_table():
    client = FakeClient()
    hook = UnityCatalogLinkHook(client=client)
    hook("table:main.gov.orders", "2026-08-13", "driver.orders", "1.2.0")
    props = client.properties["main.gov.orders"]
    assert props["dc43.contract_id"] == "driver.orders"
    assert props["dc43.contract_version"] == "1.2.0"
    assert props["dc43.dataset_version"] == "2026-08-13"
    # tag keys are UC-normalized: '.' -> '_'
    assert client.tags["main.gov.orders"]["dc43_contract_id"] == "driver.orders"


def test_path_datasets_resolve_to_no_table():
    client = FakeClient()
    UnityCatalogLinkHook(client=client)("/data/orders", "v1", "driver.orders", "1.0.0")
    assert client.properties == {} and client.tags == {}


def test_contract_server_tables_win_over_prefix_resolution():
    client = FakeClient()
    contract = _contract(["main.gov.orders", "main.gov.ORDERS", "main.bak.orders"])
    hook = UnityCatalogLinkHook(
        client=client, contract_loader=lambda cid, cver: contract
    )
    hook("table:ignored.by.servers", "v9", "driver.orders", "1.2.0")
    # dedup is case-insensitive; both distinct tables stamped
    assert set(client.properties) == {"main.gov.orders", "main.bak.orders"}


def test_skip_tables_and_failure_isolation():
    client = FakeClient(fail_on={"main.gov.bad"})
    contract = _contract(["main.gov.bad", "system.billing", "main.gov.ok"])
    hook = UnityCatalogLinkHook(
        client=client,
        contract_loader=lambda cid, cver: contract,
        skip_tables=frozenset({"system.billing"}),
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        hook("table:x", "v1", "driver.orders", "1.2.0")
    # the failing table warned (property + tag) and did not abort the run
    assert "main.gov.ok" in client.properties
    assert "system.billing" not in client.properties
    texts = [str(w.message) for w in caught]
    assert any("sync failed" in t for t in texts)
    assert any("skipped reserved table" in t for t in texts)


def test_reserved_and_invalid_keys_normalized():
    assert normalize_tag_key("owner") is None
    assert normalize_tag_key(" dc43/env:prod ") == "dc43_env_prod"
    assert normalize_tag_key("") is None
    client = FakeClient()
    hook = UnityCatalogLinkHook(
        client=client,
        static_properties={"owner": "me", "team": "data"},
        static_tags={"cost-center": "42"},
    )
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        hook("table:t", "v1", "c", "1.0.0")
    assert "owner" not in client.properties["t"]
    assert client.properties["t"]["team"] == "data"
    assert client.tags["t"]["cost_center"] == "42"


def test_prefix_resolver_variants():
    assert prefix_table_resolver()("table:a.b.c") == "a.b.c"
    assert prefix_table_resolver()("a.b.c") is None
    assert prefix_table_resolver("")("a.b.c") == "a.b.c"
    assert contract_server_tables(_contract(["x.y.z"])) == ("x.y.z",)
    assert contract_server_tables(_contract()) == ()


def test_governance_service_fires_link_hooks(spark, sf_dir):
    from dc43_spark.showcase import orders_contract

    client = FakeClient()
    service = GovernanceService(
        link_hooks=[UnityCatalogLinkHook(client=client)]
    )
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    contract = orders_contract()
    service.evaluate_dataset(
        df, contract, dataset_id="table:main.gov.orders", dataset_version="2026-08-13"
    )
    props = client.properties["main.gov.orders"]
    assert props["dc43.contract_id"] == contract.id
    assert props["dc43.contract_version"] == contract.version


def test_spark_sql_client_end_to_end(spark):
    """Real DDL against the local session catalog: the exact statements a
    Databricks session would send to Unity Catalog."""
    spark.sql("DROP TABLE IF EXISTS dc43_sync_demo")
    spark.range(3).write.saveAsTable("dc43_sync_demo")
    try:
        hook = UnityCatalogLinkHook(
            client=SparkSqlCatalogClient(spark=spark),
            table_resolver=prefix_table_resolver(""),
        )
        hook("dc43_sync_demo", "v7", "driver.orders", "1.2.0")
        rows = spark.sql("SHOW TBLPROPERTIES dc43_sync_demo").collect()
        props = {r["key"]: r["value"] for r in rows}
        assert props["dc43.contract_id"] == "driver.orders"
        assert props["dc43.contract_version"] == "1.2.0"
        assert props["dc43.dataset_version"] == "v7"
        # OSS fallback encodes tags as dc43.tag.* properties
        assert props["dc43.tag.dc43_contract_id"] == "driver.orders"
        # unset path removes the encoded tag
        SparkSqlCatalogClient(spark=spark).set_tags(
            "dc43_sync_demo", {}, unset=["dc43_contract_id"]
        )
        rows = spark.sql("SHOW TBLPROPERTIES dc43_sync_demo").collect()
        props = {r["key"]: r["value"] for r in rows}
        assert "dc43.tag.dc43_contract_id" not in props
    finally:
        spark.sql("DROP TABLE IF EXISTS dc43_sync_demo")


def test_uc_tag_ddl_statement_shape():
    """With uc_tag_ddl=True the client emits UC's SET/UNSET TAGS DDL."""

    class SqlSpy:
        def __init__(self):
            self.statements: list[str] = []

        def sql(self, statement):
            self.statements.append(statement)

    spy = SqlSpy()
    client = SparkSqlCatalogClient(spark=spy, uc_tag_ddl=True)
    client.set_tags("main.gov.orders", {"env": "prod"}, unset=["stale"])
    assert spy.statements == [
        "ALTER TABLE `main`.`gov`.`orders` SET TAGS ('env'='prod')",
        "ALTER TABLE `main`.`gov`.`orders` UNSET TAGS ('stale')",
    ]


def test_quote_escaping():
    class SqlSpy:
        def __init__(self):
            self.statements = []

        def sql(self, statement):
            self.statements.append(statement)

    spy = SqlSpy()
    SparkSqlCatalogClient(spark=spy).set_properties("a.b", {"k'ey": "v'al"})
    assert spy.statements == [
        "ALTER TABLE `a`.`b` SET TBLPROPERTIES ('k''ey'='v''al')"
    ]
    with pytest.raises(ValueError):
        SparkSqlCatalogClient(spark=spy).set_properties("", {"k": "v"})
