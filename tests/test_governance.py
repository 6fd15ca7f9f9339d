from __future__ import annotations

import pytest

from dc43_spark.contracts import Contract, QualityRule, SchemaObject, SchemaProperty
from dc43_spark.contracts.store import FSContractStore, MemoryContractStore
from dc43_spark.governance import FSGovernanceStore, GovernanceService, MemoryGovernanceStore
from dc43_spark.products import DataProduct, Port, ProductRegistry


def orders_contract(version="0.1.0") -> Contract:
    return Contract(
        id="test.orders", version=version,
        schema_objects=[
            SchemaObject(
                name="orders",
                properties=[
                    SchemaProperty("order_id", "bigint", required=True),
                    SchemaProperty("amount", "double", required=True, quality=[QualityRule("gt", 0.0)]),
                ],
            )
        ],
    )


@pytest.fixture()
def service():
    svc = GovernanceService(clock=lambda: "2026-01-01T00:00:00+00:00")
    svc.contract_store.put(orders_contract())
    return svc


def test_evaluate_persists_status_and_links(spark, service):
    df = spark.createDataFrame([(1, 10.0)], "order_id long, amount double")
    out = service.evaluate_dataset(
        df, service.resolve_contract("test.orders"),
        dataset_id="path:/data/orders", dataset_version="v1", operation="write",
    )
    assert out.validation.ok
    status = service.dataset_status("path:/data/orders", "v1")
    assert status["status"] == "ok" and status["contract_version"] == "0.1.0"
    assert service.dataset_contract("path:/data/orders")["contract_id"] == "test.orders"
    acts = service.pipeline_activity("path:/data/orders")
    assert len(acts) == 1 and acts[0]["operation"] == "write"


def test_status_matrix(spark, service):
    contract = service.resolve_contract("test.orders")
    good = spark.createDataFrame([(1, 10.0)], "order_id long, amount double")
    bad = spark.createDataFrame([(2, -1.0)], "order_id long, amount double")
    service.evaluate_dataset(good, contract, dataset_id="d", dataset_version="v1", operation="write")
    service.evaluate_dataset(bad, contract, dataset_id="d", dataset_version="v2", operation="write")
    matrix = service.status_matrix("d")
    assert [(m["dataset_version"], m["status"]) for m in matrix] == [("v1", "ok"), ("v2", "block")]


def test_draft_on_block(spark):
    svc = GovernanceService(draft_on_block=True)
    svc.contract_store.put(orders_contract())
    bad = spark.createDataFrame([(1, -1.0)], "order_id long, amount double")
    out = svc.evaluate_dataset(
        bad, svc.resolve_contract("test.orders"),
        dataset_id="d", dataset_version="v1", operation="write",
    )
    assert out.draft is not None
    assert out.draft.contract.version in svc.contract_store.versions("test.orders")
    # drafts are excluded from 'latest'
    assert svc.resolve_contract("test.orders").version == "0.1.0"
    status = svc.dataset_status("d", "v1")
    assert status["draft_version"] == out.draft.contract.version


def test_fs_governance_store_roundtrip(tmp_path):
    store = FSGovernanceStore(tmp_path)
    store.save_status("table:t", "v1", {"status": "ok", "metrics": {"row_count": 2}})
    store.link("table:t", "c.id", "1.0.0")
    store.record_activity({"dataset_id": "table:t", "operation": "read"})
    again = FSGovernanceStore(tmp_path)
    assert again.load_status("table:t", "v1")["status"] == "ok"
    assert again.get_link("table:t")["contract_version"] == "1.0.0"
    assert again.activity("table:t")[0]["operation"] == "read"
    assert again.status_matrix("table:t")[0]["dataset_version"] == "v1"


def test_product_registry():
    cs = MemoryContractStore()
    cs.put(orders_contract())
    cs.put(orders_contract("1.0.0"))
    reg = ProductRegistry(cs)
    product = DataProduct(
        id="sales.analytics",
        output_ports=[Port(name="gold", contract_id="test.orders", contract_version=">=0.1.0")],
        input_ports=[Port(name="raw", contract_id="test.orders", contract_version="==0.1.0")],
    )
    reg.register(product)
    assert reg.resolve_output_contract("sales.analytics", "gold").version == "1.0.0"
    assert reg.resolve_input_contract("sales.analytics", "raw").version == "0.1.0"
    with pytest.raises(LookupError):
        reg.register(DataProduct(id="x", output_ports=[Port(name="o", contract_id="nope")]))
    d = product.to_dict()
    assert DataProduct.from_dict(d).output_ports[0].contract_id == "test.orders"


def test_memory_store_isolation():
    s = MemoryGovernanceStore()
    assert s.load_status("a", "b") is None
    assert s.activity() == [] and s.status_matrix("a") == []


def test_spark_table_governance_store_roundtrip(spark):
    from dc43_spark.governance.stores import SparkTableGovernanceStore

    store = SparkTableGovernanceStore(spark, "gov_rt")
    assert store.load_status("path:/d/orders", "1.0.0") is None
    store.save_status("path:/d/orders", "1.0.0", {"status": "block", "ok": False})
    store.save_status("path:/d/orders", "1.0.0", {"status": "ok", "ok": True})
    # latest-wins on the append-only log
    assert store.load_status("path:/d/orders", "1.0.0")["status"] == "ok"
    store.save_status("path:/d/orders", "1.1.0", {"status": "warn", "ok": True})

    store.link("path:/d/orders", "c.id", "0.9.0")
    store.link("path:/d/orders", "c.id", "1.0.0")
    assert store.get_link("path:/d/orders")["contract_version"] == "1.0.0"

    store.record_activity({"dataset_id": "path:/d/orders", "operation": "read"})
    store.record_activity({"dataset_id": "other", "operation": "write"})
    assert [e["operation"] for e in store.activity("path:/d/orders")] == ["read"]
    assert len(store.activity()) == 2

    matrix = store.status_matrix("path:/d/orders")
    assert [(r["dataset_version"], r["status"]) for r in matrix] == [
        ("1.0.0", "ok"), ("1.1.0", "warn"),
    ]


def test_governance_service_over_spark_table_store(spark):
    from dc43_spark.governance.stores import SparkTableGovernanceStore

    svc = GovernanceService(
        store=SparkTableGovernanceStore(spark, "gov_svc"),
        clock=lambda: "2026-01-01T00:00:00+00:00",
    )
    svc.contract_store.put(orders_contract())
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "order_id long, amount double")
    outcome = svc.evaluate_dataset(
        df, svc.resolve_contract("test.orders"),
        dataset_id="table:orders", dataset_version="1.0.0", operation="write",
    )
    assert outcome.validation.status == "ok"
    assert svc.dataset_status("table:orders", "1.0.0")["status"] == "ok"
    assert svc.dataset_contract("table:orders")["contract_id"] == "test.orders"
    assert len(svc.pipeline_activity("table:orders")) == 1


def test_product_stores_roundtrip_and_port_registration(tmp_path):
    """FS/SQL product stores persist ODPS documents across instances, and
    register_port evolves a bumped immutable version per port change (ref
    data_products/backend/stores + interface.py:53-75)."""
    from dc43_spark.products import (
        DataProduct, FSProductStore, Port, ProductRegistry, SQLProductStore,
        register_port,
    )

    product = DataProduct(
        id="sales.analytics", version="1.0.0",
        output_ports=[Port(name="gold", contract_id="test.orders")],
    )
    for store in (FSProductStore(tmp_path / "products"),
                  SQLProductStore(str(tmp_path / "products.db"))):
        store.put(product)
        assert store.get("sales.analytics", "1.0.0").to_dict() == product.to_dict()
        assert store.versions("sales.analytics") == ["1.0.0"]
        assert store.list_ids() == ["sales.analytics"]
        assert store.latest("sales.analytics").version == "1.0.0"

    # persistence across instances (FS)
    again = FSProductStore(tmp_path / "products")
    assert again.latest("sales.analytics").version == "1.0.0"

    # idempotent port registration: identical port -> no new version
    store = SQLProductStore(str(tmp_path / "reg.db"))
    store.put(product)
    same = register_port(
        store, "sales.analytics", Port(name="gold", contract_id="test.orders")
    )
    assert same.version == "1.0.0" and store.versions("sales.analytics") == ["1.0.0"]
    # new port -> minor bump, old version untouched
    evolved = register_port(
        store, "sales.analytics",
        Port(name="silver", contract_id="test.orders"), bump="minor",
    )
    assert evolved.version == "1.1.0"
    assert [p.name for p in evolved.output_ports] == ["gold", "silver"]
    assert [p.name for p in store.get("sales.analytics", "1.0.0").output_ports] == ["gold"]
    # changed binding on an existing port name -> replaced + bumped
    rebound = register_port(
        store, "sales.analytics",
        Port(name="gold", contract_id="test.orders", contract_version="==1.0.0"),
        bump="patch",
    )
    assert rebound.version == "1.1.1"
    gold = next(p for p in rebound.output_ports if p.name == "gold")
    assert gold.contract_version == "==1.0.0"
    # unknown product bootstraps at 0.1.0 with the port attached
    fresh = register_port(store, "ml.features", Port(name="in", contract_id="c"), kind="input")
    assert fresh.version == "0.1.0" and fresh.input_ports[0].name == "in"

    # the registry runs unchanged on a persistent store
    cs = MemoryContractStore()
    cs.put(orders_contract("1.0.0"))
    reg = ProductRegistry(cs, FSProductStore(tmp_path / "reg_fs"))
    reg.register(DataProduct(
        id="p", output_ports=[Port(name="out", contract_id="test.orders")]))
    assert reg.resolve_output_contract("p", "out").version == "1.0.0"
    reg2 = ProductRegistry(cs, FSProductStore(tmp_path / "reg_fs"))
    assert reg2.resolve_output_contract("p", "out").version == "1.0.0"


def test_spark_table_product_store(spark):
    """The Delta-product-store analogue (ref data_products/backend/stores/
    delta.py) over a Spark catalog table — same (id, version, document)
    convention as SparkTableContractStore so one deployment keeps a single
    document-storage shape for both kinds."""
    from dc43_spark.products import DataProduct, Port, ProductRegistry
    from dc43_spark.products.store import SparkTableProductStore

    store = SparkTableProductStore(spark, "dp_store_rt")
    product = DataProduct(
        id="sales.analytics", version="1.0.0",
        output_ports=[Port(name="gold", contract_id="test.orders")],
    )
    store.put(product)
    assert store.get("sales.analytics", "1.0.0").to_dict() == product.to_dict()
    assert store.versions("sales.analytics") == ["1.0.0"]
    assert store.list_ids() == ["sales.analytics"]
    assert store.latest("sales.analytics").version == "1.0.0"
    assert store.get("sales.analytics", "9.9.9") is None
    # quoting survives ids with single quotes
    quoted = DataProduct(id="it's", version="0.1.0")
    store.put(quoted)
    assert store.get("it's", "0.1.0").id == "it's"
    # the registry runs unchanged on the table-backed store
    cs = MemoryContractStore()
    cs.put(orders_contract("1.0.0"))
    reg = ProductRegistry(cs, store)
    reg.register(DataProduct(
        id="p", output_ports=[Port(name="out", contract_id="test.orders")]))
    assert reg.resolve_output_contract("p", "out").version == "1.0.0"
    spark.sql("DROP TABLE IF EXISTS dp_store_rt")


def test_bootstrap_builds_product_registry(tmp_path):
    from dc43_spark.governance import bootstrap as bs
    from dc43_spark.products import DataProduct, Port

    cfg_file = tmp_path / "svc.toml"
    cfg_file.write_text(f"""
[contract_store]
type = "sql"
dsn = "{tmp_path / 'c.db'}"

[product_store]
type = "sql"
dsn = "{tmp_path / 'p.db'}"
""")
    cfg = bs.load_config(str(cfg_file), env={})
    reg = bs.build_registry(cfg)
    reg.contract_store.put(orders_contract())
    reg.register(DataProduct(
        id="p", output_ports=[Port(name="out", contract_id="test.orders")]))
    # a second registry over the same config sees the persisted product
    reg2 = bs.build_registry(cfg)
    assert reg2.resolve_output_contract("p", "out").id == "test.orders"
    # env overrides the product store type
    cfg2 = bs.load_config(str(cfg_file), env={"DC43_DATA_PRODUCT_STORE_TYPE": "memory"})
    assert cfg2.product_store.type == "memory"
    # collibra tier resolves to the HTTP-adapter-backed store
    from dc43_spark.products.collibra import CollibraProductStore

    collibra_cfg = bs.StoreConfig.from_mapping(
        {"type": "collibra", "base_url": "http://collibra.local"}
    )
    assert isinstance(bs.build_product_store(collibra_cfg), CollibraProductStore)
    with pytest.raises(ValueError, match="base_url"):
        bs.build_product_store(bs.StoreConfig.from_mapping({"type": "collibra"}))
    with pytest.raises(ValueError, match="spark"):
        bs.build_product_store(
            bs.StoreConfig.from_mapping({"type": "spark_table", "table": "t"})
        )


def test_evaluate_tracks_drift_across_versions(spark, service):
    """track_drift stores a profile with each verdict and warns when a
    later version drifts from the newest stored profile — without ever
    re-reading the earlier version's data."""
    contract = service.resolve_contract("test.orders")
    v1 = spark.createDataFrame(
        [(i, 10.0 + i) for i in range(50)], "order_id long, amount double"
    )
    out1 = service.evaluate_dataset(
        v1, contract, dataset_id="d", dataset_version="v1",
        operation="write", track_drift=True,
    )
    assert out1.validation.ok and not any(
        "drift" in w for w in out1.validation.warnings
    )
    assert "profile" in service.dataset_status("d", "v1")
    # v2: amount goes 30% null -> null-rate drift flagged as a warning
    v2 = spark.createDataFrame(
        [(i, None if i < 30 else 10.0 + i) for i in range(100)],
        "order_id long, amount double",
    )
    out2 = service.evaluate_dataset(
        v2, contract, dataset_id="d", dataset_version="v2",
        operation="read", track_drift=True,
    )
    drift_warnings = [w for w in out2.validation.warnings if w.startswith("drift vs")]
    assert drift_warnings and "amount" in drift_warnings[0]
    assert "v1" in drift_warnings[0]
    # a stable v3 (same shape as v2) does not warn
    out3 = service.evaluate_dataset(
        v2, contract, dataset_id="d", dataset_version="v3",
        operation="read", track_drift=True,
    )
    assert not [w for w in out3.validation.warnings if w.startswith("drift vs")]


def test_drift_tracking_catches_shape_via_psi(spark, service):
    """The PSI leg flows end-to-end through the orchestrator: a version
    whose amount distribution goes uniform -> bimodal with IDENTICAL
    min/max, null rate, and distinct count still raises the drift
    warning, from the STORED profile's sketches alone."""
    contract = service.resolve_contract("test.orders")
    uniform = spark.createDataFrame(
        [(i, i * 0.1) for i in range(1001)], "order_id long, amount double"
    )
    service.evaluate_dataset(
        uniform, contract, dataset_id="ds", dataset_version="v1",
        operation="write", track_drift=True,
    )
    bimodal = spark.createDataFrame(
        [(i, i * 0.02) for i in range(501)]
        + [(501 + i, 90.0 + i * 0.02) for i in range(501)],
        "order_id long, amount double",
    )
    out = service.evaluate_dataset(
        bimodal, contract, dataset_id="ds", dataset_version="v2",
        operation="read", track_drift=True,
    )
    drift = [w for w in out.validation.warnings if w.startswith("drift vs")]
    assert drift and "amount" in drift[0]


def test_governance_metrics_tier_across_stores(spark, tmp_path):
    """The dq_metrics tier (ref governance/backend/stores/delta.py):
    save_status flattens the payload's metrics into one row per key;
    load_metrics filters by version/contract and is latest-wins per
    (version, key); list_datasets enumerates. Memory, FS and Spark-table
    stores must agree."""
    from dc43_spark.governance.stores import (
        FSGovernanceStore,
        MemoryGovernanceStore,
        SparkTableGovernanceStore,
    )

    def payload(n_violations, recorded_at, status="ok"):
        return {
            "status": status,
            "ok": status == "ok",
            "contract_id": "c.orders",
            "contract_version": "1.0.0",
            "recorded_at": recorded_at,
            "metrics": {
                "row_count": 100,
                "violations.not_null_k": n_violations,
                "note": "free-text",
            },
        }

    stores = [
        MemoryGovernanceStore(),
        FSGovernanceStore(tmp_path / "gov"),
        SparkTableGovernanceStore(spark, "gov_metrics"),
    ]
    for store in stores:
        store.save_status("path:/d/orders", "1.0.0", payload(7, "t1", "warn"))
        store.save_status("path:/d/orders", "1.0.0", payload(0, "t2"))  # re-run
        store.save_status("path:/d/orders", "1.1.0", payload(3, "t3"))
        store.save_status("path:/other", "0.1.0", payload(1, "t4"))

        datasets = store.list_datasets()
        assert len(datasets) == 2 and datasets == sorted(datasets)

        recs = store.load_metrics("path:/d/orders")
        # latest-wins: the re-validated 1.0.0 shows 0 violations, not 7
        got = {
            (r["dataset_version"], r["metric_key"]): r["metric_numeric_value"]
            for r in recs
        }
        assert got[("1.0.0", "violations.not_null_k")] == 0.0
        assert got[("1.1.0", "violations.not_null_k")] == 3.0
        assert got[("1.0.0", "row_count")] == 100.0
        assert got[("1.0.0", "note")] is None  # non-numeric: payload only
        assert all(r["contract_id"] == "c.orders" for r in recs)

        one = store.load_metrics("path:/d/orders", dataset_version="1.1.0")
        assert {r["metric_key"] for r in one} == {
            "row_count", "violations.not_null_k", "note",
        }
        assert store.load_metrics("path:/d/orders", contract_id="nope") == []
