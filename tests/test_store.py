from __future__ import annotations

from dc43_spark.contracts import Contract, SchemaObject, SchemaProperty
from dc43_spark.contracts.store import FSContractStore, MemoryContractStore


def make(version: str, status: str = "active") -> Contract:
    return Contract(
        id="test.orders",
        version=version,
        status=status,
        schema_objects=[
            SchemaObject(name="orders", properties=[SchemaProperty("id", "bigint", required=True)])
        ],
    )


def _exercise(store):
    for v in ["0.1.0", "0.1.1", "1.0.0"]:
        store.put(make(v))
    store.put(make("1.1.0-draft-x", status="draft"))
    assert store.versions("test.orders") == ["0.1.0", "0.1.1", "1.0.0", "1.1.0-draft-x"]
    assert store.get("test.orders", "0.1.1").version == "0.1.1"
    assert store.get("test.orders", "9.9.9") is None
    assert store.resolve("test.orders").version == "1.0.0"  # latest skips drafts
    assert store.resolve("test.orders", ">=0.1.1").version == "1.0.0"
    assert store.resolve("test.orders", "==0.1.0").version == "0.1.0"
    assert store.list_ids() == ["test.orders"]
    assert store.resolve("missing.id") is None


def test_memory_store():
    _exercise(MemoryContractStore())


def test_fs_store_roundtrip(tmp_path):
    store = FSContractStore(tmp_path / "contracts")
    _exercise(store)
    # a second store instance over the same root sees the same documents
    again = FSContractStore(tmp_path / "contracts")
    assert again.resolve("test.orders").version == "1.0.0"
    loaded = again.get("test.orders", "1.0.0")
    assert loaded.schema_object.properties[0].name == "id"


def test_sql_contract_store_roundtrip(tmp_path):
    from dc43_spark.contracts.sql_store import SQLContractStore

    store = SQLContractStore(str(tmp_path / "contracts.db"))
    _exercise(store)


def test_sql_governance_store(tmp_path):
    from dc43_spark.contracts.sql_store import SQLGovernanceStore

    store = SQLGovernanceStore(str(tmp_path / "gov.db"))
    store.save_status("path:/d", "1.0.0", {"status": "ok"})
    store.save_status("path:/d", "1.1.0", {"status": "block"})
    assert store.load_status("path:/d", "1.0.0") == {"status": "ok"}
    assert store.load_status("path:/d", "9.9.9") is None
    store.link("path:/d", "c.orders", "2.0.0")
    assert store.get_link("path:/d") == {
        "contract_id": "c.orders", "contract_version": "2.0.0",
    }
    store.record_activity({"dataset_id": "path:/d", "op": "read"})
    store.record_activity({"dataset_id": "path:/other", "op": "write"})
    assert [a["op"] for a in store.activity("path:/d")] == ["read"]
    assert len(store.activity()) == 2
    matrix = store.status_matrix("path:/d")
    assert [(m["dataset_version"], m["status"]) for m in matrix] == [
        ("1.0.0", "ok"), ("1.1.0", "block"),
    ]


def test_http_contract_store_with_fake_transport():
    from dc43_spark.contracts.http_store import HTTPContractStore

    # in-memory server implementing the JSON protocol
    docs: dict[tuple[str, str], dict] = {}

    def transport(method, path, body):
        parts = path.strip("/").split("/")
        if method == "PUT" and len(parts) == 3:
            docs[(parts[1], parts[2])] = body
            return 200, None
        if method == "GET" and path == "/contracts":
            return 200, {"ids": sorted({k[0] for k in docs})}
        if method == "GET" and len(parts) == 3 and parts[2] == "versions":
            vs = [v for (cid, v) in docs if cid == parts[1]]
            return (200, {"versions": vs}) if vs else (404, None)
        if method == "GET" and len(parts) == 3:
            doc = docs.get((parts[1], parts[2]))
            return (200, doc) if doc else (404, None)
        return 400, None

    _exercise(HTTPContractStore(transport))


def test_spark_table_stores_put_is_replace(spark):
    """Review finding: plain INSERT made re-put keep the stale row and
    get() nondeterministic — the draft-approve flow re-puts the same
    version with status flipped and must read back the new document."""
    from dc43_spark.contracts.model import Contract, SchemaObject, SchemaProperty
    from dc43_spark.contracts.store import SparkTableContractStore
    from dc43_spark.products.odps import DataProduct
    from dc43_spark.products.store import SparkTableProductStore

    cs = SparkTableContractStore(spark, "default.put_replace_contracts")
    c = Contract(
        id="pr.c", version="1.0.0", status="draft",
        schema_objects=[SchemaObject(name="t", properties=[
            SchemaProperty("k", "bigint", required=True),
        ])],
    )
    cs.put(c)
    c2 = Contract.from_dict(c.to_dict())
    c2.status = "active"
    cs.put(c2)
    assert cs.get("pr.c", "1.0.0").status == "active"
    assert cs.versions("pr.c") == ["1.0.0"]

    ps = SparkTableProductStore(spark, "default.put_replace_products")
    p = DataProduct(id="pr.p", version="1.0.0", status="draft")
    ps.put(p)
    p2 = DataProduct.from_dict(p.to_dict())
    p2.status = "active"
    ps.put(p2)
    assert ps.get("pr.p", "1.0.0").status == "active"


def test_spark_table_store_migrates_legacy_3col_layout(spark):
    """ADVICE r7 (low): a pre-seq (id, version, document) table must be
    evolved in place (ALTER TABLE ADD COLUMNS) — CREATE IF NOT EXISTS
    alone left put() failing on INSERT arity and get() unable to resolve
    orderBy('seq'). Legacy rows stay readable; re-puts win."""
    import json as _json

    from dc43_spark.contracts.model import Contract, SchemaObject, SchemaProperty
    from dc43_spark.contracts.store import SparkTableContractStore

    table = "default.legacy_contracts"
    spark.sql(
        f"CREATE TABLE {table} (id STRING, version STRING, document STRING) "
        "USING parquet"
    )
    legacy = Contract(
        id="lg.c", version="1.0.0", status="draft",
        schema_objects=[SchemaObject(name="t", properties=[
            SchemaProperty("k", "bigint", required=True),
        ])],
    )
    doc = _json.dumps(legacy.to_dict(), sort_keys=True).replace("'", "''")
    spark.sql(f"INSERT INTO {table} VALUES ('lg.c', '1.0.0', '{doc}')")

    store = SparkTableContractStore(spark, table)
    # legacy row is readable through the migrated store
    assert store.get("lg.c", "1.0.0").status == "draft"
    # re-put wins over the seq-NULL legacy row (desc sort, NULLS LAST)
    flipped = Contract.from_dict(legacy.to_dict())
    flipped.status = "active"
    store.put(flipped)
    assert store.get("lg.c", "1.0.0").status == "active"
    assert store.versions("lg.c") == ["1.0.0"]
    assert "seq" in [f.name for f in spark.table(table).schema.fields]
