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
