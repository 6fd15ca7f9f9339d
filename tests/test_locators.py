from __future__ import annotations

import pytest

from dc43_spark.contracts import Contract, SchemaObject, SchemaProperty
from dc43_spark.contracts.model import Server
from dc43_spark.io.locators import (
    ContractFirstDatasetLocator,
    ContractVersionLocator,
    DatasetResolution,
    StaticDatasetLocator,
    delta_time_travel_options,
    list_folder_versions,
)
from dc43_spark.io.read import read_with_contract
from dc43_spark.io.write import write_with_contract


def contract(path: str | None = None) -> Contract:
    servers = [Server(path=path, format="parquet")] if path else []
    return Contract(
        id="test.versioned",
        version="0.1.0",
        status="active",
        servers=servers,
        schema_objects=[
            SchemaObject(
                name="t",
                properties=[
                    SchemaProperty("k", "bigint", required=True),
                    SchemaProperty("v", "string"),
                ],
            )
        ],
    )


def test_contract_first_fills_location():
    res = ContractFirstDatasetLocator().for_read(
        contract("/data/base"), DatasetResolution()
    )
    assert res.path == "/data/base"
    assert res.format == "parquet"
    assert res.dataset_id == "path:/data/base"


def test_static_overrides_win():
    loc = StaticDatasetLocator(path="/override", options={"a": "1"})
    res = loc.for_read(contract("/data/base"), DatasetResolution(path="/data/base"))
    assert res.path == "/override"
    assert res.options == {"a": "1"}
    assert res.dataset_id == "path:/override"


def test_delta_time_travel_options():
    assert delta_time_travel_options(version=3) == {"versionAsOf": "3"}
    assert delta_time_travel_options(timestamp="2026-01-01") == {
        "timestampAsOf": "2026-01-01"
    }
    with pytest.raises(ValueError):
        delta_time_travel_options()


def test_version_locator_delta_read_options():
    loc = ContractVersionLocator("7")
    res = loc.for_read(None, DatasetResolution(path="/d", format="delta"))
    assert res.options == {"versionAsOf": "7"}
    res = loc.for_read(None, DatasetResolution(path="/d", format="delta"))
    assert res.dataset_version == "7"


def test_folder_versioning_roundtrip(spark, tmp_path):
    base = str(tmp_path / "versioned")
    c = contract(base)
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    df2 = spark.createDataFrame([(2, "b")], "k long, v string")

    write_with_contract(
        df1, c, mode="overwrite", locator=ContractVersionLocator("1.0.0")
    )
    write_with_contract(
        df2, c, mode="overwrite", locator=ContractVersionLocator("1.1.0")
    )
    assert list_folder_versions(base) == ["1.0.0", "1.1.0"]

    latest, _ = read_with_contract(
        spark, c, locator=ContractVersionLocator("latest")
    )
    assert [r.k for r in latest.collect()] == [2]

    pinned, _ = read_with_contract(
        spark, c, locator=ContractVersionLocator("1.0.0")
    )
    assert [r.k for r in pinned.collect()] == [1]

    both, _ = read_with_contract(
        spark, c, locator=ContractVersionLocator("latest", include_prior=True)
    )
    assert sorted(r.k for r in both.collect()) == [1, 2]


def test_missing_version_raises(tmp_path):
    base = str(tmp_path / "nope")
    with pytest.raises(FileNotFoundError):
        ContractVersionLocator("1.0.0").for_read(
            None, DatasetResolution(path=base)
        )


def test_write_latest_starts_at_1_0_0(tmp_path):
    res = ContractVersionLocator("latest").for_write(
        None, DatasetResolution(path=str(tmp_path / "w"))
    )
    assert res.dataset_version == "1.0.0"
    assert res.path.endswith("/1.0.0")
