from __future__ import annotations

import pytest

from dc43_spark.contracts import Contract, QualityRule, SchemaObject, SchemaProperty
from dc43_spark.contracts.model import Server
from dc43_spark.io.read import read_with_contract
from dc43_spark.io.status import (
    BlockedReadError,
    DowngradeBlockedReadStatus,
    EnforceReadStatus,
    FilterInvalidRowsReadStatus,
    GovernanceInterceptor,
    IoContext,
)
from dc43_spark.io.write import write_with_contract

SCHEMA = "k long, amount double"


def contract(path: str) -> Contract:
    return Contract(
        id="test.status",
        version="0.1.0",
        status="active",
        servers=[Server(path=path, format="parquet")],
        schema_objects=[
            SchemaObject(
                name="t",
                properties=[
                    SchemaProperty("k", "bigint", required=True),
                    SchemaProperty("amount", "double", quality=[QualityRule("gt", 0.0)]),
                ],
            )
        ],
    )


@pytest.fixture()
def dirty_path(spark, tmp_path):
    p = str(tmp_path / "dirty")
    spark.createDataFrame(
        [(1, 1.0), (2, -5.0), (None, 3.0)], SCHEMA
    ).write.mode("overwrite").parquet(p)
    return p


def test_enforce_raises_on_block(spark, dirty_path):
    # required-null failure escalates to block on read
    with pytest.raises(BlockedReadError):
        read_with_contract(
            spark, contract(dirty_path), status_strategy=EnforceReadStatus()
        )


def test_downgrade_returns_warn(spark, dirty_path):
    df, result = read_with_contract(
        spark, contract(dirty_path), status_strategy=DowngradeBlockedReadStatus()
    )
    assert result.status == "warn"
    assert not result.errors
    assert df.count() == 3


def test_filter_invalid_rows(spark, dirty_path):
    df, result = read_with_contract(
        spark, contract(dirty_path), status_strategy=FilterInvalidRowsReadStatus()
    )
    rows = df.collect()
    assert [(r.k, r.amount) for r in rows] == [(1, 1.0)]
    assert result.status == "warn"


class Recorder(GovernanceInterceptor):
    def __init__(self):
        self.calls: list[str] = []

    def pre_read(self, ctx: IoContext) -> None:
        self.calls.append(f"pre_read:{ctx.path}")

    def post_read(self, ctx, df, result) -> None:
        self.calls.append(f"post_read:{result.status}")

    def pre_write(self, ctx, df):
        self.calls.append("pre_write")
        return df.filter("amount > 0")

    def post_write(self, ctx, result) -> None:
        self.calls.append(f"post_write:{result.status}")


def test_interceptor_hooks_read(spark, dirty_path):
    rec = Recorder()
    read_with_contract(
        spark, contract(dirty_path),
        status_strategy=DowngradeBlockedReadStatus(), interceptors=[rec],
    )
    assert rec.calls[0] == f"pre_read:{dirty_path}"
    assert rec.calls[1] == "post_read:warn"


def test_interceptor_pre_write_replaces_frame(spark, tmp_path):
    target = str(tmp_path / "out")
    rec = Recorder()
    df = spark.createDataFrame([(1, 1.0), (2, -5.0)], SCHEMA)
    res = write_with_contract(
        df, contract(target), mode="overwrite", interceptors=[rec]
    )
    # pre_write filtered the bad row, so validation is clean
    assert res.validation.ok
    assert rec.calls == ["pre_write", "post_write:ok"]
    assert spark.read.parquet(target).count() == 1


def test_writer_modifier_partitions_output(spark, tmp_path):
    import os

    target = str(tmp_path / "parts")
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], SCHEMA)
    write_with_contract(
        df, contract(target), mode="overwrite",
        writer_modifier=lambda w: w.partitionBy("k"),
    )
    assert any(n.startswith("k=") for n in os.listdir(target))


# module-level so a dotted-path reference can instantiate it (discovery)
class ConfRecorder(GovernanceInterceptor):
    instances: list = []

    def __init__(self) -> None:
        self.calls: list[str] = []
        ConfRecorder.instances.append(self)

    def pre_read(self, ctx) -> None:
        self.calls.append(f"pre_read:{ctx.operation}")

    def post_read(self, ctx, df, result) -> None:
        self.calls.append(f"post_read:{result.status}")

    def pre_write(self, ctx, df):
        self.calls.append("pre_write")
        return df

    def post_write(self, ctx, result) -> None:
        self.calls.append(f"post_write:{result.status}")


def test_interceptor_discovery_from_conf_and_env(spark, tmp_path, monkeypatch):
    """Conf/env-registered interceptors fire WITHOUT pipeline code passing
    them (ref interceptors.py:112-137): per-op conf key beats the base
    key beats the env var; explicit interceptors=[] disables discovery."""
    from dc43_spark.io.status import interceptor_refs, resolve_interceptor

    ref = f"{__name__}.ConfRecorder"
    # priority: per-op > base > env
    monkeypatch.setenv("DC43_GOVERNANCE_INTERCEPTORS", "env.Mod")
    spark.conf.set("dc43.governance.interceptors", ref)
    spark.conf.set("dc43.governance.interceptors.read", f"{ref}, {ref}")
    try:
        assert interceptor_refs(spark, "read") == (ref, ref)
        assert interceptor_refs(spark, "write") == (ref,)
        spark.conf.unset("dc43.governance.interceptors")
        spark.conf.unset("dc43.governance.interceptors.read")
        assert interceptor_refs(spark, "write") == ("env.Mod",)
        monkeypatch.delenv("DC43_GOVERNANCE_INTERCEPTORS")

        # end-to-end: conf-only registration observed in read AND write
        spark.conf.set("dc43.governance.interceptors", ref)
        target = str(tmp_path / "conf_int")
        df = spark.createDataFrame([(1, 1.0)], SCHEMA)
        ConfRecorder.instances.clear()
        res = write_with_contract(df, contract(target), mode="overwrite")
        assert res.validation.ok
        assert [i.calls for i in ConfRecorder.instances] == [
            ["pre_write", "post_write:ok"]
        ]
        ConfRecorder.instances.clear()
        _, rres = read_with_contract(spark, contract(target))
        assert rres.ok
        assert [i.calls for i in ConfRecorder.instances] == [
            ["pre_read:read", "post_read:ok"]
        ]
        # explicit empty list opts out of discovery
        ConfRecorder.instances.clear()
        read_with_contract(spark, contract(target), interceptors=[])
        assert ConfRecorder.instances == []
    finally:
        for key in (
            "dc43.governance.interceptors",
            "dc43.governance.interceptors.read",
        ):
            try:
                spark.conf.unset(key)
            except Exception:
                pass
    # resolver guards
    with pytest.raises(ValueError):
        resolve_interceptor("NoDots")
    with pytest.raises(ValueError):
        resolve_interceptor("no.such.module.Cls")
    with pytest.raises(TypeError):
        resolve_interceptor(object())
