"""governed_table / governed_view runtime binding (ref dlt.py:269-330).

On a DLT runtime the decorators must register the contract's expectation
dicts through the module's ``expect_all`` / ``expect_all_or_drop`` and wrap
with ``table``/``view``; off-platform they must fall back to LocalPipeline
with IDENTICAL dicts and drop semantics, so one pipeline file runs in both
environments.
"""

from __future__ import annotations

from dc43_spark.io.dlt import (
    LocalPipeline,
    dlt_expectations,
    governed_table,
    governed_view,
)
from dc43_spark.showcase import orders_contract


class FakeDlt:
    """Records every decorator registration like the Databricks dlt module."""

    def __init__(self):
        self.expect_all_calls: list[dict[str, str]] = []
        self.expect_all_or_drop_calls: list[dict[str, str]] = []
        self.table_kwargs: list[dict] = []
        self.view_kwargs: list[dict] = []
        self.order: list[str] = []

    def expect_all(self, expectations):
        self.expect_all_calls.append(dict(expectations))

        def deco(fn):
            self.order.append("expect_all")
            return fn

        return deco

    def expect_all_or_drop(self, expectations):
        self.expect_all_or_drop_calls.append(dict(expectations))

        def deco(fn):
            self.order.append("expect_all_or_drop")
            return fn

        return deco

    def table(self, **kwargs):
        self.table_kwargs.append(kwargs)

        def deco(fn):
            self.order.append("table")
            return fn

        return deco

    def view(self, **kwargs):
        self.view_kwargs.append(kwargs)

        def deco(fn):
            self.order.append("view")
            return fn

        return deco


def test_governed_table_binds_to_dlt_module():
    fake = FakeDlt()
    contract = orders_contract()

    @governed_table(contract, dlt_module=fake, name="orders_clean", comment="gold")
    def orders_clean():  # pragma: no cover - never executed by the fake
        raise AssertionError("DLT runtime materializes assets, not the decorator")

    plan = dlt_expectations(contract)
    assert fake.expect_all_or_drop_calls == [plan["expect_all_or_drop"]]
    # orders_contract has no optional rules -> no expect_all registration
    assert fake.expect_all_calls == []
    assert fake.table_kwargs == [{"name": "orders_clean", "comment": "gold"}]
    # expectations wrap the fn BEFORE table() — the runtime's required order
    assert fake.order == ["expect_all_or_drop", "table"]
    binding = orders_clean.__dc43_binding__
    assert binding.contract_id == contract.id
    assert binding.contract_version == contract.version
    assert binding.expect_all_or_drop == plan["expect_all_or_drop"]


def test_governed_view_binds_to_dlt_module_with_extras():
    fake = FakeDlt()

    @governed_view(
        None,
        dlt_module=fake,
        extra_expect_all={"positive": "value > 0"},
        extra_expect_all_or_drop={"named": "name IS NOT NULL"},
    )
    def my_view():  # pragma: no cover
        raise AssertionError

    assert fake.expect_all_calls == [{"positive": "value > 0"}]
    assert fake.expect_all_or_drop_calls == [{"named": "name IS NOT NULL"}]
    assert fake.order == ["expect_all_or_drop", "expect_all", "view"]


def test_local_fallback_matches_dlt_registration(spark, sf_dir):
    """The same decorated function, run on LocalPipeline, enforces exactly
    the dicts a DLT runtime would receive."""
    contract = orders_contract()
    pipeline = LocalPipeline()

    @governed_table(contract, pipeline=pipeline, name="orders_clean", align=False)
    def orders_clean(sp):
        return sp.read.parquet(f"{sf_dir}/orders.parquet")

    # same binding record in both environments
    plan = dlt_expectations(contract)
    assert orders_clean.__dc43_binding__.expect_all_or_drop == plan["expect_all_or_drop"]

    reports = pipeline.run(spark)
    report = reports["orders_clean"]
    assert set(report.failed) == set(plan["expect_all_or_drop"])
    # fixtures are clean -> nothing dropped, every expectation fully passed
    assert report.ok and report.rows_out == report.rows_in > 0


def test_local_fallback_drops_enforced_failures(spark):
    pipeline = LocalPipeline()

    @governed_table(
        pipeline=pipeline, extra_expect_all_or_drop={"positive": "v > 0"}
    )
    def vals(sp):
        return sp.createDataFrame([(1,), (-2,), (3,)], "v int")

    report = pipeline.run(spark)["vals"]
    assert report.rows_in == 3 and report.rows_out == 2
    assert report.failed["positive"] == 1
    assert [r.v for r in pipeline.read("vals").orderBy("v").collect()] == [1, 3]


def test_ambient_pipeline_used_without_explicit_target(spark):
    from dc43_spark.io import dlt as dlt_mod

    dlt_mod._AMBIENT.clear()

    @governed_view(extra_expect_all={"obs": "x IS NOT NULL"})
    def ambient_asset(sp):
        return sp.createDataFrame([(1,), (None,)], "x int")

    ambient = dlt_mod._ambient_pipeline()
    report = ambient.run(spark)["ambient_asset"]
    # observe-only: counted but NOT dropped
    assert report.rows_in == report.rows_out == 2
    assert report.failed["obs"] == 1
    dlt_mod._AMBIENT.clear()
