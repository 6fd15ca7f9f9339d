from __future__ import annotations

import pytest

from dc43_spark.contracts import Contract, QualityRule, SchemaObject, SchemaProperty
from dc43_spark.governance.lineage import (
    LineageCollector,
    SpanRecorder,
    dataset_ref,
    run_event,
)
from dc43_spark.io.dlt import LocalPipeline, dlt_expectations


def contract() -> Contract:
    return Contract(
        id="test.dlt",
        version="0.1.0",
        status="active",
        schema_objects=[
            SchemaObject(
                name="t",
                properties=[
                    SchemaProperty("k", "bigint", required=True),
                    SchemaProperty(
                        "amount", "double",
                        quality=[QualityRule("gt", 0.0)],
                    ),
                    SchemaProperty(
                        "note", "string",
                        quality=[QualityRule("regex", "^n", severity="warning")],
                    ),
                ],
            )
        ],
    )


def test_dlt_expectations_split_by_severity():
    plan = dlt_expectations(contract())
    assert "not_null_k" in plan["expect_all_or_drop"]
    assert "gt_amount" in plan["expect_all_or_drop"]
    assert "regex_note" in plan["expect_all"]  # warning -> observe only
    for pred in {**plan["expect_all"], **plan["expect_all_or_drop"]}.values():
        assert isinstance(pred, str) and pred


def test_local_pipeline_drops_enforced_counts_observed(spark):
    pipe = LocalPipeline()

    @pipe.governed_table(contract(), name="clean")
    def clean():
        return spark.createDataFrame(
            [(1, 1.0, "note"), (2, -1.0, "note"), (None, 3.0, "x")],
            "k long, amount double, note string",
        )

    reports = pipe.run(spark)
    rep = reports["clean"]
    assert rep.rows_in == 3
    assert rep.rows_out == 1  # row2 fails gt, row3 fails not_null
    assert rep.failed["gt_amount"] == 1
    assert rep.failed["not_null_k"] == 1
    assert rep.failed["regex_note"] == 1  # observed, not dropped
    assert not rep.ok
    assert pipe.read("clean").count() == 1


def test_local_pipeline_dependencies(spark):
    pipe = LocalPipeline()

    @pipe.governed_table(name="base", align=False)
    def base():
        return spark.createDataFrame([(1,), (2,)], "k long")

    @pipe.governed_view(name="doubled", align=False)
    def doubled():
        from pyspark.sql import functions as F

        return pipe.read("base").withColumn("k2", F.col("k") * 2)

    reports = pipe.run(spark)
    assert reports["base"].rows_out == 2
    assert reports["doubled"].rows_out == 2
    assert sorted(r.k2 for r in pipe.read("doubled").collect()) == [2, 4]


def test_lineage_run_events():
    col = LineageCollector()
    clock = iter(["t0", "t1"])
    with col.governed_run(
        "job.read",
        inputs=[dataset_ref(name="path:/data/orders", contract=contract())],
        run_id="rid-1",
        now=lambda: next(clock),
    ) as rid:
        assert rid == "rid-1"
    assert [e["eventType"] for e in col.events] == ["START", "COMPLETE"]
    assert col.events[0]["eventTime"] == "t0"
    start = col.events[0]
    assert start["inputs"][0]["facets"]["dataContract"]["contractId"] == "test.dlt"
    fields = start["inputs"][0]["facets"]["schema"]["fields"]
    assert {f["name"] for f in fields} == {"k", "amount", "note"}


def test_lineage_fail_event():
    col = LineageCollector()
    with pytest.raises(RuntimeError):
        with col.governed_run("job.write", run_id="r"):
            raise RuntimeError("boom")
    assert [e["eventType"] for e in col.events] == ["START", "FAIL"]
    assert "boom" in col.events[1]["run"]["facets"]["errorMessage"]["message"]


def test_span_recorder():
    ticks = iter([0, 5_000_000])
    rec = SpanRecorder(clock_ns=lambda: next(ticks))
    with rec.span("read", dataset="orders"):
        pass
    assert rec.spans[0].duration_ms == 5.0
    assert rec.spans[0].status == "OK"

    rec2 = SpanRecorder()
    with pytest.raises(ValueError):
        with rec2.span("bad"):
            raise ValueError("x")
    assert rec2.spans[0].status == "ERROR"
