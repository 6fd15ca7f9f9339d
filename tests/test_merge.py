from __future__ import annotations

import pytest

from dc43_spark.contracts import Contract, QualityRule, SchemaObject, SchemaProperty
from dc43_spark.io.merge import merge_with_contract
from dc43_spark.io.read import ValidationBlockedError

SCHEMA = "k long, v string, amount double"


def contract() -> Contract:
    return Contract(
        id="test.merge",
        version="0.1.0",
        status="active",
        schema_objects=[
            SchemaObject(
                name="t",
                properties=[
                    SchemaProperty("k", "bigint", required=True),
                    SchemaProperty("v", "string"),
                    SchemaProperty(
                        "amount", "double", quality=[QualityRule("gt", 0.0)]
                    ),
                ],
            )
        ],
    )


def rows(df):
    return sorted((r.k, r.v, r.amount) for r in df.collect())


def test_merge_into_missing_target_inserts_all(spark, tmp_path):
    target = str(tmp_path / "t")
    src = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA)
    res = merge_with_contract(spark, src, contract(), keys=["k"], path=target)
    assert res.strategy == "initial-write"
    assert rows(spark.read.parquet(target)) == [(1, "a", 1.0), (2, "b", 2.0)]


def test_merge_update_and_insert(spark, tmp_path):
    target = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA)
    merge_with_contract(spark, base, contract(), keys=["k"], path=target)

    src = spark.createDataFrame([(2, "B", 20.0), (3, "c", 3.0)], SCHEMA)
    res = merge_with_contract(spark, src, contract(), keys=["k"], path=target)
    assert res.strategy == "outer-join-rewrite"
    assert rows(spark.read.parquet(target)) == [
        (1, "a", 1.0),  # untouched
        (2, "B", 20.0),  # updated
        (3, "c", 3.0),  # inserted
    ]


def test_merge_matched_ignore_keeps_target(spark, tmp_path):
    target = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    merge_with_contract(spark, base, contract(), keys=["k"], path=target)

    src = spark.createDataFrame([(1, "X", 9.0), (2, "b", 2.0)], SCHEMA)
    merge_with_contract(
        spark, src, contract(), keys=["k"], path=target, when_matched="ignore"
    )
    assert rows(spark.read.parquet(target)) == [(1, "a", 1.0), (2, "b", 2.0)]


def test_merge_not_matched_ignore_drops_new(spark, tmp_path):
    target = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    merge_with_contract(spark, base, contract(), keys=["k"], path=target)

    src = spark.createDataFrame([(1, "A", 10.0), (2, "b", 2.0)], SCHEMA)
    merge_with_contract(
        spark, src, contract(), keys=["k"], path=target, when_not_matched="ignore"
    )
    assert rows(spark.read.parquet(target)) == [(1, "A", 10.0)]


def test_merge_delete_predicate(spark, tmp_path):
    target = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA)
    merge_with_contract(spark, base, contract(), keys=["k"], path=target)

    src = spark.createDataFrame([(1, "tombstone", 0.5), (3, "c", 3.0)], SCHEMA)
    merge_with_contract(
        spark, src, contract(), keys=["k"], path=target,
        delete_predicate="s.v = 'tombstone'",
    )
    assert rows(spark.read.parquet(target)) == [(2, "b", 2.0), (3, "c", 3.0)]


def test_merge_blocks_on_violations(spark, tmp_path):
    target = str(tmp_path / "t")
    src = spark.createDataFrame([(1, "a", -1.0)], SCHEMA)
    with pytest.raises(ValidationBlockedError):
        merge_with_contract(spark, src, contract(), keys=["k"], path=target)


def test_merge_composite_keys(spark, tmp_path):
    target = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a", 1.0), (1, "b", 2.0)], SCHEMA)
    merge_with_contract(spark, base, contract(), keys=["k", "v"], path=target)

    src = spark.createDataFrame([(1, "a", 100.0)], SCHEMA)
    merge_with_contract(spark, src, contract(), keys=["k", "v"], path=target)
    assert rows(spark.read.parquet(target)) == [(1, "a", 100.0), (1, "b", 2.0)]


def test_merge_runs_interceptors(spark, tmp_path):
    """merge_with_contract fires the same hook surface as governed
    writes: pre_write may replace the source, post_write sees the
    verdict (r6: interceptor coverage extended to the merge path)."""
    from dc43_spark.io.status import GovernanceInterceptor

    calls = []

    class Rec(GovernanceInterceptor):
        def pre_write(self, ctx, df):
            calls.append(("pre", ctx.operation))
            return df.filter("amount > 0")

        def post_write(self, ctx, result):
            calls.append(("post", result.status))

    target = str(tmp_path / "m")
    good = spark.createDataFrame([(1, "a", 5.0), (2, "b", -1.0)], SCHEMA)
    res = merge_with_contract(
        spark, good, contract(), keys=["k"], path=target, interceptors=[Rec()]
    )
    assert res.strategy == "initial-write"
    assert calls == [("pre", "merge"), ("post", "ok")]
    # the pre_write filter removed the bad row before validation/write
    assert spark.read.parquet(target).count() == 1
