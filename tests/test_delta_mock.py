"""Mock-based assertions for the env-gated Delta MERGE branch (r5 verdict
item 10): delta-spark cannot install in this container, so a recording
fake of ``delta.tables.DeltaTable`` pins the EXACT builder calls —
condition string, clause order, clause presence per flag — that the delta
path emits. The real end-to-end twin (tests/test_delta_readiness.py)
lights up unchanged wherever delta-spark exists; this suite keeps the
branch from rotting here."""

from __future__ import annotations

import sys
import types

import pytest

from dc43_spark.contracts import Contract, QualityRule, SchemaObject, SchemaProperty
from dc43_spark.io.merge import merge_with_contract
from dc43_spark.io.read import ValidationBlockedError

SCHEMA = "k long, v string, amount double"


def _contract():
    return Contract(
        id="test.delta_merge",
        version="0.1.0",
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


class RecordingBuilder:
    def __init__(self, log: list) -> None:
        self.log = log

    # signatures mirror delta-spark's DeltaMergeBuilder (all clause
    # methods take condition=; the column-level forms take set=/values=)

    def whenMatchedDelete(self, condition=None):  # noqa: N802
        self.log.append(("whenMatchedDelete", condition))
        return self

    def whenMatchedUpdateAll(self, condition=None):  # noqa: N802
        self.log.append(("whenMatchedUpdateAll", condition))
        return self

    def whenMatchedUpdate(self, condition=None, set=None):  # noqa: N802
        self.log.append(("whenMatchedUpdate", condition, set))
        return self

    def whenNotMatchedInsertAll(self, condition=None):  # noqa: N802
        self.log.append(("whenNotMatchedInsertAll", condition))
        return self

    def whenNotMatchedInsert(self, condition=None, values=None):  # noqa: N802
        self.log.append(("whenNotMatchedInsert", condition, values))
        return self

    def whenNotMatchedBySourceDelete(self, condition=None):  # noqa: N802
        self.log.append(("whenNotMatchedBySourceDelete", condition))
        return self

    def whenNotMatchedBySourceUpdate(self, condition=None, set=None):  # noqa: N802
        self.log.append(("whenNotMatchedBySourceUpdate", condition, set))
        return self

    def execute(self):
        self.log.append(("execute",))


class RecordingDeltaTable:
    calls: list = []

    def __init__(self, kind: str, target: str) -> None:
        RecordingDeltaTable.calls.append((kind, target))
        self.log: list = []
        RecordingDeltaTable.last = self

    @classmethod
    def forPath(cls, spark, path):  # noqa: N802
        return cls("path", path)

    @classmethod
    def forName(cls, spark, table):  # noqa: N802
        return cls("table", table)

    def alias(self, name):
        self.log.append(("alias", name))
        return self

    def merge(self, source, condition):
        self.log.append(("merge", condition, source.columns))
        return RecordingBuilder(self.log)


@pytest.fixture()
def fake_delta(monkeypatch):
    delta_mod = types.ModuleType("delta")
    tables_mod = types.ModuleType("delta.tables")
    tables_mod.DeltaTable = RecordingDeltaTable
    delta_mod.tables = tables_mod
    monkeypatch.setitem(sys.modules, "delta", delta_mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables_mod)
    RecordingDeltaTable.calls = []
    return RecordingDeltaTable


def test_delta_merge_builder_calls_update_insert(spark, fake_delta):
    src = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    res = merge_with_contract(
        spark, src, _contract(), keys=["k", "v"], path="/delta/t", format="delta"
    )
    assert res.strategy == "delta"
    assert fake_delta.calls == [("path", "/delta/t")]
    log = fake_delta.last.log
    # exact builder sequence: alias target, merge on null-safe key equality
    # over BOTH keys, update-all then insert-all, one execute
    assert log[0] == ("alias", "t")
    merge_call = log[1]
    assert merge_call[0] == "merge"
    assert merge_call[1] == "t.`k` <=> s.`k` AND t.`v` <=> s.`v`"
    assert merge_call[2] == ["k", "v", "amount"]  # contract-aligned source
    assert log[2:] == [
        ("whenMatchedUpdateAll", None),
        ("whenNotMatchedInsertAll", None),
        ("execute",),
    ]


def test_delta_merge_builder_delete_and_ignore_flags(spark, fake_delta):
    src = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    merge_with_contract(
        spark, src, _contract(), keys=["k"], table="gov.t", format="delta",
        when_matched="ignore", when_not_matched="ignore",
        delete_predicate="s.amount < 0",
    )
    assert fake_delta.calls == [("table", "gov.t")]
    log = fake_delta.last.log
    # delete clause is registered BEFORE any update so Delta evaluates it
    # first, and ignore flags suppress update/insert clauses entirely
    assert log[2] == ("whenMatchedDelete", "s.amount < 0")
    assert log[3] == ("execute",)


def test_delta_branch_still_validates_first(spark, fake_delta):
    bad = spark.createDataFrame([(1, "a", -5.0)], SCHEMA)
    with pytest.raises(ValidationBlockedError):
        merge_with_contract(
            spark, bad, _contract(), keys=["k"], path="/delta/t", format="delta"
        )
    # blocked before any DeltaTable was ever constructed
    assert fake_delta.calls == []


def test_delta_merge_builder_conditional_clause_forwarding(spark, fake_delta):
    """r11: the full conditional clause surface forwards to delta-spark's
    builder verbatim — SET/VALUES maps, per-clause predicates, by-source
    actions (whenNotMatchedBySourceUpdate/Delete)."""
    src = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    merge_with_contract(
        spark, src, _contract(), keys=["k"], path="/delta/t", format="delta",
        when_matched={"v": "s.v", "amount": "t.amount + s.amount"},
        matched_predicate="t.amount < 100",
        delete_predicate="s.amount < 0",
        when_not_matched={"k": "s.k", "amount": "s.amount"},
        insert_predicate="s.k > 0",
        when_not_matched_by_source={"v": "'stale'"},
        not_matched_by_source_predicate="t.k % 2 = 0",
    )
    log = fake_delta.last.log
    assert ("whenMatchedDelete", "s.amount < 0") in log
    assert (
        "whenMatchedUpdate", "t.amount < 100",
        {"v": "s.v", "amount": "t.amount + s.amount"},
    ) in log
    assert (
        "whenNotMatchedInsert", "s.k > 0",
        {"k": "s.k", "amount": "s.amount"},
    ) in log
    assert (
        "whenNotMatchedBySourceUpdate", "t.k % 2 = 0", {"v": "'stale'"},
    ) in log
    assert log[-1] == ("execute",)
    # and the delete variant
    merge_with_contract(
        spark, src, _contract(), keys=["k"], path="/delta/t2", format="delta",
        when_matched="ignore", when_not_matched="ignore",
        when_not_matched_by_source="delete",
        not_matched_by_source_predicate="t.k = 9",
    )
    assert ("whenNotMatchedBySourceDelete", "t.k = 9") in fake_delta.last.log
