"""CHECK constraints on snaplog tables (Delta's ALTER TABLE ADD
CONSTRAINT semantics) + in-commit monotonic timestamps.

Constraints are versioned table metadata: the full name->expression map
rides in a metadata-only commit, existing rows are validated on ADD,
every write path (append, overwrite, merge, update, write_txn) validates
its batch in one aggregate pass, NULL passes (SQL CHECK), time travel
and RESTORE see the constraint set as of their version, and concurrent
constraint changes conflict with in-flight writers.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from dc43_spark.contracts.model import (
    Contract,
    QualityRule,
    SchemaObject,
    SchemaProperty,
)
from dc43_spark.io.snaplog import (
    ConstraintViolationError,
    SnaplogTable,
    SnapshotConflictError,
)


def _df(spark, rows, schema="id long, v long"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def table(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, 10), (2, 20)]))
    return t


def test_add_then_violating_append_raises(spark, table):
    table.add_check_constraint("v_positive", "v > 0")
    assert table.check_constraints == {"v_positive": "v > 0"}
    with pytest.raises(ConstraintViolationError, match="v_positive") as ei:
        table.write(_df(spark, [(3, -1), (4, 5), (5, -2)]))
    assert ei.value.counts == {"v_positive": 2}
    # nothing landed
    assert sorted(r["id"] for r in table.read().collect()) == [1, 2]
    table.write(_df(spark, [(3, 3)]))  # valid rows pass
    assert sorted(r["id"] for r in table.read().collect()) == [1, 2, 3]


def test_null_passes_check_semantics(spark, table):
    table.add_check_constraint("v_positive", "v > 0")
    table.write(_df(spark, [(7, None)]))  # NULL is not FALSE -> passes
    assert 7 in {r["id"] for r in table.read().collect()}


def test_add_validates_existing_rows(spark, table):
    table.write(_df(spark, [(9, -5)]))
    before = table.version()
    with pytest.raises(ConstraintViolationError, match="add_check_constraint"):
        table.add_check_constraint("v_positive", "v > 0")
    assert table.version() == before  # nothing committed
    assert table.check_constraints == {}


def test_null_then_not_null_add_refused(spark, table):
    table.add_check_constraint("v_positive", "v > 0")
    table.write(_df(spark, [(7, None)]))
    with pytest.raises(ConstraintViolationError):
        table.add_check_constraint("v_set", "v IS NOT NULL")


def test_merge_enforces(spark, table):
    table.add_check_constraint("v_positive", "v > 0")
    before = table.version()
    with pytest.raises(ConstraintViolationError, match="merge"):
        table.merge(_df(spark, [(1, -99)]), ["id"])
    assert table.version() == before
    assert {r["id"]: r["v"] for r in table.read().collect()}[1] == 10
    table.merge(_df(spark, [(1, 99)]), ["id"])
    assert {r["id"]: r["v"] for r in table.read().collect()}[1] == 99


def test_update_enforces(spark, table):
    table.add_check_constraint("v_positive", "v > 0")
    with pytest.raises(ConstraintViolationError, match="update"):
        table.update([("id", "=", 1)], {"v": F.lit(-1)})
    table.update([("id", "=", 1)], {"v": F.lit(123)})
    assert {r["id"]: r["v"] for r in table.read().collect()}[1] == 123


def test_overwrite_enforces_and_constraints_survive(spark, table):
    table.add_check_constraint("v_positive", "v > 0")
    with pytest.raises(ConstraintViolationError, match="overwrite"):
        table.write(_df(spark, [(1, -1)]), mode="overwrite")
    table.write(_df(spark, [(1, 1)]), mode="overwrite")
    assert table.check_constraints == {"v_positive": "v > 0"}


def test_write_txn_enforces(spark, table):
    table.add_check_constraint("v_positive", "v > 0")
    with pytest.raises(ConstraintViolationError, match="write_txn"):
        table.write_txn(_df(spark, [(8, -8)]), app_id="app", version=1)
    assert table.write_txn(_df(spark, [(8, 8)]), app_id="app", version=1)


def test_drop_and_guardrails(spark, table):
    table.add_check_constraint("v_positive", "v > 0")
    with pytest.raises(ValueError, match="already exists"):
        table.add_check_constraint("v_positive", "v > 1")
    with pytest.raises(ValueError, match="identifier"):
        table.add_check_constraint("bad name!", "v > 0")
    with pytest.raises(ValueError, match="no constraint"):
        table.drop_check_constraint("nope")
    table.drop_check_constraint("v_positive")
    assert table.check_constraints == {}
    table.write(_df(spark, [(3, -1)]))  # relaxed: violating rows admitted


def test_time_travel_sees_old_constraint_set(spark, table):
    v0 = table.version()
    table.add_check_constraint("v_positive", "v > 0")
    assert table.snapshot(v0).constraints == {}
    assert table.snapshot().constraints == {"v_positive": "v > 0"}


def test_restore_rolls_constraints_back(spark, table):
    v0 = table.version()
    table.add_check_constraint("v_positive", "v > 0")
    table.restore(version_as_of=v0)
    assert table.check_constraints == {}
    table.write(_df(spark, [(3, -1)]))  # pre-constraint rules apply again


def test_constraints_survive_checkpoint(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "cp"), checkpoint_interval=2)
    t.write(_df(spark, [(1, 1)]))
    t.add_check_constraint("v_positive", "v > 0")
    for i in range(2, 6):
        t.write(_df(spark, [(i, i)]))  # crosses checkpoint boundaries
    fresh = SnaplogTable(spark, t.path, checkpoint_interval=2)
    assert fresh.check_constraints == {"v_positive": "v > 0"}
    with pytest.raises(ConstraintViolationError):
        fresh.write(_df(spark, [(9, -9)]))


def test_set_constraints_commit_invisible_to_cdf(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "cdf"), change_feed=True)
    t.write(_df(spark, [(1, 1)]))
    off = t.version()
    t.add_check_constraint("v_positive", "v > 0")
    changes, new_off = t.changes_since(off)
    assert changes.count() == 0  # metadata-only: no change rows
    assert new_off == t.version()


def test_concurrent_constraint_change_conflicts_pinned_op(
    spark, tmp_path, monkeypatch
):
    from tests.test_snaplog_concurrency import inject_before_next_commit

    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(i, i + 1) for i in range(10)]))
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch, lambda: other.add_check_constraint("v_positive", "v > 0")
    )
    with pytest.raises(SnapshotConflictError, match="CHECK constraints"):
        t.delete([("id", "<", 3)])


def test_concurrent_constraint_change_aborts_append(
    spark, tmp_path, monkeypatch
):
    from tests.test_snaplog_concurrency import inject_before_next_commit

    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, 1)]))
    other = SnaplogTable(spark, t.path)
    inject_before_next_commit(
        monkeypatch, lambda: other.add_check_constraint("v_positive", "v > 0")
    )
    # validated against the pre-change (empty) set -> must abort, even
    # though the rows happen to satisfy the new constraint
    with pytest.raises(SnapshotConflictError, match="constraints"):
        t.write(_df(spark, [(2, 2)]))


def test_apply_contract_constraints(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "c"))
    t.write(
        spark.createDataFrame(
            [(1, "A", 5.0), (2, "B", 7.5)], "k long, cat string, score double"
        )
    )
    contract = Contract(
        id="test.scores",
        version="1.0.0",
        schema_objects=[
            SchemaObject(
                name="scores",
                properties=[
                    SchemaProperty("k", "bigint", required=True, unique=True),
                    SchemaProperty(
                        "cat", "string", required=True,
                        quality=[QualityRule("enum", ["A", "B"])],
                    ),
                    SchemaProperty(
                        "score", "double",
                        quality=[QualityRule("ge", 0.0)],
                    ),
                ],
            )
        ],
    )
    added = t.apply_contract_constraints(contract)
    assert added  # row-level rules registered
    names = set(t.check_constraints)
    assert any("k" in n for n in names)
    assert not any("unique" in n for n in names)  # metric-only: excluded
    # the TABLE now enforces the contract on any writer
    with pytest.raises(ConstraintViolationError):
        t.write(spark.createDataFrame([(3, "Z", 1.0)], "k long, cat string, score double"))
    with pytest.raises(ConstraintViolationError):
        t.write(spark.createDataFrame([(3, "A", -1.0)], "k long, cat string, score double"))
    t.write(spark.createDataFrame([(3, "A", 1.0)], "k long, cat string, score double"))
    # idempotent re-apply: nothing new
    assert t.apply_contract_constraints(contract) == {}


# ---------------- in-commit monotonic timestamps


def test_commit_timestamps_monotonic_under_clock_skew(spark, tmp_path, monkeypatch):
    t = SnaplogTable(spark, str(tmp_path / "ts"))
    t.write(_df(spark, [(1, 1)]))
    real = t.snapshot().timestamp
    # writer whose clock runs BEHIND the previous committer's
    monkeypatch.setattr(time, "time", lambda: real - 3600.0)
    t.write(_df(spark, [(2, 2)]))
    t.write(_df(spark, [(3, 3)]))
    hist = t.history()
    stamps = [h.timestamp for h in hist]
    assert stamps == sorted(stamps)
    assert len(set(stamps)) == len(stamps)  # strictly increasing
    # timestampAsOf stays well-defined: the head timestamp resolves to
    # the head version even though the wall clock went backwards
    assert t.snapshot(timestamp=stamps[-1]).version == hist[-1].version
    assert t.snapshot(timestamp=stamps[0]).version == hist[0].version
