"""Named refs for snaplog — Iceberg's tags: pin a version under a name,
resolve it in read/restore, protect it from vacuum, version the ref map
itself through the commit log (full-map metadata commits, the
constraints pattern)."""

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.snaplog import SnaplogTable


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"s{i}") for i in range(lo, hi)], "k long, v string"
    ).coalesce(1)


def test_create_read_restore_by_tag(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 5), mode="overwrite")
    t.write(_df(spark, 5, 8), mode="append")
    t.create_tag("v1_release", 1)
    t.write(_df(spark, 0, 2), mode="overwrite")

    assert t.tags == {"v1_release": 1}
    assert t.read(tag="v1_release").count() == 8
    assert t.read().count() == 2
    # the ref map is itself versioned: before the tag commit it is empty
    assert t.snapshot(1).refs == {}
    # restore by tag; the tag survives the restore (refs are pointers,
    # not snapshot content — they never roll back)
    t.restore(tag="v1_release")
    assert t.read().count() == 8
    assert t.tags == {"v1_release": 1}


def test_tag_guards(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    with pytest.raises(FileNotFoundError):
        t.create_tag("x")
    t.write(_df(spark, 0, 3), mode="overwrite")
    t.create_tag("head")  # default: current head
    assert t.tags == {"head": 0}
    with pytest.raises(ValueError, match="already pins"):
        t.create_tag("head", 0)
    with pytest.raises(ValueError, match="have 0..1"):
        t.create_tag("nope", 7)
    with pytest.raises(ValueError, match="alphanumeric"):
        t.create_tag("bad name")
    t.create_tag("1.0.0")  # SemVer names allowed (governed writes use them)
    t.delete_tag("1.0.0")
    with pytest.raises(ValueError, match="no tag"):
        t.read(tag="missing")
    with pytest.raises(ValueError, match="no tag"):
        t.delete_tag("missing")
    with pytest.raises(ValueError, match="tag OR version_as_of"):
        t.read(tag="head", version_as_of=0)
    # replace moves the pin in one commit
    t.write(_df(spark, 3, 6), mode="append")
    t.create_tag("head", replace=True)
    assert t.tags == {"head": t.version() - 1}  # tag commit itself is +1


def test_vacuum_retains_tagged_versions(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 5), mode="overwrite")   # v0
    t.write(_df(spark, 0, 3), mode="overwrite")   # v1 (drops v0's file)
    t.create_tag("audit", 1)                       # v2
    t.write(_df(spark, 0, 2), mode="overwrite")   # v3 (drops v1's file)
    t.write(_df(spark, 0, 1), mode="overwrite")   # v4

    deleted = t.vacuum(keep_versions=1)
    # v0's and v3's exclusive files are swept; v1's survives via the tag
    assert deleted == 2
    assert t.read(tag="audit").count() == 3
    assert t.read().count() == 1
    # untag -> the next vacuum sweeps it and the tag read dies with vacuum
    t.delete_tag("audit")
    assert t.vacuum(keep_versions=1) == 1
    with pytest.raises(Exception):
        t.read(version_as_of=1).collect()


def test_tags_survive_checkpoints_and_new_handles(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"), checkpoint_interval=3)
    t.write(_df(spark, 0, 3), mode="overwrite")
    t.create_tag("r1")
    for i in range(6):  # cross at least one checkpoint boundary
        t.write(_df(spark, 10 * i, 10 * i + 2), mode="append")
    t2 = SnaplogTable(spark, str(tmp_path / "t"), checkpoint_interval=3)
    assert t2.tags == {"r1": 0}
    assert t2.read(tag="r1").count() == 3
    assert t2.describe_detail()["tags"] == {"r1": 0}


def test_tag_commits_are_invisible_to_the_change_feed(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "t"), change_feed=True)
    t.write(_df(spark, 0, 3), mode="overwrite")
    t.create_tag("x")
    t.delete_tag("x")
    feed = t.table_changes(0).collect()
    assert sorted(r._change_type for r in feed) == ["insert"] * 3
    assert {r._commit_version for r in feed} == {0}


def test_clone_does_not_carry_tags(spark, tmp_path):
    """A clone's v0 is the source snapshot; source tag versions do not
    exist in the clone's log, so carrying refs would dangle."""
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 4), mode="overwrite")
    t.create_tag("keep")
    c = t.clone(str(tmp_path / "c"))
    assert c.tags == {}
    assert c.read().count() == 4


def test_tag_as_of_through_the_data_source(spark, tmp_path):
    from dc43_spark.io.snaplog_source import SnaplogDataSource

    spark.dataSource.register(SnaplogDataSource)
    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 4), mode="overwrite")
    t.create_tag("r1")
    t.write(_df(spark, 0, 2), mode="overwrite")

    df = spark.read.format("snaplog").option("tagAsOf", "r1").load(t.path)
    assert df.count() == 4
    assert spark.read.format("snaplog").load(t.path).count() == 2
    with pytest.raises(Exception, match="not both"):
        (
            spark.read.format("snaplog")
            .option("tagAsOf", "r1")
            .option("versionAsOf", "0")
            .load(t.path)
            .count()
        )
    with pytest.raises(Exception, match="no tag"):
        spark.read.format("snaplog").option("tagAsOf", "zz").load(t.path).count()


def test_governed_writes_tag_dataset_versions(spark, tmp_path):
    """Governance versions == table refs: a governed write through a
    version locator TAGS the committed head with the dataset_version,
    and a governed read pinned at that symbolic version resolves through
    tagAsOf — contract-level versioning mapped onto format-level time
    travel (the snaplog twin of the folder-per-version strategy)."""
    from dc43_spark.contracts import Contract, SchemaObject, SchemaProperty
    from dc43_spark.io.locators import ContractVersionLocator, StaticDatasetLocator
    from dc43_spark.io.read import read_with_contract
    from dc43_spark.io.write import write_with_contract

    contract = Contract(
        id="tags.orders", version="0.1.0",
        schema_objects=[SchemaObject(
            name="t",
            properties=[
                SchemaProperty("k", "bigint", required=True),
                SchemaProperty("v", "string", required=True),
            ],
        )],
    )
    path = str(tmp_path / "t")

    def loc(version):
        return ContractVersionLocator(
            version, base=StaticDatasetLocator(path=path, format="snaplog")
        )

    write_with_contract(
        _df(spark, 0, 4), contract, locator=loc("1.0.0"), mode="overwrite"
    )
    write_with_contract(
        _df(spark, 4, 6), contract, locator=loc("1.1.0"), mode="append"
    )
    t = SnaplogTable(spark, path)
    assert t.tags == {"1.0.0": 0, "1.1.0": 2}  # each tag commit is +1

    aligned, result = read_with_contract(
        spark, contract, locator=loc("1.0.0"), metrics=False
    )
    assert result.status == "ok"
    assert aligned.count() == 4
    aligned, _ = read_with_contract(
        spark, contract, locator=loc("1.1.0"), metrics=False
    )
    assert aligned.count() == 6
    # re-writing a version MOVES its tag (folder-replace semantics)
    write_with_contract(
        _df(spark, 0, 2), contract, locator=loc("1.0.0"), mode="overwrite"
    )
    aligned, _ = read_with_contract(
        spark, contract, locator=loc("1.0.0"), metrics=False
    )
    assert aligned.count() == 2


def test_governed_write_tagging_mirrors_read_routing(spark, tmp_path):
    """Read pins route pure digits to versionAsOf and ISO instants to
    timestampAsOf (locators.py for_read) — NEVER to tagAsOf — so governed
    writes must not tag those version shapes: instants contain ':' which
    the tag grammar rejects AFTER the data commit (a retry would then
    duplicate the append), and a digit tag would never be consulted."""
    from dc43_spark.contracts import Contract, SchemaObject, SchemaProperty
    from dc43_spark.io.locators import ContractVersionLocator, StaticDatasetLocator
    from dc43_spark.io.write import write_with_contract

    contract = Contract(
        id="tags.routing", version="0.1.0",
        schema_objects=[SchemaObject(
            name="t",
            properties=[SchemaProperty("k", "bigint", required=True),
                        SchemaProperty("v", "string", required=True)],
        )],
    )
    path = str(tmp_path / "t")

    def loc(version):
        return ContractVersionLocator(
            version, base=StaticDatasetLocator(path=path, format="snaplog")
        )

    # ISO instant: must not raise post-commit and must not create a tag
    write_with_contract(
        _df(spark, 0, 3), contract,
        locator=loc("2026-01-01T00:00:00+00:00"), mode="overwrite",
    )
    t = SnaplogTable(spark, path)
    assert t.tags == {}
    assert t.read().count() == 3
    # pure digit: resolved as versionAsOf on read, so no tag either
    write_with_contract(
        _df(spark, 3, 5), contract, locator=loc("1"), mode="append",
    )
    t = SnaplogTable(spark, path)
    assert t.tags == {}
    assert t.version() == 1  # data commits only, no tag commits
    # symbolic SemVer still tags
    write_with_contract(
        _df(spark, 5, 6), contract, locator=loc("1.0.0"), mode="append",
    )
    t = SnaplogTable(spark, path)
    assert t.tags == {"1.0.0": 2}
