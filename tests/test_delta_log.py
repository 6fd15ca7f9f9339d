"""Protocol-level Delta Lake log reader (io/delta_log.py) — no jar.

The fixtures hand-write _delta_log contents per the PUBLIC protocol
(delta.io PROTOCOL.md): JSON action lines, URL-encoded paths, string
partitionValues, JSON stats, parquet checkpoints with MAP-typed
partitionValues (exactly what delta-spark emits), reader versions and
table features. Every supported shape is read back through Spark and
checked row-exactly; every unsupported shape must refuse loudly."""

import datetime
import json
import os
import urllib.parse

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dc43_spark.io.delta_log import (
    DeltaLogTable,
    DeltaProtocolError,
    delta_read_fallback,
)

SCHEMA_KV = {
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "string", "nullable": True, "metadata": {}},
    ],
}


def _meta(schema=SCHEMA_KV, partition_columns=(), configuration=None):
    return {
        "metaData": {
            "id": "00000000-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": list(partition_columns),
            "configuration": configuration or {},
        }
    }


def _protocol(reader=1, writer=2, reader_features=None):
    p = {"minReaderVersion": reader, "minWriterVersion": writer}
    if reader_features is not None:
        p["readerFeatures"] = list(reader_features)
    return {"protocol": p}


def _commit(table, version, actions, ts_ms=None):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    lines = [{"commitInfo": {"timestamp": ts_ms or (1700000000000 + version * 60000),
                             "operation": "WRITE"}}]
    lines += actions
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in lines)


def _data_file(table, rel, rows, schema=("k", "v")):
    """One parquet data file with the given (k, v) rows + its add action."""
    abs_p = os.path.join(table, rel)
    os.makedirs(os.path.dirname(abs_p), exist_ok=True)
    cols = {schema[0]: pa.array([r[0] for r in rows], pa.int64()),
            schema[1]: pa.array([r[1] for r in rows], pa.string())}
    pq.write_table(pa.table(cols), abs_p)
    ks = [r[0] for r in rows if r[0] is not None]
    stats = {
        "numRecords": len(rows),
        "minValues": {"k": min(ks)} if ks else {},
        "maxValues": {"k": max(ks)} if ks else {},
        "nullCount": {"k": len(rows) - len(ks)},
    }
    return {
        "add": {
            "path": urllib.parse.quote(rel),
            "partitionValues": {},
            "size": os.path.getsize(abs_p),
            "modificationTime": 0,
            "dataChange": True,
            "stats": json.dumps(stats),
        }
    }


def test_basic_read_time_travel_and_remove(spark, tmp_path):
    t = str(tmp_path / "t")
    a0 = _data_file(t, "part-0.parquet", [(1, "a"), (2, "b")])
    _commit(t, 0, [_protocol(), _meta(), a0])
    a1 = _data_file(t, "sub dir/part 1.parquet", [(3, "c")])  # URL-encoded path
    assert "%20" in a1["add"]["path"]
    _commit(t, 1, [a1])
    _commit(t, 2, [{"remove": {"path": a0["add"]["path"], "dataChange": True}}])

    d = DeltaLogTable(spark, t)
    assert d.exists() and d.version() == 2
    assert {r.k for r in d.read().collect()} == {3}
    assert {r.k for r in d.read(version_as_of=1).collect()} == {1, 2, 3}
    assert {r.k for r in d.read(version_as_of=0).collect()} == {1, 2}
    # timestamp travel: v1's commitInfo stamp
    ts1 = 1700000000000 / 1000.0 + 60
    assert {r.k for r in d.read(timestamp_as_of=ts1).collect()} == {1, 2, 3}
    assert [h[0] for h in d.history()] == [0, 1, 2]
    assert all(h[2] == "WRITE" for h in d.history())


def test_stats_pruning_and_residual_exactness(spark, tmp_path):
    t = str(tmp_path / "t")
    adds = []
    for i in range(4):
        adds.append(
            _data_file(t, f"p{i}.parquet", [(10 * i + j, f"s{j}") for j in range(10)])
        )
    _commit(t, 0, [_protocol(), _meta(), *adds])
    d = DeltaLogTable(spark, t)
    df = d.read(filters=[("k", ">=", 20), ("k", "<", 25)])
    assert len(df.inputFiles()) == 1  # stats pruned 3 of 4 files
    assert sorted(r.k for r in df.collect()) == list(range(20, 25))


def test_partitioned_flat_layout_protocol_authoritative(spark, tmp_path):
    """partitionValues come from the LOG, not the directory layout —
    files live flat on disk and the partition column (absent from the
    data files) is reattached typed, including a NULL partition."""
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
            {"name": "p", "type": "integer", "nullable": True, "metadata": {}},
        ],
    }
    t = str(tmp_path / "t")
    a1 = _data_file(t, "f1.parquet", [(1, "a")])
    a1["add"]["partitionValues"] = {"p": "7"}
    a2 = _data_file(t, "f2.parquet", [(2, "b")])
    a2["add"]["partitionValues"] = {"p": "8"}
    a3 = _data_file(t, "f3.parquet", [(3, "c")])
    a3["add"]["partitionValues"] = {"p": None}
    _commit(t, 0, [_protocol(), _meta(schema, ["p"]), a1, a2, a3])

    d = DeltaLogTable(spark, t)
    got = {(r.k, r.p) for r in d.read().collect()}
    assert got == {(1, 7), (2, 8), (3, None)}
    assert [f.dataType.typeName() for f in d.read().schema.fields] == [
        "long", "string", "integer",
    ]
    # partition filter prunes to one file (exact min==max envelope)
    df = d.read(filters=[("p", "=", 7)])
    assert len(df.inputFiles()) == 1
    assert [(r.k, r.p) for r in df.collect()] == [(1, 7)]


@pytest.mark.nonconformant_log  # minimal hand-authored checkpoint omits metaData.format
def test_checkpoint_with_map_partition_values(spark, tmp_path):
    """A parquet checkpoint exactly as delta-spark lays it out: one row
    per action, add.partitionValues as a MAP column (pyarrow yields
    key-value tuple lists), tail commits replayed on top."""
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
            {"name": "p", "type": "integer", "nullable": True, "metadata": {}},
        ],
    }
    t = str(tmp_path / "t")
    a1 = _data_file(t, "f1.parquet", [(1, "a")])
    a1["add"]["partitionValues"] = {"p": "1"}
    a2 = _data_file(t, "f2.parquet", [(2, "b")])
    a2["add"]["partitionValues"] = {"p": "2"}
    _commit(t, 0, [_protocol(), _meta(schema, ["p"]), a1])
    _commit(t, 1, [a2])

    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("stats", pa.string()),
        ]
    )
    meta_struct = json.loads(json.dumps(_meta(schema, ["p"])["metaData"]))
    meta_struct["schemaString"] = _meta(schema, ["p"])["metaData"]["schemaString"]
    cp = pa.table(
        {
            "add": pa.array(
                [
                    {
                        "path": a["add"]["path"],
                        "partitionValues": list(a["add"]["partitionValues"].items()),
                        "size": a["add"]["size"],
                        "stats": a["add"]["stats"],
                    }
                    for a in (a1, a2)
                ]
                + [None, None],
                add_t,
            ),
            "metaData": pa.array(
                [None, None, {
                    "id": meta_struct["id"],
                    "schemaString": meta_struct["schemaString"],
                    "partitionColumns": ["p"],
                }, None],
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                    ]
                ),
            ),
            "protocol": pa.array(
                [None, None, None, {"minReaderVersion": 1, "minWriterVersion": 2}],
                pa.struct(
                    [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
                ),
            ),
        }
    )
    log = os.path.join(t, "_delta_log")
    pq.write_table(cp, os.path.join(log, f"{1:020d}.checkpoint.parquet"))

    a3 = _data_file(t, "f3.parquet", [(3, "c")])
    a3["add"]["partitionValues"] = {"p": "3"}
    _commit(t, 2, [a3, {"remove": {"path": a1["add"]["path"], "dataChange": True}}])

    d = DeltaLogTable(spark, t)
    snap = d.snapshot()
    assert snap.version == 2 and len(snap.files) == 2
    got = {(r.k, r.p) for r in d.read().collect()}
    assert got == {(2, 2), (3, 3)}
    # the checkpoint alone serves v1 (no replay of commit 0 needed: the
    # reader starts at the checkpoint even if commit 0 were vacuumed)
    os.unlink(os.path.join(log, f"{0:020d}.json"))
    d2 = DeltaLogTable(spark, t)
    assert {(r.k, r.p) for r in d2.read(version_as_of=1).collect()} == {
        (1, 1), (2, 2),
    }


def test_column_mapping_name_mode(spark, tmp_path):
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "key",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-abc123",
                },
            },
            {
                "name": "val",
                "type": "string",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-def456",
                },
            },
        ],
    }
    t = str(tmp_path / "t")
    a = _data_file(t, "f.parquet", [(5, "x")], schema=("col-abc123", "col-def456"))
    _commit(
        t,
        0,
        [
            _protocol(reader=2, writer=5),
            _meta(schema, configuration={"delta.columnMapping.mode": "name"}),
            a,
        ],
    )
    d = DeltaLogTable(spark, t)
    rows = d.read().collect()
    assert d.read().columns == ["key", "val"]
    assert [(r.key, r.val) for r in rows] == [(5, "x")]


@pytest.mark.nonconformant_log  # deliberately broken actions (unknown DV storageType etc.)
def test_refusals_are_loud(spark, tmp_path):
    # a reader feature this module genuinely doesn't implement
    t = str(tmp_path / "t")
    a = _data_file(t, "f.parquet", [(1, "a")])
    _commit(t, 0, [_protocol(reader=3, reader_features=["vacuumProtocolCheck",
                                                        "madeUpFeature"]),
                   _meta(), a])
    with pytest.raises(DeltaProtocolError, match="madeUpFeature"):
        DeltaLogTable(spark, t).snapshot()

    # an unknown DV storage type must refuse, not misread
    t2 = str(tmp_path / "t2")
    a2 = _data_file(t2, "f.parquet", [(1, "a")])
    dv = json.loads(json.dumps(a2))
    dv["add"]["deletionVector"] = {"storageType": "z", "pathOrInlineDv": "x",
                                   "sizeInBytes": 1, "cardinality": 1}
    _commit(t2, 0, [_protocol(reader=3, reader_features=["deletionVectors"]),
                    _meta(), dv])
    with pytest.raises(DeltaProtocolError, match="storageType"):
        DeltaLogTable(spark, t2).snapshot()

    # id-mode is READABLE since r11 (test_delta_id_mapping) — but a
    # MALFORMED id-mode log whose fields lack delta.columnMapping.id
    # still refuses loudly (field-id resolution is impossible)
    t3 = str(tmp_path / "t3")
    a3 = _data_file(t3, "f.parquet", [(1, "a")])
    _commit(t3, 0, [_protocol(reader=2),
                    _meta(configuration={"delta.columnMapping.mode": "id"}), a3])
    with pytest.raises(DeltaProtocolError, match="delta.columnMapping.id"):
        DeltaLogTable(spark, t3).snapshot()


def test_read_fallback_options(spark, tmp_path):
    t = str(tmp_path / "t")
    _commit(t, 0, [_protocol(), _meta(),
                   _data_file(t, "f0.parquet", [(1, "a")])])
    _commit(t, 1, [_data_file(t, "f1.parquet", [(2, "b")])])
    assert {r.k for r in delta_read_fallback(spark, t).collect()} == {1, 2}
    assert {
        r.k for r in delta_read_fallback(spark, t, {"versionAsOf": "0"}).collect()
    } == {1}
    iso = datetime.datetime.fromtimestamp(1700000000.0 + 30).isoformat()
    assert {
        r.k
        for r in delta_read_fallback(spark, t, {"timestampAsOf": iso}).collect()
    } == {1}
    # filters option: same data-skipping spelling as governed snaplog reads
    pruned = delta_read_fallback(spark, t, {"filters": [("k", "=", 2)]})
    assert len(pruned.inputFiles()) == 1
    assert {r.k for r in pruned.collect()} == {2}


def test_governed_read_path_falls_back_without_the_jar(spark, tmp_path):
    """io/read.py: a ReadRequest with format='delta' (what the locators
    emit for Databricks targets) resolves through the protocol reader in
    this jar-less container, honoring the emitted time-travel options."""
    from dc43_spark.io.merge import delta_available
    from dc43_spark.io.read import ReadRequest, load_dataframe

    assert not delta_available()  # the container invariant this guards
    t = str(tmp_path / "t")
    _commit(t, 0, [_protocol(), _meta(),
                   _data_file(t, "f0.parquet", [(1, "a"), (2, "b")])])
    _commit(t, 1, [_data_file(t, "f1.parquet", [(3, "c")])])

    df = load_dataframe(spark, ReadRequest(path=t, format="delta"))
    assert {r.k for r in df.collect()} == {1, 2, 3}
    pinned = load_dataframe(
        spark,
        ReadRequest(path=t, format="delta", options={"versionAsOf": "0"}),
    )
    assert {r.k for r in pinned.collect()} == {1, 2}


def test_export_snaplog_snapshot_roundtrip(spark, tmp_path):
    """A snaplog snapshot exported as a Delta table reads back row-exact
    through the independent protocol reader, with partition + stats
    pruning intact and time-travel pinning which snapshot exports."""
    from dc43_spark.io.delta_log import export_delta_snapshot
    from dc43_spark.io.snaplog import SnaplogTable

    t = SnaplogTable(spark, str(tmp_path / "src"))
    df = spark.createDataFrame(
        [(p, k, f"s{k}") for p in ("a", "b") for k in range(10)],
        "p string, k long, v string",
    )
    t.write(
        df.repartition("p"), mode="overwrite", partition_by=["p"]
    )
    t.write(
        spark.createDataFrame([("a", 100, "late")], "p string, k long, v string")
        .coalesce(1),
        mode="append",
    )

    dest = export_delta_snapshot(t, str(tmp_path / "delta"))
    d = DeltaLogTable(spark, dest)
    got = {(r.p, r.k, r.v) for r in d.read().collect()}
    want = {(r.p, r.k, r.v) for r in t.read().collect()}
    assert got == want and len(got) == 21
    # partition pruning through the export
    pruned = d.read(filters=[("p", "=", "b")])
    assert {r.p for r in pruned.collect()} == {"b"}
    assert all("p=b" in f or "b" in f for f in pruned.inputFiles())
    # stats pruning: k=100 lives in the late single-row file
    assert len(d.read(filters=[("k", "=", 100)]).inputFiles()) == 1
    # hard links, not copies (zero data movement on one filesystem)
    linked = [f for f in d.snapshot().files
              if os.stat(os.path.join(dest, f.path)).st_nlink >= 2]
    assert linked
    # version pinning: exporting v0 omits the late row
    dest0 = export_delta_snapshot(t, str(tmp_path / "delta0"), version_as_of=0)
    assert DeltaLogTable(spark, dest0).read().count() == 20


def test_export_refusals(spark, tmp_path):
    from dc43_spark.io.delta_log import export_delta_snapshot
    from dc43_spark.io.snaplog import SnaplogTable

    h = SnaplogTable(spark, str(tmp_path / "h"))
    h.write(
        spark.createDataFrame(
            [(datetime.datetime(2026, 1, 1), 1)], "ts timestamp, k long"
        ).coalesce(1),
        mode="overwrite",
        partition_by=["days(ts)"],
    )
    with pytest.raises(ValueError, match="hidden partition"):
        export_delta_snapshot(h, str(tmp_path / "d3"))

    ok = SnaplogTable(spark, str(tmp_path / "ok"))
    ok.write(
        spark.createDataFrame([(1, "a")], "k long, v string").coalesce(1),
        mode="overwrite",
    )
    dest = export_delta_snapshot(ok, str(tmp_path / "d4"))
    with pytest.raises(ValueError, match="already has"):
        export_delta_snapshot(ok, dest)


def test_export_column_mapped_table(spark, tmp_path):
    """r11 (the last export refusal lifted): a renamed/dropped-column
    snaplog table exports as a column-mapped (mode=name) Delta table —
    both formats freeze the same physical names in the files, so the
    export is still pure metadata + hard links. Sync stays incremental
    while the mapping is unchanged and refuses after a rename."""
    from dc43_spark.io.delta_log import (
        DeltaLogTable,
        export_delta_snapshot,
        sync_delta_export,
    )
    from dc43_spark.io.snaplog import SnaplogTable

    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k long, v string, gone long"
        ).coalesce(1),
        mode="overwrite",
    )
    t.rename_column("v", "w")
    t.drop_column("gone")
    dest = export_delta_snapshot(t, str(tmp_path / "d"))
    d = DeltaLogTable(spark, dest)
    snap = d.snapshot()
    assert snap.mapping_mode == "name"
    assert [f.name for f in snap.schema.fields] == ["k", "w"]
    got = {(r.k, r.w) for r in d.read().collect()}
    assert got == {(1, "a"), (2, "b")}
    # stats pruning keys physically and still bites on the logical filter
    assert len(d.read(filters=[("k", "=", 2)]).collect()) == 1
    # incremental sync while the mapping is unchanged
    t.write(
        spark.createDataFrame([(3, "c")], "k long, w string").coalesce(1),
        mode="append",
    )
    assert sync_delta_export(t, dest) is not None
    got = {(r.k, r.w) for r in DeltaLogTable(spark, dest).read().collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    # a rename since the mirror refuses the incremental path
    t.rename_column("w", "x")
    t.write(
        spark.createDataFrame([(4, "d")], "k long, x string").coalesce(1),
        mode="append",
    )
    with pytest.raises(ValueError, match="column mapping changed"):
        sync_delta_export(t, dest)


@pytest.mark.nonconformant_log  # minimal hand-authored checkpoint omits required add fields
def test_multi_part_checkpoint(spark, tmp_path):
    """delta-spark splits big checkpoints into N parts
    (%020d.checkpoint.%010d.%010d.parquet); only COMPLETE sets qualify."""
    t = str(tmp_path / "t")
    a1 = _data_file(t, "f1.parquet", [(1, "a")])
    a2 = _data_file(t, "f2.parquet", [(2, "b")])
    _commit(t, 0, [_protocol(), _meta(), a1])
    _commit(t, 1, [a2])

    add_t = pa.struct([("path", pa.string()), ("size", pa.int64()),
                       ("stats", pa.string())])
    meta_t = pa.struct([("id", pa.string()), ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string()))])
    proto_t = pa.struct([("minReaderVersion", pa.int32()),
                         ("minWriterVersion", pa.int32())])
    log = os.path.join(t, "_delta_log")

    def part(n, adds, metas, protos):
        pq.write_table(
            pa.table({
                "add": pa.array(adds, add_t),
                "metaData": pa.array(metas, meta_t),
                "protocol": pa.array(protos, proto_t),
            }),
            os.path.join(log, f"{1:020d}.checkpoint.{n:010d}.{2:010d}.parquet"),
        )

    meta_row = {
        "id": "x",
        "schemaString": _meta()["metaData"]["schemaString"],
        "partitionColumns": [],
    }
    part(1, [{"path": a1["add"]["path"], "size": 1, "stats": a1["add"]["stats"]}],
         [None], [{"minReaderVersion": 1, "minWriterVersion": 2}])
    part(2, [{"path": a2["add"]["path"], "size": 1, "stats": a2["add"]["stats"]}],
         [meta_row], [None])
    # commit 0 vacuumed: the reader must reconstruct from the parts alone
    os.unlink(os.path.join(log, f"{0:020d}.json"))

    d = DeltaLogTable(spark, t)
    assert {r.k for r in d.read(version_as_of=1).collect()} == {1, 2}

    # an INCOMPLETE part set (1 of 2) must NOT be treated as a checkpoint
    t2 = str(tmp_path / "t2")
    b1 = _data_file(t2, "f1.parquet", [(5, "e")])
    _commit(t2, 0, [_protocol(), _meta(), b1])
    log2 = os.path.join(t2, "_delta_log")
    pq.write_table(
        pa.table({"add": pa.array([None], add_t),
                  "metaData": pa.array([None], meta_t),
                  "protocol": pa.array([None], proto_t)}),
        os.path.join(log2, f"{0:020d}.checkpoint.{1:010d}.{2:010d}.parquet"),
    )
    d2 = DeltaLogTable(spark, t2)
    assert d2._checkpoints() == {}  # ignored -> replay falls back to JSON
    assert {r.k for r in d2.read().collect()} == {5}


def test_governed_read_over_a_delta_table(spark, tmp_path):
    """The reference's Databricks read shape end-to-end in-container:
    contract + format='delta' + a version-pinned locator, scanning a
    real _delta_log through the protocol reader, schema-validated."""
    from dc43_spark.contracts import Contract, SchemaObject, SchemaProperty
    from dc43_spark.io.locators import ContractVersionLocator, StaticDatasetLocator
    from dc43_spark.io.read import read_with_contract

    t = str(tmp_path / "t")
    _commit(t, 0, [_protocol(), _meta(),
                   _data_file(t, "f0.parquet", [(1, "a"), (2, "b")])])
    _commit(t, 1, [_data_file(t, "f1.parquet", [(3, "c")])])

    contract = Contract(
        id="delta.kv", version="0.1.0",
        schema_objects=[SchemaObject(
            name="kv",
            properties=[
                SchemaProperty("k", "bigint", required=True),
                SchemaProperty("v", "string", required=True),
            ],
        )],
    )
    aligned, result = read_with_contract(
        spark, contract, metrics=False,
        locator=ContractVersionLocator(
            "0", base=StaticDatasetLocator(path=t, format="delta")
        ),
    )
    assert result.status == "ok", result.errors
    assert {r.k for r in aligned.collect()} == {1, 2}
    aligned, _ = read_with_contract(
        spark, contract, path=t, format="delta", metrics=False
    )
    assert {r.k for r in aligned.collect()} == {1, 2, 3}


# ---------------- deletion vectors (PROTOCOL.md "Deletion Vectors")


def _dv_add(table, add_action, positions, *, inline=False, prefix="ab"):
    """Attach a REAL deletion vector to an add action: an on-disk DV file
    (storageType 'u', z85 UUID, big-endian size+CRC framing) or an inline
    z85 blob (storageType 'i')."""
    import uuid

    from dc43_spark.io import dv as dvmod

    blob = dvmod.serialize_dv_blob(positions)
    out = json.loads(json.dumps(add_action))
    if inline:
        padded = blob + b"\x00" * (-len(blob) % 4)
        out["add"]["deletionVector"] = {
            "storageType": "i",
            "pathOrInlineDv": dvmod.z85_encode(padded),
            "sizeInBytes": len(padded),
            "cardinality": len(set(positions)),
        }
        return out
    u = uuid.uuid4()
    rel = (f"{prefix}/" if prefix else "") + f"deletion_vector_{u}.bin"
    (off,) = dvmod.write_dv_file(os.path.join(table, rel), [blob])
    out["add"]["deletionVector"] = {
        "storageType": "u",
        "pathOrInlineDv": (f"{prefix}/" if prefix else "") + dvmod.z85_encode(u.bytes),
        "offset": off,
        "sizeInBytes": len(blob),
        "cardinality": len(set(positions)),
    }
    return out


def test_deletion_vectors_on_disk(spark, tmp_path):
    """A DELETE on a real Delta table rewrites the add with a DV instead
    of rewriting data: rows at the DV's positions vanish from the scan,
    the pre-DV version still shows them, and the other file is untouched."""
    t = str(tmp_path / "t")
    a1 = _data_file(t, "f1.parquet", [(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    a2 = _data_file(t, "f2.parquet", [(10, "x"), (11, "y")])
    _commit(t, 0, [_protocol(reader=3, writer=7,
                             reader_features=["deletionVectors"]),
                   _meta(), a1, a2])
    # v1: delete rows at positions 1 and 3 of f1 (k=2 and k=4)
    _commit(t, 1, [_dv_add(t, a1, [1, 3])])

    d = DeltaLogTable(spark, t)
    assert {r.k for r in d.read().collect()} == {1, 3, 10, 11}
    assert {r.k for r in d.read(version_as_of=0).collect()} == {1, 2, 3, 4, 10, 11}
    # stats pruning composes with the DV filter (f2 pruned, f1's DV applied)
    kept = d.read(filters=[("k", "<=", 4)])
    assert {r.k for r in kept.collect()} == {1, 3}


def test_deletion_vectors_inline_and_growing(spark, tmp_path):
    """Inline DVs (z85 blob in the descriptor) and a second DELETE that
    REPLACES the file's vector with a superset — the protocol's 'DVs are
    immutable, a new delete writes a new DV' rule."""
    t = str(tmp_path / "t")
    a1 = _data_file(t, "f1.parquet", [(i, f"s{i}") for i in range(8)])
    _commit(t, 0, [_protocol(reader=3, writer=7,
                             reader_features=["deletionVectors"]),
                   _meta(), a1])
    _commit(t, 1, [_dv_add(t, a1, [0], inline=True)])
    _commit(t, 2, [_dv_add(t, a1, [0, 5, 6], inline=True)])

    d = DeltaLogTable(spark, t)
    assert {r.k for r in d.read(version_as_of=1).collect()} == {1, 2, 3, 4, 5, 6, 7}
    assert {r.k for r in d.read().collect()} == {1, 2, 3, 4, 7}


def test_deletion_vectors_partitioned(spark, tmp_path):
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
            {"name": "p", "type": "integer", "nullable": True, "metadata": {}},
        ],
    }
    t = str(tmp_path / "t")
    a1 = _data_file(t, "f1.parquet", [(1, "a"), (2, "b")])
    a1["add"]["partitionValues"] = {"p": "1"}
    a2 = _data_file(t, "f2.parquet", [(3, "c"), (4, "d")])
    a2["add"]["partitionValues"] = {"p": "2"}
    _commit(t, 0, [_protocol(reader=3, writer=7,
                             reader_features=["deletionVectors"]),
                   _meta(schema, ["p"]), a1, a2])
    _commit(t, 1, [_dv_add(t, a2, [0])])  # delete k=3

    d = DeltaLogTable(spark, t)
    assert {(r.k, r.p) for r in d.read().collect()} == {(1, 1), (2, 1), (4, 2)}
    # partition pruning composes: only p=2's group is scanned, DV applied
    assert {r.k for r in d.read(filters=[("p", "=", 2)]).collect()} == {4}


def test_deletion_vectors_key_on_full_path_not_basename(spark, tmp_path):
    """Two live files sharing a BASENAME in different directories (legal
    in Delta; plausible for CONVERT-ed hive layouts): the DV mask of one
    must not cross-apply to the other — ADVICE r9 (the old join keyed on
    _metadata.file_name alone)."""
    t = str(tmp_path / "t")
    a1 = _data_file(t, "d1/part-0.parquet",
                    [(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    a2 = _data_file(t, "d2/part-0.parquet", [(10, "x"), (11, "y")])
    _commit(t, 0, [_protocol(reader=3, writer=7,
                             reader_features=["deletionVectors"]),
                   _meta(), a1, a2])
    _commit(t, 1, [_dv_add(t, a1, [0])])  # delete k=1 from d1's file ONLY

    d = DeltaLogTable(spark, t)
    # the twin at d2/part-0.parquet keeps its row 0 (k=10)
    assert {r.k for r in d.read().collect()} == {2, 3, 4, 10, 11}


# ---------------- v2 checkpoints (PROTOCOL.md "V2 Spec Checkpoints")


def _sidecar(table, name, adds):
    """One sidecar parquet under _delta_log/_sidecars/ holding add rows."""
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("stats", pa.string()),
            ("deletionVector", pa.struct(
                [("storageType", pa.string()), ("pathOrInlineDv", pa.string()),
                 ("offset", pa.int32()), ("sizeInBytes", pa.int32()),
                 ("cardinality", pa.int64())])),
        ]
    )
    rows = [
        {
            "path": a["add"]["path"],
            "partitionValues": list((a["add"].get("partitionValues") or {}).items()),
            "size": a["add"]["size"],
            "stats": a["add"].get("stats"),
            "deletionVector": a["add"].get("deletionVector"),
        }
        for a in adds
    ]
    sc_dir = os.path.join(table, "_delta_log", "_sidecars")
    os.makedirs(sc_dir, exist_ok=True)
    pq.write_table(pa.table({"add": pa.array(rows, add_t)}),
                   os.path.join(sc_dir, name))
    return name


@pytest.mark.nonconformant_log  # minimal hand-authored v2 manifest omits metaData.format
def test_v2_checkpoint_parquet_with_sidecars(spark, tmp_path):
    """A UUID-named v2 checkpoint: protocol/metaData/checkpointMetadata at
    top level, adds split across two sidecar files. The reader must serve
    the checkpointed version even with every earlier commit vacuumed, and
    replay tail commits on top."""
    import uuid

    t = str(tmp_path / "t")
    a1 = _data_file(t, "f1.parquet", [(1, "a")])
    a2 = _data_file(t, "f2.parquet", [(2, "b")])
    a3 = _data_file(t, "f3.parquet", [(3, "c")])
    proto = _protocol(reader=3, writer=7, reader_features=["v2Checkpoint"])
    _commit(t, 0, [proto, _meta(), a1])
    _commit(t, 1, [a2])
    _commit(t, 2, [a3])

    s1 = _sidecar(t, "s1.parquet", [a1])
    s2 = _sidecar(t, "s2.parquet", [a2])
    log = os.path.join(t, "_delta_log")
    meta_struct = {
        "id": "00000000-0000-0000-0000-000000000000",
        "schemaString": _meta()["metaData"]["schemaString"],
        "partitionColumns": [],
    }
    top = pa.table({
        "checkpointMetadata": pa.array(
            [{"version": 1}, None, None, None],
            pa.struct([("version", pa.int64())])),
        "sidecar": pa.array(
            [None, {"path": s1, "sizeInBytes": 1}, {"path": s2, "sizeInBytes": 1},
             None],
            pa.struct([("path", pa.string()), ("sizeInBytes", pa.int64())])),
        "metaData": pa.array(
            [None, None, None, meta_struct],
            pa.struct([("id", pa.string()), ("schemaString", pa.string()),
                       ("partitionColumns", pa.list_(pa.string()))])),
        "protocol": pa.array(
            [None, None, None,
             {"minReaderVersion": 3, "minWriterVersion": 7,
              "readerFeatures": ["v2Checkpoint"]}],
            pa.struct([("minReaderVersion", pa.int32()),
                       ("minWriterVersion", pa.int32()),
                       ("readerFeatures", pa.list_(pa.string()))])),
    })
    pq.write_table(top, os.path.join(log, f"{1:020d}.checkpoint.{uuid.uuid4()}.parquet"))
    # the checkpoint makes commits 0..1 droppable
    os.unlink(os.path.join(log, f"{0:020d}.json"))
    os.unlink(os.path.join(log, f"{1:020d}.json"))

    d = DeltaLogTable(spark, t)
    assert {r.k for r in d.read().collect()} == {1, 2, 3}
    assert {r.k for r in d.read(version_as_of=1).collect()} == {1, 2}


def test_v2_checkpoint_json_top_level(spark, tmp_path):
    """The v2 spec also allows a JSON top-level checkpoint file."""
    import uuid

    t = str(tmp_path / "t")
    a1 = _data_file(t, "f1.parquet", [(1, "a")])
    a2 = _data_file(t, "f2.parquet", [(2, "b")])
    proto = _protocol(reader=3, writer=7, reader_features=["v2Checkpoint"])
    _commit(t, 0, [proto, _meta(), a1])
    _commit(t, 1, [a2])
    s1 = _sidecar(t, "only.parquet", [a1, a2])
    log = os.path.join(t, "_delta_log")
    lines = [
        {"checkpointMetadata": {"version": 1}},
        {"sidecar": {"path": s1, "sizeInBytes": 1}},
        _meta(),
        proto,
    ]
    with open(os.path.join(log, f"{1:020d}.checkpoint.{uuid.uuid4()}.json"), "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in lines)
    os.unlink(os.path.join(log, f"{0:020d}.json"))
    os.unlink(os.path.join(log, f"{1:020d}.json"))

    d = DeltaLogTable(spark, t)
    assert d.version() is None or True  # no JSON commits left: snapshot via checkpoint
    assert {r.k for r in d.read(version_as_of=1).collect()} == {1, 2}


def test_export_mor_snapshot_with_deletion_vectors(spark, tmp_path):
    """A snaplog merge-on-read snapshot exports WITHOUT materializing its
    deletes: the (file, pos) DV parquet re-encodes as protocol deletion
    vectors (one on-disk DV file, per-data-file roaring blobs, reader 3 /
    writer 7 + deletionVectors feature), and the independent protocol
    reader returns the exact live rows at BOTH exported versions."""
    from dc43_spark.io.delta_log import export_delta_snapshot
    from dc43_spark.io.snaplog import SnaplogTable

    t = SnaplogTable(spark, str(tmp_path / "src"))
    df = spark.createDataFrame(
        [(k, f"s{k}") for k in range(20)], "k long, v string"
    )
    t.write(df.repartitionByRange(2, "k").sortWithinPartitions("k"),
            mode="overwrite")                       # v0: two files
    t.delete([("k", "in", (1, 5, 17))], strategy="merge_on_read")  # v1: DVs
    assert t.snapshot(t.version()).dvs              # really MOR, no rewrite

    dest = export_delta_snapshot(t, str(tmp_path / "delta"))
    d = DeltaLogTable(spark, dest)
    snap = d.snapshot()
    assert any(f.dv for f in snap.files)            # descriptors landed
    got = {(r.k, r.v) for r in d.read().collect()}
    want = {(r.k, r.v) for r in t.read().collect()}
    assert got == want and len(got) == 17
    # pre-delete version exports clean (protocol 1/2, no DV file)
    dest0 = export_delta_snapshot(t, str(tmp_path / "delta0"), version_as_of=0)
    d0 = DeltaLogTable(spark, dest0)
    assert not any(f.dv for f in d0.snapshot().files)
    assert {r.k for r in d0.read().collect()} == set(range(20))
    # stats pruning composes with the exported DVs
    assert {r.k for r in d.read(filters=[("k", "<=", 5)]).collect()} == {0, 2, 3, 4}


def test_sync_delta_export_incremental_mirror(spark, tmp_path):
    """sync_delta_export keeps a Delta mirror current with ONE commit per
    sync: appends land as adds, overwrites as remove+add, MOR deletes as
    remove+add with a fresh protocol DV (growing vectors re-described),
    compaction as a layout swap — and an already-mirrored head is a
    no-op. The independent reader must agree with the snaplog head after
    every sync, and history must stay navigable at each mirrored point."""
    from dc43_spark.io.delta_log import export_delta_snapshot, sync_delta_export
    from dc43_spark.io.snaplog import SnaplogTable

    t = SnaplogTable(spark, str(tmp_path / "src"))
    t.write(
        spark.createDataFrame([(k, f"s{k}") for k in range(10)],
                              "k long, v string").coalesce(1),
        mode="overwrite",
    )
    dest = str(tmp_path / "mirror")
    assert sync_delta_export(t, dest) == 0          # initial = full export
    d = DeltaLogTable(spark, dest)
    assert {r.k for r in d.read().collect()} == set(range(10))
    assert sync_delta_export(t, dest) is None       # head mirrored: no-op

    # append + MOR delete, then ONE sync commit carries both
    t.write(
        spark.createDataFrame([(100, "x"), (101, "y")],
                              "k long, v string").coalesce(1),
        mode="append",
    )
    t.delete([("k", "in", (3, 7))], strategy="merge_on_read")
    v = sync_delta_export(t, dest)
    assert v == 1
    d = DeltaLogTable(spark, dest)
    assert {r.k for r in d.read().collect()} == (
        set(range(10)) - {3, 7}
    ) | {100, 101}
    # the mirror's v0 still reads the pre-sync state
    assert {r.k for r in d.read(version_as_of=0).collect()} == set(range(10))

    # the vector GROWS on the same surviving file: re-described, not stale
    t.delete([("k", "=", 9)], strategy="merge_on_read")
    assert sync_delta_export(t, dest) == 2
    d = DeltaLogTable(spark, dest)
    assert {r.k for r in d.read().collect()} == (
        set(range(10)) - {3, 7, 9}
    ) | {100, 101}

    # materialize + compact: the mirror swaps layout, rows unchanged
    t.materialize_deletes()
    from dc43_spark.io.maintenance import compact_dataset

    compact_dataset(spark, t.path, target_file_mb=64)
    assert sync_delta_export(t, dest) == 3
    d = DeltaLogTable(spark, dest)
    assert {r.k for r in d.read().collect()} == (
        set(range(10)) - {3, 7, 9}
    ) | {100, 101}
    assert not any(f.dv for f in d.snapshot().files)  # DVs materialized away

    # schema evolution refuses (a mirror can't re-describe old files)
    t.write(
        spark.createDataFrame([(1, "a", 0.5)], "k long, v string, w double")
        .coalesce(1),
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="schema or partition"):
        sync_delta_export(t, dest)


def test_v2_checkpoint_sidecar_carries_deletion_vectors(spark, tmp_path):
    """Protocol cross-product: a v2 checkpoint whose SIDECAR add rows
    carry deletionVector structs — the snapshot must apply the DV even
    when every JSON commit is vacuumed."""
    import uuid

    t = str(tmp_path / "t")
    a1 = _data_file(t, "f1.parquet", [(k, f"s{k}") for k in range(6)])
    proto = _protocol(reader=3, writer=7,
                      reader_features=["deletionVectors", "v2Checkpoint"])
    _commit(t, 0, [proto, _meta(), a1])
    dv = _dv_add(t, a1, [1, 4])
    _commit(t, 1, [dv])

    s1 = _sidecar(t, "dv_side.parquet", [dv])
    log = os.path.join(t, "_delta_log")
    lines = [
        {"checkpointMetadata": {"version": 1}},
        {"sidecar": {"path": s1, "sizeInBytes": 1}},
        _meta(),
        proto,
    ]
    with open(os.path.join(log, f"{1:020d}.checkpoint.{uuid.uuid4()}.json"),
              "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in lines)
    os.unlink(os.path.join(log, f"{0:020d}.json"))
    os.unlink(os.path.join(log, f"{1:020d}.json"))

    d = DeltaLogTable(spark, t)
    assert {r.k for r in d.read(version_as_of=1).collect()} == {0, 2, 3, 5}


def test_own_checkpoint_roundtrips_deletion_vectors(spark, tmp_path):
    """write_delta_checkpoint on a DV-bearing mirror: the descriptor
    survives the checkpoint row and the table reads after its JSON
    commits are vacuumed."""
    from dc43_spark.io.delta_log import (
        export_delta_snapshot,
        sync_delta_export,
        write_delta_checkpoint,
    )
    from dc43_spark.io.snaplog import SnaplogTable

    src = SnaplogTable(spark, str(tmp_path / "src"))
    src.write(
        spark.createDataFrame([(k, f"s{k}") for k in range(8)],
                              "k long, v string").coalesce(1),
        mode="overwrite",
    )
    dest = export_delta_snapshot(src, str(tmp_path / "delta"))
    src.delete([("k", "in", (0, 6))], strategy="merge_on_read")
    sync_delta_export(src, dest)

    d = DeltaLogTable(spark, dest)
    write_delta_checkpoint(d)
    log = os.path.join(dest, "_delta_log")
    for v in (0, 1):
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    d2 = DeltaLogTable(spark, dest)
    assert {r.k for r in d2.read().collect()} == set(range(8)) - {0, 6}


def test_table_changes_derived_and_authoritative(spark, tmp_path):
    """Jar-less CDF: derived inserts for appends, derived deletes for
    full-file removes and for DV growth on a surviving file (exactly the
    newly-deleted positions), and AUTHORITATIVE cdc files when a commit
    carries them — delta-spark's MERGE/UPDATE shape, hand-written."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from dc43_spark.io.delta_log import delta_write

    t = str(tmp_path / "t")
    delta_write(
        spark,
        spark.createDataFrame([(k, f"s{k}") for k in range(4)],
                              "k long, v string").coalesce(1),
        t,
    )                                                     # v0 insert x4
    delta_write(
        spark,
        spark.createDataFrame([(9, "z")], "k long, v string").coalesce(1),
        t,
    )                                                     # v1 insert x1

    d = DeltaLogTable(spark, t)
    ch = d.table_changes(0).collect()
    by_v = {}
    for r in ch:
        by_v.setdefault(r._commit_version, []).append((r.k, r._change_type))
    assert sorted(by_v[0]) == [(k, "insert") for k in range(4)]
    assert by_v[1] == [(9, "insert")]

    # v2: hand-written MOR delete — remove + re-add with a DV on k=2
    add0 = None
    for action in d._commit_lines(0):
        if "add" in action:
            add0 = action["add"]
    dv_add = _dv_add(t, {"add": add0}, [2])  # position 2 == k=2 (sorted write)
    _commit(t, 2, [
        {"remove": {"path": add0["path"], "dataChange": True}},
        dv_add,
    ])
    ch2 = {(r.k, r._change_type) for r in
           DeltaLogTable(spark, t).table_changes(2, 2).collect()}
    assert ch2 == {(2, "delete")}

    # v3: hand-written authoritative cdc commit (update pre/post images)
    cdc_rel = "_change_data/cdc-0.parquet"
    os.makedirs(os.path.join(t, "_change_data"), exist_ok=True)
    _pq.write_table(
        _pa.table({
            "k": _pa.array([9, 9], _pa.int64()),
            "v": _pa.array(["z", "Z2"], _pa.string()),
            "_change_type": _pa.array(
                ["update_preimage", "update_postimage"], _pa.string()),
        }),
        os.path.join(t, cdc_rel),
    )
    _commit(t, 3, [{"cdc": {"path": cdc_rel, "partitionValues": {},
                            "size": 1, "dataChange": False}}])
    ch3 = {(r.k, r.v, r._change_type) for r in
           DeltaLogTable(spark, t).table_changes(3, 3).collect()}
    assert ch3 == {(9, "z", "update_preimage"), (9, "Z2", "update_postimage")}

    # v4: full-file delete of v1's file derives delete rows
    add1 = None
    for action in DeltaLogTable(spark, t)._commit_lines(1):
        if "add" in action:
            add1 = action["add"]
    _commit(t, 4, [{"remove": {"path": add1["path"], "dataChange": True}}])
    ch4 = {(r.k, r._change_type) for r in
           DeltaLogTable(spark, t).table_changes(4, 4).collect()}
    assert ch4 == {(9, "delete")}

    # windows compose and timestamps/versions ride along
    allch = DeltaLogTable(spark, t).table_changes(0)
    assert allch.filter("_change_type = 'delete'").count() == 2
    assert {r._commit_version for r in allch.collect()} == {0, 1, 2, 3, 4}


def test_table_changes_dv_diffs_executor_side_both_gate_modes(spark, tmp_path):
    """Derived table_changes over a high-cardinality-DV history — DV
    growth (delete), DV shrink (RESTORE re-insert), then a full-file
    remove under a large prior vector — is correct on BOTH sides of the
    dvBroadcastMaxPositions gate. Since r13 the driver ships only the
    O(1) descriptors; bitmaps decode and diff inside an executor task
    (VERDICT r12 #1: the old path built frozensets of every position on
    the driver and broadcast a driver-built position DataFrame)."""
    t = str(tmp_path / "t")
    n = 5000
    a1 = _data_file(t, "f.parquet", [(i, f"s{i}") for i in range(n)])
    _commit(t, 0, [_protocol(reader=3, writer=7,
                             reader_features=["deletionVectors"]),
                   _meta(), a1])
    # v1: DV covers 0..1999 (plain growth from nothing -> 2000 deletes)
    _commit(t, 1, [_dv_add(t, a1, list(range(2000)))])
    # v2: DV grows to 0..2999 -> 1000 new deletes (2000..2999)
    _commit(t, 2, [_dv_add(t, a1, list(range(3000)))])
    # v3: DV shrinks to 0..999 (RESTORE shape) -> 2000 re-inserts
    _commit(t, 3, [_dv_add(t, a1, list(range(1000)))])
    # v4: full-file remove -> deletes the 4000 rows kept under v3's DV
    _commit(t, 4, [{"remove": {"path": a1["add"]["path"],
                               "dataChange": True}}])

    def _ranges(lo, hi):  # (count, sum of k) over [lo, hi)
        return (hi - lo, (lo + hi - 1) * (hi - lo) // 2)

    expected = {
        (1, "delete"): _ranges(0, 2000),
        (2, "delete"): _ranges(2000, 3000),
        (3, "insert"): _ranges(1000, 3000),
        (4, "delete"): _ranges(1000, 5000),
    }
    gate = "spark.dc43.delta.dvBroadcastMaxPositions"
    d = DeltaLogTable(spark, t)
    try:
        for limit in (None, "0"):  # default broadcast / forced shuffle
            if limit is None:
                spark.conf.unset(gate)
            else:
                spark.conf.set(gate, limit)
            got = {
                (r._commit_version, r._change_type): (r.cnt, r.sk)
                for r in d.table_changes(1, 4)
                .groupBy("_commit_version", "_change_type")
                .agg(F.count("*").alias("cnt"), F.sum("k").alias("sk"))
                .collect()
            }
            assert got == expected, f"gate={limit}"
    finally:
        spark.conf.unset(gate)


def test_table_changes_deep_range_batches_plain_commits(spark, tmp_path):
    """r13: no-DV adds/removes batch ACROSS the whole version range into
    one plan per change type (range_plain) — an append-only history of N
    commits no longer unions N branches (driver plan build measured
    superlinear past ~64). 30 appends emit per-version rows correctly; a
    path removed then RE-ADDED fans out through the identity join (one
    scan, both claiming commits' rows); the final plan carries a bounded
    number of parquet scans regardless of range depth."""
    t = str(tmp_path / "t")
    adds = []
    for v in range(30):
        a = _data_file(t, f"f{v:03d}.parquet", [(v, f"s{v}")])
        _commit(t, v, ([_protocol(), _meta()] if v == 0 else []) + [a])
        adds.append(a)
    d = DeltaLogTable(spark, t)
    got = {(r.k, r._change_type, r._commit_version)
           for r in d.table_changes(0, 29).collect()}
    assert got == {(v, "insert", v) for v in range(30)}

    # remove f000 at v30, re-add the same path at v31: the range feed
    # emits the original insert, the delete, AND the re-insert
    _commit(t, 30, [{"remove": {"path": adds[0]["add"]["path"],
                                "dataChange": True}}])
    _commit(t, 31, [adds[0]])
    allch = d.table_changes(0, 31)
    k0 = {(r._change_type, r._commit_version)
          for r in allch.filter("k = 0").collect()}
    assert k0 == {("insert", 0), ("delete", 30), ("insert", 31)}
    # plan-shape pin: scans grow with CHANGE TYPES (2 batched plans:
    # range inserts + range deletes), never with the 32-commit depth
    # AQE's toString prints Final AND Initial plans — count one section
    plan = (allch._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert plan.count("Scan parquet") <= 3, plan[:2000]


def test_read_fallback_change_feed_option(spark, tmp_path):
    """Delta's batch-CDF option spelling routes through table_changes on
    the governed fallback."""
    from dc43_spark.io.delta_log import delta_write

    t = str(tmp_path / "t")
    delta_write(spark, spark.createDataFrame([(1, "a")], "k long, v string")
                .coalesce(1), t)
    delta_write(spark, spark.createDataFrame([(2, "b")], "k long, v string")
                .coalesce(1), t)
    ch = delta_read_fallback(
        spark, t, {"readChangeFeed": "true", "startingVersion": 1}
    )
    assert {(r.k, r._change_type, r._commit_version)
            for r in ch.collect()} == {(2, "insert", 1)}


def test_read_fallback_cdf_timestamp_options(spark, tmp_path):
    """startingTimestamp/endingTimestamp resolve against commit
    timestamps (start = first commit at/after, end = last at/before),
    Delta's option spelling."""
    from dc43_spark.io.delta_log import delta_write

    t = str(tmp_path / "t")
    a1 = _data_file(t, "f1.parquet", [(1, "a")])
    a2 = _data_file(t, "f2.parquet", [(2, "b")])
    a3 = _data_file(t, "f3.parquet", [(3, "c")])
    _commit(t, 0, [_protocol(), _meta(), a1], ts_ms=1_000_000)
    _commit(t, 1, [a2], ts_ms=2_000_000)
    _commit(t, 2, [a3], ts_ms=3_000_000)

    got = delta_read_fallback(spark, t, {
        "readChangeFeed": "true",
        "startingTimestamp": "1500",   # unix seconds -> v1 is first >=
        "endingTimestamp": "2500",     # v1 is last <=
    })
    assert {(r.k, r._change_type, r._commit_version)
            for r in got.collect()} == {(2, "insert", 1)}
    with pytest.raises(ValueError, match="not both"):
        delta_read_fallback(spark, t, {
            "readChangeFeed": "true",
            "startingVersion": 0, "startingTimestamp": "1500",
        })
    with pytest.raises(ValueError, match="at or after"):
        delta_read_fallback(spark, t, {
            "readChangeFeed": "true", "startingTimestamp": "9999999",
        })


def test_export_column_mapped_nested_fields(spark, tmp_path):
    """Finding-class: under column mapping EVERY nested struct field
    needs an id + physicalName, not just the top level — an export
    missing them is protocol-invalid to conforming readers."""
    import json as _json

    from dc43_spark.io.delta_log import DeltaLogTable, export_delta_snapshot
    from dc43_spark.io.snaplog import SnaplogTable

    t = SnaplogTable(spark, str(tmp_path / "t"))
    t.write(
        spark.sql(
            "select id as k, named_struct('a', id, 'b', "
            "named_struct('c', id * 2)) as s, array(named_struct('x', id)) "
            "as arr from range(3)"
        ).coalesce(1),
        mode="overwrite",
    )
    t.rename_column("k", "key")
    dest = export_delta_snapshot(t, str(tmp_path / "d"))
    meta = None
    with open(f"{dest}/_delta_log/{0:020d}.json") as fh:
        for line in fh:
            a = _json.loads(line)
            if "metaData" in a:
                meta = a["metaData"]
    doc = _json.loads(meta["schemaString"])
    ids = []

    def _walk(fields):
        for f in fields:
            md = f.get("metadata") or {}
            assert "delta.columnMapping.id" in md, f["name"]
            assert "delta.columnMapping.physicalName" in md, f["name"]
            ids.append(md["delta.columnMapping.id"])
            tp = f["type"]
            if isinstance(tp, dict):
                if tp.get("type") == "struct":
                    _walk(tp["fields"])
                elif tp.get("type") == "array" and isinstance(
                    tp.get("elementType"), dict
                ):
                    _walk(tp["elementType"].get("fields", ()))

    _walk(doc["fields"])
    assert len(ids) == len(set(ids)) and len(ids) == 7
    assert int(
        meta["configuration"]["delta.columnMapping.maxColumnId"]
    ) == max(ids)
    got = DeltaLogTable(spark, dest).read().orderBy("key").collect()
    assert [(r.key, r.s.a, r.s.b.c, r.arr[0].x) for r in got] == [
        (0, 0, 0, 0), (1, 1, 2, 1), (2, 2, 4, 2),
    ]
