"""id-mode column mapping (delta.columnMapping.mode=id — the mode
iceberg-converted / UniForm tables carry): file columns are resolved by
PARQUET FIELD ID, not by name. The reader builds read schemas whose
fields carry ``parquet.field.id`` metadata (from delta.columnMapping.id)
and lets Spark's native field-id matching do the resolution; the writer
and DML stage files whose parquet footers carry the ids.

Fixtures hand-author the table with pyarrow (PARQUET:field_id field
metadata) using ON-FILE NAMES THAT DIFFER from both the logical and the
physical names — only id resolution can read them correctly."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dc43_spark.io.delta_dml import delta_delete, delta_merge, delta_update
from dc43_spark.io.delta_log import (
    DeltaLogTable,
    DeltaWriteError,
    delta_optimize,
    delta_write,
)


def _id_field(name, typ, fid):
    return pa.field(name, typ, metadata={b"PARQUET:field_id": str(fid).encode()})


def _schema_json(partition=False):
    fields = [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-aaa"}},
        {"name": "v", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-bbb"}},
    ]
    if partition:
        fields.append(
            {"name": "p", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName": "col-ppp"}}
        )
    return json.dumps({"type": "struct", "fields": fields})


def _mk_id_table(tmp_path, *, partition=False):
    t = str(tmp_path / "t")
    os.makedirs(os.path.join(t, "_delta_log"))
    adds = []

    def _file(name, ks, vs, pv):
        # deliberately WRONG on-file names ("weird_a"/"weird_b"): only
        # field-id matching can resolve these
        tbl = pa.table({
            "weird_a": pa.array(ks, pa.int64()),
            "weird_b": pa.array(vs, pa.string()),
        }).cast(pa.schema([
            _id_field("weird_a", pa.int64(), 1),
            _id_field("weird_b", pa.string(), 2),
        ]))
        pq.write_table(tbl, os.path.join(t, name))
        adds.append({"add": {
            "path": name, "partitionValues": pv, "size": 1,
            "dataChange": True,
            "stats": json.dumps({"numRecords": len(ks)}),
        }})

    if partition:
        _file("f1.parquet", [0, 1], ["a", "b"], {"col-ppp": "1"})
        _file("f2.parquet", [2, 3], ["c", "d"], {"col-ppp": "2"})
    else:
        _file("f1.parquet", [0, 1], ["a", "b"], {})
        _file("f2.parquet", [2, 3], ["c", "d"], {})
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "idmode",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": _schema_json(partition),
                      "partitionColumns": ["p"] if partition else [],
                      "configuration": {
                          "delta.columnMapping.mode": "id",
                          "delta.columnMapping.maxColumnId": "3",
                      }}},
    ] + adds
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in actions)
    return t


def test_id_mode_read_resolves_by_field_id(spark, tmp_path):
    t = _mk_id_table(tmp_path)
    d = DeltaLogTable(spark, t)
    assert d.snapshot().mapping_mode == "id"
    got = {(r.k, r.v) for r in d.read().collect()}
    assert got == {(0, "a"), (1, "b"), (2, "c"), (3, "d")}
    # stats pruning on the logical name still works (stats keyed physical
    # in the log would be mapped; here file stats ride numRecords only)
    assert {r.k for r in d.read(filters=[("k", ">=", 2)]).collect()} == {2, 3}


def test_id_mode_partitioned_read(spark, tmp_path):
    t = _mk_id_table(tmp_path, partition=True)
    d = DeltaLogTable(spark, t)
    got = {(r.k, r.p) for r in d.read().collect()}
    assert got == {(0, 1), (1, 1), (2, 2), (3, 2)}
    df = d.read(filters=[("p", "=", 2)])
    assert len(df.inputFiles()) == 1
    assert {r.k for r in df.collect()} == {2, 3}


def test_id_mode_append_stages_field_ids(spark, tmp_path):
    """delta_write appends to an id-mode table: the staged parquet must
    carry the field ids (and the re-read resolves through them)."""
    t = _mk_id_table(tmp_path)
    d = DeltaLogTable(spark, t)
    delta_write(
        spark,
        spark.createDataFrame([(9, "z")], "k long, v string"),
        t, mode="append", checkpoint_interval=None,
    )
    got = {(r.k, r.v) for r in d.read().collect()}
    assert (9, "z") in got and len(got) == 5
    # the new file's footer carries the ids
    new_files = [
        f.path for f in d.snapshot().files if f.path.startswith("part-")
    ]
    assert new_files
    sch = pq.read_schema(os.path.join(t, new_files[0]))
    ids = {
        n: sch.field(n).metadata.get(b"PARQUET:field_id")
        for n in sch.names
    }
    assert set(ids.values()) == {b"1", b"2"}
    # evolution refuses loudly (ids are assigned at commit, files staged
    # before it)
    with pytest.raises(DeltaWriteError, match="id-mode"):
        delta_write(
            spark,
            spark.createDataFrame([(10, "q", 1)], "k long, v string, extra long"),
            t, mode="append", merge_schema=True, checkpoint_interval=None,
        )


def test_id_mode_dml_round_trip(spark, tmp_path):
    """DELETE (deletion vectors) / UPDATE / MERGE on an id-mode table:
    the lineage scan resolves by field id, new row files keep ids, and
    pinned reads time-travel correctly."""
    t = _mk_id_table(tmp_path)
    d = DeltaLogTable(spark, t)
    assert delta_delete(spark, t, "k = 0", use_dvs=True) == 1
    assert {r.k for r in d.read().collect()} == {1, 2, 3}
    assert delta_update(spark, t, {"v": "upper(v)"}, "k = 1") == 2
    assert {(r.k, r.v) for r in d.read().collect()} == {
        (1, "B"), (2, "c"), (3, "d")
    }
    delta_merge(
        spark,
        spark.createDataFrame([(3, "D3"), (7, "g")], "k long, v string"),
        t, ["k"], use_dvs=True,
    )
    assert {(r.k, r.v) for r in d.read().collect()} == {
        (1, "B"), (2, "c"), (3, "D3"), (7, "g")
    }
    # time travel to v0 still resolves the original files by id
    assert {(r.k, r.v) for r in d.read(version_as_of=0).collect()} == {
        (0, "a"), (1, "b"), (2, "c"), (3, "d")
    }
    # OPTIMIZE keeps ids and rows
    if delta_optimize(spark, t, target_file_mb=64) is not None:
        assert {(r.k, r.v) for r in d.read().collect()} == {
            (1, "B"), (2, "c"), (3, "D3"), (7, "g")
        }


def test_id_mode_optimize_stats_keyed_physically(spark, tmp_path):
    """Review r11 fix: OPTIMIZE on an id-mode table must stage the
    rewrite under PHYSICAL names so the new add's footer stats key
    physically (the protocol's column-mapping stats requirement), not
    under the logical names the field-id read schema uses."""
    import json as _json

    from dc43_spark.io.delta_log import delta_optimize

    t = _mk_id_table(tmp_path)
    v = delta_optimize(spark, t, target_file_mb=64)
    assert v == 1
    d = DeltaLogTable(spark, t)
    raw = d._collect_state(v)[0]
    new_adds = [a for a in raw.values() if a["path"].startswith("part-")]
    assert new_adds
    st = _json.loads(new_adds[0]["stats"])
    assert "col-aaa" in st["minValues"] and "k" not in st["minValues"]
    # and the rewritten file still resolves by field id
    assert {(r.k, r.v) for r in d.read().collect()} == {
        (0, "a"), (1, "b"), (2, "c"), (3, "d")
    }
    # stats pruning through the physical keys (mapped back to logical)
    assert {r.k for r in d.read(filters=[("k", "<", 2)]).collect()} == {0, 1}


def test_id_mode_respects_explicit_fieldid_opt_out(spark, tmp_path):
    """Review r11 fix: a session that DELIBERATELY disabled field-id
    reads gets a pointed refusal, not silently flipped global state."""
    from dc43_spark.io.delta_log import DeltaProtocolError

    t = _mk_id_table(tmp_path / "optout")
    key = "spark.sql.parquet.fieldId.read.enabled"
    spark.conf.set(key, "false")
    try:
        with pytest.raises(DeltaProtocolError, match="fieldId"):
            DeltaLogTable(spark, t).snapshot()
    finally:
        spark.conf.set(key, "true")
    assert DeltaLogTable(spark, t).read().count() == 4
