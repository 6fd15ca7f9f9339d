"""Type widening + VARIANT + vacuumProtocolCheck on the jar-less Delta
surface (PROTOCOL.md "Type Widening", "Variant Data Type",
"Vacuum Protocol Check").

Widening is a metadata-only ALTER: old files keep their narrow physical
type and every scan reads them through the wide schema — Spark's parquet
reader performs the whole promotion lattice natively, which is exactly
why this needs no data rewrite. VARIANT columns ride Spark's native
variant encoding (the same physical layout delta-spark writes) and must
announce their reader+writer feature from birth."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.delta_log import (
    DeltaLogTable,
    DeltaProtocolError,
    DeltaWriteError,
    delta_add_constraint,
    delta_vacuum,
    delta_widen_column_type,
    delta_write,
)


def _protocol(path, version=None):
    log = os.path.join(path, "_delta_log")
    out = None
    for n in sorted(os.listdir(log)):
        if not n.endswith(".json") or n.startswith("_"):
            continue
        if version is not None and int(n.split(".")[0]) > version:
            break
        with open(os.path.join(log, n)) as fh:
            for line in fh:
                a = json.loads(line)
                if "protocol" in a:
                    out = a["protocol"]
    return out


def test_widen_int_to_long_metadata_only(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id").cast("int").alias("k"), F.lit("a").alias("v")
    ).coalesce(1)
    delta_write(spark, df, t)
    files_before = {f.path for f in DeltaLogTable(spark, t).snapshot().files}
    v = delta_widen_column_type(spark, t, "k", "long")
    assert v == 1
    d = DeltaLogTable(spark, t)
    snap = d.snapshot()
    # no data moved; schema is wide; the change is recorded on the field
    assert {f.path for f in snap.files} == files_before
    assert snap.schema["k"].dataType.simpleString() == "bigint"
    doc = json.loads(snap.schema.json())
    kmeta = next(f for f in doc["fields"] if f["name"] == "k")["metadata"]
    assert kmeta["delta.typeWidening.typeChanges"] == [
        {"fromType": "integer", "toType": "long"}
    ]
    p = _protocol(t)
    assert p["minReaderVersion"] == 3 and p["minWriterVersion"] == 7
    assert "typeWidening" in p["readerFeatures"]
    assert "typeWidening" in p["writerFeatures"]
    # narrow files read through the wide schema; appends land wide
    delta_write(
        spark,
        spark.createDataFrame(
            [(2**40, "b")], "k long, v string"
        ).coalesce(1),
        t,
    )
    rows = {r.k for r in DeltaLogTable(spark, t).read().collect()}
    assert rows == set(range(10)) | {2**40}
    # stats pruning still bites across narrow- and wide-typed files
    assert len(
        DeltaLogTable(spark, t).read(filters=[("k", ">", 100)]).inputFiles()
    ) == 1
    # pre-widening versions time-travel with their own (narrow) schema
    old = DeltaLogTable(spark, t).read(version_as_of=0)
    assert old.schema["k"].dataType.simpleString() == "int"


def test_widening_lattice_refusals(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(4).select(
        F.col("id").alias("k"),              # long
        F.col("id").cast("int").alias("n"),
        (F.col("id") % 2).cast("int").alias("p"),
    ).coalesce(1)
    delta_write(spark, df, t, partition_by=["p"])
    with pytest.raises(DeltaWriteError, match="not a protocol-allowed"):
        delta_widen_column_type(spark, t, "k", "int")      # narrowing
    with pytest.raises(DeltaWriteError, match="partition column"):
        delta_widen_column_type(spark, t, "p", "long")
    with pytest.raises(DeltaWriteError, match="no top-level column"):
        delta_widen_column_type(spark, t, "zz", "long")
    delta_add_constraint(spark, t, "n_pos", "n >= 0")
    with pytest.raises(DeltaWriteError, match="referenced by"):
        delta_widen_column_type(spark, t, "n", "long")


def test_widen_decimal_and_int_to_decimal(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(5).select(
        F.col("id").cast("decimal(5,2)").alias("d"),
        F.col("id").cast("int").alias("n"),
    ).coalesce(1)
    delta_write(spark, df, t)
    delta_widen_column_type(spark, t, "d", "decimal(12,4)")
    delta_widen_column_type(spark, t, "n", "decimal(11,1)")
    with pytest.raises(DeltaWriteError, match="not a protocol-allowed"):
        # integer part shrinks: 10 digits needed, 9 offered
        delta_widen_column_type(spark, t, "d", "decimal(11,3)")
    got = DeltaLogTable(spark, t).read().orderBy("n").collect()
    assert [str(r.d) for r in got][:2] == ["0.0000", "1.0000"]
    assert str(got[3].n) == "3.0"


def test_widen_date_to_ntz_pulls_timestampntz_feature(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(3).select(
        F.date_from_unix_date(F.col("id").cast("int")).alias("c"),
        F.col("id").alias("k"),
    ).coalesce(1)
    delta_write(spark, df, t)
    delta_widen_column_type(spark, t, "c", "timestamp_ntz")
    p = _protocol(t)
    assert {"typeWidening", "timestampNtz"} <= set(p["readerFeatures"])
    assert {"typeWidening", "timestampNtz"} <= set(p["writerFeatures"])
    got = DeltaLogTable(spark, t).read().orderBy("k").collect()
    assert got[1].c.isoformat() == "1970-01-02T00:00:00"


def test_foreign_typewidening_table_reads(spark, tmp_path):
    """A delta-spark-shaped log: readerFeatures [typeWidening], wide
    schemaString, narrow physical file — must read, not refuse."""
    t = tmp_path / "t"
    log = t / "_delta_log"
    log.mkdir(parents=True)
    spark.range(3).select(F.col("id").cast("int").alias("k")).coalesce(1) \
        .write.mode("overwrite").parquet(str(t / "stage"))
    part = next(n for n in os.listdir(t / "stage") if n.endswith(".parquet"))
    os.rename(t / "stage" / part, t / "f0.parquet")
    schema = json.dumps({
        "type": "struct",
        "fields": [{
            "name": "k", "type": "long", "nullable": True,
            "metadata": {"delta.typeWidening.typeChanges": [
                {"fromType": "integer", "toType": "long"}
            ]},
        }],
    })
    actions = [
        {"commitInfo": {"timestamp": 1, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["typeWidening"],
                      "writerFeatures": ["typeWidening"]}},
        {"metaData": {
            "id": "22222222-2222-2222-2222-222222222222",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {},
        }},
        {"add": {"path": "f0.parquet", "partitionValues": {},
                 "size": os.path.getsize(t / "f0.parquet"),
                 "modificationTime": 1, "dataChange": True}},
    ]
    with open(log / f"{0:020d}.json", "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    d = DeltaLogTable(spark, str(t))
    got = d.read().orderBy("k").collect()
    assert [r.k for r in got] == [0, 1, 2]
    assert d.read().schema["k"].dataType.simpleString() == "bigint"


def test_variant_create_append_read(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.sql(
        "select id as k, parse_json(format_string('{\"n\": %d}', id)) as v "
        "from range(4)"
    ).coalesce(1)
    delta_write(spark, df, t)
    p = _protocol(t)
    assert p["minReaderVersion"] == 3 and p["minWriterVersion"] == 7
    assert "variantType" in p["readerFeatures"]
    assert "variantType" in p["writerFeatures"]
    delta_write(spark, df.withColumn("k", F.col("k") + 10), t)
    d = DeltaLogTable(spark, t)
    d.read().createOrReplaceTempView("vt")
    got = spark.sql(
        "select k, to_json(v) j from vt order by k"
    ).collect()
    assert len(got) == 8
    assert got[0].j == '{"n":0}' and got[-1].j == '{"n":3}'
    # time travel + stats pruning on the non-variant column still work
    assert d.read(version_as_of=0).count() == 4
    assert len(d.read(filters=[("k", ">=", 10)]).inputFiles()) == 1


def test_variant_evolution_upgrades_protocol(spark, tmp_path):
    t = str(tmp_path / "t")
    delta_write(
        spark,
        spark.range(3).select(F.col("id").alias("k")).coalesce(1),
        t,
    )
    assert _protocol(t) == {"minReaderVersion": 1, "minWriterVersion": 2}
    df = spark.sql(
        "select id + 3 as k, parse_json('{\"a\":1}') as v from range(2)"
    ).coalesce(1)
    delta_write(spark, df, t, merge_schema=True)
    p = _protocol(t)
    assert "variantType" in p["readerFeatures"]
    assert "variantType" in p["writerFeatures"]
    d = DeltaLogTable(spark, t)
    d.read().createOrReplaceTempView("vt2")
    got = spark.sql("select k, to_json(v) j from vt2 order by k").collect()
    assert [r.j for r in got] == [None, None, None, '{"a":1}', '{"a":1}']


def test_variant_dml_roundtrip(spark, tmp_path):
    """DELETE/UPDATE on a variant table: the lineage scan, DV staging and
    new-file staging all run through Spark (pyarrow never opens the
    variant files), so row-level ops just work."""
    from dc43_spark.io.delta_dml import delta_delete, delta_update

    t = str(tmp_path / "t")
    df = spark.sql(
        "select id as k, parse_json(format_string('{\"n\": %d}', id)) as v "
        "from range(6)"
    ).coalesce(1)
    delta_write(spark, df, t)
    delta_delete(spark, t, "k >= 4")
    delta_update(spark, t, {"k": "k + 100"}, "k = 0")
    d = DeltaLogTable(spark, t)
    d.read().createOrReplaceTempView("vdml")
    got = spark.sql(
        "select k, to_json(v) j from vdml order by k"
    ).collect()
    assert [(r.k, r.j) for r in got] == [
        (1, '{"n":1}'), (2, '{"n":2}'), (3, '{"n":3}'), (100, '{"n":0}'),
    ]


def test_ntz_create_announces_feature(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(2).select(
        F.col("id").alias("k"),
        F.to_timestamp_ntz(F.lit("2024-01-01 00:00:00")).alias("ts"),
    ).coalesce(1)
    delta_write(spark, df, t)
    p = _protocol(t)
    assert "timestampNtz" in p["readerFeatures"]
    assert "timestampNtz" in p["writerFeatures"]
    got = DeltaLogTable(spark, t).read().collect()
    assert all(r.ts.isoformat() == "2024-01-01T00:00:00" for r in got)


def test_vacuum_refuses_unknown_writer_feature(spark, tmp_path):
    """vacuumProtocolCheck's whole point: a sweep that doesn't understand
    a writer feature may delete files that feature depends on."""
    t = str(tmp_path / "t")
    delta_write(
        spark, spark.range(3).select(F.col("id").alias("k")).coalesce(1), t
    )
    log = os.path.join(t, "_delta_log")
    name = f"{0:020d}.json"
    with open(os.path.join(log, name)) as fh:
        lines = [json.loads(x) for x in fh if x.strip()]
    for a in lines:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 1, "minWriterVersion": 7,
                "writerFeatures": ["icebergCompatV2"],
            }
    with open(os.path.join(log, name), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    with pytest.raises(DeltaWriteError, match="icebergCompatV2"):
        delta_vacuum(spark, t)
    # reads stay fine: icebergCompatV2 is a WRITER-side obligation
    assert DeltaLogTable(spark, t).read().count() == 3
