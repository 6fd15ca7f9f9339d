"""Liquid clustering (Delta writer feature ``clustering``, PROTOCOL.md
"Clustered Table"): the clustering declaration is the
``delta.clustering`` domain; appends need not cluster (delta-spark's
rule), and a bare OPTIMIZE is the clustering pass — here laid out
through the shared z-order kernel so footer stats prune every
clustering column."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dc43_spark.io.delta_log import (
    DeltaLogTable,
    delta_optimize,
    delta_write,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("c"),
        F.lit("x").alias("v"),
    )


def test_create_clustered_declares_domain_and_optimize_clusters(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 2000).repartition(4), t,
                cluster_by=["c"])
    log = os.path.join(t, "_delta_log")
    with open(os.path.join(log, f"{0:020d}.json")) as fh:
        actions = [json.loads(x) for x in fh if x.strip()]
    protocol = next(a["protocol"] for a in actions if "protocol" in a)
    assert {"clustering", "domainMetadata"} <= set(
        protocol["writerFeatures"]
    )
    dom = next(a["domainMetadata"] for a in actions
               if "domainMetadata" in a)
    assert dom["domain"] == "delta.clustering"
    assert json.loads(dom["configuration"])["clusteringColumns"] == [["c"]]
    # appends are legal WITHOUT clustering (pure blind append)
    delta_write(spark, _df(spark, 2000, 2400).repartition(2), t)
    d = DeltaLogTable(spark, t)
    assert d.read().count() == 2400
    # before clustering, a c-filter touches many files
    files_before = len(d.read(filters=[("c", "=", 3)]).inputFiles())
    assert files_before > 1
    # bare OPTIMIZE IS the clustering pass: z-ordered by the domain's
    # columns, so the same filter prunes to a strict subset
    v = delta_optimize(spark, t, target_file_mb=0.01)
    assert v == 2
    d = DeltaLogTable(spark, t)
    assert d.read().count() == 2400
    files_after = len(d.read(filters=[("c", "=", 3)]).inputFiles())
    total_after = len(d.snapshot().files)
    assert files_after < total_after
    # domain survives the optimize commit (state fold + checkpoints)
    assert "delta.clustering" in d._domains(d.version())


def test_foreign_clustered_table_appends_and_optimizes(spark, tmp_path):
    """A delta-spark-shaped clustered log: the writer gate accepts the
    feature (we honor its obligations) instead of refusing."""
    t = tmp_path / "t"
    log = t / "_delta_log"
    log.mkdir(parents=True)
    spark.range(4).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("c")
    ).coalesce(1).write.mode("overwrite").parquet(str(t / "stage"))
    part = next(n for n in os.listdir(t / "stage") if n.endswith(".parquet"))
    os.rename(t / "stage" / part, t / "f0.parquet")
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "c", "type": "long", "nullable": True, "metadata": {}},
        ],
    })
    actions = [
        {"commitInfo": {"timestamp": 1, "operation": "CREATE TABLE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["clustering", "domainMetadata"]}},
        {"metaData": {
            "id": "44444444-4444-4444-4444-444444444444",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {},
        }},
        {"domainMetadata": {"domain": "delta.clustering",
                            "configuration": json.dumps(
                                {"clusteringColumns": [["c"]]}),
                            "removed": False}},
        {"add": {"path": "f0.parquet", "partitionValues": {},
                 "size": os.path.getsize(t / "f0.parquet"),
                 "modificationTime": 1, "dataChange": True}},
    ]
    with open(log / f"{0:020d}.json", "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    delta_write(
        spark,
        spark.range(4, 8).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("c")
        ).coalesce(1),
        str(t),
    )
    d = DeltaLogTable(spark, str(t))
    assert d.read().count() == 8
    assert delta_optimize(spark, str(t), target_file_mb=128) == 2
    assert DeltaLogTable(spark, str(t)).read().count() == 8


def test_cluster_by_validations(spark, tmp_path):
    t = str(tmp_path / "t")
    with pytest.raises(ValueError, match="not in schema"):
        delta_write(spark, _df(spark, 0, 4), t, cluster_by=["zz"])
    with pytest.raises(ValueError, match="unpartitioned"):
        delta_write(spark, _df(spark, 0, 4), t,
                    partition_by=["v"], cluster_by=["c"])
    delta_write(spark, _df(spark, 0, 4), t)
    with pytest.raises(ValueError, match="CREATE time"):
        delta_write(spark, _df(spark, 4, 8), t, cluster_by=["c"])


def test_clustered_mapped_table_optimizes_by_physical_domain(
    spark, tmp_path
):
    """Finding-class: delta-spark stores PHYSICAL names in the
    delta.clustering domain on mapped tables — OPTIMIZE must translate
    them to logical before the zorder surface."""
    from dc43_spark.io.delta_log import (
        delta_enable_column_mapping,
        delta_rename_column,
    )

    from dc43_spark.io.delta_log import _protocol_with_features

    t = str(tmp_path / "t")
    delta_write(spark, _df(spark, 0, 12000).repartition(3), t)
    delta_enable_column_mapping(spark, t)
    delta_rename_column(spark, t, "c", "cluster_key")  # physical stays "c"
    d = DeltaLogTable(spark, t)
    head = d.version()
    log = os.path.join(t, "_delta_log")
    protocol = None
    for n in sorted(os.listdir(log)):
        if n.endswith(".json") and not n.startswith("_"):
            with open(os.path.join(log, n)) as fh:
                for line in fh:
                    a = json.loads(line)
                    if "protocol" in a:
                        protocol = a["protocol"]
    protocol = _protocol_with_features(
        protocol, set(), {"clustering", "domainMetadata"}
    ) or protocol
    actions = [
        {"commitInfo": {"timestamp": 1, "operation": "CLUSTER BY"}},
        {"protocol": protocol},
        {"domainMetadata": {"domain": "delta.clustering",
                            "configuration": json.dumps(
                                {"clusteringColumns": [["c"]]}),
                            "removed": False}},
    ]
    with open(os.path.join(log, f"{head + 1:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    # pre-fix this raised "zorder_by columns not in schema: ['c']"
    v = delta_optimize(spark, t, target_file_mb=0.01)
    assert v == head + 2
    d = DeltaLogTable(spark, t)
    assert d.read().count() == 12000
    files_hit = len(d.read(filters=[("cluster_key", "=", 3)]).inputFiles())
    assert files_hit < len(d.snapshot().files)
