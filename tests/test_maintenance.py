"""Small-file compaction (io/maintenance.py): file-count collapse, row
preservation, atomic swap, clustering locality."""

from __future__ import annotations

from pyspark.sql import functions as F

from dc43_spark.io.maintenance import _parquet_files, compact_dataset


def test_compaction_collapses_small_files(spark, tmp_path):
    path = str(tmp_path / "ds")
    # 20 tiny append files (a foreachBatch-style accretion)
    for batch in range(20):
        spark.range(batch * 100, batch * 100 + 100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        ).coalesce(1).write.mode("append").parquet(path)
    n_before = len(_parquet_files(path))
    assert n_before >= 20
    before_rows = spark.read.parquet(path).count()

    res = compact_dataset(spark, path, target_file_mb=128)
    assert res.files_before == n_before
    assert res.files_after < n_before and res.files_after >= 1
    assert res.rows == before_rows == 2000
    after = spark.read.parquet(path)
    assert after.count() == 2000
    assert sorted(r.k for r in after.collect()) == list(range(2000))


def test_compaction_clustering_narrows_file_ranges(spark, tmp_path):
    path = str(tmp_path / "clustered")
    for batch in range(8):
        spark.range(20_000).select(
            ((F.col("id") * 7919 + batch) % 1000).alias("k"),
            # incompressible payload so the size target forces >1 file
            F.md5((F.col("id") * 31 + batch).cast("string")).alias("payload"),
        ).coalesce(1).write.mode("append").parquet(path)

    compact_dataset(spark, path, target_file_mb=1, cluster_by=["k"])
    files = _parquet_files(path)
    assert len(files) >= 2  # size target forced a multi-file layout
    # each clustered file covers a NARROW, mostly disjoint k-range
    spans = []
    for f in files:
        pdf = spark.read.parquet(f).agg(
            F.min("k").alias("lo"), F.max("k").alias("hi")
        ).first()
        spans.append((pdf.lo, pdf.hi))
    spans.sort()
    full = max(hi for _, hi in spans) - min(lo for lo, _ in spans)
    assert all(hi - lo < full for lo, hi in spans)
    # ranges are non-overlapping except at boundaries (repartitionByRange)
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 <= l2


def test_compaction_noop_below_min_files(spark, tmp_path):
    path = str(tmp_path / "small")
    spark.range(10).coalesce(1).write.parquet(path)
    res = compact_dataset(spark, path, min_files=2)
    assert res.files_before == res.files_after == 1 and res.rows == -1


def test_index_compaction_preserves_probe_results(spark, sf_dir, tmp_path):
    """Appends accrete files into both persisted indexes; compaction
    collapses them (hive layout preserved for the embedding index) and
    probes return EXACTLY the same hits before and after."""
    import numpy as np

    from dc43_spark.functions import dedup_index as di
    from dc43_spark.functions import embedding_index as ei
    from dc43_spark.io.maintenance import (
        compact_embedding_index,
        compact_minhash_index,
    )

    # --- embedding index
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter("vec_id < 200")
        .select("vec_id", "embedding")
    )
    eidx = str(tmp_path / "ei")
    ei.embedding_index_write(emb, eidx)
    for wave in range(3):
        ei.embedding_index_append(
            spark, eidx,
            emb.select((F.col("vec_id") + 10_000 * (wave + 1)).alias("vec_id"),
                       "embedding"),
        )
    rows = emb.orderBy("vec_id").limit(2).collect()
    batch = spark.createDataFrame(
        [(90_001, [float(x) for x in rows[0].embedding]),
         (90_002, [float(x) for x in rows[1].embedding])],
        "vec_id long, embedding array<double>",
    )
    before = sorted(map(tuple, ei.embedding_index_probe(spark, eidx, batch).collect()))
    res = compact_embedding_index(spark, eidx)
    assert res.files_after < res.files_before
    # hive partition dirs survive (pruning layout intact)
    assert any("bucket=" in d for d in __import__("os").listdir(f"{eidx}/vectors"))
    after = sorted(map(tuple, ei.embedding_index_probe(spark, eidx, batch).collect()))
    assert after == before and before  # non-trivial agreement

    # --- minhash index
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 80")
        .select("doc_id", "text")
    )
    nidx = str(tmp_path / "ndx")
    di.minhash_index_write(docs, nidx)
    for wave in range(3):
        di.minhash_index_append(
            spark, nidx,
            docs.select((F.col("doc_id") + 10_000 * (wave + 1)).alias("doc_id"),
                        F.concat_ws(" ", "text", F.lit(f"w{wave}")).alias("text")),
        )
    probe = spark.createDataFrame(
        [(70_001, docs.orderBy("doc_id").limit(1).collect()[0].text)],
        "doc_id long, text string",
    )
    nb = sorted(map(tuple, di.minhash_index_probe(spark, nidx, probe).collect()))
    nres = compact_minhash_index(spark, nidx)
    assert nres.files_after < nres.files_before
    na = sorted(map(tuple, di.minhash_index_probe(spark, nidx, probe).collect()))
    assert na == nb and nb
