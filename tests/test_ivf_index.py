from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dc43_spark.functions.similarity import (
    ivf_query_index,
    ivf_topk,
    ivf_write_index,
)
from dc43_spark.io.bucketing import plan_string

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def index_path(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    ivf_write_index(emb, path, n_centroids=16, seed=42)
    return path


def test_index_layout(spark, index_path):
    lists = spark.read.parquet(f"{index_path}/lists")
    assert lists.count() == 500  # every corpus vector in exactly one list
    assert lists.select("centroid_id").distinct().count() <= 16
    cents = spark.read.parquet(f"{index_path}/centroids")
    assert cents.count() == 16


def test_query_matches_inmemory_ivf(spark, emb, index_path):
    queries = emb.filter(F.col("vec_id") < 10)
    from_index = {
        (r.q_id, r.rank): (r.n_id, r.cosine)
        for r in ivf_query_index(spark, index_path, queries, k=5, nprobe=4).collect()
    }
    in_memory = {
        (r.q_id, r.rank): (r.n_id, r.cosine)
        for r in ivf_topk(queries, emb, k=5, n_centroids=16, nprobe=4, seed=42).collect()
    }
    assert from_index == in_memory


def test_partition_pruning_reads_only_probed_lists(spark, emb, index_path):
    """The point of the layout: a 1-query probe reads nprobe directories,
    not the whole index — visible in both PartitionFilters and the actual
    file list."""
    one_query = emb.filter(F.col("vec_id") == 0)
    out = ivf_query_index(spark, index_path, one_query, k=3, nprobe=2)
    plan = plan_string(out, "formatted")
    assert "PartitionFilters: [centroid_id" in plan

    # replicate the probe computation and count the files the pruned scan
    # actually touches vs the full index
    import numpy as np

    from dc43_spark.functions.similarity import _ivf_assign

    cents = np.stack(
        spark.read.parquet(f"{index_path}/centroids")
        .orderBy("centroid_id")
        .toPandas()["centroid"]
        .to_numpy()
    )
    probes = {
        r.centroid_id
        for r in _ivf_assign(
            one_query, cents, id_col="vec_id", vec_col="embedding", nprobe=2
        )
        .select("centroid_id")
        .collect()
    }
    assert len(probes) == 2
    full = spark.read.parquet(f"{index_path}/lists")
    pruned = full.filter(F.col("centroid_id").isin(sorted(probes)))
    # inputFiles() reports the PRE-pruning file index; count the files a
    # real execution touches instead
    files_read = pruned.select(F.input_file_name()).distinct().count()
    total_lists = full.select("centroid_id").distinct().count()
    assert 0 < files_read <= 2 < total_lists


def test_ivf_index_append_extends_index(spark, emb, tmp_path):
    """FAISS-add semantics (r6): new vectors assign to the FROZEN
    centroids and append to their list partitions; a full-probe query
    then returns them exactly as a rebuild with the same centroids
    would, and the existing lists are never rewritten."""
    import numpy as np

    from dc43_spark.functions.similarity import ivf_index_append

    path = str(tmp_path / "ivf_app")
    base = emb.filter("vec_id < 400")
    ivf_write_index(base, path, n_centroids=8, seed=42)
    n_before = spark.read.parquet(f"{path}/lists").count()

    batch = emb.filter("vec_id >= 400").select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    ivf_index_append(spark, path, batch)
    lists = spark.read.parquet(f"{path}/lists")
    n_added = batch.count()
    assert lists.count() == n_before + n_added
    # appended ids landed in existing centroid partitions only
    assert lists.select("centroid_id").distinct().count() <= 8

    # a query that IS an appended vector finds itself... excluded, so
    # probe with an exact copy under another id: full-probe top-1 == copy
    some = batch.limit(1).collect()[0]
    queries = spark.createDataFrame(
        [(99_999, [float(x) for x in some.embedding])],
        "vec_id long, embedding array<double>",
    )
    top = ivf_query_index(spark, path, queries, k=1, nprobe=8).collect()
    assert top[0].n_id == some.vec_id and top[0].cosine == 1.0

    # dim guard
    dim = len(some.embedding)
    bad = spark.createDataFrame(
        [(1, [0.0] * (dim + 1))], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dim"):
        ivf_index_append(spark, path, bad)
    # whole-batch guard (r6 advice): a LATER row with a wrong dim — or a
    # NULL vector — must raise up front, not just row 0
    mixed = spark.createDataFrame(
        [(1, [0.0] * dim), (2, [0.0] * (dim + 1))],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="dim"):
        ivf_index_append(spark, path, mixed)
    nulled = spark.createDataFrame(
        [(1, [0.0] * dim), (2, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="NULL"):
        ivf_index_append(spark, path, nulled)
    # appending the quantized flavour to a code index round-trips too
    from dc43_spark.functions.similarity import (
        ivf_query_index_quantized,
        ivf_write_index_quantized,
    )

    qpath = str(tmp_path / "ivf8_app")
    ivf_write_index_quantized(base, qpath, n_centroids=8, seed=42)
    ivf_index_append(spark, qpath, batch, quantized=True)
    qlists = spark.read.parquet(f"{qpath}/lists")
    assert qlists.count() == n_before + n_added
    assert "code" in qlists.columns
    full = emb.select("vec_id", "embedding").union(batch)
    qtop = ivf_query_index_quantized(
        spark, qpath, queries, full, k=1, nprobe=8
    ).collect()
    assert qtop[0].n_id == some.vec_id
