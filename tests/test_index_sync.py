"""CDC-driven maintenance of the persisted MinHash index: the index
mirrors a snaplog corpus table by consuming its change feed — O(docs
changed) per sync, tombstoned deletes, idempotent replays.

Mirror oracle: after every sync, the set of PROBEABLE index docs (self-
probe at threshold 1.0) must equal the table head's doc ids."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dc43_spark.functions.dedup_index import (
    minhash_index_probe,
    minhash_index_tombstones,
    minhash_index_vacuum,
)
from dc43_spark.functions.index_sync import sync_minhash_index
from dc43_spark.io.snaplog import SnaplogTable

PARAMS = dict(num_hashes=8, rows_per_band=2, shingle_size=2, band_files=2)


def _doc(i, text):
    return (f"d{i}", text)


def _corpus(spark, tmp_path):
    t = SnaplogTable(spark, str(tmp_path / "corpus"), change_feed=True)
    return t


def _docs_df(spark, docs):
    return spark.createDataFrame(docs, "doc_id string, text string")


def _probeable_ids(spark, idx, table):
    """Self-probe the table head against the index: ids whose EXACT text
    match (jaccard 1.0) is findable. With a mirrored index that is
    exactly the head's id set (every doc matches itself)."""
    head = table.read()
    hits = minhash_index_probe(spark, idx, head, threshold=1.0)
    return {r.dup_of for r in hits.filter(F.col("doc_id") == F.col("dup_of")).collect()}


def _table_ids(table):
    return {r.doc_id for r in table.read().select("doc_id").collect()}


def test_sync_mirrors_table_through_inserts_and_deletes(spark, tmp_path):
    t = _corpus(spark, tmp_path)
    idx = str(tmp_path / "idx")
    t.write(
        _docs_df(
            spark,
            [
                _doc(1, "the quick brown fox jumps over the lazy dog"),
                _doc(2, "pack my box with five dozen liquor jugs"),
            ],
        )
    )
    st = sync_minhash_index(spark, idx, t, **PARAMS)
    assert (st.strategy, st.docs_added) == ("initial", 2)
    assert _probeable_ids(spark, idx, t) == _table_ids(t)

    # append-only growth
    t.write(_docs_df(spark, [_doc(3, "sphinx of black quartz judge my vow")]))
    st = sync_minhash_index(spark, idx, t)
    assert (st.strategy, st.docs_added, st.docs_removed) == ("incremental", 1, 0)
    assert _probeable_ids(spark, idx, t) == _table_ids(t)

    # delete -> tombstone: the doc stops matching WITHOUT an index rewrite
    t.delete([("doc_id", "=", "d2")])
    st = sync_minhash_index(spark, idx, t)
    assert st.docs_removed == 1
    assert _probeable_ids(spark, idx, t) == _table_ids(t)
    probe_all = minhash_index_probe(
        spark,
        idx,
        _docs_df(spark, [_doc(2, "pack my box with five dozen liquor jugs")]),
        threshold=1.0,
    )
    assert probe_all.count() == 0  # tombstoned doc is invisible to probes

    # vacuum applies tombstones physically and clears them
    removed = minhash_index_vacuum(spark, idx)
    assert removed == 1
    assert minhash_index_tombstones(spark, idx) is None
    sh = spark.read.parquet(f"{idx}/shingles")
    assert {r.doc_id for r in sh.select("doc_id").collect()} == {"d1", "d3"}
    assert _probeable_ids(spark, idx, t) == _table_ids(t)

    # no-op sync
    st = sync_minhash_index(spark, idx, t)
    assert st.strategy == "no-op"


def test_resurrection_and_replay_idempotence(spark, tmp_path):
    t = _corpus(spark, tmp_path)
    idx = str(tmp_path / "idx")
    d2_text = "pack my box with five dozen liquor jugs"
    t.write(_docs_df(spark, [_doc(1, "quick brown fox"), _doc(2, d2_text)]))
    sync_minhash_index(spark, idx, t, **PARAMS)
    t.delete([("doc_id", "=", "d2")])
    sync_minhash_index(spark, idx, t)
    assert _probeable_ids(spark, idx, t) == {"d1"}

    # re-insert the same (immutable) doc: tombstone drops, no re-index
    t.write(_docs_df(spark, [_doc(2, d2_text)]))
    st = sync_minhash_index(spark, idx, t)
    assert st.docs_resurrected == 1
    assert st.docs_added == 0  # the bands/shingles were still there
    assert _probeable_ids(spark, idx, t) == {"d1", "d2"}
    sh = spark.read.parquet(f"{idx}/shingles")
    assert sh.filter(F.col("doc_id") == "d2").count() == 1  # no duplicates

    # crash before offset write == stale offset; replay must converge
    off = json.load(open(f"{idx}/_sync_offset.json"))
    t.write(_docs_df(spark, [_doc(4, "new unique document four")]))
    sync_minhash_index(spark, idx, t)
    json.dump(off, open(f"{idx}/_sync_offset.json", "w"))  # roll offset back
    st = sync_minhash_index(spark, idx, t)  # replays the d4 window
    assert st.docs_added == 0  # idempotent: d4 already indexed
    sh2 = spark.read.parquet(f"{idx}/shingles")  # re-list: new files visible
    assert sh2.filter(F.col("doc_id") == "d4").count() == 1


def test_updates_and_foreign_sources_are_refused(spark, tmp_path):
    t = _corpus(spark, tmp_path)
    idx = str(tmp_path / "idx")
    t.write(_docs_df(spark, [_doc(1, "hello world document")]))
    sync_minhash_index(spark, idx, t, **PARAMS)
    t.update([("doc_id", "=", "d1")], set={"text": F.lit("mutated text")})
    with pytest.raises(ValueError, match="immutable"):
        sync_minhash_index(spark, idx, t)
    # an index pointed at a different table refuses
    other = SnaplogTable(spark, str(tmp_path / "other"), change_feed=True)
    other.write(_docs_df(spark, [_doc(9, "unrelated")]))
    with pytest.raises(ValueError, match="tracks"):
        sync_minhash_index(spark, idx, other)


def test_embedding_index_sync_mirrors_table(spark, tmp_path):
    """The embedding twin: probeable vector set follows the table through
    insert / delete / vacuum / resurrection."""
    from dc43_spark.functions.embedding_index import (
        embedding_index_probe,
        embedding_index_tombstones,
        embedding_index_vacuum,
    )
    from dc43_spark.functions.index_sync import sync_embedding_index

    t = SnaplogTable(spark, str(tmp_path / "vecs"), change_feed=True)
    idx = str(tmp_path / "vidx")

    def vdf(rows):
        return spark.createDataFrame(rows, "vec_id string, embedding array<double>")

    v = {
        "v1": [1.0, 0.0, 0.0, 0.0],
        "v2": [0.0, 1.0, 0.0, 0.0],
        "v3": [0.0, 0.0, 1.0, 0.0],
    }
    t.write(vdf([("v1", v["v1"]), ("v2", v["v2"])]))
    st = sync_embedding_index(spark, idx, t, n_planes=4, seed=7)
    assert (st.strategy, st.docs_added) == ("initial", 2)

    def probeable():
        hits = embedding_index_probe(spark, idx, t.read(), threshold=0.999)
        return {
            r.dup_of for r in hits.filter(F.col("vec_id") == F.col("dup_of")).collect()
        }

    assert probeable() == {"v1", "v2"}

    t.write(vdf([("v3", v["v3"])]))
    st = sync_embedding_index(spark, idx, t)
    assert st.docs_added == 1
    assert probeable() == {"v1", "v2", "v3"}

    t.delete([("vec_id", "=", "v2")])
    st = sync_embedding_index(spark, idx, t)
    assert st.docs_removed == 1
    assert probeable() == {"v1", "v3"}

    assert embedding_index_vacuum(spark, idx) == 1
    assert embedding_index_tombstones(spark, idx) is None
    assert probeable() == {"v1", "v3"}

    # resurrection of the immutable vector
    t.delete([("vec_id", "=", "v3")])
    sync_embedding_index(spark, idx, t)
    t.write(vdf([("v3", v["v3"])]))
    st = sync_embedding_index(spark, idx, t)
    assert st.docs_resurrected == 1 and st.docs_added == 0
    assert probeable() == {"v1", "v3"}
