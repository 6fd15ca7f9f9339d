"""Measure ANN recall@k vs the exact oracle at $SPARK_GRAFT_SF_DIR.

The approximate similarity tiers (LSH buckets, IVF partial probe,
int8-quantized IVF index) are oracle-gated only at their EXACT settings
(full probe == brute force); this harness measures what the approximate
settings actually give up — recall@k against ``cosine_topk`` — so the
speed/recall trade-off is a recorded number (SCALE.md), not an
adjective.

Usage: python tools/ann_recall.py [--k 10] [--queries 100]
Prints one line per configuration and a JSON summary last.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def recall(truth: dict, approx: dict, k: int) -> float:
    """Mean |approx∩truth| / |truth| over queries with non-empty truth."""
    scores = []
    for qid, want in truth.items():
        got = approx.get(qid, set())
        if want:
            scores.append(len(got & want) / len(want))
    return sum(scores) / len(scores) if scores else 0.0


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=100)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dc43-ann-recall")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dc43_spark.functions import similarity as sim

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = corpus.orderBy("vec_id").limit(args.queries).cache()
    queries.count()

    def topk_sets(df) -> dict:
        out: dict = {}
        for r in df.collect():
            out.setdefault(r.q_id, set()).add(r.n_id)
        return out

    truth = topk_sets(
        sim.cosine_topk(queries, corpus, k=args.k)
    )
    n_corpus = corpus.count()
    print(f"# corpus={n_corpus} queries={len(truth)} k={args.k}")

    results = {}
    for n_planes, probe in ((6, 0), (6, 1), (8, 1), (10, 1)):
        approx = topk_sets(
            sim.lsh_bucketed_topk(
                queries, corpus, k=args.k, n_planes=n_planes, multi_probe=probe
            )
        )
        r = recall(truth, approx, args.k)
        name = f"lsh_planes{n_planes}_probe{probe}"
        results[name] = round(r, 4)
        print(f"{name}: recall@{args.k} = {r:.3f}")

    for n_centroids, nprobe in ((16, 2), (16, 4), (16, 8), (16, 16)):
        approx = topk_sets(
            sim.ivf_topk(
                queries, corpus, k=args.k,
                n_centroids=n_centroids, nprobe=nprobe,
            )
        )
        r = recall(truth, approx, args.k)
        name = f"ivf_c{n_centroids}_probe{nprobe}"
        results[name] = round(r, 4)
        print(f"{name}: recall@{args.k} = {r:.3f}")

    # int8-quantized persisted index (the scale path the gate exercises)
    import tempfile
    import shutil

    idx = tempfile.mkdtemp(prefix="dc43_recall_ivf8_")
    try:
        sim.ivf_write_index_quantized(corpus, idx, n_centroids=16)
        for nprobe in (4, 16):
            approx = topk_sets(
                sim.ivf_query_index_quantized(
                    spark, idx, queries, corpus, k=args.k, nprobe=nprobe
                )
            )
            r = recall(truth, approx, args.k)
            name = f"ivf_int8_c16_probe{nprobe}"
            results[name] = round(r, 4)
            print(f"{name}: recall@{args.k} = {r:.3f}")
    finally:
        shutil.rmtree(idx, ignore_errors=True)

    # product quantization: pure-ADC ranking and the rescore serving
    # recipe, at two code resolutions (coarse 8x4bitsish vs fine 16xfull)
    for m, n_codes in ((8, 256), (16, 256)):
        books = sim.train_pq(corpus, m=m, n_codes=n_codes)
        codes = sim.pq_encode(corpus, books).cache()
        codes.count()
        approx = topk_sets(sim.pq_topk(queries, codes, books, k=args.k))
        r = recall(truth, approx, args.k)
        name = f"pq_m{m}_k{n_codes}_adc"
        results[name] = round(r, 4)
        print(f"{name}: recall@{args.k} = {r:.3f}")
        approx = topk_sets(
            sim.pq_topk(
                queries, codes, books, k=args.k, corpus=corpus, rescore_factor=8
            )
        )
        r = recall(truth, approx, args.k)
        name = f"pq_m{m}_k{n_codes}_rescore8"
        results[name] = round(r, 4)
        print(f"{name}: recall@{args.k} = {r:.3f}")
        codes.unpersist()

    # IVF-PQ: list pruning x byte compression (both approximations stack)
    for nprobe in (2, 4, 8, 16):
        approx = topk_sets(
            sim.ivfpq_topk(
                queries, corpus, k=args.k, n_centroids=16, nprobe=nprobe,
                rescore_factor=8,
            )
        )
        r = recall(truth, approx, args.k)
        name = f"ivfpq_c16_probe{nprobe}_rescore8"
        results[name] = round(r, 4)
        print(f"{name}: recall@{args.k} = {r:.3f}")

    print(json.dumps({"k": args.k, "n_corpus": n_corpus, "recall": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
