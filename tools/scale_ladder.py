"""Empirical scale ladder — measure the three 100 TB claims instead of
arguing them from plan shape (r6 verdict item 3).

Generates 1x / 10x / 30x document corpora in a temp dir (variants of the
sf0.1 corpus; /root/testdata is never written) and measures:

1. LSH index probe cost vs corpus size   -> expected FLAT
   (probe shuffles only batch-derived rows; index relations stream
   map-only into broadcast joins)
2. connected-components rounds vs chain length -> expected LOG
   (alternating large-star/small-star halves chain diameter per round)
3. capstone pipeline wall-time vs corpus size  -> expected LINEAR
   (every stage is one bounded-shuffle pass over the corpus)

Variant generation: replica ``r`` deterministically REORDERS each
document's tokens (sorted by ``xxhash64(token, r)``; replica 0 keeps the
original text). The token MULTISET is untouched, so every corpus-filter
signal (token count, stopword hits, language markers, distinct count,
punctuation ratio) is preserved and each replica keeps ~the same document
set as the base corpus — but the k-token shingles differ across replicas,
so replicas are NOT near-dups of each other and the near-dup pair count
scales linearly with the replica count. (A plain suffix would leave
cross-replica Jaccard ~1 and make the pair set quadratic; a per-token
hash suffix would zero the stopword ratio and drop EVERY scaled document
at the filter — both destroy the very linearity being measured.)

Usage: python tools/scale_ladder.py [--scales 1,10,30] [--reps 2]
Writes the measured table to stdout (markdown) and a JSON line at the end.
Timings on this host are noisy (SCALE.md bench caveat): reps take the MIN.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def scaled_corpus(spark, base_df, k: int):
    """k deterministic variants of every document: replica r reorders the
    tokens by xxhash64(token, r) — filter signals intact, cross-replica
    shingle overlap destroyed; replica 0 is the original text."""
    from pyspark.sql import functions as F

    if k == 1:
        return base_df
    reps = spark.range(k).select(F.col("id").alias("_rep"))
    keyed = F.transform(
        F.split(F.trim(F.col("text")), r"\s+"),
        lambda t: F.struct(F.xxhash64(t, F.col("_rep")).alias("k"), t.alias("t")),
    )
    reordered = F.concat_ws(
        " ", F.transform(F.array_sort(keyed), lambda s: s["t"])
    )
    return (
        base_df.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") * k + F.col("_rep")).alias("doc_id"),
            F.when(F.col("_rep") == 0, F.col("text"))
            .otherwise(reordered)
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )


def time_min(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,30")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--chains", default="64,512,4096,32768")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    chains = [int(c) for c in args.chains.split(",")]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dc43-scale-ladder")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dc43_spark.functions import dedup as dd
    from dc43_spark.functions import dedup_index as di
    from dc43_spark import showcase_curation

    base = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    n_base = base.count()
    work = tempfile.mkdtemp(prefix="dc43-ladder-")
    result: dict = {"base_docs": n_base, "scales": scales, "work": work}
    print(f"# scale ladder: base={n_base} docs, scales={scales}, work={work}\n")

    try:
        # materialise each scaled corpus once (generation cost excluded
        # from every measurement below)
        dirs = {}
        for k in scales:
            d = os.path.join(work, f"x{k}")
            scaled_corpus(spark, base, k).write.mode("overwrite").parquet(
                os.path.join(d, "documents.parquet")
            )
            dirs[k] = d

        # ---- curve 1: LSH index probe cost vs corpus size (expect FLAT)
        batch = spark.createDataFrame(
            [(int(r.doc_id), r.text) for r in base.limit(50).collect()],
            "doc_id long, text string",
        ).cache()
        batch.count()
        # warm-up: the session's FIRST probe/capstone pays whole-stage
        # codegen JIT (~2 s) that would masquerade as an x1 cost
        warm_idx = os.path.join(work, "ndx_warm")
        di.minhash_index_write(base.select("doc_id", "text").limit(500), warm_idx)
        di.minhash_index_probe(spark, warm_idx, batch).count()
        showcase_curation.q_curation_pipeline_documents(spark, dirs[scales[0]]).count()
        probe_rows = []
        for k in scales:
            idx = os.path.join(work, f"ndx_x{k}")
            corpus_k = spark.read.parquet(
                os.path.join(dirs[k], "documents.parquet")
            ).select("doc_id", "text")
            di.minhash_index_write(corpus_k, idx)
            t = time_min(
                lambda: di.minhash_index_probe(spark, idx, batch).count(),
                args.reps,
            )
            probe_rows.append({"scale": k, "docs": n_base * k, "probe_s": round(t, 3)})
            print(f"probe  x{k:<3} ({n_base * k:>7} docs indexed): {t:.3f} s")
        result["probe_vs_index_size"] = probe_rows

        # ---- curve 2: CC rounds vs chain length (expect LOG)
        cc_rows = []
        for length in chains:
            edges = spark.range(length).select(
                F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
            )
            stats: dict = {}
            t0 = time.monotonic()
            out = dd.connected_components(
                edges, driver_threshold=0, max_iterations=40, stats=stats
            )
            n_roots = out.select("root").distinct().count()
            dt = time.monotonic() - t0
            assert n_roots == 1, f"chain of {length} must collapse to 1 root"
            cc_rows.append(
                {"chain": length, "rounds": stats["rounds"], "wall_s": round(dt, 2)}
            )
            print(
                f"cc     chain={length:<6} rounds={stats['rounds']:<3} "
                f"({dt:.1f} s, converged={stats['converged']})"
            )
        result["cc_rounds_vs_chain"] = cc_rows

        # ---- curve 3: capstone wall-time vs corpus size (expect LINEAR)
        cap_rows = []
        for k in scales:
            counts: list[int] = []
            t = time_min(
                lambda: counts.append(
                    showcase_curation.q_curation_pipeline_documents(
                        spark, dirs[k]
                    ).count()
                ),
                args.reps,
            )
            cap_rows.append(
                {
                    "scale": k,
                    "docs": n_base * k,
                    "out_rows": counts[-1],
                    "capstone_s": round(t, 2),
                }
            )
            print(
                f"capstone x{k:<3} ({n_base * k:>7} docs -> "
                f"{counts[-1]} out): {t:.2f} s"
            )
            # the scaled corpora must actually FLOW: each replica keeps
            # ~the base document set (filter signals are order-invariant)
            assert counts[-1] >= 0.5 * k * cap_rows[0]["out_rows"], (
                "scaled corpus starved the pipeline — variant generation "
                "is breaking the corpus filter"
            )
        result["capstone_vs_corpus"] = cap_rows

        # quick verdicts (loose factors — host noise, see SCALE.md caveat)
        p = [r["probe_s"] for r in probe_rows]
        c = [r["capstone_s"] for r in cap_rows]
        result["probe_flat"] = max(p) <= max(3.0 * min(p), min(p) + 2.0)
        if len(scales) >= 2:
            span = scales[-1] / scales[0]
            result["capstone_subquadratic"] = c[-1] <= c[0] * span * 3
        import math

        result["cc_log"] = all(
            r["rounds"] <= 2 * math.log2(r["chain"]) + 4 for r in cc_rows
        )
        print("\n" + json.dumps(result))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
