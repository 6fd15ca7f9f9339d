"""dc43-spark lakehouse tour: the snaplog table format end-to-end —
transactional writes, time travel, file-granular MERGE, the exactly-once
streaming sink, and the draft-review loop that turns a blocked write into
an approved contract.

Run: python examples/lakehouse.py  (self-contained; writes to a temp dir)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dc43_spark.io.snaplog import SnaplogTable

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("dc43-lakehouse")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="dc43_lakehouse_")

    # 1. A transactional table on a plain filesystem: append + overwrite
    #    commit through a JSON manifest log; readers never see partials.
    table = SnaplogTable(spark, os.path.join(work, "orders"))
    table.write(
        spark.range(0, 1000).select(
            F.col("id").alias("k"), F.lit("v1").alias("s")
        ).repartitionByRange(4, "k").sortWithinPartitions("k"),
        mode="overwrite",
    )
    v1 = table.version()
    table.write(
        spark.createDataFrame([(2000, "v2")], "k long, s string"), mode="append"
    )
    print("versions:", [c.version for c in table.history()])

    # 2. Time travel: read any committed snapshot by version or timestamp.
    print("rows@v1:", table.read(version_as_of=v1).count(),
          " rows@head:", table.read().count())

    # 3. File-granular MERGE: footer-stats pruning + an exact semi-join pick
    #    the rewrite set; untouched files carry over by reference.
    stats = table.merge(
        spark.createDataFrame([(k, "merged") for k in range(10, 20)], "k long, s string"),
        ["k"],
    )
    print(
        f"merge rewrote {stats.files_rewritten}/{stats.files_total} files "
        f"(candidates after stats pruning: {stats.candidates_after_stats})"
    )

    # 4. Exactly-once streaming sink: each micro-batch commits its data AND
    #    its idempotence marker in one manifest; replays dedupe.
    from dc43_spark.streaming.sink import snaplog_sink

    src = os.path.join(work, "stream_src")
    spark.createDataFrame([(9000 + i, "stream") for i in range(5)],
                          "k long, s string").coalesce(1).write.mode("append").parquet(src)
    events_table = os.path.join(work, "events")
    ckpt = os.path.join(work, "ckpt")
    for _ in range(2):  # second run is a full replay: nothing lands twice
        q = snaplog_sink(
            spark.readStream.schema("k long, s string").parquet(src),
            events_table, ckpt, trigger_once=True,
        )
        q.awaitTermination()
    print("stream rows (after replay):",
          SnaplogTable(spark, events_table).read().count())

    # 5. Draft review loop: a blocked governed write drafts a relaxed
    #    contract; approving it is what makes it readable.
    from dc43_spark.contracts import Contract, SchemaObject, SchemaProperty
    from dc43_spark.governance import GovernanceService
    from dc43_spark.governance.workflow import latest_active, list_drafts, review_draft

    svc = GovernanceService(draft_on_block=True)
    svc.contract_store.put(
        Contract(
            id="lake.orders", version="1.0.0",
            schema_objects=[SchemaObject(
                name="orders",
                properties=[SchemaProperty("k", "bigint", required=True)],
            )],
        )
    )
    dirty = spark.createDataFrame([(1,), (None,)], "k long")
    outcome = svc.evaluate_dataset(
        dirty, svc.resolve_contract("lake.orders"),
        dataset_id=f"path:{work}/orders", dataset_version="2.0.0",
        operation="write",
    )
    print("write verdict:", outcome.validation.status,
          "drafted:", outcome.draft.contract.version)
    print("pending drafts:", list_drafts(svc.contract_store))
    review_draft(
        svc.contract_store, svc.store,
        "lake.orders", outcome.draft.contract.version,
        decision="approve", reviewer="you", supersede=True,
    )
    print("active after review:", latest_active(svc.contract_store, "lake.orders").version)

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
