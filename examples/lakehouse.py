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

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Python data source classes are cloudpickled BY REFERENCE to executor
# workers, which spawn with PYTHONPATH (not the driver's sys.path)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


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

    # 3b. Ordered MULTI-clause MERGE (delta-spark's chained builder):
    #     clauses of a kind evaluate first-match-wins in list order —
    #     here hot rows take the source value, everything else matched
    #     falls to the unconditional second clause.
    table.merge(
        spark.createDataFrame(
            [(k, "hot" if k < 13 else "cold") for k in range(10, 20)],
            "k long, s string",
        ),
        ["k"],
        matched_clauses=[
            {"action": "update", "condition": "s.s = 'hot'",
             "set": {"s": "concat('HOT:', s.s)"}},
            {"action": "update", "set": {"s": "t.s"}},
        ],
        not_matched_clauses=[
            {"action": "insert", "condition": "s.k % 2 = 0"},
        ],
    )
    hot = table.read(filters=[("k", ">=", 10), ("k", "<", 13)])
    print("multi-clause merge hot rows:",
          sorted((r.k, r.s) for r in hot.filter("k < 13").collect()))

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

    # 5. Data skipping: pyarrow-DNF filters prune the file list against
    #    footer min/max stats BEFORE the scan; the residual Spark filter
    #    keeps results row-exact.
    lookup = table.read(filters=[("k", "=", 500)])
    print(
        f"point lookup opened {len(lookup.inputFiles())}/"
        f"{len(table.snapshot().files)} files ->",
        [(r.k, r.s) for r in lookup.collect()],
    )

    # 5b. Merge-on-read delete: a deletion vector lands instead of a file
    #     rewrite (O(matching rows)); reads subtract it until materialize
    #     folds it back into only the affected files.
    st = table.delete([("k", ">=", 900), ("k", "<", 910)], strategy="merge_on_read")
    print(
        f"MOR delete: {st.rows_before} rows vectored, "
        f"{st.files_rewritten} files rewritten; head rows:", table.read().count(),
    )
    print("materialized files:", table.materialize_deletes(),
          " head rows:", table.read().count())

    # 6. Change data feed + incremental materialized view: downstream
    #    reprocesses only changed rows — never the table.
    from dc43_spark.io.ivm import refresh_sum_view, sum_view_select

    cdc_table = SnaplogTable(spark, os.path.join(work, "sales"), change_feed=True)
    cdc_table.write(
        spark.createDataFrame(
            [("eu", 10), ("eu", 5), ("us", 7)], "region string, amount long"
        )
    )
    view = SnaplogTable(spark, os.path.join(work, "sales_by_region"))
    refresh_sum_view(view, cdc_table, keys=["region"], sums={"revenue": "amount"})
    cdc_table.delete([("region", "=", "us")])
    cdc_table.write(spark.createDataFrame([("ap", 3)], "region string, amount long"))
    st = refresh_sum_view(view, cdc_table, keys=["region"], sums={"revenue": "amount"})
    print(
        f"ivm refresh ({st.strategy}, src v{st.offset_before}->v{st.offset_after}):",
        sorted(
            (r.region, r.revenue, r.n_rows)
            for r in sum_view_select(view, ["revenue"]).collect()
        ),
    )

    # 7. The table as a registered Spark data source: batch reads with
    #    pushdown, and the commit log as an exactly-once CDC stream.
    from dc43_spark.io.snaplog_source import SnaplogDataSource

    spark.dataSource.register(SnaplogDataSource)
    feed = (
        spark.readStream.format("snaplog")
        .option("readChangeFeed", "true")
        .load(cdc_table.path)
        .writeStream.format("memory")
        .queryName("sales_cdc")
        .trigger(availableNow=True)
        .start()
    )
    feed.awaitTermination(60)
    print(
        "cdc stream:",
        sorted(
            (r._commit_version, r._change_type, r.region)
            for r in spark.sql("select * from sales_cdc").collect()
        ),
    )

    # 8. Draft review loop: a blocked governed write drafts a relaxed
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

    # 8. Tags + write-audit-publish: stage risky work on a zero-copy
    #    branch, audit it with the contract engine, publish atomically.
    table.create_tag("pre_wap")
    branch = table.branch_out(os.path.join(work, "staging"))
    branch.merge(
        spark.createDataFrame([(5, "audited")], "k long, s string"), ["k"]
    )
    from dc43_spark.governance.wap import governed_publish

    svc.contract_store.put(
        Contract(
            id="lake.orders_wap", version="1.0.0",
            schema_objects=[SchemaObject(
                name="orders",
                properties=[
                    SchemaProperty("k", "bigint", required=True),
                    SchemaProperty("s", "string", required=True),
                ],
            )],
        )
    )
    res = governed_publish(svc, table, branch, "lake.orders_wap")
    print("governed publish:", res.verdict, "-> landed at v", res.source_version)
    print("rollback path stays open: read(tag='pre_wap') rows =",
          table.read(tag="pre_wap").count())

    # 9. Generated columns + the OPTIMIZE surface: writes compute derived
    #    columns and keep the small-file problem down on their own.
    gen = SnaplogTable(
        spark, os.path.join(work, "gen"),
        auto_compact=True, auto_compact_min_files=4, optimize_write=True,
    )
    gen.write(
        spark.createDataFrame([(1, 12.34)], "k long, amount double"),
        mode="overwrite",
    )
    gen.set_generated_column("cents", "CAST(amount * 100 AS BIGINT)")
    for i in range(2, 8):  # tiny appends: auto-compact keeps files bounded
        gen.write(
            spark.createDataFrame([(i, i * 1.0)], "k long, amount double")
            .coalesce(1),
            mode="append", merge_schema=(i == 2),
        )
    print("generated cents for k=5:",
          {r.k: r.cents for r in gen.read(filters=[("k", "=", 5)]).collect()})
    print("files after auto-compact:", gen.snapshot().num_files,
          "of", len([c for c in gen.history() if c.operation == 'append']) + 1,
          "data commits")

    # 10. A named catalog + SQL over the format (pushdown intact).
    from dc43_spark.io.catalog import SnaplogCatalog

    cat = SnaplogCatalog(spark, os.path.join(work, "warehouse"))
    cat.table("orders").write(table.read(), mode="overwrite")
    print("catalog SQL:",
          cat.sql("SELECT COUNT(*) AS n FROM orders WHERE k < 100").collect())

    # 11. Hand the snapshot to a Delta cluster: one protocol-compliant
    #     _delta_log, data files hard-linked (and read it back through
    #     the jar-less protocol reader to prove the round trip).
    from dc43_spark.io.delta_log import DeltaLogTable, export_delta_snapshot

    dest = export_delta_snapshot(gen, os.path.join(work, "delta_export"))
    print("delta export read-back rows:", DeltaLogTable(spark, dest).read().count())

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
