"""dc43-spark quickstart: contract -> governed write -> governed read ->
verdict history, then a taste of the curation operators.

Run: python examples/quickstart.py  (expects the sf0.001 testdata layout;
pass a different data dir as argv[1])
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(data_dir: str = "/root/testdata/sf0.001") -> int:
    from pyspark.sql import SparkSession

    from dc43_spark.contracts import Contract, QualityRule, SchemaObject, SchemaProperty
    from dc43_spark.governance import GovernanceService
    from dc43_spark.io.read import read_with_contract
    from dc43_spark.io.write import write_with_contract

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("dc43-quickstart")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = tempfile.mkdtemp(prefix="dc43_quickstart_")

    # 1. Declare a contract: schema + quality rules.
    contract = Contract(
        id="quickstart.orders",
        version="0.1.0",
        schema_objects=[
            SchemaObject(
                name="orders",
                properties=[
                    SchemaProperty("o_orderkey", "bigint", required=True, unique=True),
                    SchemaProperty("o_custkey", "bigint", required=True),
                    SchemaProperty(
                        "o_totalprice", "double", required=True,
                        quality=[QualityRule("gt", 0.0)],
                    ),
                    SchemaProperty(
                        "o_orderstatus", "string", required=True,
                        quality=[QualityRule("enum", ["F", "O", "P"])],
                    ),
                ],
            )
        ],
    )

    # 2. Governed write: one-pass validation, then the physical write.
    orders = spark.read.parquet(f"{data_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    target = f"{out_dir}/orders"
    wres = write_with_contract(orders, contract, path=target, mode="overwrite")
    print("write verdict:", wres.validation.status, wres.validation.metrics["row_count"], "rows")

    # 3. Governed read: align/cast + verdict (reads warn, writes block).
    df, rres = read_with_contract(spark, contract, path=target)
    print("read verdict:", rres.status, "->", df.count(), "rows")

    # 4. Governance service: persist the verdict, link dataset<->contract.
    svc = GovernanceService()
    svc.contract_store.put(contract)
    svc.evaluate_dataset(
        df, contract, dataset_id=f"path:{target}", dataset_version="v1",
        operation="write", track_drift=True,
    )
    print("status matrix:", svc.status_matrix(f"path:{target}"))

    # 5. Curation taste: filter + exact dedup + near-dup pairs.
    from dc43_spark.functions import curation as cu
    from dc43_spark.functions import dedup as dd

    docs = spark.read.parquet(f"{data_dir}/documents.parquet")
    kept = cu.corpus_filter(docs).filter("keep")
    pairs = dd.minhash_near_duplicates(docs, threshold=0.8)
    print("kept docs:", kept.count(), "| near-dup pairs:", pairs.count())

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
