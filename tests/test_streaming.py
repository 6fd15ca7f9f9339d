from __future__ import annotations

import time

import pytest

from dc43_spark.contracts import Contract, QualityRule, SchemaObject, SchemaProperty
from dc43_spark.io import SplitWriteViolationStrategy
from dc43_spark.streaming import (
    MetricsQueryListener,
    StreamingGovernedWriter,
    format_dataset_version,
    observe_stream,
)

SCHEMA = "event_id long, event_type string, value double"


def events_contract() -> Contract:
    return Contract(
        id="test.events", version="0.1.0",
        schema_objects=[
            SchemaObject(
                name="events",
                properties=[
                    SchemaProperty("event_id", "bigint", required=True),
                    SchemaProperty(
                        "event_type", "string", required=True,
                        quality=[QualityRule("enum", ["click", "view"])],
                    ),
                    SchemaProperty("value", "double", quality=[QualityRule("gt", 0.0)]),
                ],
            )
        ],
    )


def _write_batches(spark, src_dir, batches):
    """One parquet file per micro-batch (file stream + maxFilesPerTrigger=1)."""
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(str(src_dir))


def _stream(spark, src_dir):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir))
    )


def _await(query, timeout=60):
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(timeout)


def test_version_templates():
    from datetime import datetime, timezone

    now = datetime(2026, 1, 2, 3, 4, 5, tzinfo=timezone.utc)
    assert format_dataset_version("batch-{batch_id}", batch_id=7, now=now) == "batch-7"
    assert format_dataset_version("{timestamp}", batch_id=0, now=now) == "20260102T030405Z"
    assert format_dataset_version("{unix_timestamp}", batch_id=0, now=now) == str(
        int(now.timestamp())
    )


def test_governed_stream_writes_and_records_timeline(spark, tmp_path):
    src = tmp_path / "src"
    _write_batches(spark, src, [[(1, "click", 1.0), (2, "view", 2.0)]])
    writer = StreamingGovernedWriter(
        events_contract(), path=str(tmp_path / "out"), enforce=True
    )
    q = writer.start(_stream(spark, src), checkpoint=str(tmp_path / "ckpt"))
    _await(q)
    assert len(writer.timeline) == 1
    rec = writer.timeline[0]
    assert rec.row_count == 2 and rec.violations == 0 and rec.status == "ok"
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 2


def test_kill_switch_stops_on_blocking_batch(spark, tmp_path):
    src = tmp_path / "src"
    # second batch has a NULL required event_id -> block -> stop
    _write_batches(
        spark, src,
        [[(1, "click", 1.0)], [(None, "view", 2.0)]],
    )
    writer = StreamingGovernedWriter(
        events_contract(), path=str(tmp_path / "out"), enforce=True, max_failed_batches=1
    )
    q = writer.start(_stream(spark, src), checkpoint=str(tmp_path / "ckpt"))
    with pytest.raises(Exception) as ei:
        q.processAllAvailable()
    assert "blocked" in str(ei.value)
    q.stop()
    statuses = [r.status for r in writer.timeline]
    assert "block" in statuses


def test_intervention_drops_batch_and_continues(spark, tmp_path):
    src = tmp_path / "src"
    _write_batches(
        spark, src,
        [[(1, "click", 1.0)], [(None, "view", 2.0)], [(3, "click", 3.0)]],
    )
    decisions = []

    def never_stop(record, failed):
        decisions.append((record.batch_id, failed))
        return None  # drop the batch, keep going

    writer = StreamingGovernedWriter(
        events_contract(), path=str(tmp_path / "out"),
        enforce=True, intervention=never_stop,
    )
    q = writer.start(_stream(spark, src), checkpoint=str(tmp_path / "ckpt"))
    _await(q)
    out = spark.read.parquet(str(tmp_path / "out"))
    # blocked batch dropped; clean batches written
    assert out.count() == 2
    assert decisions and decisions[0][1] == 1


def test_streaming_split_strategy(spark, tmp_path):
    src = tmp_path / "src"
    _write_batches(spark, src, [[(1, "click", 1.0), (2, "bad", -1.0)]])
    writer = StreamingGovernedWriter(
        events_contract(), path=str(tmp_path / "out"),
        enforce=False, strategy=SplitWriteViolationStrategy(),
    )
    q = writer.start(_stream(spark, src), checkpoint=str(tmp_path / "ckpt"))
    _await(q)
    assert spark.read.parquet(str(tmp_path / "out/valid")).count() == 1
    assert spark.read.parquet(str(tmp_path / "out/reject")).count() == 1


def test_version_template_per_batch_paths(spark, tmp_path):
    src = tmp_path / "src"
    _write_batches(spark, src, [[(1, "click", 1.0)], [(2, "view", 2.0)]])
    writer = StreamingGovernedWriter(
        events_contract(), path=str(tmp_path / "out"),
        enforce=True, version_template="batch-{batch_id}",
    )
    q = writer.start(_stream(spark, src), checkpoint=str(tmp_path / "ckpt"))
    _await(q)
    batches = sorted(p.name for p in (tmp_path / "out").iterdir() if p.is_dir())
    assert batches == ["batch-0", "batch-1"]


def test_observe_stream_listener(spark, tmp_path):
    src = tmp_path / "src"
    _write_batches(spark, src, [[(1, "click", 1.0), (2, "bad", -2.0)]])
    contract = events_contract()
    listener = MetricsQueryListener(contract)
    spark.streams.addListener(listener)
    try:
        observed = observe_stream(_stream(spark, src), contract)
        q = (
            observed.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        deadline = time.time() + 30
        while not listener.timeline and time.time() < deadline:
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)
    assert listener.timeline, "listener saw no observed metrics"
    rec = listener.timeline[0]
    assert rec.row_count == 2
    assert rec.metrics["violations.enum_event_type"] == 1
    assert rec.metrics["violations.gt_value"] == 1
    assert rec.status == "warn"


def test_corpus_filter_runs_on_a_stream(spark, tmp_path):
    """corpus_filter is a narrow projection, so the SAME operator runs
    unchanged over readStream — the batch/streaming parity a curation
    pipeline needs to filter live crawl ingest."""
    from dc43_spark.functions.curation import corpus_filter

    src = tmp_path / "docs"
    doc_schema = "doc_id long, text string"
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and then the "
                "dog chases the fox around the big old tree in the yard"),
            (2, "tiny doc"),
        ],
        doc_schema,
    ).coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(doc_schema).parquet(str(src))
    out = corpus_filter(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("corpus_filter_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r["doc_id"]: r for r in spark.sql(
        "SELECT * FROM corpus_filter_stream"
    ).collect()}
    assert rows[1]["keep"] is True
    assert rows[2]["keep"] is False and "too_short" in rows[2]["drop_reasons"]


def test_streaming_writer_port_bound(spark, tmp_path):
    """The streaming sink resolves its contract through a product OUTPUT
    port exactly like batch writes (r6 port-bound governed IO)."""
    import time

    from dc43_spark.contracts import Contract, SchemaObject, SchemaProperty
    from dc43_spark.contracts.model import Server
    from dc43_spark.contracts.store import MemoryContractStore
    from dc43_spark.products import DataProduct, Port, ProductRegistry
    from dc43_spark.streaming.observer import StreamingGovernedWriter

    target = str(tmp_path / "out")
    contract = Contract(
        id="stream.orders", version="0.1.0",
        servers=[Server(path=target, format="parquet")],
        schema_objects=[SchemaObject(name="t", properties=[
            SchemaProperty("k", "bigint", required=True),
            SchemaProperty("v", "string"),
        ])],
    )
    cs = MemoryContractStore()
    cs.put(contract)
    reg = ProductRegistry(cs)
    reg.register(DataProduct(
        id="stream.producer",
        output_ports=[Port(name="gold", contract_id="stream.orders")],
    ))
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").coalesce(
        1
    ).write.parquet(str(src / "b1"))
    writer = StreamingGovernedWriter(
        product="stream.producer", port="gold", registry=reg, path=target
    )
    stream = spark.readStream.schema("k long, v string").parquet(str(src / "*"))
    q = (
        stream.writeStream.foreachBatch(writer.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    time.sleep(0.3)
    assert writer.contract.id == "stream.orders"
    assert spark.read.parquet(target).count() == 2
    with pytest.raises(ValueError, match="not both"):
        StreamingGovernedWriter(contract, product="p", port="x")


def test_read_stream_with_contract(spark, tmp_path):
    """Governed streaming read: location from the contract's servers,
    schema-only verdict, aligned streaming frame; schema errors block
    before the query starts."""
    import time

    from dc43_spark.contracts import Contract, SchemaObject, SchemaProperty
    from dc43_spark.contracts.model import Server
    from dc43_spark.io.read import ValidationBlockedError, read_stream_with_contract

    src = tmp_path / "src"
    spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "k long, v string, extra double"
    ).coalesce(1).write.parquet(str(src))

    def contract(props):
        return Contract(
            id="stream.read", version="0.1.0",
            servers=[Server(path=str(src), format="parquet")],
            schema_objects=[SchemaObject(name="t", properties=props)],
        )

    good = contract([
        SchemaProperty("k", "bigint", required=True),
        SchemaProperty("v", "string"),
    ])
    df, res = read_stream_with_contract(spark, good)
    assert df.isStreaming and res.ok
    assert df.columns == ["k", "v"]  # aligned: extra pruned, order enforced
    out = str(tmp_path / "out")
    q = (
        df.writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    time.sleep(0.3)
    assert spark.read.parquet(out).count() == 2

    # a required column the source lacks blocks BEFORE any query starts
    bad = contract([SchemaProperty("missing_col", "bigint", required=True)])
    with pytest.raises(ValidationBlockedError):
        read_stream_with_contract(spark, bad)
