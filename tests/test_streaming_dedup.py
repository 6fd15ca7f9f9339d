from __future__ import annotations

from datetime import datetime, timedelta

from dc43_spark.streaming.dedup import dedup_stream

T0 = datetime(2026, 1, 1)
SCHEMA = "event_id long, user_id long, ts timestamp"


def ev(i: int, user: int, minutes: float):
    return (i, user, T0 + timedelta(minutes=minutes))


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "src"
    # batch 1: event 1 twice (same id, same ts) and event 2 once
    b1 = [ev(1, 1, 0), ev(1, 1, 0), ev(2, 2, 1)]
    # batch 2: replay of event 1 with a LATER timestamp (retry), new event 3
    b2 = [ev(1, 1, 3), ev(3, 3, 4)]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.schema(spark.createDataFrame(b1, SCHEMA).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    deduped = dedup_stream(stream, keys=["event_id"], ts_col="ts", delay="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        rows = spark.table("t_dedup").collect()
    finally:
        q.stop()

    got = sorted((r.event_id, r.user_id) for r in rows)
    # event 1 exactly once despite 3 arrivals (2 in-batch, 1 retry with a
    # different timestamp in a later batch); events 2 and 3 pass through
    assert got == [(1, 1), (2, 2), (3, 3)]
