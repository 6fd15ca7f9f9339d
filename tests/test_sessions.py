from __future__ import annotations

from contextlib import contextmanager
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from dc43_spark.streaming.sessions import (
    sessionize,
    sessionize_stream,
    sessionize_stream_v2,
    state_v2_available,
)

T0 = datetime(2026, 1, 1, 0, 0, 0)
SCHEMA = "event_id long, user_id long, ts timestamp"

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

# both state backends must implement identical session semantics; v2 needs
# google.protobuf for its state-server worker (absent in this container)
IMPLS = [
    pytest.param(sessionize_stream, id="state_v1"),
    pytest.param(
        sessionize_stream_v2,
        id="state_v2",
        marks=pytest.mark.skipif(
            not state_v2_available(),
            reason="transformWithStateInPandas requires google.protobuf",
        ),
    ),
]


@contextmanager
def _state_store_for(spark, impl):
    """transformWithStateInPandas requires the RocksDB state store; scope
    the provider override to the query under test."""
    if impl is not sessionize_stream_v2:
        yield
        return
    try:
        old = spark.conf.get(_PROVIDER_KEY)
    except Exception:
        old = None
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        yield
    finally:
        spark.conf.unset(_PROVIDER_KEY) if old is None else spark.conf.set(_PROVIDER_KEY, old)


def ev(i: int, user: int, minutes: float):
    return (i, user, T0 + timedelta(minutes=minutes))


def test_batch_sessionize_splits_on_gap(spark):
    rows = [
        ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 20),   # session 1 (3 events)
        ev(4, 1, 60), ev(5, 1, 65),                 # session 2 (gap 40 > 30)
        ev(6, 2, 0),                                # user 2, one session
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sessionize(df, gap_minutes=30)
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start, r.session_end)
        for r in out.collect()
    }
    assert got[(1, 1)] == (3, T0, T0 + timedelta(minutes=20))
    assert got[(1, 2)] == (2, T0 + timedelta(minutes=60), T0 + timedelta(minutes=65))
    assert got[(2, 1)] == (1, T0, T0)


def test_batch_sessionize_boundary_gap_not_split(spark):
    # exactly 30 min gap is NOT a split (strictly greater closes)
    df = spark.createDataFrame([ev(1, 1, 0), ev(2, 1, 30)], SCHEMA)
    out = sessionize(df, gap_minutes=30).collect()
    assert len(out) == 1 and out[0].n_events == 2


@pytest.mark.parametrize("impl", IMPLS)
def test_streaming_sessionize_closes_on_gap(spark, tmp_path, impl):
    src = tmp_path / "src"
    name = f"t_sessions_{impl.__name__}"
    b1 = [ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 0)]
    b2 = [ev(4, 1, 120)]  # 110-min gap -> closes user 1's first session
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.schema(spark.createDataFrame(b1, SCHEMA).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    with _state_store_for(spark, impl):
        sessions = impl(stream, gap_minutes=30)
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            assert spark.table(name).count() == 0  # nothing closed yet

            spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(str(src))
            q.processAllAvailable()
            rows = {r.user_id: r for r in spark.table(name).collect()}
            # user 1: closed by the gap (event at 120 min, gap 110 > 30)
            assert rows[1].n_events == 2
            assert rows[1].session_start == T0
            assert rows[1].session_end == T0 + timedelta(minutes=10)
            # user 2: closed by the EVENT-TIME TIMEOUT/TIMER — the watermark
            # advanced to 110 min, past user 2's last_ts + gap = 30 min
            assert rows[2].n_events == 1
            assert rows[2].session_start == rows[2].session_end == T0
            assert len(rows) == 2
        finally:
            q.stop()


@pytest.mark.parametrize("impl", IMPLS)
def test_streaming_and_batch_agree_on_closed_sessions(spark, tmp_path, impl):
    src = tmp_path / "src2"
    name = f"t_sessions2_{impl.__name__}"
    batches = [
        [ev(1, 1, 0), ev(2, 1, 5), ev(3, 2, 0), ev(4, 2, 3)],
        [ev(5, 1, 90), ev(6, 2, 100)],  # closes both first sessions
    ]
    spark.createDataFrame(batches[0], SCHEMA).coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = (
        spark.readStream.schema(spark.createDataFrame(batches[0], SCHEMA).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    with _state_store_for(spark, impl):
        q = (
            impl(stream, gap_minutes=30)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )
        try:
            q.processAllAvailable()
            spark.createDataFrame(batches[1], SCHEMA).coalesce(1).write.mode("append").parquet(str(src))
            q.processAllAvailable()
            streamed = {
                (r.user_id, r.session_start, r.session_end, r.n_events)
                for r in spark.table(name).collect()
            }
        finally:
            q.stop()

    all_events = spark.createDataFrame([e for b in batches for e in b], SCHEMA)
    batch = sessionize(all_events, gap_minutes=30)
    closed_in_batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.collect()
        if r.session_seq == 1  # the open (last) sessions never streamed out
    }
    assert streamed == closed_in_batch


def test_batch_sessionize_gap_is_wall_clock_across_dst(spark):
    """NTZ event times 2h apart on the wall (but 1h as NY instants across
    spring-forward) must SPLIT at gap_minutes=90 — the old
    cast-through-session-tz path measured 1h and kept one session."""
    from dc43_spark.streaming.sessions import sessionize

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ev = spark.sql(
            "SELECT * FROM VALUES "
            "(1L, 7L, TIMESTAMP_NTZ'2026-03-08 01:30:00'), "
            "(2L, 7L, TIMESTAMP_NTZ'2026-03-08 03:30:00') "
            "AS t(event_id, user_id, ts)"
        )
        sessions = sessionize(ev, gap_minutes=90)
        assert sessions.count() == 2
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
