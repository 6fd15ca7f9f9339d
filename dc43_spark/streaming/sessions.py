"""Sessionization: gap-based session windows, batch and stateful streaming.

Batch path (``sessionize``): pure window functions — ``lag`` marks gap
breaks, a running sum numbers sessions, one aggregation emits per-session
rows. Shuffles once on the user key; SQL-expressible, so the driver gate
oracle-checks it (``user_sessions_events``).

Streaming path (``sessionize_stream``): ``applyInPandasWithState`` keeps one
open session per user in state and emits a session row when a later event
closes the gap, or when the WATERMARK passes ``last_ts + gap`` (event-time
timeout) — at that point no on-time event can extend the session, so the
close is exact and closed sessions match the batch path bit-for-bit. This is
the custom-stateful-operator pattern the built-in ``session_window`` can't
cover once you need per-session derived payloads or non-time close
conditions.

Event-time (not processing-time) timeouts matter twice over: they make the
close deterministic w.r.t. data rather than wall clock, and they keep the
engine quiescent when no data arrives — processing-time timeouts force the
scheduler to spin "state cleanup" micro-batches forever, which burns driver
cycles in production and deadlocks ``processAllAvailable()`` in tests.

Scale notes: state is one small row per ACTIVE user (not per event);
watermark-driven timeouts bound it. The grouping shuffle is on user_id —
salting is unnecessary because state semantics need all of a user's events
on one partition anyway.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Batch gap-sessionization via window functions.

    Output: one row per (user, session_seq) with start/end timestamps and
    the event count. Ordering is made total with ``order_tiebreak`` so the
    running session number is deterministic across engines.

    Skew note: the per-user window routes one user's whole history to one
    partition — inherent to gap sessionization (state must see the user's
    ordered events). Bot-grade hot users belong in a pre-filter; the
    streaming twin bounds the same state by watermark instead."""
    w_user = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_tiebreak))
    # gap compared in integer MICROSECONDS: unix_micros here == epoch_us in
    # DuckDB oracles (second-granularity unix_timestamp truncates, epoch()
    # is fractional — both cross-engine traps)
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag(ts_col).over(w_user)
    # timestamp_diff handles TIMESTAMP and TIMESTAMP_NTZ natively — casting
    # NTZ through the session tz skews gaps that straddle a DST transition
    gap_from_prev = F.timestamp_diff("MICROSECOND", prev_ts, F.col(ts_col))
    is_new = F.when(prev_ts.isNull() | (gap_from_prev > gap_us), 1).otherwise(0)
    with_session = df.withColumn("_new", is_new).withColumn(
        "session_seq",
        F.sum("_new").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    return (
        with_session.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


def sessionize_stream(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Stateful streaming sessionization (``applyInPandasWithState``).

    State per user: (session_start_us, last_us, n_events) as integer epoch
    micros — no float rounding of timestamps. A batch of events extends the
    open session or closes it (gap exceeded) and emits the finished session;
    the event-time timeout at ``last + gap`` flushes sessions for users that
    go silent once the watermark proves no on-time event can arrive."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("session_start", T.LongType()),  # epoch micros
            T.StructField("last_ts", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    gap_us = gap_minutes * 60 * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append((start, last, n))
                state.remove()
        else:
            events = pd.concat(list(pdfs))
            # datetime64 unit is ns or us depending on the Arrow path —
            # normalize explicitly instead of trusting astype(int64)
            ts = events[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")
            ts.sort()
            if state.exists:
                start, last, n = state.get
            else:
                start = last = int(ts[0])
                n = 0
            for t in ts:
                t = int(t)
                if n > 0 and (t - last) > gap_us:
                    closed.append((start, last, n))
                    start, last, n = t, t, 1
                else:
                    last = max(last, t)
                    n += 1
            state.update((start, last, n))
            # fire only once the watermark PASSES last+gap (ceil to ms so we
            # never close a hair early vs an event at exactly last+gap)
            state.setTimeoutTimestamp(-((last + gap_us) // -1000))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def state_v2_available() -> bool:
    """``transformWithStateInPandas`` spawns a protobuf-based state-server
    driver worker; without ``google.protobuf`` installed the query crashes
    at initialization (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE).
    Env-gated like the Delta paths: the v2 operator and its parity tests
    light up unchanged the moment protobuf appears."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def sessionize_stream_v2(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Stateful streaming sessionization on the Spark 4 state API v2
    (``transformWithStateInPandas``) — semantics identical to
    ``sessionize_stream``; the twins are parity-tested against each other
    and the batch path.

    What v2 buys at scale: typed composite state (value/list/map per key
    instead of one struct), first-class timers (many per key, listable,
    deletable) decoupled from the input path, state TTL, and the RocksDB
    state-store backend with changelog checkpointing — the store Spark
    requires for this operator and the right one for 100 TB state anyway
    (memory-bounded, spill-free, incremental checkpoints). Timer semantics:
    one event-time timer per user at ``last_ts + gap``; a timer that fires
    after the session was extended is detected stale (watermark has not
    passed the CURRENT ``last_ts + gap``) and ignored, because
    ``handleInputRows`` re-registered the later one.

    Requires ``spark.sql.streaming.stateStore.providerClass`` =
    ``...RocksDBStateStoreProvider`` on the session."""
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    gap_us = gap_minutes * 60 * 1_000_000

    def _emit(key: tuple, closed: list[tuple[int, int, int]]):
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [n for _, _, n in closed],
            }
        )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState(
                "session", "session_start long, last_ts long, n_events long"
            )

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            import pandas as pd

            events = pd.concat(list(rows))
            ts = events[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")
            ts.sort()
            closed: list[tuple[int, int, int]] = []
            if self._state.exists():
                start, last, n = self._state.get()
            else:
                start = last = int(ts[0])
                n = 0
            for t in ts:
                t = int(t)
                if n > 0 and (t - last) > gap_us:
                    closed.append((start, last, n))
                    start, last, n = t, t, 1
                else:
                    last = max(last, t)
                    n += 1
            self._state.update((start, last, n))
            # ceil-to-ms so the timer never fires a hair before last+gap
            self._handle.registerTimer(-((last + gap_us) // -1000))
            if closed:
                yield from _emit(key, closed)

        def handleExpiredTimer(self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo):
            if not self._state.exists():
                return
            start, last, n = self._state.get()
            wm_us = timerValues.getCurrentWatermarkInMs() * 1000
            if last + gap_us <= wm_us:
                self._state.clear()
                yield from _emit(key, [(start, last, n)])
            # else: stale timer from before the session was extended —
            # handleInputRows already registered the correct later timer

        def close(self) -> None:
            pass

    return (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .transformWithStateInPandas(
            SessionProcessor(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="eventTime",
        )
    )
