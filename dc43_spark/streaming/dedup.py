"""Streaming deduplication with bounded state.

Batch dedup (``functions/dedup.py``) sees the whole dataset; a stream
cannot, so exact dedup state would grow forever. The watermark bounds it:
``dedup_stream`` keeps each key's state only until the event-time
watermark passes ``delay``, after which a late duplicate is (by the
watermark contract) droppable anyway.

This wraps ``dropDuplicatesWithinWatermark`` — the Spark 3.5+ operator
that, unlike plain streaming ``dropDuplicates``, does not require the
event-time column itself to be part of the key and expires state on the
watermark alone. Duplicates whose event times differ (retries with fresh
timestamps, at-least-once replays) still dedup as long as they arrive
within ``delay`` of each other.

Scale: state is one row per distinct key within the watermark horizon —
shuffle is on the dedup key; the horizon, not the stream length, bounds
memory.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    *,
    keys: Sequence[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """First occurrence per ``keys`` within the watermark horizon.

    ``df`` must be a streaming DataFrame; ``ts_col`` is the event-time
    column the watermark rides on."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))
