from dc43_spark.streaming.dedup import dedup_stream
from dc43_spark.streaming.drain import drain
from dc43_spark.streaming.observer import (
    BatchRecord,
    MetricsQueryListener,
    StreamingGovernedWriter,
    format_dataset_version,
    observe_stream,
)
from dc43_spark.streaming.sessions import sessionize, sessionize_stream

__all__ = [
    "BatchRecord",
    "MetricsQueryListener",
    "StreamingGovernedWriter",
    "format_dataset_version",
    "observe_stream",
    "sessionize",
    "sessionize_stream",
    "dedup_stream",
    "drain",
]
