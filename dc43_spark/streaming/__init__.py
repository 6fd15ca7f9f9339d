from dc43_spark.streaming.observer import (
    BatchRecord,
    MetricsQueryListener,
    StreamingGovernedWriter,
    format_dataset_version,
    observe_stream,
)

__all__ = [
    "BatchRecord",
    "MetricsQueryListener",
    "StreamingGovernedWriter",
    "format_dataset_version",
    "observe_stream",
]
