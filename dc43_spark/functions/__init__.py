from dc43_spark.functions import (
    asof,
    curation,
    dedup,
    multimodal,
    ranges,
    similarity,
    skew,
    text,
)

__all__ = [
    "text",
    "dedup",
    "similarity",
    "multimodal",
    "asof",
    "ranges",
    "skew",
    "curation",
]
