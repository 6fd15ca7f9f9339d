"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake behind ``FAKE_DECODERS`` (clearly marked; swap in real
Pillow/torchaudio decoders by registering into ``DECODERS``). Everything
around it — schemas, Arrow-batched ``mapInPandas`` plumbing, partition
sizing — is real and tested.

Design for 100 TB:
- binary payloads stay opaque until the last possible operator (no decode
  before filters/joins that don't need pixels);
- decode runs in ``mapInPandas`` so payload bytes move driver-free in Arrow
  record batches; batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap executor memory;
- feature outputs are fixed-width structs, so downstream ops are columnar.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

Decoder = Callable[[bytes], list[float]]


def _fake_decode(payload: bytes) -> list[float]:
    """DETERMINISTIC FAKE decoder (no codecs in this container).

    Produces an 8-dim 'feature' from the payload's sha256 — stable across
    runs/machines so tests and oracles can pin outputs. Replace with a real
    decoder via ``DECODERS[media_type] = fn``."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:8]]


FAKE_DECODERS: dict[str, Decoder] = {
    "image": _fake_decode,
    "audio": _fake_decode,
    "video": _fake_decode,
}

DECODERS: dict[str, Decoder] = dict(FAKE_DECODERS)


def extract_features(df: DataFrame, *, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over a MEDIA_SCHEMA frame.

    ``mapInPandas`` streams record batches through Python once; the decoder
    never sees the whole partition, so executor memory stays bounded by the
    Arrow batch size regardless of payload count."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            types = pdf["media_type"]
            features = [
                DECODERS.get(t, _fake_decode)(p if p is not None else b"")
                for t, p in zip(types, payloads)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": types,
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "content_hash": [
                        hashlib.md5(p if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                    "feature": features,
                }
            )

    return df.mapInPandas(process, schema=FEATURE_SCHEMA)


def payload_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM payload statistics — no Python, no decode."""
    return df.select(
        F.col("media_id"),
        F.col("media_type"),
        F.length(F.col("payload")).cast("long").alias("n_bytes"),
        F.md5(F.col("payload")).alias("content_hash"),
    )


def frame_sample_plan(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Plan video frame sampling WITHOUT decoding: one output row per
    requested frame timestamp, derived from metadata duration. The decode of
    each planned frame happens later in ``extract_features`` (stubbed here).

    This is the scale trick: the expensive decode fan-out is an explode on
    metadata, so Spark can repartition the planned frames before any codec
    runs."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        df.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )
