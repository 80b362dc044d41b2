"""Multimodal column handling: opaque binary payloads + typed metadata
(north-star extensions; SURVEY §7 phase 5).

Real pipelines carry image/audio/video as BinaryType columns with a
metadata struct, decoded in Arrow-batched Python (mapInPandas) because
codecs live in Python/C libraries. The media libraries are not in this
container, so the *decode kernel* is a deterministic fake (bytes →
md5-derived pseudo dimensions, clearly marked), while everything
Spark-side — schema, binary column, Arrow batch shape, partitioning —
is real and oracle-checked.

Scale notes: mapInPandas streams Arrow record batches; payloads never
pass through the driver; batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch. Decode is a narrow map —
no shuffle — so it scales linearly with executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Model a multimodal table: utf-8 text bytes stand in for an
    encoded media blob (BinaryType) + passthrough metadata."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.col("source").alias("media_source"),
    )


def fake_decode(payload: bytes) -> tuple[int, str, int, int, int]:
    """STUB decode kernel — deterministic fake of an image/video probe.

    A real deployment would call PIL/ffmpeg here; those libs are not in
    this container. Dimensions are md5-derived so the result is
    oracle-checkable end-to-end through the Arrow boundary.
    """
    digest = hashlib.md5(payload).hexdigest()
    width = int(digest[:4], 16) % 1024 + 1
    height = int(digest[4:8], 16) % 1024 + 1
    n_frames = int(digest[8:12], 16) % 64 + 1
    return len(payload), digest, width, height, n_frames


def decode_metadata(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': mapInPandas over the binary column."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [d[0] for d in decoded],
                    "payload_md5": [d[1] for d in decoded],
                    "width": [d[2] for d in decoded],
                    "height": [d[3] for d in decoded],
                    "n_frames": [d[4] for d in decoded],
                }
            )

    return with_payload.mapInPandas(decode_batches, schema=DECODED_SCHEMA)
