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


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

_SAMPLE_RATES = (8000, 16000, 22050, 44100, 48000)


def fake_probe_audio(payload: bytes) -> tuple[int, int, int, int]:
    """STUB audio probe — deterministic fake of an ffprobe/soundfile
    header read (the audio libs are not in this container). Derived
    from md5 so the Arrow round trip is oracle-checkable."""
    digest = hashlib.md5(payload).hexdigest()
    sample_rate = _SAMPLE_RATES[int(digest[:4], 16) % len(_SAMPLE_RATES)]
    n_samples = int(digest[4:12], 16) % 10_000_000 + 1
    duration_ms = n_samples * 1000 // sample_rate
    return len(payload), sample_rate, n_samples, duration_ms


def probe_audio(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched audio header probe: mapInPandas over the binary
    column — same plumbing as decode_metadata, audio-shaped output."""

    def probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probed = [fake_probe_audio(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [p[0] for p in probed],
                    "sample_rate": [p[1] for p in probed],
                    "n_samples": [p[2] for p in probed],
                    "duration_ms": [p[3] for p in probed],
                }
            )

    return with_payload.mapInPandas(probe_batches, schema=AUDIO_SCHEMA)


def thumbnail_dims(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning: integer thumbnail dims that fit ``max_side``,
    preserving aspect ratio. Pure expression over the decoded metadata
    (the actual pixel resample would live in the same mapInPandas
    kernel as the decode — this is the partition-friendly math that
    surrounds it)."""
    longest = F.greatest("width", "height")
    return decoded.withColumns(
        {
            "thumb_w": F.greatest(
                F.lit(1), F.floor(F.col("width") * max_side / longest)
            ).cast("int"),
            "thumb_h": F.greatest(
                F.lit(1), F.floor(F.col("height") * max_side / longest)
            ).cast("int"),
        }
    )


def sample_frames(decoded: DataFrame, every_k: int = 7) -> DataFrame:
    """Frame sampling: one row per sampled frame index (0, k, 2k, ...).

    explode(sequence(...)) is a narrow generator — no shuffle, output
    co-partitioned with the input video rows, which is exactly what a
    real frame-extraction kernel (ffmpeg in the mapInPandas stage)
    needs. The per-frame fingerprint is md5(payload_md5, idx) — a
    deterministic stand-in for a frame content hash.
    """
    return decoded.withColumn(
        "frame_idx",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
        ),
    ).withColumn(
        "frame_fingerprint",
        F.md5(
            F.concat_ws("_", F.col("payload_md5"), F.col("frame_idx"))
        ),
    )


def payload_crc32_arrow(with_payload: DataFrame) -> DataFrame:
    """Zero-copy Arrow tier (`mapInArrow`): checksum the raw payload
    bytes without ever materializing a pandas object.

    For byte-level kernels (checksums, magic-number sniffing, container
    demuxing) the pandas conversion in mapInPandas buys nothing — the
    kernel wants the buffer, not a Series. mapInArrow hands the
    RecordBatch straight through, so per-batch overhead is one Python
    call and the payload bytes are read in place. Verified equal to the
    JVM-side F.crc32 in tests (the law that makes the tier safe to use
    for kernels Spark has no builtin for).
    """
    import pyarrow as pa
    import zlib

    def crc_batches(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("doc_id")
            payload = batch.column("payload")
            crcs = pa.array(
                [
                    zlib.crc32(v.as_py()) if v.is_valid else None
                    for v in payload
                ],
                type=pa.int64(),
            )
            yield pa.RecordBatch.from_arrays([ids, crcs], ["doc_id", "payload_crc32"])

    return with_payload.select("doc_id", "payload").mapInArrow(
        crc_batches, schema="doc_id long, payload_crc32 long"
    )


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


PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", LongType()),
    ]
)

#: perceptual-hash banding: 4 bands x 15 bits of the 60-bit hash.
PHASH_BANDS = 4
PHASH_BAND_BITS = 15


def perceptual_hash(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched 60-bit perceptual hash of each media payload.

    A real pHash DCTs the decoded pixels so *similar* images land at
    small hamming distance; no codec exists in this container, so the
    deterministic surrogate hashes the payload's leading content (the
    first 32 characters of the decoded byte stream) — payloads with
    shared leading content are "visually similar" in this model — and
    xors in ``doc_id % 4`` as 2 bits of per-capture sensor noise, so
    genuinely-near (hamming 1-2) neighbors exist, not just exact
    collisions. The Spark-side plumbing (BinaryType in, Arrow batches,
    LongType hash out) is exactly what the real kernel would use;
    swap the md5 line for the DCT and nothing else changes.
    """

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                prefix = bytes(payload).decode("utf-8")[:32]
                base = int(hashlib.md5(prefix.encode("utf-8")).hexdigest()[:15], 16)
                out.append(base ^ (int(doc_id) % 4))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "phash": out})

    return with_payload.mapInPandas(hash_batches, schema=PHASH_SCHEMA)
