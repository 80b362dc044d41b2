"""Stream-stream joins (beyond the reference's surface; part of the
complete Structured Streaming join story next to the static-broadcast
join in streaming/scoring.py).

The canonical market-data shape: align two live feeds (e.g. realtime
ticks against the historical-replay feed, or trades against quotes)
on key + bounded event-time proximity. Both sides carry watermarks so
Spark can bound the join state: a buffered row is dropped once the
other side's watermark passes its time + tolerance — without the time
bound the state would grow forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_feeds_within(
    left: DataFrame,
    right: DataFrame,
    tolerance: str = "5 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Inner stream-stream join: rows of the two tick feeds with the
    same symbol whose event times are within ``tolerance``
    (right.ts in [left.ts - tolerance, left.ts]).

    State bound: each side buffers at most watermark_delay + tolerance
    of data per key — the exact condition Spark derives from the
    watermark + time-range predicate.
    """
    l = (
        left.withWatermark("ts", watermark_delay)
        .select(
            F.col("symbol"),
            F.col("ts").alias("l_ts"),
            F.col("close").alias("l_close"),
        )
    )
    r = (
        right.withWatermark("ts", watermark_delay)
        .select(
            F.col("symbol").alias("r_symbol"),
            F.col("ts").alias("r_ts"),
            F.col("close").alias("r_close"),
        )
    )
    return l.join(
        r,
        (F.col("symbol") == F.col("r_symbol"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {tolerance}"))
        & (F.col("r_ts") <= F.col("l_ts")),
    ).select("symbol", "l_ts", "l_close", "r_ts", "r_close")


def join_feeds_left_outer(
    left: DataFrame,
    right: DataFrame,
    tolerance: str = "5 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Left-outer stream-stream join: every left tick emits — matched
    rows as soon as both sides arrive, unmatched rows null-padded
    AFTER the joint watermark passes left.ts + tolerance (only then
    can Spark prove no match will ever arrive; this deferred-null
    emission is the semantic difference from the batch left join).

    Same state bound as the inner form: the time-range predicate plus
    both watermarks let the engine drop buffered rows once they are
    provably unmatchable.
    """
    l = left.withWatermark("ts", watermark_delay).select(
        F.col("symbol"),
        F.col("ts").alias("l_ts"),
        F.col("close").alias("l_close"),
    )
    r = right.withWatermark("ts", watermark_delay).select(
        F.col("symbol").alias("r_symbol"),
        F.col("ts").alias("r_ts"),
        F.col("close").alias("r_close"),
    )
    return l.join(
        r,
        (F.col("symbol") == F.col("r_symbol"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {tolerance}"))
        & (F.col("r_ts") <= F.col("l_ts")),
        "leftOuter",
    ).select("symbol", "l_ts", "l_close", "r_ts", "r_close")
