"""Scalable point-in-interval joins.

Spark's native options for `p.ts BETWEEN i.start AND i.end` are a
BroadcastNestedLoopJoin (fine only while the interval side fits in one
executor's memory) or a cartesian product (never fine). The scalable
form used by production range-join implementations is *bucketing*:

- explode each interval into the fixed-width time buckets it overlaps
  (an interval of length L produces ~L/width rows — bounded, known);
- map each point to the single bucket containing it;
- equi-join on the bucket key (plus any additional equi keys);
- filter exact containment.

Because a point lives in exactly ONE bucket and a matching interval
covers that bucket, every (point, interval) match is produced exactly
once — no dedup pass is needed. The shuffle key is (bucket, *keys):
narrow, uniformly distributed when intervals are, and AQE's skew
splitting handles a hot bucket.

Reference analogue: none — the reference joins nothing. This is the
§2.3 join-surface extension that makes `join_range_bands`' semantics
survive a LARGE interval side (the broadcast form stays right when the
interval side is small).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKET = "_iv_bucket"


def _floor_to(c: Column, width_s: int) -> Column:
    """Floor a timestamp to a width_s-second grid (epoch math — exact
    for any width, no calendar dependence)."""
    return F.timestamp_seconds(
        (F.unix_timestamp(c) - (F.unix_timestamp(c) % width_s))
    )


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    width_s: int = 3600,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point_ts < end`` (optionally also equal on `keys`),
    as an equi-join on exploded width_s-second buckets.

    `end` is exclusive: an interval ending exactly on a bucket
    boundary does not generate the boundary bucket. Empty intervals
    (end <= start) match nothing and are dropped before the explode —
    without the guard, an empty interval whose start sits exactly ON a
    bucket boundary would make sequence() throw (its floored end-1µs
    lands in the PREVIOUS bucket, an illegal descending range; found
    by the hypothesis property test).
    """
    iv = intervals.where(F.col(end) > F.col(start)).withColumn(
        BUCKET,
        F.explode(
            F.sequence(
                _floor_to(F.col(start), width_s),
                _floor_to(
                    F.col(end) - F.expr("interval 1 microsecond"), width_s
                ),
                F.expr(f"interval {width_s} seconds"),
            )
        ),
    )
    pt = points.withColumn(BUCKET, _floor_to(F.col(point_ts), width_s))
    contained = (F.col(point_ts) >= F.col(start)) & (
        F.col(point_ts) < F.col(end)
    )
    return pt.join(iv, [BUCKET, *keys]).where(contained).drop(BUCKET)
