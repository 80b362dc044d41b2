"""bucketed_interval_join (operators/intervals.py): equality with the
naive range join, the exactly-once match property, and the plan shape
that makes it scale (no BNLJ/cartesian)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_trend_predictor_spark.operators.intervals import (
    bucketed_interval_join,
)
from stock_trend_predictor_spark.plans import REGISTRY
from stock_trend_predictor_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _frames(spark):
    ev = load_table(spark, SF_DIR, "events")
    points = ev.select("event_id", "ts")
    # overlapping, non-aligned intervals: session-ish spans per user
    intervals = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("iv_start"))
        .withColumn(
            "iv_end", F.col("iv_start") + F.expr("interval 7 hours 13 minutes")
        )
    )
    return points, intervals


def test_bucketed_equals_naive_range_join(spark):
    points, intervals = _frames(spark)
    bucketed = bucketed_interval_join(
        points, intervals, point_ts="ts", start="iv_start", end="iv_end"
    ).select("event_id", "user_id")
    naive = points.join(
        intervals,
        (F.col("ts") >= F.col("iv_start")) & (F.col("ts") < F.col("iv_end")),
    ).select("event_id", "user_id")
    assert bucketed.count() == naive.count()
    assert bucketed.exceptAll(naive).count() == 0
    assert naive.exceptAll(bucketed).count() == 0


def test_bucketed_join_matches_exactly_once(spark):
    """A point matches an interval through exactly one bucket — the
    property that removes the dedup pass entirely."""
    points, intervals = _frames(spark)
    out = bucketed_interval_join(
        points, intervals, point_ts="ts", start="iv_start", end="iv_end"
    )
    dups = (
        out.groupBy("event_id", "user_id")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dups == 0


def test_hot_window_plan_has_no_bnlj(spark):
    plan = str(
        REGISTRY["hot_window_purchase_count"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
    )
    # BNLJs are allowed ONLY for the 1-row mean-threshold broadcast
    # (its condition references `thr`; the subtree appears twice since
    # `hot` feeds both the interval join and the final left join). The
    # CONTAINMENT join itself must be an equi-join on the bucket key —
    # a BNLJ without `thr` would mean the range condition leaked back
    # into a nested loop.
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "thr" in line, line
    assert "CartesianProduct" not in plan
    assert "_iv_bucket" in plan  # bucket key present as an equi key
