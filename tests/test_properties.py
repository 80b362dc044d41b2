"""Property-based spot checks (SURVEY §5.5): the engine's scalar
expressions vs plain-Python reference implementations, driven by
hypothesis through one batched Spark evaluation per property."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import stable_round
from stock_trend_predictor_spark.functions.stock import change_pct, movement

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def _eval_pairs(spark, pairs, cols):
    df = spark.createDataFrame(pairs, "open double, close double")
    return df.select(*cols).collect()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=50))
def test_movement_label_matches_python(spark, pairs):
    rows = _eval_pairs(spark, pairs, [movement().alias("m")])
    for (o, c), r in zip(pairs, rows):
        assert r["m"] == int(c > o)  # predict_from_vm4.py:31 law


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.01, max_value=1e6, allow_nan=False),
            finite,
        ),
        min_size=1,
        max_size=50,
    )
)
def test_change_pct_matches_python(spark, pairs):
    rows = _eval_pairs(spark, pairs, [change_pct(scale=6).alias("p")])
    for (o, c), r in zip(pairs, rows):
        want = math.floor((c - o) / o * 100 * 1e6 + 0.5) / 1e6
        assert r["p"] == want


@settings(max_examples=20, deadline=None)
@given(st.lists(finite, min_size=1, max_size=50), st.integers(0, 6))
def test_stable_round_matches_python(spark, values, scale):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    rows = df.select(stable_round(F.col("x"), scale).alias("r")).collect()
    p = float(10**scale)
    for v, r in zip(values, rows):
        assert r["r"] == math.floor(v * p + 0.5) / p


# --- bucketed interval join vs pure-Python containment -----------------

_minute = st.integers(min_value=0, max_value=60 * 48)  # two days of minutes


@settings(max_examples=15, deadline=None)
@given(
    points=st.lists(_minute, min_size=1, max_size=25),
    intervals=st.lists(
        st.tuples(_minute, st.integers(min_value=0, max_value=60 * 7)),
        min_size=1,
        max_size=12,
    ),
)
def test_bucketed_interval_join_matches_python(spark, points, intervals):
    """For arbitrary minute-grained points and intervals (including
    zero-length, bucket-aligned, multi-bucket and overlapping ones),
    the bucketed equi-join must produce exactly the pairs the plain
    containment predicate does."""
    from datetime import datetime, timedelta

    from stock_trend_predictor_spark.operators.intervals import (
        bucketed_interval_join,
    )

    base = datetime(2024, 3, 1)
    pts = spark.createDataFrame(
        [(i, base + timedelta(minutes=m)) for i, m in enumerate(points)],
        "pid int, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (
                j,
                base + timedelta(minutes=s),
                base + timedelta(minutes=s + dur),
            )
            for j, (s, dur) in enumerate(intervals)
        ],
        "iid int, iv_start timestamp, iv_end timestamp",
    )
    got = {
        (r.pid, r.iid)
        for r in bucketed_interval_join(
            pts, ivs, point_ts="ts", start="iv_start", end="iv_end"
        ).collect()
    }
    expect = {
        (i, j)
        for i, m in enumerate(points)
        for j, (s, dur) in enumerate(intervals)
        if s <= m < s + dur
    }
    assert got == expect
