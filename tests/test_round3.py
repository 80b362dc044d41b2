"""Round-3 law tests: asof NULL-row fidelity, IVF recall bar,
replayed-sink idempotence companions.

The asof tests pin the ADVICE finding that per-column fills could mix
rows when the matched right row holds a NULL — the operator must
return the matched row's NULL (ASOF semantics), never a value patched
from a neighboring right row.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F  # noqa: F401

from stock_trend_predictor_spark.operators.windows import (
    asof_join,
    asof_join_forward,
)


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_backward_returns_matched_rows_null(spark):
    """Matched right row has v=NULL -> output v must be NULL, not the
    earlier right row's value."""
    left = spark.createDataFrame(
        [("A", _ts(10))], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", _ts(1), 100.0, "x"), ("A", _ts(5), None, "y")],
        "k string, ts timestamp, v double, tag string",
    )
    row = asof_join(
        left, right, by=["k"], ts="ts", right_cols=["v", "tag"]
    ).collect()[0]
    assert row.tag_asof == "y"  # matched the ts=5 row
    assert row.v_asof is None  # ...and took ITS null, not 100.0


def test_asof_forward_returns_matched_rows_null(spark):
    """Forward twin: matched (earliest future) right row has v=NULL ->
    output v must be NULL, not a later right row's value."""
    left = spark.createDataFrame(
        [("A", _ts(0))], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", _ts(3), None, "y"), ("A", _ts(7), 200.0, "z")],
        "k string, ts timestamp, v double, tag string",
    )
    row = asof_join_forward(
        left, right, by=["k"], ts="ts", right_cols=["v", "tag"]
    ).collect()[0]
    assert row.tag_next == "y"
    assert row.ts_next == _ts(3)
    assert row.v_next is None


def test_asof_forward_tolerance_still_nulls_past_horizon(spark):
    left = spark.createDataFrame(
        [("A", _ts(0)), ("B", _ts(0))], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", _ts(3), 1.0), ("B", _ts(30), 2.0)],
        "k string, ts timestamp, v double",
    )
    out = {
        r.k: (r.ts_next, r.v_next)
        for r in asof_join_forward(
            left, right, by=["k"], ts="ts", right_cols=["v"],
            tolerance_seconds=10,
        ).collect()
    }
    assert out["A"] == (_ts(3), 1.0)
    assert out["B"] == (None, None)  # match exists but beyond horizon
