"""Stock/tick scalar expressions (SURVEY §2.8, §2.10 M1).

These are the reference's per-row Python expressions re-expressed as
native Catalyst columns — JVM-side, codegen'd, no UDFs:

- movement label: ``int(close > open)``
  (reference ml_model/predict_from_vm4.py:31)
- percent change: ``round((close - open) / open * 100, 2)``
  (reference ml_model/predict_from_vm4.py:61)
- wire timestamp format ``'%Y-%m-%d %H:%M:%S'``
  (reference data_collection/fetch_stock.py:55)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def movement(close: Column | str = "close", open_: Column | str = "open") -> Column:
    """0/1 label: did the bar close above its open (F7/M1)."""
    c = F.col(close) if isinstance(close, str) else close
    o = F.col(open_) if isinstance(open_, str) else open_
    return (c > o).cast("int")


def change_pct(
    close: Column | str = "close", open_: Column | str = "open", scale: int = 2
) -> Column:
    """Percent change of close vs open, rounded (F8/F9).

    Rounded via exact.stable_round so the value is reproducible
    bit-for-bit across engines and partitionings. A zero open yields
    NULL (nullif guard) — the one semantics Spark-ANSI and DuckDB
    share for division by zero.
    """
    from stock_trend_predictor_spark.functions.exact import stable_round

    c = F.col(close) if isinstance(close, str) else close
    o = F.col(open_) if isinstance(open_, str) else open_
    return stable_round((c - o) / F.nullif(o, F.lit(0.0)) * 100, scale)


def wire_timestamp(ts: Column | str = "ts") -> Column:
    """Format a timestamp the way the reference puts it on the wire (F1)."""
    t = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(t, "yyyy-MM-dd HH:mm:ss")
