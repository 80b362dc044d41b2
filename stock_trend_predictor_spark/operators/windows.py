"""Time-series operators the reference implies but never implements
(SURVEY §2.5: features_engineering.py is named for features yet computes
none) — rolling features, as-of joins, sessionization, resampling.

Scale design: every operator here is a single shuffle on the series key
(symbol/user), then narrow window evaluation within partitions. No
range-join explosions, no driver-side state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts: str,
    right_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` within the same ``by`` group.

    Spark-first implementation (SURVEY §7 phase 2): instead of a range
    join (quadratic blow-up on dense keys), union both sides tagged,
    sort once per key, and carry the last-seen right values forward with
    ``last(..., ignorenulls=True)``. One shuffle on ``by``; cost is
    O(n log n) per key regardless of match distance — the strategy that
    survives 100 TB where a non-equi join would not.

    At equal timestamps the right row sorts first (side tag 0 < 1), so
    the join is inclusive — matching DuckDB ``ASOF JOIN ... ON r.ts <=
    l.ts`` semantics.

    The matched values travel as ONE struct filled by a single
    ``last(ignorenulls=True)``: per-column fills would mix rows when
    the matched right row holds a NULL in one column (that column
    would be taken from an earlier right row), diverging from ASOF
    semantics, which return the matched row's NULL.
    """
    by = list(by)
    tag = "__asof_side"
    sval = "__asof_vals"
    struct_t = T.StructType([right.schema[c] for c in right_cols])
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias(tag),
        F.lit(None).cast(struct_t).alias(sval),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in by + [ts] else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias(tag),
        F.struct(*[F.col(c) for c in right_cols]).alias(sval),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*by)
        .orderBy(ts, tag)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        F.col(tag),
        F.last(sval, ignorenulls=True).over(w).alias(sval),
    )
    return filled.where(F.col(tag) == 1).select(
        *lcols,
        *[F.col(f"{sval}.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts: str,
    right_cols: Sequence[str],
    tolerance_seconds: int | None = None,
    suffix: str = "_next",
) -> DataFrame:
    """Forward as-of join: for each left row, the EARLIEST right row
    with ``right.ts >= left.ts`` within the same ``by`` group,
    optionally only if it arrives within ``tolerance_seconds``.

    Same union-and-sort strategy as :func:`asof_join` (no range join —
    O(n log n) per key at any match distance), mirrored in time:
    ``first(..., ignorenulls=True)`` over CURRENT ROW .. UNBOUNDED
    FOLLOWING. At equal timestamps the right row sorts after the left
    (side tag 1 > 0) yet inside the forward frame, so the join is
    inclusive. The tolerance is applied as a post-filter on the
    matched right timestamp — rows past the horizon revert to NULL,
    which keeps the window single-pass (no per-row frame bounds).

    As in :func:`asof_join`, the matched timestamp and values travel
    as ONE struct filled by a single ``first(ignorenulls=True)`` so a
    NULL in one right column can never be patched from a later right
    row (the mixed-row hazard).
    """
    by = list(by)
    tag = "__asof_side"
    sval = "__asof_vals"
    mts = f"__match_{ts}"
    struct_t = T.StructType(
        [T.StructField(mts, right.schema[ts].dataType)]
        + [right.schema[c] for c in right_cols]
    )
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.lit(0).alias(tag),
        F.lit(None).cast(struct_t).alias(sval),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in by + [ts] else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(1).alias(tag),
        F.struct(
            F.col(ts).alias(mts), *[F.col(c) for c in right_cols]
        ).alias(sval),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*by)
        .orderBy(ts, tag)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        *lcols,
        F.col(tag),
        F.first(sval, ignorenulls=True).over(w).alias(sval),
    )
    out = filled.where(F.col(tag) == 0).select(
        *lcols,
        F.col(f"{sval}.{mts}").alias(mts),
        *[F.col(f"{sval}.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    if tolerance_seconds is not None:
        in_tol = (
            F.unix_micros(F.col(mts)) - F.unix_micros(F.col(ts))
        ) <= tolerance_seconds * 1_000_000
        out = out.select(
            *lcols,
            F.when(in_tol, F.col(mts)).alias(mts),
            *[
                F.when(in_tol, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in right_cols
            ],
        )
    return out.withColumnRenamed(mts, f"{ts}{suffix}")


def bucketed_lag(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    bucket: str = "1 day",
    out: str = "prev_value",
) -> DataFrame:
    """lag(value) over (partition by key order by ts) — computed
    scalably for LOW-cardinality keys.

    A plain per-key window caps parallelism at #keys (the reference's
    3-symbol universe would put a third of 100 TB in one sort task).
    Two passes fix it:

    1. lag within (key, time-bucket) — shuffle on (key, bucket), so
       parallelism is #keys × #buckets;
    2. each bucket's head row takes the previous bucket's last value,
       carried by a window over the tiny per-(key, bucket) aggregate
       (#keys × #buckets rows) joined back.

    Requires globally unique ``ts`` per key (true for the driver data;
    add a tiebreak column otherwise). Result is row-identical to the
    plain window — asserted by the rolling_lag_bucketed oracle.
    """
    with_bucket = df.withColumn("__bucket", F.window(ts, bucket)["start"])
    w_in = Window.partitionBy(key, "__bucket").orderBy(ts)
    in_bucket = with_bucket.withColumn(out, F.lag(value).over(w_in))

    per_bucket = (
        with_bucket.groupBy(key, "__bucket")
        .agg(F.max_by(value, ts).alias("__last"))
    )
    w_b = Window.partitionBy(key).orderBy("__bucket")
    carry = per_bucket.withColumn(
        "__prev_last", F.lag("__last").over(w_b)
    ).select(key, "__bucket", "__prev_last")

    return (
        in_bucket.join(carry, [key, "__bucket"], "left")
        .withColumn(out, F.coalesce(F.col(out), F.col("__prev_last")))
        .drop("__bucket", "__prev_last")
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap: str = "30 minutes",
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign gap-based session ids per key (new session when the
    inter-event gap exceeds ``gap``).

    Classic two-window composition: flag starts with lag(), then a
    running sum converts flags to session ordinals. Single shuffle on
    ``key``. The streaming twin is ``session_window()`` in
    streaming/windows.py; this batch form is oracle-checkable.
    """
    order = [ts, *order_tiebreak]
    w = Window.partitionBy(key).orderBy(*order)
    gap_expr = F.expr(f"INTERVAL {gap}")
    is_new = (
        F.when(F.lag(ts).over(w).isNull(), 1)
        .when(F.col(ts) > F.lag(ts).over(w) + gap_expr, 1)
        .otherwise(0)
    )
    return df.withColumn("__is_new", is_new).withColumn(
        "session_seq",
        F.sum("__is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).drop("__is_new")


def resample_bars(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Downsample a tick series to OHLC bars per (key, time bucket).

    open/close via min_by/max_by on the timestamp (deterministic: the
    driver data has globally unique timestamps), high/low via min/max —
    all map-side-combinable aggregates, one shuffle.
    """
    from stock_trend_predictor_spark.functions.exact import DECIMAL_T

    bar = F.window(ts, bucket)
    return (
        df.groupBy(F.col(key), bar.alias("bar"))
        .agg(
            F.min_by(value, ts).alias("open"),
            F.max(value).alias("high"),
            F.min(value).alias("low"),
            F.max_by(value, ts).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum(F.col(value).cast(DECIMAL_T)).cast("double").alias("total_value"),
        )
        .select(
            key,
            F.col("bar.start").alias("bar_start"),
            "open", "high", "low", "close", "n_ticks", "total_value",
        )
    )
