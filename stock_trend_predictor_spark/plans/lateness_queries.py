"""Event-time lateness profiling — the watermark-tuning query.

Every Structured Streaming pipeline in streaming/ sets a watermark
(ingest.py builders); the right delay is an empirical question about
the source. This query answers it from the batch log: replay events in
ARRIVAL order (event_id — the monotone ingest sequence, mirroring the
reference's append-only collection), track the running event-time
high-watermark per stream, and profile how late each event is against
it. The "would a 1-minute / 5-minute watermark have dropped it" counts
are exactly the numbers you read before choosing
``withWatermark("ts", ...)``.

Scale shape: one window over the per-stream arrival order (the same
(event_type, order) shuffle every tick query pays) and one aggregate.
Lateness state is a single running max — the watermark operator's own
cost model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table

#: audited watermark delays, seconds.
WM_DELAYS_S = (60, 300)


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    drop_cols_sql = ",\n       ".join(
        f"CAST(count(*) FILTER (WHERE late_s > {d}) AS BIGINT)"
        f" AS n_drop_{d}s"
        for d in WM_DELAYS_S
    )

    @register(
        "watermark_lateness_profile",
        oracle=f"""
WITH arr AS (
    SELECT event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
           event_id
    FROM events
), lat AS (
    SELECT event_type,
           greatest(
               max(tsec) OVER (PARTITION BY event_type
                               ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) - tsec,
               0) AS late_s
    FROM arr
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE late_s > 0) AS BIGINT) AS n_late,
       {stable_round_sql(
           'CAST(count(*) FILTER (WHERE late_s > 0) AS DOUBLE)'
           ' / count(*)', 6)} AS frac_late,
       CAST(max(late_s) AS BIGINT) AS max_late_s,
       {drop_cols_sql}
FROM lat GROUP BY event_type
""",
        doc=f"Watermark-tuning profile per stream (event_type): "
        f"events replayed in arrival order (event_id, the monotone "
        f"ingest sequence), lateness = running event-time max minus "
        f"own event time. Reports the late fraction, worst lateness "
        f"and — the actionable part — how many events each candidate "
        f"watermark delay {WM_DELAYS_S}s would have DROPPED, i.e. "
        f"the exact completeness-vs-state tradeoff curve for "
        f"withWatermark(). Integer seconds end-to-end; one ordered "
        f"window per stream + one aggregate.",
    )
    def watermark_lateness_profile(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        arr = ev.select(
            "event_type",
            F.floor(F.unix_timestamp("ts")).cast("long").alias("tsec"),
            "event_id",
        )
        w = (
            Window.partitionBy("event_type")
            .orderBy("event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        lat = arr.select(
            "event_type",
            F.greatest(
                F.max("tsec").over(w) - F.col("tsec"), F.lit(0)
            ).alias("late_s"),
        )
        aggs = [
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("late_s") > 0, 1).otherwise(0)
            ).alias("n_late"),
            stable_round(
                F.sum(F.when(F.col("late_s") > 0, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("frac_late"),
            F.max("late_s").alias("max_late_s"),
        ] + [
            F.sum(
                F.when(F.col("late_s") > d, 1).otherwise(0)
            ).alias(f"n_drop_{d}s")
            for d in WM_DELAYS_S
        ]
        return lat.groupBy("event_type").agg(*aggs)


_register()
