"""Funnel step latency: how LONG each conversion step takes.

funnel_view_click_purchase counts who reaches each stage; this query
measures the time spent between stages for the users who advance —
the companion number every conversion dashboard pairs with the counts
(median and p90 step latency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "funnel_step_latency",
        oracle=f"""
WITH ev AS (
    SELECT user_id, event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS es
    FROM events
), fv AS (
    SELECT user_id, min(es) AS vts FROM ev
    WHERE event_type = 'view' GROUP BY 1
), fc AS (
    SELECT f.user_id, f.vts, min(e.es) AS cts
    FROM fv f JOIN ev e
      ON e.user_id = f.user_id AND e.event_type = 'click'
     AND e.es >= f.vts
    GROUP BY 1, 2
), fp AS (
    SELECT c.user_id, c.vts, c.cts, min(e.es) AS pts
    FROM fc c JOIN ev e
      ON e.user_id = c.user_id AND e.event_type = 'purchase'
     AND e.es >= c.cts
    GROUP BY 1, 2, 3
), lat AS (
    SELECT 'view_to_click' AS step, cts - vts AS lat_s FROM fc
    UNION ALL
    SELECT 'click_to_purchase' AS step, pts - cts AS lat_s FROM fp
)
SELECT step,
       CAST(count(*) AS BIGINT) AS n_users,
       {stable_round_sql('quantile_cont(lat_s, 0.5)', 6)} AS median_s,
       {stable_round_sql('quantile_cont(lat_s, 0.9)', 6)} AS p90_s,
       CAST(max(lat_s) AS BIGINT) AS max_s
FROM lat GROUP BY 1
""",
        doc="Per-step conversion latency for the view -> click -> "
        "purchase funnel: first view per user, first click at/after "
        "it, first purchase at/after that (the same stage semantics "
        "as funnel_view_click_purchase), then exact median/p90/max "
        "seconds spent in each step. Two user-keyed time-bounded "
        "joins (each against a one-row-per-user firsts table) + one "
        "two-group percentile aggregate — integer epoch seconds "
        "end-to-end, so only the interpolated percentiles are "
        "doubles and those follow the engine-matched quantile_cont "
        "convention every percentile query here uses.",
    )
    def funnel_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select(
            "user_id",
            "event_type",
            F.unix_timestamp("ts").cast("long").alias("es"),
        )
        fv = (
            ev.where(F.col("event_type") == "view")
            .groupBy("user_id")
            .agg(F.min("es").alias("vts"))
        )
        clicks = ev.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("cu"), F.col("es").alias("ces")
        )
        fc = (
            fv.join(
                clicks,
                (F.col("cu") == F.col("user_id"))
                & (F.col("ces") >= F.col("vts")),
            )
            .groupBy("user_id", "vts")
            .agg(F.min("ces").alias("cts"))
        )
        purchases = ev.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("pu"), F.col("es").alias("pes")
        )
        fp = (
            fc.join(
                purchases,
                (F.col("pu") == F.col("user_id"))
                & (F.col("pes") >= F.col("cts")),
            )
            .groupBy("user_id", "vts", "cts")
            .agg(F.min("pes").alias("pts"))
        )
        lat = fc.select(
            F.lit("view_to_click").alias("step"),
            (F.col("cts") - F.col("vts")).alias("lat_s"),
        ).unionAll(
            fp.select(
                F.lit("click_to_purchase").alias("step"),
                (F.col("pts") - F.col("cts")).alias("lat_s"),
            )
        )
        return lat.groupBy("step").agg(
            F.count(F.lit(1)).alias("n_users"),
            stable_round(F.percentile("lat_s", F.lit(0.5)), 6).alias(
                "median_s"
            ),
            stable_round(F.percentile("lat_s", F.lit(0.9)), 6).alias(
                "p90_s"
            ),
            F.max("lat_s").alias("max_s"),
        )


_register()
