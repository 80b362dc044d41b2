"""Growth metrics: rolling-window active-user stickiness.

DAU / MAU30 per day — the canonical product-growth ratio. The scale
shape is the same bounded fan-out that sliding_distinct_users proved
for 6 hourly windows, stretched to 30 daily ones: every (day, user)
activity fact belongs to exactly 30 trailing windows, so the rolling
distinct count is one explode + one hash aggregate — never a range
self-join, never unbounded distinct state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table

#: trailing window length in days for the MAU denominator.
MAU_WINDOW_D = 30


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "stickiness_rolling_mau",
        oracle=f"""
WITH du AS (
    SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
           user_id
    FROM events
), dau AS (
    SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY 1
), fan AS (
    SELECT (du.day + k) AS wday, du.user_id
    FROM du, LATERAL (SELECT unnest(generate_series(0,
                      {MAU_WINDOW_D - 1})) AS k)
), mau AS (
    SELECT wday, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
    FROM fan GROUP BY 1
)
SELECT d.day AS day_epoch_days, d.dau, m.mau,
       {stable_round_sql('CAST(d.dau AS DOUBLE) / m.mau', 6)}
           AS stickiness
FROM dau d JOIN mau m ON m.wday = d.day
""",
        doc=f"DAU / trailing-{MAU_WINDOW_D}-day-MAU stickiness per "
        f"day: the distinct (day, user) activity table fans each "
        f"fact FORWARD into the {MAU_WINDOW_D} windows that trail "
        f"over it (bounded {MAU_WINDOW_D}x explode of user-id pairs "
        f"— the sliding_distinct_users pattern at daily grain), so "
        f"rolling distinct users is one hash aggregate per window "
        f"day with no range self-join. Reported only for days that "
        f"have activity (join against DAU). At 100 TB the exact "
        f"distinct swaps for the HLL sketch with the identical "
        f"fan-out — hll_sink maintains exactly this state "
        f"continuously.",
    )
    def stickiness_rolling_mau(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        du = (
            load_table(spark, sf_dir, "events")
            .select(
                F.floor(F.unix_timestamp("ts") / F.lit(86400))
                .cast("long")
                .alias("day"),
                "user_id",
            )
            .distinct()
        )
        dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
        fan = du.select(
            "day",
            "user_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(MAU_WINDOW_D - 1))
            ).alias("k"),
        ).select((F.col("day") + F.col("k")).alias("wday"), "user_id")
        mau = fan.groupBy("wday").agg(
            F.countDistinct("user_id").alias("mau")
        )
        return (
            dau.join(mau, dau.day == mau.wday)
            .select(
                F.col("day").alias("day_epoch_days"),
                "dau",
                "mau",
                stable_round(
                    F.col("dau").cast("double") / F.col("mau"), 6
                ).alias("stickiness"),
            )
        )


_register()
