"""Experimentation & operations analytics: A/B testing, seasonal
anomaly detection, and fulfillment lead times.

- ``ab_conversion_ztest``: the two-proportion z-test every
  experimentation platform runs, over deterministic hash-split arms.
- ``seasonal_residual_outliers``: anomalies AFTER removing trend and
  hour-of-day seasonality — the composition (decompose -> robust
  z-score) that raw-value thresholds (event_value_anomaly_mad) can't
  express: a normal 3am dip is not an alert, an abnormal one is.
- ``ship_lead_time_by_priority``: order-to-ship latency percentiles
  per priority class — the SLA view of the orders/lineitem join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    DECIMAL_T,
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import (
    TICKS_ORACLE_CTE,
    load_table,
    ticks,
)

#: robust z-score cut for the seasonal-residual outlier flag.
OUTLIER_Z = 3.5
#: MAD-to-sigma consistency constant for normal data.
MAD_K = 1.4826


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "ab_conversion_ztest",
        oracle=f"""
WITH tagged AS (
    SELECT CAST(user_id % 2 AS BIGINT) AS arm,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
    FROM events
), sums AS (
    SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
                AS BIGINT) AS c_a,
           CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
                AS BIGINT) AS c_b
    FROM tagged
), stats AS (
    SELECT n_a, c_a, n_b, c_b,
           CAST(c_a AS DOUBLE) / n_a AS p_a,
           CAST(c_b AS DOUBLE) / n_b AS p_b,
           CAST(c_a + c_b AS DOUBLE) / (n_a + n_b) AS pp
    FROM sums
)
SELECT n_a, c_a, n_b, c_b,
       {stable_round_sql('p_a', 6)} AS rate_a,
       {stable_round_sql('p_b', 6)} AS rate_b,
       {stable_round_sql(
           '(p_a - p_b) / sqrt(pp * (1.0 - pp)'
           ' * (1.0 / n_a + 1.0 / n_b))', 6)} AS z,
       CASE WHEN abs((p_a - p_b) / sqrt(pp * (1.0 - pp)
                 * (1.0 / n_a + 1.0 / n_b))) > 1.96
            THEN 1 ELSE 0 END AS significant
FROM stats
""",
        doc="Two-proportion z-test for the purchase share of events "
        "between deterministic user-assigned arms (user_id parity — "
        "assignment at the user grain, as an experimentation "
        "platform would persist it; the metric is event-level so it "
        "stays non-degenerate at any scale): pooled-variance z with "
        "the 95% significance flag. One map-side-combinable 4-count "
        "reduction; the statistic is a fixed double expression on "
        "exact integers. The experiment-analysis primitive the "
        "p-chart (ongoing monitoring) and this (two-arm comparison) "
        "bracket between them.",
    )
    def ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
        tagged = load_table(spark, sf_dir, "events").select(
            (F.col("user_id") % 2).alias("arm"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("conv"),
        )
        sums = tagged.agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
            F.sum(
                F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)
            ).alias("c_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
            F.sum(
                F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)
            ).alias("c_b"),
        )
        p_a = F.col("c_a").cast("double") / F.col("n_a")
        p_b = F.col("c_b").cast("double") / F.col("n_b")
        pp = (F.col("c_a") + F.col("c_b")).cast("double") / (
            F.col("n_a") + F.col("n_b")
        )
        z = (p_a - p_b) / F.sqrt(
            pp * (F.lit(1.0) - pp)
            * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
        )
        return sums.select(
            "n_a",
            "c_a",
            "n_b",
            "c_b",
            stable_round(p_a, 6).alias("rate_a"),
            stable_round(p_b, 6).alias("rate_b"),
            stable_round(z, 6).alias("z"),
            F.when(F.abs(z) > 1.96, 1).otherwise(0).alias("significant"),
        )

    @register(
        "seasonal_residual_outliers",
        oracle=f"""
WITH {TICKS_ORACLE_CTE.strip()},
trended AS (
    SELECT symbol, ts, tick_id, close,
           CASE WHEN COUNT(*) OVER w = 25 THEN
               CAST(SUM(CAST(close AS DECIMAL(27,6))) OVER w AS DOUBLE) / 25
           END AS trend
    FROM ticks
    WINDOW w AS (PARTITION BY symbol ORDER BY ts, tick_id
                 ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
), det AS (
    SELECT symbol, ts, tick_id, close,
           close - trend AS detrended,
           CAST(hour(ts) AS BIGINT) AS hod
    FROM trended WHERE trend IS NOT NULL
), seas AS (
    SELECT symbol, hod,
           CAST(SUM(CAST(detrended AS DECIMAL(27,6))) AS DOUBLE)
               / count(*) AS seasonal
    FROM det GROUP BY 1, 2
), resid AS (
    SELECT d.symbol, d.ts, d.tick_id, d.close,
           d.detrended - s.seasonal AS r
    FROM det d JOIN seas s ON s.symbol = d.symbol AND s.hod = d.hod
), med AS (
    SELECT symbol, quantile_cont(r, 0.5) AS med_r FROM resid GROUP BY 1
), mad AS (
    SELECT r.symbol, m.med_r,
           quantile_cont(abs(r.r - m.med_r), 0.5) AS mad_r
    FROM resid r JOIN med m ON r.symbol = m.symbol
    GROUP BY 1, 2
)
SELECT r.symbol, r.ts, r.tick_id, r.close,
       {stable_round_sql('r.r', 6)} AS residual,
       {stable_round_sql(
           '(r.r - m.med_r) / ({MAD_K} * m.mad_r)'.format(MAD_K=MAD_K),
           6)} AS robust_z
FROM resid r JOIN mad m ON r.symbol = m.symbol
WHERE abs((r.r - m.med_r) / ({MAD_K} * m.mad_r)) > {OUTLIER_Z}
""",
        doc=f"Seasonally-adjusted anomaly detection: residuals from "
        f"the classical decompose (centered 25-tick trend + hour-of-"
        f"day seasonal, both decimal-exact — the same construction "
        f"as seasonal_decompose_hod), robust-z-scored against the "
        f"per-symbol median/MAD (x{MAD_K}), reporting ticks beyond "
        f"|z| > {OUTLIER_Z}. Catches the 3am spike that is abnormal "
        f"FOR 3am, which a raw-value MAD screen "
        f"(event_value_anomaly_mad) either misses or drowns in "
        f"false positives. One symbol sort + a 24-row seasonal "
        f"broadcast + two one-row-per-symbol robust-stat passes.",
    )
    def seasonal_residual_outliers(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        t = ticks(spark, sf_dir)
        w = (
            Window.partitionBy("symbol")
            .orderBy("ts", "tick_id")
            .rowsBetween(-12, 12)
        )
        trended = t.withColumns(
            {
                "_s": F.sum(F.col("close").cast(DECIMAL_T))
                .over(w)
                .cast("double"),
                "_cnt": F.count(F.lit(1)).over(w),
            }
        ).withColumn(
            "trend",
            F.when(F.col("_cnt") == 25, F.col("_s") / 25),
        )
        det = trended.where(F.col("trend").isNotNull()).select(
            "symbol",
            "ts",
            "tick_id",
            "close",
            (F.col("close") - F.col("trend")).alias("detrended"),
            F.hour("ts").cast("long").alias("hod"),
        )
        seas = det.groupBy("symbol", "hod").agg(
            (
                F.sum(F.col("detrended").cast(DECIMAL_T)).cast("double")
                / F.count(F.lit(1))
            ).alias("seasonal")
        )
        resid = det.join(F.broadcast(seas), ["symbol", "hod"]).select(
            "symbol",
            "ts",
            "tick_id",
            "close",
            (F.col("detrended") - F.col("seasonal")).alias("r"),
        )
        med = resid.groupBy("symbol").agg(
            F.percentile("r", F.lit(0.5)).alias("med_r")
        )
        mad = (
            resid.join(F.broadcast(med), "symbol")
            .groupBy("symbol", "med_r")
            .agg(
                F.percentile(
                    F.abs(F.col("r") - F.col("med_r")), F.lit(0.5)
                ).alias("mad_r")
            )
        )
        z = (F.col("r") - F.col("med_r")) / (MAD_K * F.col("mad_r"))
        return (
            resid.join(F.broadcast(mad), "symbol")
            .where(F.abs(z) > OUTLIER_Z)
            .select(
                "symbol",
                "ts",
                "tick_id",
                "close",
                stable_round("r", 6).alias("residual"),
                stable_round(z, 6).alias("robust_z"),
            )
        )

    @register(
        "ship_lead_time_by_priority",
        oracle=f"""
WITH lead AS (
    SELECT o.o_orderpriority,
           (CAST(floor(epoch(l.l_shipdate)) AS BIGINT)
            - CAST(floor(epoch(o.o_orderdate)) AS BIGINT)) / 86400.0
               AS lead_days
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       {stable_round_sql('quantile_cont(lead_days, 0.5)', 6)} AS p50_days,
       {stable_round_sql('quantile_cont(lead_days, 0.9)', 6)} AS p90_days,
       {stable_round_sql('max(lead_days)', 6)} AS max_days
FROM lead GROUP BY 1
""",
        doc="Order-to-ship lead time percentiles per priority class — "
        "the SLA report of the orders/lineitem join: integer epoch "
        "difference scaled to days, exact interpolated p50/p90 per "
        "priority. One fact join (orders side prunes to two "
        "columns), one 5-group percentile aggregate. The "
        "operational counterpart of q4's late-order counting.",
    )
    def ship_lead_time_by_priority(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderpriority",
            F.unix_timestamp("o_orderdate").cast("long").alias("oes"),
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            F.unix_timestamp("l_shipdate").cast("long").alias("ses"),
        )
        lead = o.join(li, o.o_orderkey == li.l_orderkey).select(
            "o_orderpriority",
            ((F.col("ses") - F.col("oes")) / 86400.0).alias("lead_days"),
        )
        return lead.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_lines"),
            stable_round(
                F.percentile("lead_days", F.lit(0.5)), 6
            ).alias("p50_days"),
            stable_round(
                F.percentile("lead_days", F.lit(0.9)), 6
            ).alias("p90_days"),
            stable_round(F.max("lead_days"), 6).alias("max_days"),
        )


_register()
