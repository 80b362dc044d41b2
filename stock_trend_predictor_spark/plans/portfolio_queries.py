"""Portfolio-level analytics: the pairs-trading spread signal and the
equal-weight portfolio summary.

These consume the cross-sectional building blocks (hourly return
grid, cointegration hedge ratios) and produce what a strategy
actually trades on: a z-scored spread with entry flags, and the
portfolio's return / risk / drawdown summary. Everything reduces to
the hours-sized grid before any window — raw ticks are touched once,
in the resample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stock_trend_predictor_spark.functions.exact import (
    DECIMAL_T,
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table

#: rolling window (hours) for the spread z-score.
SPREAD_WIN = 24
#: z-score magnitude that flags a tradeable divergence.
SPREAD_ENTRY_Z = 2.0

_HOURLY_CTE = """
hourly AS (
    SELECT event_type AS symbol,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           arg_min(value, ts) AS first_px,
           arg_max(value, ts) AS px
    FROM events GROUP BY 1, 2
)
"""


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    # ------------------------------------------------------------------
    @register(
        "pairs_spread_zscore",
        oracle=f"""
WITH {_HOURLY_CTE.strip()},
aligned AS (
    SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.hour,
           a.px AS pa, b.px AS pb
    FROM hourly a JOIN hourly b USING (hour)
    WHERE a.symbol < b.symbol
), ols AS (
    SELECT sym_a, sym_b, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(pa AS DECIMAL(27,6))) AS DOUBLE) AS sa,
           CAST(SUM(CAST(pb AS DECIMAL(27,6))) AS DOUBLE) AS sb,
           CAST(SUM(CAST(pa * pb AS DECIMAL(27,6))) AS DOUBLE) AS sab,
           CAST(SUM(CAST(pb * pb AS DECIMAL(27,6))) AS DOUBLE) AS sbb
    FROM aligned GROUP BY 1, 2
), spread AS (
    SELECT al.sym_a, al.sym_b, al.hour,
           al.pa - ((o.sa - ((o.n * o.sab - o.sa * o.sb)
                              / (o.n * o.sbb - o.sb * o.sb)) * o.sb) / o.n)
                 - ((o.n * o.sab - o.sa * o.sb)
                    / (o.n * o.sbb - o.sb * o.sb)) * al.pb AS e
    FROM aligned al
    JOIN ols o ON o.sym_a = al.sym_a AND o.sym_b = al.sym_b
), win AS (
    SELECT sym_a, sym_b, hour, e,
           CAST(SUM(CAST(e AS DECIMAL(27,6))) OVER w AS DOUBLE) AS se,
           CAST(SUM(CAST(e * e AS DECIMAL(38,12))) OVER w AS DOUBLE) AS see,
           COUNT(*) OVER w AS cnt
    FROM spread
    WINDOW w AS (PARTITION BY sym_a, sym_b ORDER BY hour
                 ROWS BETWEEN {SPREAD_WIN - 1} PRECEDING AND CURRENT ROW)
), scored AS (
    SELECT sym_a, sym_b, hour, e, cnt,
           (e - se / cnt)
           / sqrt(greatest((see - se * se / cnt) / (cnt - 1), 1e-30)) AS z
    FROM win
)
SELECT sym_a, sym_b, hour,
       {stable_round_sql('e', 6)} AS spread,
       CASE WHEN cnt = {SPREAD_WIN}
            THEN {stable_round_sql('z', 6)} END AS zscore,
       CASE WHEN cnt = {SPREAD_WIN}
            THEN abs(z) > {SPREAD_ENTRY_Z} END AS entry_signal
FROM scored
""",
        doc=f"The pairs-trading signal: the hedge-regression residual "
        f"spread per unordered symbol pair, z-scored against its "
        f"rolling {SPREAD_WIN}-hour mean/std, with |z| > "
        f"{SPREAD_ENTRY_Z} entry flags — what the "
        "cointegration_engle_granger screen feeds in production. "
        "Same OLS sufficient sums (broadcast back, one row per "
        "pair); the rolling stats are decimal window sums over the "
        "hours-sized spread series — NULL until a full window, "
        "std floored at 1e-30 to keep the flat-window z finite and "
        "identical cross-engine. Pairs are unordered (a < b): the "
        "spread is direction-specific, one direction is the "
        "convention.",
    )
    def pairs_spread_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        hourly = ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("hour", "ts").alias("hour"),
        ).agg(F.max_by("value", "ts").alias("px"))
        a = hourly.select(
            F.col("symbol").alias("sym_a"), "hour", F.col("px").alias("pa")
        )
        b = hourly.select(
            F.col("symbol").alias("sym_b"), "hour", F.col("px").alias("pb")
        )
        aligned = a.join(b, "hour").where(F.col("sym_a") < F.col("sym_b"))
        pa, pb = F.col("pa"), F.col("pb")
        ols = aligned.groupBy("sym_a", "sym_b").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(pa.cast(DECIMAL_T)).cast("double").alias("sa"),
            F.sum(pb.cast(DECIMAL_T)).cast("double").alias("sb"),
            F.sum((pa * pb).cast(DECIMAL_T)).cast("double").alias("sab"),
            F.sum((pb * pb).cast(DECIMAL_T)).cast("double").alias("sbb"),
        )
        beta = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")) / (
            F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")
        )
        alpha = (F.col("sa") - beta * F.col("sb")) / F.col("n")
        spread = aligned.join(F.broadcast(ols), ["sym_a", "sym_b"]).select(
            "sym_a",
            "sym_b",
            "hour",
            (pa - alpha - beta * pb).alias("e"),
        )
        w = (
            Window.partitionBy("sym_a", "sym_b")
            .orderBy("hour")
            .rowsBetween(-(SPREAD_WIN - 1), 0)
        )
        e = F.col("e")
        win = spread.withColumns(
            {
                "se": F.sum(e.cast(DECIMAL_T)).over(w).cast("double"),
                "see": F.sum((e * e).cast("decimal(38,12)"))
                .over(w)
                .cast("double"),
                "cnt": F.count(F.lit(1)).over(w),
            }
        )
        cnt = F.col("cnt")
        z = (e - F.col("se") / cnt) / F.sqrt(
            F.greatest(
                (F.col("see") - F.col("se") * F.col("se") / cnt) / (cnt - 1),
                F.lit(1e-30),
            )
        )
        full = cnt == SPREAD_WIN
        return win.select(
            "sym_a",
            "sym_b",
            "hour",
            stable_round(e, 6).alias("spread"),
            F.when(full, stable_round(z, 6)).alias("zscore"),
            F.when(full, F.abs(z) > SPREAD_ENTRY_Z).alias("entry_signal"),
        )

    # ------------------------------------------------------------------
    @register(
        "portfolio_equal_weight_summary",
        oracle=f"""
WITH {_HOURLY_CTE.strip()},
lv AS (
    SELECT hour,
           CAST(SUM(CAST(ln(px) AS DECIMAL(27,18))) AS DOUBLE) / count(*)
               AS log_value
    FROM hourly WHERE px > 0 GROUP BY 1
), cum AS (
    SELECT hour, log_value,
           log_value - lag(log_value) OVER (ORDER BY hour) AS r,
           max(log_value) OVER w AS peak,
           first_value(log_value) OVER (ORDER BY hour) AS first_log
    FROM lv
    WINDOW w AS (ORDER BY hour
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), sums AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(r) AS BIGINT) AS n_rets,
           CAST(SUM(CAST(r AS DECIMAL(27,18))) AS DOUBLE) AS sr,
           CAST(SUM(CAST(r * r AS DECIMAL(27,18))) AS DOUBLE) AS srr,
           max_by(log_value, hour) - any_value(first_log) AS total_log,
           min(log_value - peak) AS max_dd_log
    FROM cum
)
SELECT n AS n_hours,
       {stable_round_sql('exp(total_log) - 1.0', 6)} AS total_return,
       {stable_round_sql('sr / n_rets', 8)} AS mean_hourly_ret,
       {stable_round_sql(
           '(sr / n_rets)'
           ' / sqrt((srr - sr * sr / n_rets) / (n_rets - 1))', 6)}
           AS sharpe_hourly,
       {stable_round_sql('1.0 - exp(least(0.0, max_dd_log))', 6)}
           AS max_drawdown
FROM sums
""",
        doc="Equal-weight (geometric-mean) portfolio summary over the "
        "hourly grid: the portfolio log-value is the cross-sectional "
        "mean of ln(price) per hour — decimal-summed, so the series "
        "is order-independent — hourly returns are its first "
        "differences, total return is exp(last - first) - 1, Sharpe "
        "comes from decimal sufficient moments of the log returns, "
        "and max drawdown is 1 - exp(min(log_value - running peak)) "
        "— the portfolio twin of max_drawdown_per_symbol. The "
        "single-partition windows run over HOURS (744 rows for a "
        "month at ANY data scale), never ticks, which is why the "
        "global ORDER BY is safe here and only here; everything "
        "tick-sized was map-side combined in the resample.",
    )
    def portfolio_equal_weight_summary(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        dt = "decimal(27,18)"
        ev = load_table(spark, sf_dir, "events")
        hourly = ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("hour", "ts").alias("hour"),
        ).agg(F.max_by("value", "ts").alias("px"))
        lv = hourly.where(F.col("px") > 0).groupBy("hour").agg(
            (
                F.sum(F.log("px").cast(dt)).cast("double")
                / F.count(F.lit(1))
            ).alias("log_value")
        )
        ordered = Window.orderBy("hour")
        run = ordered.rowsBetween(Window.unboundedPreceding, 0)
        cum = lv.withColumns(
            {
                "r": F.col("log_value") - F.lag("log_value").over(ordered),
                "peak": F.max("log_value").over(run),
                "first_log": F.first("log_value").over(ordered),
            }
        )
        r = F.col("r")
        sums = cum.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(r).alias("n_rets"),
            F.sum(r.cast(dt)).cast("double").alias("sr"),
            F.sum((r * r).cast(dt)).cast("double").alias("srr"),
            (F.max_by("log_value", "hour") - F.any_value("first_log")).alias(
                "total_log"
            ),
            F.min(F.col("log_value") - F.col("peak")).alias("max_dd_log"),
        )
        n_rets = F.col("n_rets")
        sr, srr = F.col("sr"), F.col("srr")
        return sums.select(
            F.col("n").alias("n_hours"),
            stable_round(F.exp(F.col("total_log")) - 1.0, 6).alias(
                "total_return"
            ),
            stable_round(sr / n_rets, 8).alias("mean_hourly_ret"),
            stable_round(
                (sr / n_rets)
                / F.sqrt((srr - sr * sr / n_rets) / (n_rets - 1)),
                6,
            ).alias("sharpe_hourly"),
            stable_round(
                1.0 - F.exp(F.least(F.lit(0.0), F.col("max_dd_log"))), 6
            ).alias("max_drawdown"),
        )


_register()
