"""Technical-indicator tier 2: ATR, OBV, momentum battery, banded
Mann-Kendall trend test, and realized volatility.

The reference is a stock TREND predictor with NO feature pipeline at
all: streaming_processing/features_engineering.py:1-54 only parses the
Kafka JSON and prints to console, and the trainer
(ml_model/predict_from_vm4.py:31) labels movement straight from
close > open on raw rows. This module supplies the rest of
the standard trend-analysis toolbox a user of that pipeline would
reach for next, each as pure Catalyst window expressions over ONE
per-symbol sort — the same shuffle the ticks() view already pays, so
every indicator here is marginal-shuffle-free at 100 TB.

Determinism (the driver value-hashes Spark vs DuckDB):
- Rolling sums accumulate in decimal over a uniquely-ordered
  (ts, tick_id) window; min/max/lag pick exact input doubles.
- sign() comparisons are exact (integer-summed), never float-summed.
- ln() appears only inside stable_round(, 6) outputs (same contract as
  the entropy/perplexity queries, hash-green since round 2).
- Window aggregates are bound to real columns ONCE before deriving
  indicators — Catalyst does not CSE window expressions (see the
  rsi_cutler_14 note; inline reuse planned 37 sliding aggregates).
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
from stock_trend_predictor_spark.sources.tables import (
    TICKS_ORACLE_CTE,
    load_table,
    ticks,
)

#: squared log-returns are ~1e-6..1e-2; (27,18) keeps every stored
#: digit exact so the sum is order-independent (same reasoning as
#: quality_queries.ENTROPY_DECIMAL).
RET2_DECIMAL = "decimal(27,18)"

#: Mann-Kendall band width: pairs (t, t-k) for k = 1..MK_BAND.
MK_BAND = 10


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    # ------------------------------------------------------------------
    @register(
        "atr_14_daily",
        oracle=f"""
WITH bars AS (
    SELECT event_type AS symbol,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS bar_start,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, ts) AS close
    FROM events GROUP BY 1, 2
), tr AS (
    SELECT symbol, bar_start, high, low, close,
           greatest(
               high - low,
               abs(high - coalesce(lag(close) OVER w, high)),
               abs(low - coalesce(lag(close) OVER w, low))) AS tr
    FROM bars
    WINDOW w AS (PARTITION BY symbol ORDER BY bar_start)
), win AS (
    SELECT symbol, bar_start, tr,
           CAST(SUM(CAST(tr AS DECIMAL(27,6))) OVER v AS DOUBLE) AS s_tr,
           COUNT(*) OVER v AS cnt
    FROM tr
    WINDOW v AS (PARTITION BY symbol ORDER BY bar_start
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT symbol, bar_start,
       {stable_round_sql('tr', 6)} AS true_range,
       CASE WHEN cnt = 14
            THEN {stable_round_sql('s_tr / 14', 6)} END AS atr14
FROM win
""",
        doc="Average True Range (14) over daily bars: bars come from "
        "the same min/max/arg_max resample as resample_ohlc_bars, the "
        "true range folds the overnight gap in via the previous close "
        "(first bar degrades to high-low), and ATR is the 14-bar SMA "
        "of TR summed in decimal (the SMA variant over Wilder's "
        "recursion for the same reason as rsi_cutler_14: one window "
        "aggregate, scalable and oracle-exact). Two shuffles total — "
        "the bar group-by and the per-symbol sort — and the bar table "
        "is tiny (symbols x days), so the sort is nearly free at any "
        "scale; the heavy work is the map-side-combinable resample.",
    )
    def atr_14_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        bars = ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").alias("bar_start"),
        ).agg(
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
        )
        w = Window.partitionBy("symbol").orderBy("bar_start")
        bars = bars.withColumn("prev_close", F.lag("close").over(w))
        tr = F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - F.coalesce("prev_close", "high")),
            F.abs(F.col("low") - F.coalesce("prev_close", "low")),
        )
        bars = bars.withColumn("tr", tr)
        v = (
            Window.partitionBy("symbol")
            .orderBy("bar_start")
            .rowsBetween(-13, 0)
        )
        bars = bars.withColumns(
            {
                "_s": F.sum(F.col("tr").cast(DECIMAL_T)).over(v).cast("double"),
                "_cnt": F.count(F.lit(1)).over(v),
            }
        )
        return bars.select(
            "symbol",
            "bar_start",
            stable_round("tr", 6).alias("true_range"),
            F.when(
                F.col("_cnt") == 14, stable_round(F.col("_s") / 14, 6)
            ).alias("atr14"),
        )

    # ------------------------------------------------------------------
    @register(
        "obv_tick_flow",
        oracle=f"""
WITH {TICKS_ORACLE_CTE.strip()},
dirs AS (
    SELECT symbol, ts, tick_id, close,
           CAST(sign(close - open) AS BIGINT) AS dir
    FROM ticks WHERE open IS NOT NULL
)
SELECT symbol, ts, tick_id, close,
       SUM(dir) OVER w AS obv_ticks,
       CAST(SUM(CAST(dir * close AS DECIMAL(27,6))) OVER w AS DOUBLE)
           AS obv_value
FROM dirs
WINDOW w AS (PARTITION BY symbol ORDER BY ts, tick_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
        doc="On-balance volume per symbol. The reference's close-only "
        "tick stream (data_collection/fetch_stock.py:54-58) carries no "
        "volume field, so two documented proxies: obv_ticks "
        "accumulates the up/down direction itself (volume = 1 per "
        "tick, an exact integer sum), obv_value weights each tick by "
        "its price level (direction x close, decimal-summed). Both "
        "running sums share one per-symbol sort — the ticks() view's "
        "existing shuffle — and accumulate exactly, so the cumulative "
        "series is bit-identical cross-engine at any partitioning.",
    )
    def obv_tick_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir).where(F.col("open").isNotNull())
        d = F.signum(F.col("close") - F.col("open")).cast("bigint")
        t = t.withColumn("dir", d)
        w = (
            Window.partitionBy("symbol")
            .orderBy("ts", "tick_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return t.select(
            "symbol",
            "ts",
            "tick_id",
            "close",
            F.sum("dir").over(w).alias("obv_ticks"),
            F.sum((F.col("dir") * F.col("close")).cast(DECIMAL_T))
            .over(w)
            .cast("double")
            .alias("obv_value"),
        )

    # ------------------------------------------------------------------
    @register(
        "roc_momentum_battery",
        oracle=f"""
WITH {TICKS_ORACLE_CTE.strip()},
win AS (
    SELECT symbol, ts, tick_id, close,
           lag(close, 10) OVER s AS close_10,
           max(close) OVER v AS hh14,
           min(close) OVER v AS ll14,
           COUNT(*) OVER v AS cnt
    FROM ticks
    WINDOW s AS (PARTITION BY symbol ORDER BY ts, tick_id),
           v AS (PARTITION BY symbol ORDER BY ts, tick_id
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts, tick_id, close,
       {stable_round_sql('close - close_10', 6)} AS momentum10,
       CASE WHEN close_10 <> 0
            THEN {stable_round_sql('100.0 * (close - close_10) / close_10', 6)}
       END AS roc10,
       CASE WHEN cnt = 14 AND hh14 <> ll14
            THEN {stable_round_sql('-100.0 * (hh14 - close) / (hh14 - ll14)', 6)}
       END AS williams_r14
FROM win
""",
        doc="Momentum battery per symbol: 10-tick momentum (close "
        "minus lag-10 close), 10-tick rate-of-change in percent — the "
        "per-symbol momentum features the reference pipeline never "
        "computed (features_engineering.py:1-54 parses and prints "
        "only) — and "
        "Williams %R over the last 14 closes (rolling max/min pick "
        "exact input doubles, so no summation error exists at all). "
        "The lag and the rolling extrema share one per-symbol sort; "
        "rows before a full lookback yield NULL rather than a "
        "truncated-window lie.",
    )
    def roc_momentum_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir)
        s = Window.partitionBy("symbol").orderBy("ts", "tick_id")
        v = s.rowsBetween(-13, 0)
        t = t.withColumns(
            {
                "close_10": F.lag("close", 10).over(s),
                "hh14": F.max("close").over(v),
                "ll14": F.min("close").over(v),
                "cnt": F.count(F.lit(1)).over(v),
            }
        )
        c, c10 = F.col("close"), F.col("close_10")
        hh, ll = F.col("hh14"), F.col("ll14")
        return t.select(
            "symbol",
            "ts",
            "tick_id",
            "close",
            stable_round(c - c10, 6).alias("momentum10"),
            F.when(c10 != 0, stable_round(100.0 * (c - c10) / c10, 6)).alias(
                "roc10"
            ),
            F.when(
                (F.col("cnt") == 14) & (hh != ll),
                stable_round(-100.0 * (hh - c) / (hh - ll), 6),
            ).alias("williams_r14"),
        )

    # ------------------------------------------------------------------
    _mk_lag_cols = ",\n           ".join(
        f"lag(close, {k}) OVER s AS c{k}" for k in range(1, MK_BAND + 1)
    )
    _mk_union = "\n    UNION ALL ".join(
        f"SELECT symbol, close - c{k} AS diff FROM lagged WHERE c{k} IS NOT NULL"
        for k in range(1, MK_BAND + 1)
    )

    @register(
        "mann_kendall_banded",
        oracle=f"""
WITH {TICKS_ORACLE_CTE.strip()},
lagged AS (
    SELECT symbol, close,
           {_mk_lag_cols}
    FROM ticks
    WINDOW s AS (PARTITION BY symbol ORDER BY ts, tick_id)
), pairs AS (
    {_mk_union}
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_pairs,
       SUM(CAST(sign(diff) AS BIGINT)) AS s_stat,
       {stable_round_sql('CAST(SUM(CAST(sign(diff) AS BIGINT)) AS DOUBLE)'
                         ' / count(*)', 6)} AS trend_score
FROM pairs GROUP BY 1
""",
        doc=f"Banded Mann-Kendall trend test per symbol: S = sum of "
        f"sign(x_t - x_(t-k)) over all ticks and bands k = 1..{MK_BAND}. "
        "The classic test sums over ALL O(n^2) pairs — quadratic per "
        "key, unusable on a 100 TB hypertable — so this is the banded "
        "restriction (only pairs within MK_BAND steps), which keeps "
        "the monotone-trend signal, is linear in n, and needs exactly "
        "one per-symbol sort producing all ten lag columns at once "
        "(stack() unpivots, no re-sort per band). sign() is exact and "
        "integer-summed, so S is bit-deterministic; trend_score = "
        "S / n_pairs in [-1, 1] is the per-symbol monotony verdict — "
        "the distributed, testable form of the reference's up/down "
        "movement label (ml_model/predict_from_vm4.py:31).",
    )
    def mann_kendall_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir)
        s = Window.partitionBy("symbol").orderBy("ts", "tick_id")
        t = t.withColumns(
            {f"c{k}": F.lag("close", k).over(s) for k in range(1, MK_BAND + 1)}
        )
        stack_args = ", ".join(f"c{k}" for k in range(1, MK_BAND + 1))
        pairs = t.selectExpr(
            "symbol",
            "close",
            f"stack({MK_BAND}, {stack_args}) AS ck",
        ).where(F.col("ck").isNotNull())
        sgn = F.signum(F.col("close") - F.col("ck")).cast("bigint")
        return pairs.groupBy("symbol").agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(sgn).alias("s_stat"),
            stable_round(
                F.sum(sgn).cast("double") / F.count(F.lit(1)), 6
            ).alias("trend_score"),
        )

    # ------------------------------------------------------------------
    @register(
        "realized_vol_daily",
        oracle=f"""
WITH {TICKS_ORACLE_CTE.strip()},
rets AS (
    SELECT symbol,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           ln(close / open) AS r
    FROM ticks
    WHERE open IS NOT NULL AND open > 0 AND close > 0
)
SELECT symbol, day,
       CAST(count(*) AS BIGINT) AS n_returns,
       {stable_round_sql(
           'sqrt(CAST(SUM(CAST(r * r AS DECIMAL(27,18))) AS DOUBLE))', 6)}
           AS realized_vol,
       {stable_round_sql(
           'CAST(SUM(CAST(abs(r) AS DECIMAL(27,18))) AS DOUBLE) / count(*)',
           6)} AS mean_abs_ret
FROM rets GROUP BY 1, 2
""",
        doc="Realized volatility per symbol-day: sqrt of the sum of "
        "squared tick-level log returns (the canonical realized-"
        "variance estimator), plus mean absolute return. Log returns "
        "come from the ticks() view's existing lag (open = previous "
        "close), so the only new work is one map-side-combinable "
        "aggregate — r^2 terms are summed in decimal(27,18) (they are "
        "~1e-6; a (27,6) cast would zero them) making the sum order-"
        "independent, and ln() sits inside the same stable_round(6) "
        "contract the entropy queries have held hash-green since "
        "round 2. Grouping is by the RETURN's day (boundary returns "
        "attach to the later day) — documented, deterministic.",
    )
    def realized_vol_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir).where(
            F.col("open").isNotNull() & (F.col("open") > 0) & (F.col("close") > 0)
        )
        r = F.log(F.col("close") / F.col("open"))
        rets = t.select(
            "symbol",
            F.date_trunc("day", "ts").alias("day"),
            r.alias("r"),
        )
        rr = F.col("r") * F.col("r")
        return rets.groupBy("symbol", "day").agg(
            F.count(F.lit(1)).alias("n_returns"),
            stable_round(
                F.sqrt(F.sum(rr.cast(RET2_DECIMAL)).cast("double")), 6
            ).alias("realized_vol"),
            stable_round(
                F.sum(F.abs(F.col("r")).cast(RET2_DECIMAL)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_abs_ret"),
        )

    # ------------------------------------------------------------------
    _ts_union = "\n    UNION ALL ".join(
        f"SELECT symbol, (close - c{k}) / {k}.0 AS slope"
        f" FROM lagged WHERE c{k} IS NOT NULL"
        for k in range(1, MK_BAND + 1)
    )

    @register(
        "theil_sen_banded_slope",
        oracle=f"""
WITH {TICKS_ORACLE_CTE.strip()},
lagged AS (
    SELECT symbol, close,
           {_mk_lag_cols_sql()}
    FROM ticks
    WINDOW s AS (PARTITION BY symbol ORDER BY ts, tick_id)
), slopes AS (
    {_ts_union}
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_slopes,
       {stable_round_sql('quantile_cont(slope, 0.5)', 6)} AS ts_slope,
       {stable_round_sql('quantile_cont(slope, 0.25)', 6)} AS slope_q1,
       {stable_round_sql('quantile_cont(slope, 0.75)', 6)} AS slope_q3
FROM slopes GROUP BY 1
""",
        doc=f"Banded Theil-Sen trend estimator per symbol: the median "
        f"of per-step slopes (x_t - x_(t-k)) / k over bands "
        f"k = 1..{MK_BAND} — the robust companion to the banded "
        "Mann-Kendall S (same banding rationale: the classic "
        "all-pairs estimator is O(n^2) per key; the banded form keeps "
        "the robustness to outlier ticks and is linear). The same "
        "one-sort ten-lag stack feeds both queries. Median/quartiles "
        "are exact interpolated percentiles over the slope multiset — "
        "order-independent by definition, so no decimal trick is "
        "needed; both engines sort the identical multiset and average "
        "the identical middle doubles.",
    )
    def theil_sen_banded_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir)
        s = Window.partitionBy("symbol").orderBy("ts", "tick_id")
        t = t.withColumns(
            {f"c{k}": F.lag("close", k).over(s) for k in range(1, MK_BAND + 1)}
        )
        stack_args = ", ".join(
            f"(close - c{k}) / {k}.0D" for k in range(1, MK_BAND + 1)
        )
        slopes = t.selectExpr(
            "symbol", f"stack({MK_BAND}, {stack_args}) AS slope"
        ).where(F.col("slope").isNotNull())
        return slopes.groupBy("symbol").agg(
            F.count(F.lit(1)).alias("n_slopes"),
            stable_round(F.percentile("slope", F.lit(0.5)), 6).alias(
                "ts_slope"
            ),
            stable_round(F.percentile("slope", F.lit(0.25)), 6).alias(
                "slope_q1"
            ),
            stable_round(F.percentile("slope", F.lit(0.75)), 6).alias(
                "slope_q3"
            ),
        )

    # ------------------------------------------------------------------
    @register(
        "beta_vs_market_hourly",
        oracle=f"""
WITH hourly AS (
    SELECT event_type AS symbol,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           arg_min(value, ts) AS first_px,
           arg_max(value, ts) AS last_px
    FROM events GROUP BY 1, 2
), rets AS (
    SELECT symbol, hour, (last_px - first_px) / first_px AS r
    FROM hourly WHERE first_px > 0
), market AS (
    SELECT hour,
           CAST(SUM(CAST(r AS DECIMAL(27,18))) AS DOUBLE) / count(*) AS rm
    FROM rets GROUP BY 1
), joined AS (
    SELECT s.symbol, s.r AS rs, m.rm FROM rets s JOIN market m USING (hour)
), sums AS (
    SELECT symbol, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(rs AS DECIMAL(27,18))) AS DOUBLE) AS s_rs,
           CAST(SUM(CAST(rm AS DECIMAL(27,18))) AS DOUBLE) AS s_rm,
           CAST(SUM(CAST(rs * rm AS DECIMAL(27,18))) AS DOUBLE) AS s_rsrm,
           CAST(SUM(CAST(rm * rm AS DECIMAL(27,18))) AS DOUBLE) AS s_rmrm,
           CAST(SUM(CAST(rs * rs AS DECIMAL(27,18))) AS DOUBLE) AS s_rsrs
    FROM joined GROUP BY 1
)
SELECT symbol, n AS n_hours,
       {stable_round_sql(
           '(n * s_rsrm - s_rs * s_rm) / (n * s_rmrm - s_rm * s_rm)', 6)}
           AS beta,
       {stable_round_sql(
           '(s_rs - (n * s_rsrm - s_rs * s_rm)'
           ' / (n * s_rmrm - s_rm * s_rm) * s_rm) / n', 6)} AS alpha,
       {stable_round_sql(
           '(n * s_rsrm - s_rs * s_rm)'
           ' / sqrt((n * s_rmrm - s_rm * s_rm) * (n * s_rsrs - s_rs * s_rs))',
           6)} AS corr_mkt
FROM sums
""",
        doc="Per-symbol CAPM beta against the equal-weight market: "
        "within-hour returns per symbol (arg_min/arg_max bar "
        "endpoints), the market return as the cross-sectional mean "
        "per hour, then beta/alpha/correlation from decimal-exact "
        "sufficient sums. This is the cross-SECTIONAL companion to "
        "the per-symbol indicators — the reference's per-ticker "
        "pipeline (ml_model/predict_from_vm4.py:29-39 fits each symbol "
        "in isolation) has no notion of market co-movement at all. "
        "Shape at 100 TB: one combinable (symbol, hour) resample, "
        "a market table of #hours rows (AQE broadcasts it back), one "
        "combinable per-symbol aggregate — no window over the full "
        "series, no driver state. Products of ~1e-3 returns are "
        "summed at decimal(27,18) so every stored digit is exact.",
    )
    def beta_vs_market_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        hourly = ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("hour", "ts").alias("hour"),
        ).agg(
            F.min_by("value", "ts").alias("first_px"),
            F.max_by("value", "ts").alias("last_px"),
        )
        rets = hourly.where(F.col("first_px") > 0).select(
            "symbol",
            "hour",
            ((F.col("last_px") - F.col("first_px")) / F.col("first_px")).alias(
                "r"
            ),
        )
        dt = "decimal(27,18)"
        market = rets.groupBy("hour").agg(
            (F.sum(F.col("r").cast(dt)).cast("double") / F.count(F.lit(1))).alias(
                "rm"
            )
        )
        joined = rets.join(market, "hour").select(
            "symbol", F.col("r").alias("rs"), "rm"
        )
        rs, rm = F.col("rs"), F.col("rm")
        sums = joined.groupBy("symbol").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(rs.cast(dt)).cast("double").alias("s_rs"),
            F.sum(rm.cast(dt)).cast("double").alias("s_rm"),
            F.sum((rs * rm).cast(dt)).cast("double").alias("s_rsrm"),
            F.sum((rm * rm).cast(dt)).cast("double").alias("s_rmrm"),
            F.sum((rs * rs).cast(dt)).cast("double").alias("s_rsrs"),
        )
        n = F.col("n")
        s_rs, s_rm = F.col("s_rs"), F.col("s_rm")
        s_rsrm, s_rmrm, s_rsrs = (
            F.col("s_rsrm"),
            F.col("s_rmrm"),
            F.col("s_rsrs"),
        )
        beta = (n * s_rsrm - s_rs * s_rm) / (n * s_rmrm - s_rm * s_rm)
        return sums.select(
            "symbol",
            n.alias("n_hours"),
            stable_round(beta, 6).alias("beta"),
            stable_round((s_rs - beta * s_rm) / n, 6).alias("alpha"),
            stable_round(
                (n * s_rsrm - s_rs * s_rm)
                / F.sqrt(
                    (n * s_rmrm - s_rm * s_rm) * (n * s_rsrs - s_rs * s_rs)
                ),
                6,
            ).alias("corr_mkt"),
        )


    # ------------------------------------------------------------------
    @register(
        "seasonal_decompose_hod",
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
    SELECT symbol, ts, tick_id, close, trend,
           close - trend AS detrended,
           CAST(hour(ts) AS BIGINT) AS hod
    FROM trended
), seas AS (
    SELECT symbol, hod,
           CAST(SUM(CAST(detrended AS DECIMAL(27,6))) AS DOUBLE)
               / count(detrended) AS seasonal
    FROM det WHERE detrended IS NOT NULL GROUP BY 1, 2
)
SELECT d.symbol, d.ts, d.tick_id, d.close,
       {stable_round_sql('d.trend', 6)} AS trend,
       {stable_round_sql('s.seasonal', 6)} AS seasonal,
       {stable_round_sql('d.detrended - s.seasonal', 6)} AS residual
FROM det d LEFT JOIN seas s ON s.symbol = d.symbol AND s.hod = d.hod
""",
        doc="Classical seasonal decomposition per symbol: trend = "
        "centered 25-tick moving average (NULL at the edges — never a "
        "truncated-window lie), seasonal = the mean detrended value "
        "per (symbol, hour-of-day), residual = the rest. The additive "
        "decompose every forecasting pipeline runs before modeling; "
        "the reference's features stop at raw rolling means. One "
        "symbol sort for the trend window, one 24-row-per-symbol "
        "seasonal aggregate joined back (AQE broadcast), all sums "
        "decimal-exact. The hour-of-day seasonal table is symbols x "
        "24 rows at ANY data scale.",
    )
    def seasonal_decompose_hod(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir)
        w = (
            Window.partitionBy("symbol")
            .orderBy("ts", "tick_id")
            .rowsBetween(-12, 12)
        )
        t = t.withColumns(
            {
                "_s": F.sum(F.col("close").cast(DECIMAL_T)).over(w).cast(
                    "double"
                ),
                "_cnt": F.count(F.lit(1)).over(w),
            }
        )
        det = t.select(
            "symbol",
            "ts",
            "tick_id",
            "close",
            F.when(F.col("_cnt") == 25, F.col("_s") / 25).alias("trend"),
            F.hour("ts").cast("bigint").alias("hod"),
        ).withColumn("detrended", F.col("close") - F.col("trend"))
        seas = (
            det.where(F.col("detrended").isNotNull())
            .groupBy("symbol", "hod")
            .agg(
                (
                    F.sum(F.col("detrended").cast(DECIMAL_T)).cast("double")
                    / F.count("detrended")
                ).alias("seasonal")
            )
        )
        return det.join(seas, ["symbol", "hod"], "left").select(
            "symbol",
            "ts",
            "tick_id",
            "close",
            stable_round("trend", 6).alias("trend"),
            stable_round("seasonal", 6).alias("seasonal"),
            stable_round(F.col("detrended") - F.col("seasonal"), 6).alias(
                "residual"
            ),
        )

    # ------------------------------------------------------------------
    @register(
        "changepoint_binary_split",
        oracle=f"""
WITH {TICKS_ORACLE_CTE.strip()},
pre AS (
    SELECT symbol, ts, tick_id, close,
           CAST(row_number() OVER s AS BIGINT) AS k,
           CAST(SUM(CAST(close AS DECIMAL(27,6))) OVER s AS DOUBLE) AS sk,
           CAST(SUM(CAST(close * close AS DECIMAL(27,6))) OVER s AS DOUBLE)
               AS ssk
    FROM ticks
    WINDOW s AS (PARTITION BY symbol ORDER BY ts, tick_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), tot AS (
    SELECT symbol, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(close AS DECIMAL(27,6))) AS DOUBLE) AS sn,
           CAST(SUM(CAST(close * close AS DECIMAL(27,6))) AS DOUBLE) AS ssn
    FROM ticks GROUP BY 1
), gains AS (
    SELECT p.symbol, p.ts, p.k, t.n,
           (t.ssn - t.sn * t.sn / t.n)
           - ((p.ssk - p.sk * p.sk / p.k)
              + ((t.ssn - p.ssk)
                 - (t.sn - p.sk) * (t.sn - p.sk) / (t.n - p.k))) AS gain,
           p.sk / p.k AS left_mean,
           (t.sn - p.sk) / (t.n - p.k) AS right_mean
    FROM pre p JOIN tot t USING (symbol)
    WHERE p.k < t.n
), best AS (
    SELECT *, row_number() OVER (PARTITION BY symbol
                                 ORDER BY gain DESC, k) AS rk
    FROM gains
)
SELECT symbol, k AS split_k, ts AS split_ts,
       {stable_round_sql('gain', 6)} AS sse_gain,
       {stable_round_sql('left_mean', 6)} AS left_mean,
       {stable_round_sql('right_mean', 6)} AS right_mean
FROM best WHERE rk = 1
""",
        doc="Single change-point detection per symbol (binary "
        "segmentation, first split): the split k maximizing the SSE "
        "reduction between one-segment and two-segment mean models — "
        "computed for EVERY candidate split from decimal-exact prefix "
        "sums (Sk, SSk) against the per-symbol totals, then argmax "
        "via one rank window with a deterministic (gain DESC, k) "
        "tiebreak. This is the O(n)-per-key form: no nested loop, no "
        "per-candidate rescan — one prefix-sum sort, a totals "
        "broadcast, a rank. Iterating it top-down gives full binary "
        "segmentation; each round is this same plan on the segment "
        "table. Both engines compute identical doubles from identical "
        "exact prefix sums, so the argmax row matches exactly.",
    )
    def changepoint_binary_split(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir)
        s = (
            Window.partitionBy("symbol")
            .orderBy("ts", "tick_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        c = F.col("close")
        pre = t.withColumns(
            {
                "k": F.row_number()
                .over(Window.partitionBy("symbol").orderBy("ts", "tick_id"))
                .cast("bigint"),
                "sk": F.sum(c.cast(DECIMAL_T)).over(s).cast("double"),
                "ssk": F.sum((c * c).cast(DECIMAL_T)).over(s).cast("double"),
            }
        )
        tot = t.groupBy("symbol").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(c.cast(DECIMAL_T)).cast("double").alias("sn"),
            F.sum((c * c).cast(DECIMAL_T)).cast("double").alias("ssn"),
        )
        g = pre.join(tot, "symbol").where(F.col("k") < F.col("n"))
        k, n = F.col("k"), F.col("n")
        sk, ssk = F.col("sk"), F.col("ssk")
        sn, ssn = F.col("sn"), F.col("ssn")
        gain = (ssn - sn * sn / n) - (
            (ssk - sk * sk / k) + ((ssn - ssk) - (sn - sk) * (sn - sk) / (n - k))
        )
        g = g.withColumns(
            {
                "gain": gain,
                "left_mean": sk / k,
                "right_mean": (sn - sk) / (n - k),
            }
        )
        rk = F.row_number().over(
            Window.partitionBy("symbol").orderBy(F.desc("gain"), "k")
        )
        return (
            g.withColumn("rk", rk)
            .where(F.col("rk") == 1)
            .select(
                "symbol",
                F.col("k").alias("split_k"),
                F.col("ts").alias("split_ts"),
                stable_round("gain", 6).alias("sse_gain"),
                stable_round("left_mean", 6).alias("left_mean"),
                stable_round("right_mean", 6).alias("right_mean"),
            )
        )


    # ------------------------------------------------------------------
    @register(
        "crosscorr_leadlag_hourly",
        oracle=f"""
WITH hourly AS (
    SELECT event_type AS symbol,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           arg_min(value, ts) AS first_px,
           arg_max(value, ts) AS last_px
    FROM events GROUP BY 1, 2
), rets AS (
    SELECT symbol, hour, (last_px - first_px) / first_px AS r
    FROM hourly WHERE first_px > 0
), shifted AS (
    SELECT b.symbol AS sym_b, b.r AS rb,
           b.hour + INTERVAL (l.lag) HOUR AS hour,
           CAST(l.lag AS BIGINT) AS lag
    FROM rets b, range(4) l(lag)
), joined AS (
    SELECT a.symbol AS sym_a, s.sym_b, s.lag, a.r AS ra, s.rb
    FROM rets a JOIN shifted s USING (hour)
    WHERE a.symbol <> s.sym_b
), sums AS (
    SELECT sym_a, sym_b, lag, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ra AS DECIMAL(27,18))) AS DOUBLE) AS sa,
           CAST(SUM(CAST(rb AS DECIMAL(27,18))) AS DOUBLE) AS sb,
           CAST(SUM(CAST(ra * rb AS DECIMAL(27,18))) AS DOUBLE) AS sab,
           CAST(SUM(CAST(ra * ra AS DECIMAL(27,18))) AS DOUBLE) AS saa,
           CAST(SUM(CAST(rb * rb AS DECIMAL(27,18))) AS DOUBLE) AS sbb
    FROM joined GROUP BY 1, 2, 3
)
SELECT sym_a, sym_b, lag, n AS n_hours,
       {stable_round_sql(
           '(n * sab - sa * sb)'
           ' / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))', 6)}
           AS xcorr
FROM sums WHERE n >= 30
""",
        doc="Lead-lag cross-correlation matrix: corr(r_a(h), "
        "r_b(h - lag)) for every ordered symbol pair at lags 0-3 "
        "hours — lag 0 is the plain return-correlation matrix, "
        "lag > 0 asks whether b's moves LEAD a's (the cross-symbol "
        "predictive structure the reference's per-ticker models are "
        "blind to; the ACF query is this matrix's diagonal). The lag "
        "shift is a 4x explode of the (symbol, hour) RETURN grid — "
        "hours-sized, not ticks-sized — then one equi-join on the "
        "shifted hour and a combinable decimal sufficient-sum "
        "aggregate per (pair, lag). No window over raw ticks, no "
        "range join; pairs-squared cost is bounded by the symbol "
        "universe, never the data.",
    )
    def crosscorr_leadlag_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        hourly = ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("hour", "ts").alias("hour"),
        ).agg(
            F.min_by("value", "ts").alias("first_px"),
            F.max_by("value", "ts").alias("last_px"),
        )
        rets = hourly.where(F.col("first_px") > 0).select(
            "symbol",
            "hour",
            ((F.col("last_px") - F.col("first_px")) / F.col("first_px")).alias(
                "r"
            ),
        )
        shifted = rets.select(
            F.col("symbol").alias("sym_b"),
            F.col("r").alias("rb"),
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("lag"),
            "hour",
        ).select(
            "sym_b",
            "rb",
            F.col("lag").cast("bigint").alias("lag"),
            F.expr("timestampadd(HOUR, lag, hour)").alias("hour"),
        )
        joined = (
            rets.join(shifted, "hour")
            .where(F.col("symbol") != F.col("sym_b"))
            .select(
                F.col("symbol").alias("sym_a"),
                "sym_b",
                "lag",
                F.col("r").alias("ra"),
                "rb",
            )
        )
        dt = "decimal(27,18)"
        ra, rb = F.col("ra"), F.col("rb")
        sums = joined.groupBy("sym_a", "sym_b", "lag").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(ra.cast(dt)).cast("double").alias("sa"),
            F.sum(rb.cast(dt)).cast("double").alias("sb"),
            F.sum((ra * rb).cast(dt)).cast("double").alias("sab"),
            F.sum((ra * ra).cast(dt)).cast("double").alias("saa"),
            F.sum((rb * rb).cast(dt)).cast("double").alias("sbb"),
        )
        n = F.col("n")
        sa, sb = F.col("sa"), F.col("sb")
        sab, saa, sbb = F.col("sab"), F.col("saa"), F.col("sbb")
        return sums.where(n >= 30).select(
            "sym_a",
            "sym_b",
            "lag",
            n.alias("n_hours"),
            stable_round(
                (n * sab - sa * sb)
                / F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)),
                6,
            ).alias("xcorr"),
        )


    # ------------------------------------------------------------------
    _HURST_NS = (8, 32, 128)
    _ln_ns = [f"ln({n}.0)" for n in _HURST_NS]
    _lx_bar = f"(({' + '.join(_ln_ns)}) / 3.0)"

    @register(
        "hurst_exponent_rs",
        oracle=f"""
WITH {TICKS_ORACLE_CTE.strip()},
numbered AS (
    SELECT symbol, close,
           row_number() OVER (PARTITION BY symbol
                              ORDER BY ts, tick_id) AS rn
    FROM ticks
), expanded AS (
    SELECT symbol, close, rn, s.n,
           CAST(floor((rn - 1) / s.n) AS BIGINT) AS blk,
           CAST((rn - 1) % s.n + 1 AS BIGINT) AS t
    FROM numbered, (SELECT unnest([{', '.join(str(n) for n in _HURST_NS)}]) AS n) s
), prefixed AS (
    SELECT symbol, n, blk, t, close,
           CAST(SUM(CAST(close AS DECIMAL(27,6))) OVER w AS DOUBLE) AS pref,
           CAST(SUM(CAST(close AS DECIMAL(27,6))) OVER f AS DOUBLE) AS tot,
           COUNT(*) OVER f AS bn
    FROM expanded
    WINDOW w AS (PARTITION BY symbol, n, blk ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           f AS (PARTITION BY symbol, n, blk)
), blocks AS (
    SELECT symbol, n, blk,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(close AS DECIMAL(27,6))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(close * close AS DECIMAL(27,6))) AS DOUBLE) AS sxx,
           max(pref - t * (tot / bn)) AS dev_hi,
           min(pref - t * (tot / bn)) AS dev_lo
    FROM prefixed GROUP BY 1, 2, 3
), rs AS (
    SELECT symbol, n,
           (dev_hi - dev_lo)
           / sqrt(sxx / cnt - (sx / cnt) * (sx / cnt)) AS rs_val
    FROM blocks
    WHERE cnt = n AND sxx / cnt - (sx / cnt) * (sx / cnt) > 0
), avg_rs AS (
    SELECT symbol, n, CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CAST(rs_val AS DECIMAL(27,18))) AS DOUBLE) / count(*)
               AS mean_rs
    FROM rs GROUP BY 1, 2
), fit AS (
    SELECT symbol,
           SUM((ln(CAST(n AS DOUBLE)) - {_lx_bar})
               * ln(mean_rs)) AS sxy,
           SUM((ln(CAST(n AS DOUBLE)) - {_lx_bar})
               * (ln(CAST(n AS DOUBLE)) - {_lx_bar})) AS sxx,
           CAST(count(*) AS BIGINT) AS n_sizes,
           CAST(SUM(n_blocks) AS BIGINT) AS total_blocks
    FROM avg_rs GROUP BY 1
)
SELECT symbol, n_sizes, total_blocks,
       {stable_round_sql('sxy / sxx', 6)} AS hurst
FROM fit WHERE n_sizes = 3
""",
        doc="Hurst exponent per symbol via rescaled-range (R/S) "
        "analysis over block sizes 8/32/128: H > 0.5 = persistent "
        "trend, H < 0.5 = mean reversion — THE classical long-memory "
        "test behind trend-following strategies, which the "
        "reference's rolling-mean features only gesture at. One "
        "explode to the three block sizes, ONE (symbol, n, blk) "
        "prefix-sum window over one sort, a per-block combinable "
        "aggregate (range of cumulative deviations / population "
        "std from decimal sufficient sums), and a 3-point log-log "
        "OLS slope per symbol. The only caveat at 100 TB is the "
        "row_number assignment — swap for a timestamp-derived block "
        "key to avoid the global per-symbol numbering (documented; "
        "identical block partition for gapless series). The 3-row "
        "fit SUMs are order-independent because each (symbol, n) "
        "contributes exactly one term.",
    )
    def hurst_exponent_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir)
        s = Window.partitionBy("symbol").orderBy("ts", "tick_id")
        numbered = t.select(
            "symbol", "close", F.row_number().over(s).alias("rn")
        )
        sizes = ", ".join(str(n) for n in _HURST_NS)
        expanded = numbered.select(
            "symbol",
            "close",
            "rn",
            F.explode(F.expr(f"array({sizes})")).alias("n"),
        ).select(
            "symbol",
            "close",
            "n",
            F.floor((F.col("rn") - 1) / F.col("n")).cast("bigint").alias("blk"),
            ((F.col("rn") - 1) % F.col("n") + 1).cast("bigint").alias("t"),
        )
        w = (
            Window.partitionBy("symbol", "n", "blk")
            .orderBy("t")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        full = Window.partitionBy("symbol", "n", "blk")
        prefixed = expanded.withColumns(
            {
                "pref": F.sum(F.col("close").cast(DECIMAL_T))
                .over(w)
                .cast("double"),
                "tot": F.sum(F.col("close").cast(DECIMAL_T))
                .over(full)
                .cast("double"),
                "bn": F.count(F.lit(1)).over(full),
            }
        )
        c = F.col("close")
        dev = F.col("pref") - F.col("t") * (F.col("tot") / F.col("bn"))
        blocks = prefixed.groupBy("symbol", "n", "blk").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(c.cast(DECIMAL_T)).cast("double").alias("sx"),
            F.sum((c * c).cast(DECIMAL_T)).cast("double").alias("sxx"),
            F.max(dev).alias("dev_hi"),
            F.min(dev).alias("dev_lo"),
        )
        var = F.col("sxx") / F.col("cnt") - (F.col("sx") / F.col("cnt")) * (
            F.col("sx") / F.col("cnt")
        )
        rs = blocks.where((F.col("cnt") == F.col("n")) & (var > 0)).select(
            "symbol",
            "n",
            ((F.col("dev_hi") - F.col("dev_lo")) / F.sqrt(var)).alias("rs_val"),
        )
        avg_rs = rs.groupBy("symbol", "n").agg(
            F.count(F.lit(1)).alias("n_blocks"),
            (
                F.sum(F.col("rs_val").cast("decimal(27,18)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_rs"),
        )
        import math

        lx_bar = sum(math.log(float(n)) for n in _HURST_NS) / 3.0
        # evaluate ln(n)-mean via the same double constants both engines
        # fold: ln(n) from F.log on the exact integer column
        lx = F.log(F.col("n").cast("double")) - F.lit(lx_bar)
        fit = avg_rs.groupBy("symbol").agg(
            F.sum(lx * F.log("mean_rs")).alias("sxy"),
            F.sum(lx * lx).alias("sxx"),
            F.count(F.lit(1)).alias("n_sizes"),
            F.sum("n_blocks").alias("total_blocks"),
        )
        return fit.where(F.col("n_sizes") == 3).select(
            "symbol",
            "n_sizes",
            "total_blocks",
            stable_round(F.col("sxy") / F.col("sxx"), 6).alias("hurst"),
        )


    # ------------------------------------------------------------------
    @register(
        "cointegration_engle_granger",
        oracle=f"""
WITH hourly AS (
    SELECT event_type AS symbol,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           arg_max(value, ts) AS px
    FROM events GROUP BY 1, 2
), aligned AS (
    SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.hour,
           a.px AS pa, b.px AS pb
    FROM hourly a JOIN hourly b USING (hour)
    WHERE a.symbol <> b.symbol
), ols AS (
    SELECT sym_a, sym_b, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(pa AS DECIMAL(27,6))) AS DOUBLE) AS sa,
           CAST(SUM(CAST(pb AS DECIMAL(27,6))) AS DOUBLE) AS sb,
           CAST(SUM(CAST(pa * pb AS DECIMAL(27,6))) AS DOUBLE) AS sab,
           CAST(SUM(CAST(pb * pb AS DECIMAL(27,6))) AS DOUBLE) AS sbb
    FROM aligned GROUP BY 1, 2
), resid AS (
    SELECT al.sym_a, al.sym_b, al.hour,
           al.pa - ((o.sa - ((o.n * o.sab - o.sa * o.sb)
                              / (o.n * o.sbb - o.sb * o.sb)) * o.sb) / o.n)
                 - ((o.n * o.sab - o.sa * o.sb)
                    / (o.n * o.sbb - o.sb * o.sb)) * al.pb AS e
    FROM aligned al
    JOIN ols o ON o.sym_a = al.sym_a AND o.sym_b = al.sym_b
), lagged AS (
    SELECT sym_a, sym_b,
           lag(e) OVER (PARTITION BY sym_a, sym_b ORDER BY hour) AS e0,
           e - lag(e) OVER (PARTITION BY sym_a, sym_b ORDER BY hour) AS de
    FROM resid
), adf AS (
    SELECT sym_a, sym_b, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(e0 * e0 AS DECIMAL(27,6))) AS DOUBLE) AS see,
           CAST(SUM(CAST(e0 * de AS DECIMAL(27,6))) AS DOUBLE) AS sed,
           CAST(SUM(CAST(de * de AS DECIMAL(27,6))) AS DOUBLE) AS sdd
    FROM lagged WHERE e0 IS NOT NULL GROUP BY 1, 2
), stats AS (
    SELECT o.sym_a, o.sym_b, a.n AS n_obs,
           (o.n * o.sab - o.sa * o.sb) / (o.n * o.sbb - o.sb * o.sb)
               AS hedge_beta,
           a.sed / a.see AS gamma,
           sqrt(((a.sdd - 2 * (a.sed / a.see) * a.sed
                  + (a.sed / a.see) * (a.sed / a.see) * a.see)
                 / (a.n - 1)) / a.see) AS se
    FROM ols o JOIN adf a ON a.sym_a = o.sym_a AND a.sym_b = o.sym_b
)
SELECT sym_a, sym_b, n_obs,
       {stable_round_sql('hedge_beta', 6)} AS hedge_beta,
       {stable_round_sql('gamma / se', 6)} AS df_stat,
       gamma / se < -1.95 AS cointegrated_5pct
FROM stats WHERE n_obs >= 30
""",
        doc="Engle-Granger cointegration test per ordered symbol "
        "pair — the statistical basis of pairs trading, which no "
        "per-ticker model in the reference can express. Step 1: OLS "
        "hedge ratio of a's hourly price on b's (decimal sufficient "
        "sums over the aligned hours grid). Step 2: Dickey-Fuller on "
        "the residual spread — gamma and its standard error derive "
        "ENTIRELY from three more decimal sums (See, SeD, SDD), since "
        "the residual-variance term expands as SDD - 2g*SeD + g^2*See "
        "— so the whole two-stage test is two combinable aggregates, "
        "one hours-grid join, and one per-pair lag window over "
        "hours-sized data. df_stat < -1.95 flags a stationary spread "
        "at ~5% (no-intercept DF critical value; the flag is a "
        "screening heuristic, the statistic is the contract). Raw "
        "ticks are touched exactly once, in the hourly resample.",
    )
    def cointegration_engle_granger(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
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
        aligned = a.join(b, "hour").where(F.col("sym_a") != F.col("sym_b"))
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
        resid = aligned.join(
            F.broadcast(ols), ["sym_a", "sym_b"]
        ).select(
            "sym_a",
            "sym_b",
            "hour",
            (pa - alpha - beta * pb).alias("e"),
        )
        w = Window.partitionBy("sym_a", "sym_b").orderBy("hour")
        lagged = resid.withColumn("e0", F.lag("e").over(w)).select(
            "sym_a",
            "sym_b",
            "e0",
            (F.col("e") - F.col("e0")).alias("de"),
        ).where(F.col("e0").isNotNull())
        e0, de = F.col("e0"), F.col("de")
        adf = lagged.groupBy("sym_a", "sym_b").agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum((e0 * e0).cast(DECIMAL_T)).cast("double").alias("see"),
            F.sum((e0 * de).cast(DECIMAL_T)).cast("double").alias("sed"),
            F.sum((de * de).cast(DECIMAL_T)).cast("double").alias("sdd"),
        )
        stats = adf.join(F.broadcast(ols), ["sym_a", "sym_b"])
        g = F.col("sed") / F.col("see")
        se = F.sqrt(
            (
                (F.col("sdd") - 2 * g * F.col("sed") + g * g * F.col("see"))
                / (F.col("n_obs") - 1)
            )
            / F.col("see")
        )
        return stats.where(F.col("n_obs") >= 30).select(
            "sym_a",
            "sym_b",
            "n_obs",
            stable_round(beta, 6).alias("hedge_beta"),
            stable_round(g / se, 6).alias("df_stat"),
            (g / se < -1.95).alias("cointegrated_5pct"),
        )


    # ------------------------------------------------------------------
    @register(
        "granger_causality_hourly",
        oracle=f"""
WITH hourly AS (
    SELECT event_type AS symbol,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           arg_min(value, ts) AS first_px,
           arg_max(value, ts) AS last_px
    FROM events GROUP BY 1, 2
), rets AS (
    SELECT symbol, hour,
           (last_px - first_px) / first_px AS r,
           lag((last_px - first_px) / first_px)
               OVER (PARTITION BY symbol ORDER BY hour) AS rl
    FROM hourly WHERE first_px > 0
), joined AS (
    SELECT a.symbol AS sym_a, b.symbol AS sym_b,
           a.r AS y, a.rl AS x1, b.rl AS x2
    FROM rets a JOIN rets b USING (hour)
    WHERE a.symbol <> b.symbol
      AND a.rl IS NOT NULL AND b.rl IS NOT NULL
), sums AS (
    SELECT sym_a, sym_b, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(y AS DECIMAL(27,18))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(x1 AS DECIMAL(27,18))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(x2 AS DECIMAL(27,18))) AS DOUBLE) AS s2,
           CAST(SUM(CAST(y * y AS DECIMAL(27,18))) AS DOUBLE) AS syy,
           CAST(SUM(CAST(x1 * x1 AS DECIMAL(27,18))) AS DOUBLE) AS s11,
           CAST(SUM(CAST(x2 * x2 AS DECIMAL(27,18))) AS DOUBLE) AS s22,
           CAST(SUM(CAST(x1 * x2 AS DECIMAL(27,18))) AS DOUBLE) AS s12,
           CAST(SUM(CAST(x1 * y AS DECIMAL(27,18))) AS DOUBLE) AS s1y,
           CAST(SUM(CAST(x2 * y AS DECIMAL(27,18))) AS DOUBLE) AS s2y
    FROM joined GROUP BY 1, 2
), centered AS (
    SELECT sym_a, sym_b, n,
           syy - sy * sy / n AS cyy,
           s11 - s1 * s1 / n AS c11,
           s22 - s2 * s2 / n AS c22,
           s12 - s1 * s2 / n AS c12,
           s1y - s1 * sy / n AS c1y,
           s2y - s2 * sy / n AS c2y
    FROM sums
), fits AS (
    SELECT sym_a, sym_b, n,
           cyy - c1y * c1y / c11 AS rss_r,
           cyy - ((c1y * c22 - c2y * c12)
                  / (c11 * c22 - c12 * c12)) * c1y
               - ((c2y * c11 - c1y * c12)
                  / (c11 * c22 - c12 * c12)) * c2y AS rss_u,
           (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS beta_cause
    FROM centered
    WHERE c11 > 0 AND c11 * c22 - c12 * c12 > 0 AND n > 3
)
SELECT sym_a, sym_b, n AS n_obs,
       {stable_round_sql('beta_cause', 6)} AS beta_cause,
       {stable_round_sql(
           '(rss_r - rss_u) / (rss_u / (n - 3))', 6)} AS f_stat,
       (rss_r - rss_u) / (rss_u / (n - 3)) > 3.84 AS causes_5pct
FROM fits
""",
        doc="Pairwise Granger causality (one lag) over the hourly "
        "return grid: does b's LAST-hour return improve the "
        "prediction of a's NEXT return beyond a's own last return? "
        "F-test of the restricted AR(1) against the unrestricted "
        "two-regressor model — the formal test behind the lead-lag "
        "cross-correlation matrix. Both regressions come in CLOSED "
        "FORM from ten decimal sufficient sums (centered 2x2 normal "
        "equations by Cramer's rule), so the entire two-model "
        "comparison is ONE combinable aggregate per ordered pair — "
        "no iterative fit, no second pass. Flag vs F(1, inf) 5% = "
        "3.84; the statistic is the contract.",
    )
    def granger_causality_hourly(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        hourly = ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("hour", "ts").alias("hour"),
        ).agg(
            F.min_by("value", "ts").alias("first_px"),
            F.max_by("value", "ts").alias("last_px"),
        )
        w = Window.partitionBy("symbol").orderBy("hour")
        rets = (
            hourly.where(F.col("first_px") > 0)
            .withColumn(
                "r",
                (F.col("last_px") - F.col("first_px")) / F.col("first_px"),
            )
            .withColumn("rl", F.lag("r").over(w))
            .select("symbol", "hour", "r", "rl")
        )
        a = rets.select(
            F.col("symbol").alias("sym_a"),
            "hour",
            F.col("r").alias("y"),
            F.col("rl").alias("x1"),
        )
        b = rets.select(
            F.col("symbol").alias("sym_b"),
            "hour",
            F.col("rl").alias("x2"),
        )
        joined = (
            a.join(b, "hour")
            .where(
                (F.col("sym_a") != F.col("sym_b"))
                & F.col("x1").isNotNull()
                & F.col("x2").isNotNull()
            )
        )
        dt = "decimal(27,18)"
        y, x1, x2 = F.col("y"), F.col("x1"), F.col("x2")
        sums = joined.groupBy("sym_a", "sym_b").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(y.cast(dt)).cast("double").alias("sy"),
            F.sum(x1.cast(dt)).cast("double").alias("s1"),
            F.sum(x2.cast(dt)).cast("double").alias("s2"),
            F.sum((y * y).cast(dt)).cast("double").alias("syy"),
            F.sum((x1 * x1).cast(dt)).cast("double").alias("s11"),
            F.sum((x2 * x2).cast(dt)).cast("double").alias("s22"),
            F.sum((x1 * x2).cast(dt)).cast("double").alias("s12"),
            F.sum((x1 * y).cast(dt)).cast("double").alias("s1y"),
            F.sum((x2 * y).cast(dt)).cast("double").alias("s2y"),
        )
        n = F.col("n")
        cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
        c11 = F.col("s11") - F.col("s1") * F.col("s1") / n
        c22 = F.col("s22") - F.col("s2") * F.col("s2") / n
        c12 = F.col("s12") - F.col("s1") * F.col("s2") / n
        c1y = F.col("s1y") - F.col("s1") * F.col("sy") / n
        c2y = F.col("s2y") - F.col("s2") * F.col("sy") / n
        det = c11 * c22 - c12 * c12
        b1 = (c1y * c22 - c2y * c12) / det
        b2 = (c2y * c11 - c1y * c12) / det
        rss_r = cyy - c1y * c1y / c11
        rss_u = cyy - b1 * c1y - b2 * c2y
        f = (rss_r - rss_u) / (rss_u / (n - 3))
        return sums.where((c11 > 0) & (det > 0) & (n > 3)).select(
            "sym_a",
            "sym_b",
            n.alias("n_obs"),
            stable_round(b2, 6).alias("beta_cause"),
            stable_round(f, 6).alias("f_stat"),
            (f > 3.84).alias("causes_5pct"),
        )


    # ------------------------------------------------------------------
    @register(
        "spearman_rank_matrix",
        oracle=f"""
WITH hourly AS (
    SELECT event_type AS symbol,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           arg_min(value, ts) AS first_px,
           arg_max(value, ts) AS last_px
    FROM events GROUP BY 1, 2
), rets AS (
    SELECT symbol, hour, (last_px - first_px) / first_px AS r
    FROM hourly WHERE first_px > 0
), aligned AS (
    SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.hour,
           a.r AS ra, b.r AS rb
    FROM rets a JOIN rets b USING (hour)
    WHERE a.symbol < b.symbol
), ranked AS (
    SELECT sym_a, sym_b,
           CAST(row_number() OVER (PARTITION BY sym_a, sym_b
                                   ORDER BY ra, hour) AS DOUBLE) AS ka,
           CAST(row_number() OVER (PARTITION BY sym_a, sym_b
                                   ORDER BY rb, hour) AS DOUBLE) AS kb,
           hour
    FROM aligned
), sums AS (
    SELECT sym_a, sym_b, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ka AS DECIMAL(27,6))) AS DOUBLE) AS sa,
           CAST(SUM(CAST(kb AS DECIMAL(27,6))) AS DOUBLE) AS sb,
           CAST(SUM(CAST(ka * kb AS DECIMAL(38,6))) AS DOUBLE) AS sab,
           CAST(SUM(CAST(ka * ka AS DECIMAL(38,6))) AS DOUBLE) AS saa,
           CAST(SUM(CAST(kb * kb AS DECIMAL(38,6))) AS DOUBLE) AS sbb
    FROM ranked GROUP BY 1, 2
)
SELECT sym_a, sym_b, n AS n_hours,
       {stable_round_sql(
           '(n * sab - sa * sb)'
           ' / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))', 6)}
           AS spearman_rho
FROM sums WHERE n >= 30
""",
        doc="Spearman rank correlation for every unordered symbol "
        "pair over aligned hourly returns — the robust companion to "
        "the Pearson lag-0 entry of crosscorr_leadlag_hourly: "
        "monotone dependence that outlier hours cannot distort. "
        "Ranks are row_number over (return, hour) WITHIN each pair's "
        "aligned sample — a total order, so ranks are exact integers "
        "and the Pearson-on-ranks sufficient sums are decimal-exact "
        "(rank products reach n^2, hence (38,6)). Rank windows "
        "partition by pair over the hours-sized aligned grid; the "
        "whole matrix costs pair-count x hours rows.",
    )
    def spearman_rank_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        hourly = ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("hour", "ts").alias("hour"),
        ).agg(
            F.min_by("value", "ts").alias("first_px"),
            F.max_by("value", "ts").alias("last_px"),
        )
        rets = hourly.where(F.col("first_px") > 0).select(
            "symbol",
            "hour",
            ((F.col("last_px") - F.col("first_px")) / F.col("first_px")).alias(
                "r"
            ),
        )
        a = rets.select(
            F.col("symbol").alias("sym_a"), "hour", F.col("r").alias("ra")
        )
        b = rets.select(
            F.col("symbol").alias("sym_b"), "hour", F.col("r").alias("rb")
        )
        aligned = a.join(b, "hour").where(F.col("sym_a") < F.col("sym_b"))
        pw = Window.partitionBy("sym_a", "sym_b")
        ranked = aligned.select(
            "sym_a",
            "sym_b",
            F.row_number().over(pw.orderBy("ra", "hour")).cast("double").alias(
                "ka"
            ),
            F.row_number().over(pw.orderBy("rb", "hour")).cast("double").alias(
                "kb"
            ),
        )
        ka, kb = F.col("ka"), F.col("kb")
        sums = ranked.groupBy("sym_a", "sym_b").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(ka.cast(DECIMAL_T)).cast("double").alias("sa"),
            F.sum(kb.cast(DECIMAL_T)).cast("double").alias("sb"),
            F.sum((ka * kb).cast("decimal(38,6)")).cast("double").alias("sab"),
            F.sum((ka * ka).cast("decimal(38,6)")).cast("double").alias("saa"),
            F.sum((kb * kb).cast("decimal(38,6)")).cast("double").alias("sbb"),
        )
        n = F.col("n")
        sa, sb = F.col("sa"), F.col("sb")
        sab, saa, sbb = F.col("sab"), F.col("saa"), F.col("sbb")
        return sums.where(n >= 30).select(
            "sym_a",
            "sym_b",
            n.alias("n_hours"),
            stable_round(
                (n * sab - sa * sb)
                / F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)),
                6,
            ).alias("spearman_rho"),
        )


    # ------------------------------------------------------------------
    @register(
        "updown_streaks",
        oracle=f"""
WITH {TICKS_ORACLE_CTE.strip()},
dirs AS (
    SELECT symbol, ts, tick_id,
           CAST(sign(close - open) AS BIGINT) AS dir
    FROM ticks WHERE open IS NOT NULL AND close <> open
), flagged AS (
    SELECT symbol, dir,
           row_number() OVER s
             - row_number() OVER (PARTITION BY symbol, dir
                                  ORDER BY ts, tick_id) AS island
    FROM dirs
    WINDOW s AS (PARTITION BY symbol ORDER BY ts, tick_id)
), streaks AS (
    SELECT symbol, dir, island, CAST(count(*) AS BIGINT) AS len
    FROM flagged GROUP BY 1, 2, 3
)
SELECT symbol,
       max(len) FILTER (WHERE dir = 1) AS max_up_streak,
       max(len) FILTER (WHERE dir = -1) AS max_down_streak,
       CAST(count(*) AS BIGINT) AS n_streaks,
       {stable_round_sql(
           'CAST(SUM(CAST(len AS DECIMAL(27,6))) AS DOUBLE) / count(*)',
           6)} AS mean_streak_len
FROM streaks GROUP BY 1
""",
        doc="Longest up- and down-streaks per symbol (and the streak-"
        "length profile): the extreme-run companion to the runs "
        "test's mean-level z — a max 9-tick up-streak against a "
        "fair-coin expectation of log2(n) is direct trending "
        "evidence. Streaks come from the classic two-row_number "
        "islands difference (rn over all minus rn within (symbol, "
        "dir) is constant exactly along a same-direction run); one "
        "per-symbol sort feeds both windows, and the summary "
        "aggregates the streak-grain table.",
    )
    def updown_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir).where(
            F.col("open").isNotNull() & (F.col("close") != F.col("open"))
        )
        d = F.signum(F.col("close") - F.col("open")).cast("bigint")
        s = Window.partitionBy("symbol").orderBy("ts", "tick_id")
        sd = Window.partitionBy("symbol", "dir").orderBy("ts", "tick_id")
        flagged = t.select(
            "symbol", "ts", "tick_id", d.alias("dir")
        ).withColumn(
            "island", F.row_number().over(s) - F.row_number().over(sd)
        )
        streaks = flagged.groupBy("symbol", "dir", "island").agg(
            F.count(F.lit(1)).alias("len")
        )
        return streaks.groupBy("symbol").agg(
            F.max(F.when(F.col("dir") == 1, F.col("len"))).alias(
                "max_up_streak"
            ),
            F.max(F.when(F.col("dir") == -1, F.col("len"))).alias(
                "max_down_streak"
            ),
            F.count(F.lit(1)).alias("n_streaks"),
            stable_round(
                F.sum(F.col("len").cast(DECIMAL_T)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_streak_len"),
        )

    # ------------------------------------------------------------------
    @register(
        "ar1_half_life",
        oracle=f"""
WITH {TICKS_ORACLE_CTE.strip()},
lagged AS (
    SELECT symbol, close AS y, open AS x
    FROM ticks WHERE open IS NOT NULL
), sums AS (
    SELECT symbol, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(y AS DECIMAL(27,6))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
           CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx
    FROM lagged GROUP BY 1
), fit AS (
    SELECT symbol, n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS phi
    FROM sums WHERE n * sxx - sx * sx > 0
)
SELECT symbol, n AS n_obs,
       {stable_round_sql('phi', 6)} AS phi,
       CASE WHEN phi > 0 AND phi < 1
            THEN {stable_round_sql('-ln(2.0) / ln(phi)', 6)} END
           AS half_life_ticks
FROM fit
""",
        doc="AR(1) persistence and mean-reversion half-life per "
        "symbol: phi from the OLS of close on previous close (the "
        "ticks view's existing lag — x IS open), and, when "
        "0 < phi < 1, the half-life -ln2/ln(phi) in ticks — how "
        "long a shock takes to decay halfway, the number a "
        "mean-reversion strategy sizes its holding period with "
        "(phi >= 1 = no reversion, NULL half-life). One combinable "
        "aggregate of decimal sufficient sums (price products at "
        "(38,12)); no second pass.",
    )
    def ar1_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir).where(F.col("open").isNotNull())
        lagged = t.select(
            "symbol",
            F.col("close").alias("y"),
            F.col("open").alias("x"),
        )
        x, y = F.col("x"), F.col("y")
        sums = lagged.groupBy("symbol").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(y.cast(DECIMAL_T)).cast("double").alias("sy"),
            F.sum(x.cast(DECIMAL_T)).cast("double").alias("sx"),
            F.sum((x * y).cast("decimal(38,12)")).cast("double").alias("sxy"),
            F.sum((x * x).cast("decimal(38,12)")).cast("double").alias("sxx"),
        )
        n = F.col("n")
        denom = n * F.col("sxx") - F.col("sx") * F.col("sx")
        phi = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
        return (
            sums.where(denom > 0)
            .withColumn("phi", phi)
            .select(
                "symbol",
                n.alias("n_obs"),
                stable_round(F.col("phi"), 6).alias("phi"),
                F.when(
                    (F.col("phi") > 0) & (F.col("phi") < 1),
                    stable_round(
                        -F.log(F.lit(2.0)) / F.log(F.col("phi")), 6
                    ),
                ).alias("half_life_ticks"),
            )
        )


def _mk_lag_cols_sql() -> str:
    return ",\n           ".join(
        f"lag(close, {k}) OVER s AS c{k}" for k in range(1, MK_BAND + 1)
    )


_register()
