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

    # ------------------------------------------------------------------
    @register(
        "drawdown_duration",
        oracle="""
WITH ticks AS (
    SELECT event_type AS symbol, ts, event_id AS tick_id, value AS close
    FROM events
), peaks AS (
    SELECT symbol, ts, tick_id, close,
           max(close) OVER w AS peak
    FROM ticks
    WINDOW w AS (PARTITION BY symbol ORDER BY ts, tick_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), flagged AS (
    SELECT symbol, ts, tick_id, close, peak,
           CASE WHEN close < peak THEN 1 ELSE 0 END AS under,
           row_number() OVER s
             - SUM(CASE WHEN close < peak THEN 1 ELSE 0 END) OVER
               (PARTITION BY symbol ORDER BY ts, tick_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
    FROM peaks
    WINDOW s AS (PARTITION BY symbol ORDER BY ts, tick_id)
), spells AS (
    SELECT symbol, island,
           CAST(count(*) AS BIGINT) AS spell_ticks,
           min(ts) AS spell_start, max(ts) AS spell_end,
           min(close / peak) AS worst_ratio
    FROM flagged WHERE under = 1
    GROUP BY 1, 2
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_spells,
       max(spell_ticks) AS longest_spell_ticks,
       -- floor each endpoint to whole seconds first: Spark's
       -- unix_timestamp truncates, DuckDB's epoch keeps fractions
       CAST(max(floor(epoch(spell_end)) - floor(epoch(spell_start)))
            AS BIGINT) AS longest_spell_seconds,
       floor(min(worst_ratio) * 1000000.0 + 0.5) / 1000000.0
           AS worst_peak_ratio
FROM spells GROUP BY 1
""",
        doc="Drawdown DURATION per symbol — the risk dimension "
        "max_drawdown_per_symbol omits: how LONG the series stays "
        "underwater. Gaps-and-islands over the below-running-peak "
        "flag (rn minus running under-count keys each contiguous "
        "spell — the standard islands trick, same as "
        "runlength_encode_user_events) gives every underwater spell; "
        "the summary reports spell count, the longest spell in ticks "
        "and in wall-clock seconds, and the worst close/peak ratio. "
        "One per-symbol sort feeds the running peak, the island key, "
        "and the final combinable aggregate.",
    )
    def drawdown_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        t = ev.select(
            F.col("event_type").alias("symbol"),
            "ts",
            F.col("event_id").alias("tick_id"),
            F.col("value").alias("close"),
        )
        s = Window.partitionBy("symbol").orderBy("ts", "tick_id")
        run = s.rowsBetween(Window.unboundedPreceding, 0)
        t = t.withColumn("peak", F.max("close").over(run)).withColumn(
            "under", F.when(F.col("close") < F.col("peak"), 1).otherwise(0)
        )
        t = t.withColumn(
            "island",
            F.row_number().over(s) - F.sum("under").over(run),
        )
        spells = (
            t.where(F.col("under") == 1)
            .groupBy("symbol", "island")
            .agg(
                F.count(F.lit(1)).alias("spell_ticks"),
                F.min("ts").alias("spell_start"),
                F.max("ts").alias("spell_end"),
                F.min(F.col("close") / F.col("peak")).alias("worst_ratio"),
            )
        )
        return spells.groupBy("symbol").agg(
            F.count(F.lit(1)).alias("n_spells"),
            F.max("spell_ticks").alias("longest_spell_ticks"),
            F.max(
                F.unix_timestamp("spell_end") - F.unix_timestamp("spell_start")
            ).alias("longest_spell_seconds"),
            stable_round(F.min("worst_ratio"), 6).alias("worst_peak_ratio"),
        )

    # ------------------------------------------------------------------
    @register(
        "dow_anova_f",
        oracle=f"""
WITH ticks AS (
    SELECT event_type AS symbol, ts,
           value - lag(value) OVER (PARTITION BY event_type
                                    ORDER BY ts, event_id) AS r
    FROM events
), rets AS (
    -- DuckDB dayofweek is 0-based (Sunday=0); Spark's is 1-based
    SELECT symbol, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, r
    FROM ticks WHERE r IS NOT NULL
), groups AS (
    SELECT symbol, dow, CAST(count(*) AS BIGINT) AS ng,
           CAST(SUM(CAST(r AS DECIMAL(27,6))) AS DOUBLE) AS sg,
           CAST(SUM(CAST(r * r AS DECIMAL(38,12))) AS DOUBLE) AS sgg
    FROM rets GROUP BY 1, 2
), tot AS (
    SELECT symbol, CAST(SUM(ng) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS k,
           CAST(SUM(CAST(sg AS DECIMAL(27,6))) AS DOUBLE) AS s,
           CAST(SUM(CAST(sgg AS DECIMAL(38,12))) AS DOUBLE) AS ss,
           CAST(SUM(CAST(sg * sg / ng AS DECIMAL(38,12))) AS DOUBLE)
               AS sbg
    FROM groups GROUP BY 1
)
SELECT symbol, k AS n_groups, n AS n_obs,
       {stable_round_sql('(sbg - s * s / n) / (k - 1)'
                         ' / ((ss - sbg) / (n - k))', 6)} AS f_stat,
       (sbg - s * s / n) / (k - 1) / ((ss - sbg) / (n - k)) > 2.10
           AS dow_effect_5pct
FROM tot WHERE k > 1 AND n > k
""",
        doc="One-way ANOVA F of tick deltas across day-of-week groups "
        "per symbol: is there a calendar effect worth a feature? "
        "F = (SSB/(k-1)) / (SSW/(n-k)) with the between-group sum of "
        "squares computed from per-group decimal sufficient sums "
        "(SSB = sum sg^2/ng - s^2/n, SSW = total SS - that) — so the "
        "whole test is two combinable aggregates, no window at all. "
        "The 2.10 flag is the F(6, inf) 5% critical value; the "
        "statistic is the contract. Complements seasonality_profile "
        "(which reports the group means this tests).",
    )
    def dow_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        s = Window.partitionBy("event_type").orderBy("ts", "event_id")
        rets = (
            ev.select(
                F.col("event_type").alias("symbol"),
                "ts",
                (F.col("value") - F.lag("value").over(s)).alias("r"),
            )
            .where(F.col("r").isNotNull())
            .select(
                "symbol",
                F.dayofweek("ts").cast("bigint").alias("dow"),
                "r",
            )
        )
        r = F.col("r")
        groups = rets.groupBy("symbol", "dow").agg(
            F.count(F.lit(1)).alias("ng"),
            F.sum(r.cast(DECIMAL_T)).cast("double").alias("sg"),
            F.sum((r * r).cast("decimal(38,12)")).cast("double").alias("sgg"),
        )
        tot = groups.groupBy("symbol").agg(
            F.sum("ng").alias("n"),
            F.count(F.lit(1)).alias("k"),
            F.sum(F.col("sg").cast(DECIMAL_T)).cast("double").alias("s"),
            F.sum(F.col("sgg").cast("decimal(38,12)"))
            .cast("double")
            .alias("ss"),
            F.sum(
                (F.col("sg") * F.col("sg") / F.col("ng")).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("sbg"),
        )
        n, k = F.col("n"), F.col("k")
        f = ((F.col("sbg") - F.col("s") * F.col("s") / n) / (k - 1)) / (
            (F.col("ss") - F.col("sbg")) / (n - k)
        )
        return tot.where((k > 1) & (n > k)).select(
            "symbol",
            k.alias("n_groups"),
            n.alias("n_obs"),
            stable_round(f, 6).alias("f_stat"),
            (f > 2.10).alias("dow_effect_5pct"),
        )

    # ------------------------------------------------------------------
    @register(
        "var_cvar_per_symbol",
        oracle=f"""
WITH rets AS (
    SELECT event_type AS symbol,
           value - lag(value) OVER (PARTITION BY event_type
                                    ORDER BY ts, event_id) AS r
    FROM events
), clean AS (
    SELECT symbol, r FROM rets WHERE r IS NOT NULL
), q AS (
    SELECT symbol, quantile_cont(r, 0.05) AS var5
    FROM clean GROUP BY 1
)
SELECT c.symbol,
       CAST(count(*) AS BIGINT) AS n_obs,
       {stable_round_sql('any_value(q.var5)', 6)} AS var_5pct,
       {stable_round_sql(
           'CAST(SUM(CAST(c.r AS DECIMAL(27,6)))'
           ' FILTER (WHERE c.r <= q.var5) AS DOUBLE)'
           ' / count(*) FILTER (WHERE c.r <= q.var5)', 6)} AS cvar_5pct,
       CAST(count(*) FILTER (WHERE c.r <= q.var5) AS BIGINT)
           AS n_tail_obs
FROM clean c JOIN q USING (symbol)
GROUP BY 1
""",
        doc="Value-at-Risk and expected shortfall per symbol at the "
        "5% level: VaR is the exact interpolated p5 of tick deltas "
        "(one row per symbol, broadcast back), CVaR is the decimal-"
        "exact mean of the deltas at or below it — the coherent tail "
        "measure Basel-style risk reporting uses where plain VaR "
        "fails subadditivity. The two-pass shape (quantile, then "
        "tail filter against the broadcast cut) is the same as the "
        "trimmed-mean/MAD queries, and at 100 TB the exact quantile "
        "swaps for approx_percentile with the shape unchanged "
        "(documented in the robust-stats SCALE row).",
    )
    def var_cvar_per_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        s = Window.partitionBy("event_type").orderBy("ts", "event_id")
        clean = (
            ev.select(
                F.col("event_type").alias("symbol"),
                (F.col("value") - F.lag("value").over(s)).alias("r"),
            )
            .where(F.col("r").isNotNull())
        )
        q = clean.groupBy("symbol").agg(
            F.percentile("r", F.lit(0.05)).alias("var5")
        )
        j = clean.join(F.broadcast(q), "symbol")
        tail = F.col("r") <= F.col("var5")
        return j.groupBy("symbol").agg(
            F.count(F.lit(1)).alias("n_obs"),
            stable_round(F.any_value("var5"), 6).alias("var_5pct"),
            stable_round(
                F.sum(F.when(tail, F.col("r")).cast(DECIMAL_T)).cast("double")
                / F.count(F.when(tail, 1)),
                6,
            ).alias("cvar_5pct"),
            F.count(F.when(tail, 1)).alias("n_tail_obs"),
        )

    # ------------------------------------------------------------------
    @register(
        "downside_deviation_sortino",
        oracle=f"""
WITH rets AS (
    SELECT event_type AS symbol,
           value - lag(value) OVER (PARTITION BY event_type
                                    ORDER BY ts, event_id) AS r
    FROM events
), clean AS (
    SELECT symbol, r FROM rets WHERE r IS NOT NULL
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_obs,
       {stable_round_sql(
           'CAST(SUM(CAST(r AS DECIMAL(27,6))) AS DOUBLE) / count(*)',
           6)} AS mean_ret,
       {stable_round_sql(
           'sqrt(CAST(SUM(CAST(least(r, 0.0) * least(r, 0.0)'
           ' AS DECIMAL(38,12))) AS DOUBLE) / count(*))', 6)}
           AS downside_dev,
       {stable_round_sql(
           '(CAST(SUM(CAST(r AS DECIMAL(27,6))) AS DOUBLE) / count(*))'
           ' / sqrt(CAST(SUM(CAST(least(r, 0.0) * least(r, 0.0)'
           ' AS DECIMAL(38,12))) AS DOUBLE) / count(*))', 6)}
           AS sortino
FROM clean GROUP BY 1
""",
        doc="Downside deviation and the Sortino ratio per symbol: "
        "risk measured only from the negative tick deltas "
        "(sqrt of the mean squared downside, zero target), and mean "
        "return over it — the asymmetric-risk complement to the "
        "symmetric Sharpe in the portfolio summary. One combinable "
        "aggregate: least(r, 0)^2 terms sum at decimal(38,12) (same "
        "width argument as the ARCH test's delta^4 sums), the mean "
        "at (27,6). No window beyond the shared lag.",
    )
    def downside_deviation_sortino(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        s = Window.partitionBy("event_type").orderBy("ts", "event_id")
        clean = (
            ev.select(
                F.col("event_type").alias("symbol"),
                (F.col("value") - F.lag("value").over(s)).alias("r"),
            )
            .where(F.col("r").isNotNull())
        )
        r = F.col("r")
        dn = F.least(r, F.lit(0.0))
        mean = F.sum(r.cast(DECIMAL_T)).cast("double") / F.count(F.lit(1))
        dd = F.sqrt(
            F.sum((dn * dn).cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        )
        return clean.groupBy("symbol").agg(
            F.count(F.lit(1)).alias("n_obs"),
            stable_round(mean, 6).alias("mean_ret"),
            stable_round(dd, 6).alias("downside_dev"),
            stable_round(mean / dd, 6).alias("sortino"),
        )

    # ------------------------------------------------------------------
    @register(
        "day_boundary_gaps",
        oracle="""
WITH daily AS (
    SELECT event_type AS symbol,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           arg_min(value, ts) AS day_open,
           arg_max(value, ts) AS day_close
    FROM events GROUP BY 1, 2
), gaps AS (
    SELECT symbol, day, day_open,
           lag(day_close) OVER (PARTITION BY symbol ORDER BY day)
               AS prev_close,
           day_open - lag(day_close) OVER (PARTITION BY symbol
                                           ORDER BY day) AS gap
    FROM daily
)
SELECT symbol,
       CAST(count(gap) AS BIGINT) AS n_gaps,
       CAST(count(*) FILTER (WHERE gap > 0) AS BIGINT) AS n_up_gaps,
       CAST(SUM(CAST(abs(gap) AS DECIMAL(27,6))) AS DOUBLE)
           / count(gap) AS mean_abs_gap,
       max(abs(gap)) AS max_abs_gap
FROM gaps GROUP BY 1
""",
        doc="Day-boundary gap profile per symbol: the jump between "
        "one day's close and the next day's open — overnight risk "
        "that intraday windows never see, and the reason daily-bar "
        "features (ATR folds it in via the previous close) differ "
        "from tick features. Gaps come from one lag over the daily "
        "resample (symbols x days rows); mean |gap| is decimal-"
        "exact, max is an exact pick. NULL first-day gaps are "
        "excluded by count(gap).",
    )
    def day_boundary_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        daily = ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").alias("day"),
        ).agg(
            F.min_by("value", "ts").alias("day_open"),
            F.max_by("value", "ts").alias("day_close"),
        )
        w = Window.partitionBy("symbol").orderBy("day")
        gaps = daily.withColumn(
            "gap", F.col("day_open") - F.lag("day_close").over(w)
        )
        g = F.col("gap")
        return gaps.groupBy("symbol").agg(
            F.count(g).alias("n_gaps"),
            F.count(F.when(g > 0, 1)).alias("n_up_gaps"),
            (
                F.sum(F.abs(g).cast(DECIMAL_T)).cast("double") / F.count(g)
            ).alias("mean_abs_gap"),
            F.max(F.abs(g)).alias("max_abs_gap"),
        )


_register()
