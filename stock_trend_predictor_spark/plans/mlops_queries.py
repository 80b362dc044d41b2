"""ML-operations queries: data-mixture design, distribution drift,
and conformal prediction intervals.

The monitoring/curation layer around a training pipeline — what runs
BETWEEN the corpus queries (text/dedup tiers) and the per-key models
(ml tier):

- ``lang_temperature_mix``: temperature-scaled sampling weights per
  language (w proportional to share^(1/T) — the multilingual
  data-mixture rule) plus an exact integer document allocation via
  the same largest-remainder scheme as largest_remainder_allocation.
- ``psi_price_drift``: Population Stability Index of o_totalprice
  between the early/late order halves over decile bins FROZEN from
  the early half — the standard drift alarm for a feature pipeline.
- ``conformal_interval_width``: split-conformal regression per
  symbol — OLS on the first 70% of ticks (decimal sufficient sums),
  90th-percentile absolute calibration residual as the
  distribution-free interval half-width.
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

#: mixture temperature: 1/T = 0.5 compresses language shares toward
#: uniform (the multilingual-sampling convention; T>1 upsamples tails).
MIX_INV_T = 0.5
#: document budget the integer allocation distributes.
MIX_BUDGET = 100_000

#: PSI halves cut and number of quantile bins (deciles).
PSI_DATE_CUT = "1998-01-01"
PSI_BINS = 10

#: conformal: train fraction and target coverage quantile.
CONF_TRAIN_FRAC = 0.7
CONF_Q = 0.9


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "lang_temperature_mix",
        oracle=f"""
WITH counts AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
), tot AS (
    SELECT sum(n_docs) AS n FROM counts
), w AS (
    SELECT lang, n_docs,
           CAST(n_docs AS DOUBLE) / n AS share,
           pow(CAST(n_docs AS DOUBLE) / n, {MIX_INV_T}) AS raw_w
    FROM counts, tot
), norm AS (
    SELECT lang, n_docs, share,
           raw_w / CAST(sum(CAST(raw_w AS DECIMAL(27,18)))
                        OVER () AS DOUBLE) AS weight
    FROM w
), fl AS (
    SELECT *, CAST(floor(weight * {MIX_BUDGET}) AS BIGINT) AS base,
           weight * {MIX_BUDGET} - floor(weight * {MIX_BUDGET}) AS rem
    FROM norm
), rk AS (
    SELECT *, row_number() OVER (ORDER BY rem DESC, lang) AS rk,
           {MIX_BUDGET} - sum(base) OVER () AS deficit
    FROM fl
)
SELECT lang, n_docs,
       {stable_round_sql('share', 6)} AS share,
       {stable_round_sql('weight', 6)} AS weight,
       CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
           AS alloc_docs
FROM rk
""",
        doc=f"Temperature-scaled multilingual sampling mix: language "
        f"weights proportional to share^{MIX_INV_T} (the standard "
        f"low-resource upweighting rule), normalized by a decimal-"
        f"cast windowed sum so partition order cannot perturb the "
        f"normalizer, then an exact {MIX_BUDGET}-document integer "
        f"allocation via largest remainder (provably sums to the "
        f"budget — same scheme as largest_remainder_allocation). "
        f"Distinct from corpus_lang_rebalance, which EXECUTES a "
        f"hash-threshold downsample against fixed targets; this "
        f"DESIGNS the targets. All windows run on #languages rows.",
    )
    def lang_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
        counts = (
            load_table(spark, sf_dir, "documents")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
        whole = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        w = counts.withColumn(
            "share",
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(whole).cast("double"),
        ).withColumn("raw_w", F.pow("share", F.lit(MIX_INV_T)))
        norm = w.withColumn(
            "weight",
            F.col("raw_w")
            / F.sum(F.col("raw_w").cast("decimal(27,18)"))
            .over(whole)
            .cast("double"),
        )
        fl = norm.withColumns(
            {
                "base": F.floor(F.col("weight") * MIX_BUDGET).cast("long"),
                "rem": F.col("weight") * MIX_BUDGET
                - F.floor(F.col("weight") * MIX_BUDGET),
            }
        )
        rk = fl.withColumns(
            {
                "rk": F.row_number().over(
                    Window.orderBy(F.col("rem").desc(), "lang")
                ),
                "deficit": F.lit(MIX_BUDGET) - F.sum("base").over(whole),
            }
        )
        return rk.select(
            "lang",
            "n_docs",
            stable_round("share", 6).alias("share"),
            stable_round("weight", 6).alias("weight"),
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("deficit"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc_docs"),
        )

    _EDGE_COLS = ", ".join(
        f"quantile_cont(o_totalprice, {d / PSI_BINS}) AS e{d}"
        for d in range(1, PSI_BINS)
    )
    _BIN_EXPR = " + ".join(
        f"CASE WHEN o_totalprice >= e.e{d} THEN 1 ELSE 0 END"
        for d in range(1, PSI_BINS)
    )

    @register(
        "psi_price_drift",
        oracle=f"""
WITH tagged AS (
    SELECT o_totalprice,
           CASE WHEN o_orderdate < TIMESTAMP '{PSI_DATE_CUT}'
                THEN 1 ELSE 0 END AS is_early
    FROM orders
), e AS (
    SELECT {_EDGE_COLS} FROM tagged WHERE is_early = 1
), binned AS (
    SELECT CAST({_BIN_EXPR} AS BIGINT) AS bin, is_early
    FROM tagged, e
), counts AS (
    SELECT bin,
           CAST(sum(is_early) AS BIGINT) AS n_early,
           CAST(sum(1 - is_early) AS BIGINT) AS n_late
    FROM binned GROUP BY 1
), tot AS (
    SELECT sum(n_early) AS te, sum(n_late) AS tl FROM counts
)
SELECT bin, n_early, n_late,
       {stable_round_sql('CAST(n_early AS DOUBLE) / te', 6)} AS p_early,
       {stable_round_sql('CAST(n_late AS DOUBLE) / tl', 6)} AS p_late,
       {stable_round_sql(
           '(CAST(n_early AS DOUBLE) / te - CAST(n_late AS DOUBLE) / tl)'
           ' * ln((CAST(n_early AS DOUBLE) / te)'
           ' / (CAST(n_late AS DOUBLE) / tl))', 6)} AS psi_term
FROM counts, tot
""",
        doc=f"Population Stability Index of order value across the "
        f"{PSI_DATE_CUT} cut: decile edges FROZEN from the early "
        f"half (exact interpolated percentiles — the monitoring "
        f"convention: the reference window defines the bins), both "
        f"halves binned by counting edges <= value ({PSI_BINS - 1} "
        f"fixed comparisons against a broadcast 1-row edge table, "
        f"never a range join), per-bin PSI terms (p-q)ln(p/q). "
        f"Total PSI > 0.25 is the standard retrain alarm. Quantile "
        f"bins of the reference guarantee every bin is populated "
        f"there; the late half shares the support at these scales "
        f"(a genuinely vanished bin is itself the drift signal and "
        f"would surface as an infinite term — documented, matching "
        f"the textbook definition).",
    )
    def psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders").select(
            "o_totalprice",
            F.when(
                F.col("o_orderdate") < F.lit(PSI_DATE_CUT).cast("timestamp"),
                1,
            )
            .otherwise(0)
            .alias("is_early"),
        )
        edges = o.where(F.col("is_early") == 1).agg(
            *[
                F.percentile("o_totalprice", F.lit(d / PSI_BINS)).alias(
                    f"e{d}"
                )
                for d in range(1, PSI_BINS)
            ]
        )
        binexpr = None
        for d in range(1, PSI_BINS):
            t = F.when(
                F.col("o_totalprice") >= F.col(f"e{d}"), 1
            ).otherwise(0)
            binexpr = t if binexpr is None else binexpr + t
        counts = (
            o.crossJoin(F.broadcast(edges))
            .select(binexpr.cast("long").alias("bin"), "is_early")
            .groupBy("bin")
            .agg(
                F.sum("is_early").alias("n_early"),
                F.sum(F.lit(1) - F.col("is_early")).alias("n_late"),
            )
        )
        whole = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        pe = F.col("n_early").cast("double") / F.sum("n_early").over(
            whole
        ).cast("double")
        pl = F.col("n_late").cast("double") / F.sum("n_late").over(
            whole
        ).cast("double")
        return counts.select(
            "bin",
            "n_early",
            "n_late",
            stable_round(pe, 6).alias("p_early"),
            stable_round(pl, 6).alias("p_late"),
            stable_round((pe - pl) * F.log(pe / pl), 6).alias("psi_term"),
        )

    @register(
        "pchart_purchase_rate_daily",
        oracle=f"""
WITH daily AS (
    SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_epoch,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS x
    FROM events GROUP BY 1
), tot AS (
    SELECT CAST(sum(x) AS DOUBLE) / sum(n) AS pbar FROM daily
)
SELECT day_epoch, n, x,
       {stable_round_sql('CAST(x AS DOUBLE) / n', 6)} AS p,
       {stable_round_sql(
           'tot.pbar + 3.0 * sqrt(tot.pbar * (1.0 - tot.pbar) / n)', 6)}
           AS ucl,
       {stable_round_sql(
           'greatest(tot.pbar - 3.0 * sqrt(tot.pbar * (1.0 - tot.pbar) / n),'
           ' 0.0)', 6)} AS lcl,
       CASE WHEN CAST(x AS DOUBLE) / n
                 > tot.pbar + 3.0 * sqrt(tot.pbar * (1.0 - tot.pbar) / n)
              OR CAST(x AS DOUBLE) / n
                 < greatest(tot.pbar
                     - 3.0 * sqrt(tot.pbar * (1.0 - tot.pbar) / n), 0.0)
            THEN 1 ELSE 0 END AS out_of_control
FROM daily, tot
""",
        doc="Shewhart p-chart over the daily purchase rate: centre "
        "line pbar from exact integer totals, per-day 3-sigma "
        "binomial control limits pbar +/- 3*sqrt(pbar(1-pbar)/n) "
        "(variable-n form, LCL floored at 0), and the out-of-control "
        "flag — the SPC monitor an event pipeline runs on every "
        "conversion metric. One combinable daily aggregate + a "
        "1-row broadcast centre line; limits are a fixed double "
        "expression on exact counts, identical cross-engine.",
    )
    def pchart_purchase_rate_daily(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        daily = (
            load_table(spark, sf_dir, "events")
            .groupBy(
                F.floor(F.unix_timestamp("ts") / F.lit(86400))
                .cast("long")
                .alias("day_epoch")
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                ).alias("x"),
            )
        )
        tot = daily.agg(
            (
                F.sum("x").cast("double") / F.sum("n").cast("double")
            ).alias("pbar")
        )
        p = F.col("x").cast("double") / F.col("n").cast("double")
        sigma = F.sqrt(
            F.col("pbar") * (F.lit(1.0) - F.col("pbar")) / F.col("n")
        )
        ucl = F.col("pbar") + F.lit(3.0) * sigma
        lcl = F.greatest(
            F.col("pbar") - F.lit(3.0) * sigma, F.lit(0.0)
        )
        return daily.crossJoin(F.broadcast(tot)).select(
            "day_epoch",
            "n",
            "x",
            stable_round(p, 6).alias("p"),
            stable_round(ucl, 6).alias("ucl"),
            stable_round(lcl, 6).alias("lcl"),
            F.when((p > ucl) | (p < lcl), 1).otherwise(0).alias(
                "out_of_control"
            ),
        )

    @register(
        "conformal_interval_width",
        oracle=f"""
WITH {TICKS_ORACLE_CTE.strip()},
base AS (
    SELECT symbol, open AS x, close AS y, ts, tick_id
    FROM ticks WHERE open IS NOT NULL
), idx AS (
    SELECT *, row_number() OVER (PARTITION BY symbol
                                 ORDER BY ts, tick_id) AS rn,
           count(*) OVER (PARTITION BY symbol) AS n
    FROM base
), train AS (
    SELECT * FROM idx WHERE rn <= floor({CONF_TRAIN_FRAC} * n)
), fit AS (
    SELECT symbol,
           CAST(count(*) AS BIGINT) AS n_train,
           CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(y AS DECIMAL(27,6))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
           CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx
    FROM train GROUP BY 1
), ab AS (
    SELECT symbol, n_train,
           (n_train * sxy - sx * sy) / (n_train * sxx - sx * sx) AS b,
           (sy - (n_train * sxy - sx * sy) / (n_train * sxx - sx * sx)
                 * sx) / n_train AS a
    FROM fit
), cal AS (
    SELECT i.symbol, ab.n_train, ab.a, ab.b,
           abs(i.y - (ab.a + ab.b * i.x)) AS ar
    FROM idx i JOIN ab ON i.symbol = ab.symbol
    WHERE i.rn > floor({CONF_TRAIN_FRAC} * i.n)
)
SELECT symbol,
       n_train,
       CAST(count(*) AS BIGINT) AS n_cal,
       {stable_round_sql('any_value(b)', 6)} AS slope,
       {stable_round_sql('any_value(a)', 6)} AS intercept,
       {stable_round_sql(f'quantile_cont(ar, {CONF_Q})', 6)} AS qhat90
FROM cal GROUP BY symbol, n_train
""",
        doc=f"Split-conformal regression interval per symbol: OLS "
        f"close-on-open fit from the chronologically first "
        f"{CONF_TRAIN_FRAC:.0%} of ticks (decimal sufficient sums — "
        f"same contract as pergroup_linreg_models), then the "
        f"{CONF_Q:.0%} exact quantile of absolute residuals on the "
        f"held-out calibration tail = the distribution-free interval "
        f"half-width (finite-sample coverage guarantee, no error "
        f"model assumed). The chronological split is a row_number "
        f"over the per-symbol sort every indicator already pays; "
        f"the model is one broadcast-sized row per key joined back, "
        f"never a driver dict.",
    )
    def conformal_interval_width(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        t = ticks(spark, sf_dir).where(F.col("open").isNotNull())
        base = t.select(
            "symbol",
            F.col("open").alias("x"),
            F.col("close").alias("y"),
            "ts",
            "tick_id",
        )
        wsym = Window.partitionBy("symbol")
        idx = base.withColumns(
            {
                "rn": F.row_number().over(wsym.orderBy("ts", "tick_id")),
                "n": F.count(F.lit(1)).over(wsym),
            }
        )
        cut = F.floor(F.lit(CONF_TRAIN_FRAC) * F.col("n"))
        train = idx.where(F.col("rn") <= cut)
        x, y = F.col("x"), F.col("y")
        fit = train.groupBy("symbol").agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(x.cast(DECIMAL_T)).cast("double").alias("sx"),
            F.sum(y.cast(DECIMAL_T)).cast("double").alias("sy"),
            F.sum((x * y).cast("decimal(38,6)")).cast("double").alias("sxy"),
            F.sum((x * x).cast("decimal(38,6)")).cast("double").alias("sxx"),
        )
        nt = F.col("n_train")
        b = (nt * F.col("sxy") - F.col("sx") * F.col("sy")) / (
            nt * F.col("sxx") - F.col("sx") * F.col("sx")
        )
        ab = fit.select(
            "symbol",
            "n_train",
            b.alias("b"),
            ((F.col("sy") - b * F.col("sx")) / nt).alias("a"),
        )
        cal = (
            idx.where(F.col("rn") > cut)
            .join(F.broadcast(ab), "symbol")
            .select(
                "symbol",
                "n_train",
                "a",
                "b",
                F.abs(
                    F.col("y") - (F.col("a") + F.col("b") * F.col("x"))
                ).alias("ar"),
            )
        )
        return cal.groupBy("symbol", "n_train").agg(
            F.count(F.lit(1)).alias("n_cal"),
            stable_round(F.first("b"), 6).alias("slope"),
            stable_round(F.first("a"), 6).alias("intercept"),
            stable_round(F.percentile("ar", F.lit(CONF_Q)), 6).alias(
                "qhat90"
            ),
        )


_register()
