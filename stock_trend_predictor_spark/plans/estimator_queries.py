"""Closed-form estimators: hyperparameter selection by validation
loss, and the Roll microstructure spread.

Both queries show a pattern that matters at 100 TB: model SELECTION
(not just fitting) expressed entirely through combinable sufficient
statistics — the candidate grid multiplies a #keys-row stats table,
never the data. No Python touches a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import (
    TICKS_ORACLE_CTE,
    ticks,
)

#: ridge penalty grid and the chronological train fraction.
RIDGE_LAMBDAS = (0.1, 1.0, 10.0)
RIDGE_TRAIN_FRAC = 0.7

_SUMS = """
    CAST(count(*) AS BIGINT) AS m,
    CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(y AS DECIMAL(27,6))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
"""


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "ridge_lambda_sweep_best",
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
), tr AS (
    SELECT symbol, {_SUMS}
    FROM idx WHERE rn <= floor({RIDGE_TRAIN_FRAC} * n) GROUP BY symbol
), va AS (
    SELECT symbol, {_SUMS}
    FROM idx WHERE rn > floor({RIDGE_TRAIN_FRAC} * n) GROUP BY symbol
), grid AS (
    SELECT unnest([{", ".join(f"CAST({l} AS DOUBLE)" for l in RIDGE_LAMBDAS)}])
           AS lam
), fit AS (
    SELECT t.symbol, g.lam,
           (t.sxy - t.sx * t.sy / t.m)
             / ((t.sxx - t.sx * t.sx / t.m) + g.lam) AS b,
           t.sy / t.m - (t.sxy - t.sx * t.sy / t.m)
             / ((t.sxx - t.sx * t.sx / t.m) + g.lam) * (t.sx / t.m) AS a
    FROM tr t CROSS JOIN grid g
), scored AS (
    SELECT f.symbol, f.lam, f.a, f.b,
           (v.syy - 2.0 * f.a * v.sy - 2.0 * f.b * v.sxy
            + f.a * f.a * v.m + 2.0 * f.a * f.b * v.sx
            + f.b * f.b * v.sxx) / v.m AS mse
    FROM fit f JOIN va v ON f.symbol = v.symbol
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY symbol
                                 ORDER BY mse, lam) AS rk
    FROM scored
)
SELECT symbol, lam AS best_lambda,
       {stable_round_sql('b', 6)} AS slope,
       {stable_round_sql('a', 6)} AS intercept,
       {stable_round_sql('mse', 6)} AS val_mse
FROM ranked WHERE rk = 1
""",
        doc=f"Per-symbol ridge hyperparameter sweep with validation "
        f"selection, fully closed-form: centered ridge slope "
        f"Sxy/(Sxx + lambda) and intercept from the chronological "
        f"first {RIDGE_TRAIN_FRAC:.0%} of ticks, validation MSE "
        f"EXPANDED into sufficient sums (syy - 2a*sy - 2b*sxy + "
        f"a^2*m + 2ab*sx + b^2*sxx), so the whole sweep — fit, "
        f"score, argmin over lambda in {RIDGE_LAMBDAS} — is a "
        f"cross-join of a #symbols-row stats table with a "
        f"{len(RIDGE_LAMBDAS)}-row grid. Model SELECTION without "
        f"rescanning data: the shape that makes a 100-point grid "
        f"search on 100 TB cost two aggregates. Deterministic "
        f"(mse, lambda) argmin tie-break.",
    )
    def ridge_lambda_sweep_best(
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
        cut = F.floor(F.lit(RIDGE_TRAIN_FRAC) * F.col("n"))
        x, y = F.col("x"), F.col("y")

        def sums(df: DataFrame) -> DataFrame:
            return df.groupBy("symbol").agg(
                F.count(F.lit(1)).alias("m"),
                F.sum(x.cast("decimal(27,6)")).cast("double").alias("sx"),
                F.sum(y.cast("decimal(27,6)")).cast("double").alias("sy"),
                F.sum((x * y).cast("decimal(38,6)"))
                .cast("double")
                .alias("sxy"),
                F.sum((x * x).cast("decimal(38,6)"))
                .cast("double")
                .alias("sxx"),
                F.sum((y * y).cast("decimal(38,6)"))
                .cast("double")
                .alias("syy"),
            )

        tr = sums(idx.where(F.col("rn") <= cut))
        va = sums(idx.where(F.col("rn") > cut)).select(
            F.col("symbol").alias("vsym"),
            F.col("m").alias("vm"),
            F.col("sx").alias("vsx"),
            F.col("sy").alias("vsy"),
            F.col("sxy").alias("vsxy"),
            F.col("sxx").alias("vsxx"),
            F.col("syy").alias("vsyy"),
        )
        grid = spark.createDataFrame(
            [(l,) for l in RIDGE_LAMBDAS], "lam double"
        )
        sxy_c = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("m")
        sxx_c = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("m")
        b = sxy_c / (sxx_c + F.col("lam"))
        a = F.col("sy") / F.col("m") - b * (F.col("sx") / F.col("m"))
        fit = tr.crossJoin(F.broadcast(grid)).withColumns(
            {"b": b, "a": a}
        )
        mse = (
            F.col("vsyy")
            - 2.0 * F.col("a") * F.col("vsy")
            - 2.0 * F.col("b") * F.col("vsxy")
            + F.col("a") * F.col("a") * F.col("vm")
            + 2.0 * F.col("a") * F.col("b") * F.col("vsx")
            + F.col("b") * F.col("b") * F.col("vsxx")
        ) / F.col("vm")
        scored = fit.join(
            va, fit["symbol"] == va["vsym"]
        ).withColumn("mse", mse)
        ranked = scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("symbol").orderBy("mse", "lam")
            ),
        )
        return ranked.where(F.col("rk") == 1).select(
            "symbol",
            F.col("lam").alias("best_lambda"),
            stable_round("b", 6).alias("slope"),
            stable_round("a", 6).alias("intercept"),
            stable_round("mse", 6).alias("val_mse"),
        )

    @register(
        "roll_spread_estimator",
        oracle=f"""
WITH {TICKS_ORACLE_CTE.strip()},
deltas AS (
    SELECT symbol, close - open AS d, ts, tick_id
    FROM ticks WHERE open IS NOT NULL
), lagged AS (
    SELECT symbol, d,
           lag(d) OVER (PARTITION BY symbol
                        ORDER BY ts, tick_id) AS dl
    FROM deltas
), sums AS (
    SELECT symbol,
           CAST(count(*) AS BIGINT) AS m,
           CAST(SUM(CAST(d AS DECIMAL(27,6))) AS DOUBLE) AS sd,
           CAST(SUM(CAST(dl AS DECIMAL(27,6))) AS DOUBLE) AS sdl,
           CAST(SUM(CAST(d * dl AS DECIMAL(38,6))) AS DOUBLE) AS sddl
    FROM lagged WHERE dl IS NOT NULL GROUP BY 1
)
SELECT symbol, m AS n_pairs,
       {stable_round_sql(
           '(sddl - sd * sdl / m) / (m - 1)', 9)} AS autocov_1,
       {stable_round_sql(
           'CASE WHEN (sddl - sd * sdl / m) / (m - 1) < 0'
           ' THEN 2.0 * sqrt(-((sddl - sd * sdl / m) / (m - 1)))'
           ' ELSE 0.0 END', 6)} AS roll_spread
FROM sums
""",
        doc="Roll (1984) effective-spread estimator per symbol: "
        "2*sqrt(-cov(dp_t, dp_{t-1})) from the first-order "
        "autocovariance of price changes — bid-ask bounce makes "
        "consecutive changes negatively correlated, and the "
        "magnitude recovers the spread without quote data. Sample "
        "autocovariance from decimal sufficient sums over one "
        "per-symbol sort (the lag the indicator tier already pays); "
        "a non-negative autocovariance means no measurable bounce "
        "and reports 0 (the standard convention). One combinable "
        "aggregate; output is #symbols rows.",
    )
    def roll_spread_estimator(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        t = ticks(spark, sf_dir).where(F.col("open").isNotNull())
        deltas = t.select(
            "symbol",
            (F.col("close") - F.col("open")).alias("d"),
            "ts",
            "tick_id",
        )
        lagged = deltas.withColumn(
            "dl",
            F.lag("d").over(
                Window.partitionBy("symbol").orderBy("ts", "tick_id")
            ),
        ).where(F.col("dl").isNotNull())
        d, dl = F.col("d"), F.col("dl")
        sums = lagged.groupBy("symbol").agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(d.cast("decimal(27,6)")).cast("double").alias("sd"),
            F.sum(dl.cast("decimal(27,6)")).cast("double").alias("sdl"),
            F.sum((d * dl).cast("decimal(38,6)"))
            .cast("double")
            .alias("sddl"),
        )
        acov = (
            F.col("sddl") - F.col("sd") * F.col("sdl") / F.col("m")
        ) / (F.col("m") - 1)
        return sums.select(
            "symbol",
            F.col("m").alias("n_pairs"),
            stable_round(acov, 9).alias("autocov_1"),
            stable_round(
                F.when(
                    acov < 0, 2.0 * F.sqrt(-acov)
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("roll_spread"),
        )


_register()
