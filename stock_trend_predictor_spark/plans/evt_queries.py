"""Extreme-value analysis: Gumbel fit over weekly block maxima.

VaR/CVaR (var_cvar_per_symbol) read the tail of the OBSERVED return
distribution; extreme-value theory extrapolates BEYOND it. The classic
block-maxima recipe: partition days into weekly blocks, take each
block's maximum absolute log return, fit a Gumbel law by the method of
moments (beta = s * sqrt(6) / pi, mu = m - gamma * beta with
Euler-Mascheroni gamma), and report the T-block return level
mu - beta * ln(-ln(1 - 1/T)) — "the worst weekly move expected once
per T weeks".

Everything reduces to decimal sufficient sums over the #symbols x
#weeks block-maxima table (itself one (symbol, day) collapse + one
(symbol, week) max), so the fit is two combinable aggregates at any
data scale and bit-stable under repartitioning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.plans.spectral_queries import (
    _DAILIES_CTE,
    _dailies,
)

#: Euler-Mascheroni constant for the Gumbel moment fit.
_EULER_GAMMA = 0.5772156649015329

#: return-level horizon, in weekly blocks.
EVT_T_BLOCKS = 100


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    level_factor = -math.log(-math.log(1.0 - 1.0 / EVT_T_BLOCKS))

    @register(
        "gumbel_weekly_maxima",
        oracle=f"""
WITH {_DAILIES_CTE.strip()},
rets AS (
    SELECT symbol, day,
           abs(ln(c / lag(c) OVER (PARTITION BY symbol
                                   ORDER BY day))) AS aret
    FROM dly
), blocks AS (
    SELECT symbol, CAST(floor(day / 7.0) AS BIGINT) AS week,
           max(aret) AS block_max
    FROM rets WHERE aret IS NOT NULL
    GROUP BY 1, 2
), mom AS (
    SELECT symbol,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CAST(block_max AS DECIMAL(38,18))) AS DOUBLE)
               / count(*) AS m,
           sqrt(greatest((CAST(SUM(CAST(block_max * block_max
                              AS DECIMAL(38,18))) AS DOUBLE)
                 - pow(CAST(SUM(CAST(block_max AS DECIMAL(38,18)))
                            AS DOUBLE), 2) / count(*))
                / (count(*) - 1), 0.0)) AS s
    FROM blocks GROUP BY symbol HAVING count(*) >= 2
)
SELECT symbol, n_blocks,
       {stable_round_sql(f'm - {_EULER_GAMMA!r} * s * sqrt(6.0)'
                         f' / pi()', 6)} AS gumbel_mu,
       {stable_round_sql('s * sqrt(6.0) / pi()', 6)} AS gumbel_beta,
       {stable_round_sql(
           f'(m - {_EULER_GAMMA!r} * s * sqrt(6.0) / pi())'
           f' + s * sqrt(6.0) / pi() * {level_factor!r}', 6)}
           AS return_level_t{EVT_T_BLOCKS}
FROM mom
""",
        doc=f"Gumbel extreme-value fit per symbol over weekly maxima "
        f"of |daily log return|: block maxima from the shared "
        f"(symbol, day) collapse, method-of-moments parameters "
        f"(beta = s*sqrt(6)/pi, mu = m - gamma*beta, sample std) "
        f"from decimal sufficient sums, and the once-per-"
        f"{EVT_T_BLOCKS}-weeks return level mu + beta * "
        f"{level_factor:.4f}. Extrapolates the tail BEYOND the "
        f"observed quantiles VaR stops at; symbols with fewer than "
        f"2 blocks are excluded (no variance to fit). Two "
        f"combinable aggregates after the dailies lag — nothing "
        f"scales with tick count.",
    )
    def gumbel_weekly_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _dailies(spark, sf_dir)
        w = Window.partitionBy("symbol").orderBy("day")
        rets = d.select(
            "symbol",
            "day",
            F.abs(F.log(F.col("c") / F.lag("c").over(w))).alias("aret"),
        ).where(F.col("aret").isNotNull())
        blocks = rets.groupBy(
            "symbol",
            F.floor(F.col("day") / 7.0).cast("long").alias("week"),
        ).agg(F.max("aret").alias("block_max"))
        sdec = F.sum(F.col("block_max").cast("decimal(38,18)")).cast(
            "double"
        )
        sxx = F.sum(
            (F.col("block_max") * F.col("block_max")).cast(
                "decimal(38,18)"
            )
        ).cast("double")
        n = F.count(F.lit(1))
        mom = (
            blocks.groupBy("symbol")
            .agg(
                n.alias("n_blocks"),
                (sdec / n).alias("m"),
                # greatest(, 0): the double cancellation can go
                # epsilon-negative for (near-)constant block maxima —
                # Spark sqrt would yield NaN but DuckDB sqrt RAISES,
                # killing the whole oracle run; both engines clamp
                F.sqrt(
                    F.greatest(
                        (sxx - F.pow(sdec, 2) / n) / (n - 1),
                        F.lit(0.0),
                    )
                ).alias("s"),
            )
            .where(F.col("n_blocks") >= 2)
        )
        beta = F.col("s") * F.lit(math.sqrt(6.0)) / F.lit(math.pi)
        mu = F.col("m") - F.lit(_EULER_GAMMA) * beta
        return mom.select(
            "symbol",
            "n_blocks",
            stable_round(mu, 6).alias("gumbel_mu"),
            stable_round(beta, 6).alias("gumbel_beta"),
            stable_round(mu + beta * F.lit(level_factor), 6).alias(
                f"return_level_t{EVT_T_BLOCKS}"
            ),
        )


_register()
