"""Feature-engineering primitives as pure aggregates: a decision
stump learned from rank statistics, and leakage-free k-fold target
encoding.

Both show the pattern that matters at 100 TB: the "training loop" is
sufficient statistics + a tiny candidate grid, so model fitting costs
one ordered pass and the data is never rescanned per candidate
(the ridge_lambda_sweep_best shape, applied to trees and to
categorical encoders).
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

#: candidate split ranks: deciles 1..9 of the per-symbol ordered ticks.
STUMP_DECILES = tuple(range(1, 10))

#: number of folds for target encoding.
TE_FOLDS = 5


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    dec_list = ", ".join(str(d) for d in STUMP_DECILES)

    @register(
        "decision_stump_movement",
        oracle=f"""
WITH {TICKS_ORACLE_CTE.strip()},
base AS (
    SELECT symbol, open AS x,
           CASE WHEN close > open THEN 1 ELSE 0 END AS y,
           ts, tick_id
    FROM ticks WHERE open IS NOT NULL
), idx AS (
    SELECT symbol, x, y,
           row_number() OVER (PARTITION BY symbol
                              ORDER BY x, tick_id) AS rn,
           CAST(SUM(y) OVER (PARTITION BY symbol ORDER BY x, tick_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS BIGINT) AS cpos,
           count(*) OVER (PARTITION BY symbol) AS n,
           CAST(SUM(y) OVER (PARTITION BY symbol) AS BIGINT) AS pos
    FROM base
), cand AS (
    SELECT DISTINCT i.symbol, i.x AS threshold, i.rn AS r,
                    i.cpos, i.n, i.pos
    FROM idx i JOIN (SELECT unnest([{dec_list}]) AS d) g
      ON i.rn = CAST(floor(i.n * g.d / 10.0) AS BIGINT)
    WHERE i.rn >= 1 AND i.rn < i.n
), scored AS (
    SELECT symbol, threshold, r, n,
           (1.0 - pow(CAST(pos AS DOUBLE) / n, 2)
                - pow(CAST(n - pos AS DOUBLE) / n, 2))
         - ((CAST(r AS DOUBLE) / n)
              * (1.0 - pow(CAST(cpos AS DOUBLE) / r, 2)
                     - pow(CAST(r - cpos AS DOUBLE) / r, 2))
            + (CAST(n - r AS DOUBLE) / n)
              * (1.0 - pow(CAST(pos - cpos AS DOUBLE) / (n - r), 2)
                     - pow(CAST((n - r) - (pos - cpos) AS DOUBLE)
                           / (n - r), 2))) AS gain,
           (greatest(cpos, r - cpos)
            + greatest(pos - cpos, (n - r) - (pos - cpos))) AS n_right_pred
    FROM cand
), best AS (
    SELECT *, row_number() OVER (PARTITION BY symbol
                                 ORDER BY gain DESC, threshold, r) AS rk
    FROM scored
)
SELECT symbol, CAST(n AS BIGINT) AS n_ticks,
       {stable_round_sql('threshold', 6)} AS threshold,
       {stable_round_sql('gain', 6)} AS gini_gain,
       {stable_round_sql('CAST(n_right_pred AS DOUBLE) / n', 6)}
           AS train_accuracy
FROM best WHERE rk = 1
""",
        doc="Per-symbol decision stump for the up/down movement label "
        "(the reference's binary target, ml_model/predict_from_vm4.py:31): "
        "candidate splits are the 9 per-symbol decile RANKS of the "
        "ordered open price, and every candidate's Gini gain comes "
        "from two windowed integers (cumulative positives, rank) — "
        "fit + argmax over candidates costs ONE sorted window pass, "
        "data is never rescanned per threshold. Splits are defined "
        "by rank in the deterministic (x, tick_id) order (ties at "
        "the boundary stay left), tie-break (gain DESC, threshold, "
        "rank). Train accuracy = majority class per side. The CART "
        "inner loop as a Catalyst plan.",
    )
    def decision_stump_movement(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        t = ticks(spark, sf_dir).where(F.col("open").isNotNull())
        base = t.select(
            "symbol",
            F.col("open").alias("x"),
            F.when(F.col("close") > F.col("open"), 1)
            .otherwise(0)
            .alias("y"),
            "tick_id",
        )
        wsym = Window.partitionBy("symbol")
        word = wsym.orderBy("x", "tick_id")
        idx = base.select(
            "symbol",
            "x",
            F.row_number().over(word).alias("rn"),
            F.sum("y")
            .over(
                word.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .alias("cpos"),
            F.count(F.lit(1)).over(wsym).alias("n"),
            F.sum("y").over(wsym).alias("pos"),
        )
        rank_set = F.array(
            *[
                F.floor(F.col("n") * F.lit(d) / 10.0).cast("long")
                for d in STUMP_DECILES
            ]
        )
        cand = (
            idx.where(
                F.array_contains(rank_set, F.col("rn"))
                & (F.col("rn") >= 1)
                & (F.col("rn") < F.col("n"))
            )
            .select(
                "symbol",
                F.col("x").alias("threshold"),
                F.col("rn").alias("r"),
                "cpos",
                "n",
                "pos",
            )
            .distinct()
        )
        n, r = F.col("n"), F.col("r")
        pos, cpos = F.col("pos"), F.col("cpos")

        def gini(p, tot):
            return (
                F.lit(1.0)
                - F.pow(p.cast("double") / tot, 2)
                - F.pow((tot - p).cast("double") / tot, 2)
            )

        gain = gini(pos, n) - (
            (r.cast("double") / n) * gini(cpos, r)
            + ((n - r).cast("double") / n) * gini(pos - cpos, n - r)
        )
        n_right = F.greatest(cpos, r - cpos) + F.greatest(
            pos - cpos, (n - r) - (pos - cpos)
        )
        scored = cand.select(
            "symbol",
            "threshold",
            "r",
            "n",
            gain.alias("gain"),
            n_right.alias("n_right_pred"),
        )
        wbest = Window.partitionBy("symbol").orderBy(
            F.col("gain").desc(), "threshold", "r"
        )
        return (
            scored.withColumn("rk", F.row_number().over(wbest))
            .where(F.col("rk") == 1)
            .select(
                "symbol",
                F.col("n").alias("n_ticks"),
                stable_round(F.col("threshold"), 6).alias("threshold"),
                stable_round(F.col("gain"), 6).alias("gini_gain"),
                stable_round(
                    F.col("n_right_pred").cast("double") / F.col("n"), 6
                ).alias("train_accuracy"),
            )
        )

    # ------------------------------------------------------------------
    @register(
        "target_encoding_kfold",
        oracle=f"""
WITH tagged AS (
    SELECT o_orderpriority AS priority,
           CAST(o_orderkey % {TE_FOLDS} AS BIGINT) AS fold,
           o_totalprice
    FROM orders
), per_cell AS (
    SELECT priority, fold,
           CAST(count(*) AS BIGINT) AS n_pf,
           SUM(CAST(o_totalprice AS {DECIMAL_T})) AS s_pf
    FROM tagged GROUP BY 1, 2
), per_prio AS (
    SELECT priority,
           CAST(SUM(n_pf) AS BIGINT) AS n_p,
           CAST(SUM(s_pf) AS DECIMAL(38,6)) AS s_p
    FROM per_cell GROUP BY priority
)
SELECT c.priority, c.fold, c.n_pf AS n_rows,
       {stable_round_sql(
           'CAST(p.s_p - c.s_pf AS DOUBLE) / (p.n_p - c.n_pf)', 6)}
           AS target_encoding
FROM per_cell c JOIN per_prio p ON p.priority = c.priority
""",
        doc=f"Leakage-free {TE_FOLDS}-fold mean target encoding of "
        f"order priority against total price: each (priority, fold) "
        f"cell's encoding is the mean over the OTHER folds, computed "
        f"as (S_p - S_pf) / (n_p - n_pf) from per-cell decimal sums "
        f"— the all-folds scan happens once and every fold's "
        f"leave-out mean is a subtraction, instead of {TE_FOLDS} "
        f"re-aggregations. Decimal partials keep the encoding "
        f"bit-stable under repartitioning. The feature-engineering "
        f"step every tabular model pipeline runs before fit.",
    )
    def target_encoding_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        tagged = o.select(
            F.col("o_orderpriority").alias("priority"),
            (F.col("o_orderkey") % TE_FOLDS).alias("fold"),
            "o_totalprice",
        )
        per_cell = tagged.groupBy("priority", "fold").agg(
            F.count(F.lit(1)).alias("n_pf"),
            F.sum(F.col("o_totalprice").cast(DECIMAL_T)).alias("s_pf"),
        )
        per_prio = per_cell.groupBy("priority").agg(
            F.sum("n_pf").alias("n_p"),
            F.sum("s_pf").cast("decimal(38,6)").alias("s_p"),
        )
        return (
            per_cell.join(per_prio, "priority")
            .select(
                "priority",
                "fold",
                F.col("n_pf").alias("n_rows"),
                stable_round(
                    (F.col("s_p") - F.col("s_pf")).cast("double")
                    / (F.col("n_p") - F.col("n_pf")),
                    6,
                ).alias("target_encoding"),
            )
        )


_register()
