"""The composed trend verdict: the reference's end goal (an up/down
movement call per symbol, ml_model/predict_from_vm4.py:31-39) expressed as
one engine query voting four independent indicator sub-pipelines.

Lives in its own module because it composes registry entries from
signal_queries (RSI) and indicator_queries (Mann-Kendall, Theil-Sen,
OBV) — plans/__init__ imports it after both, mirroring how
span_queries hosts corpus_keep_decision for the text side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    # ------------------------------------------------------------------
    from stock_trend_predictor_spark.plans.registry import REGISTRY

    _mk_oracle = REGISTRY["mann_kendall_banded"].oracle
    _ts_oracle = REGISTRY["theil_sen_banded_slope"].oracle
    _rsi_oracle = REGISTRY["rsi_cutler_14"].oracle
    _obv_oracle = REGISTRY["obv_tick_flow"].oracle

    @register(
        "trend_consensus_verdict",
        oracle=f"""
    WITH mk AS MATERIALIZED (
    {_mk_oracle}
    ), tsl AS MATERIALIZED (
    {_ts_oracle}
    ), rsi_all AS MATERIALIZED (
    {_rsi_oracle}
    ), obv_all AS MATERIALIZED (
    {_obv_oracle}
    ), last_rsi AS (
    SELECT symbol, arg_max(rsi14, ts) AS rsi_last
    FROM rsi_all WHERE rsi14 IS NOT NULL GROUP BY 1
    ), last_obv AS (
    SELECT symbol, arg_max(obv_ticks, ts) AS obv_last
    FROM obv_all GROUP BY 1
    ), votes AS (
    SELECT mk.symbol, mk.trend_score, t.ts_slope, r.rsi_last, o.obv_last,
           CAST(CASE WHEN mk.trend_score > 0.02 THEN 1 ELSE 0 END
              + CASE WHEN t.ts_slope > 0 THEN 1 ELSE 0 END
              + CASE WHEN r.rsi_last > 50 THEN 1 ELSE 0 END
              + CASE WHEN o.obv_last > 0 THEN 1 ELSE 0 END AS BIGINT)
               AS up_votes
    FROM mk
    JOIN tsl t ON t.symbol = mk.symbol
    JOIN last_rsi r ON r.symbol = mk.symbol
    JOIN last_obv o ON o.symbol = mk.symbol
    )
    SELECT symbol, trend_score, ts_slope, rsi_last, obv_last, up_votes,
       CASE WHEN up_votes >= 3 THEN 'up'
            WHEN up_votes <= 1 THEN 'down'
            ELSE 'mixed' END AS verdict
    FROM votes
    """,
        doc="The composed per-symbol trend verdict — the reference's "
        "whole PURPOSE (ml_model/predict_from_vm4.py:31 labels up/down "
        "movement and predicts it) expressed as one engine query over "
        "four independent indicator sub-pipelines: banded Mann-"
        "Kendall monotony, Theil-Sen robust slope, latest RSI level, "
        "and on-balance tick flow, majority-voted into up / mixed / "
        "down. Mirrors corpus_keep_decision's composition pattern on "
        "the stock side: the ORACLE nests the four sub-pipelines' SQL "
        "as MATERIALIZED sub-CTEs verbatim, while the Spark plan FUSES "
        "them: all four signals are windows/lags over the identical "
        "(symbol, ts, tick_id) sort, so one Window batch computes the "
        "ten trend lags, the RSI gain/loss sums, and the tick "
        "direction in a single exchange (4 independent sorts in the "
        "composed form -> 1; oracle equality proves the fusion "
        "changes nothing). All four signals reduce to one row per "
        "symbol before the verdict joins, so the vote layer moves "
        "symbols-count rows however large the tick history is.",
    )
    def trend_consensus_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql.window import Window

        from stock_trend_predictor_spark.functions.exact import (
            DECIMAL_T,
            stable_round,
        )
        from stock_trend_predictor_spark.sources.tables import (
            materialize_once,
            ticks,
        )

        t = ticks(spark, sf_dir)
        s = Window.partitionBy("symbol").orderBy("ts", "tick_id")
        v = s.rowsBetween(-13, 0)
        delta = F.col("close") - F.col("open")
        # ONE Window batch over one sort: trend lags + RSI sums + dir.
        # RSI note: the standalone rsi_cutler_14 drops the null-open
        # head row BEFORE windowing; here the window runs on the
        # unfiltered frame but sums/counts skip the null delta, so for
        # every row past the symbol head the 14-row frames contain the
        # identical delta set — and only the LAST row's RSI feeds the
        # verdict. Oracle equality (which replays the standalone
        # form) proves the equivalence.
        base = t.withColumns(
            {
                **{f"c{k}": F.lag("close", k).over(s) for k in range(1, 11)},
                "_sg": F.sum(F.greatest(delta, F.lit(0.0)).cast(DECIMAL_T))
                .over(v)
                .cast("double"),
                "_sl": F.sum(F.greatest(-delta, F.lit(0.0)).cast(DECIMAL_T))
                .over(v)
                .cast("double"),
                "_cnt": F.count(delta).over(v),
                "_dir": F.signum(delta).cast("bigint"),
            }
        )
        base = materialize_once(base)

        stack_args = ", ".join(f"{k}, c{k}" for k in range(1, 11))
        pairs = base.selectExpr(
            "symbol",
            "close",
            f"stack(10, {stack_args}) AS (k, ck)",
        ).where(F.col("ck").isNotNull())
        sgn = F.signum(F.col("close") - F.col("ck")).cast("bigint")
        slope = (F.col("close") - F.col("ck")) / F.col("k").cast("double")
        trend = pairs.groupBy("symbol").agg(
            stable_round(
                F.sum(sgn).cast("double") / F.count(F.lit(1)), 6
            ).alias("trend_score"),
            stable_round(
                F.percentile(slope, F.lit(0.5)), 6
            ).alias("ts_slope"),
        )

        sg, sl = F.col("_sg"), F.col("_sl")
        rsi14 = F.when(
            F.col("_cnt") == 14,
            F.when(sl == 0.0, F.lit(100.0)).otherwise(
                stable_round(100.0 - 100.0 / (1.0 + sg / sl), 6)
            ),
        )
        last = base.withColumn("_rsi", rsi14).groupBy("symbol").agg(
            F.max_by("_rsi", F.when(F.col("_rsi").isNotNull(), F.col("ts")))
            .alias("rsi_last"),
            F.sum("_dir").alias("obv_last"),
        )
        j = trend.join(last, "symbol")
        up = (
            F.when(F.col("trend_score") > 0.02, 1).otherwise(0)
            + F.when(F.col("ts_slope") > 0, 1).otherwise(0)
            + F.when(F.col("rsi_last") > 50, 1).otherwise(0)
            + F.when(F.col("obv_last") > 0, 1).otherwise(0)
        ).cast("bigint")
        j = j.withColumn("up_votes", up)
        verdict = (
            F.when(F.col("up_votes") >= 3, F.lit("up"))
            .when(F.col("up_votes") <= 1, F.lit("down"))
            .otherwise(F.lit("mixed"))
        )
        return j.select(
            "symbol",
            "trend_score",
            "ts_slope",
            "rsi_last",
            "obv_last",
            "up_votes",
            verdict.alias("verdict"),
        )




_register()
