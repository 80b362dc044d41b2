"""The composed trend verdict: the reference's end goal (an up/down
movement call per symbol, ml_model/train_model.py:20-35) expressed as
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
        "whole PURPOSE (ml_model/train_model.py labels up/down "
        "movement and predicts it) expressed as one engine query over "
        "four independent indicator sub-pipelines: banded Mann-"
        "Kendall monotony, Theil-Sen robust slope, latest RSI level, "
        "and on-balance tick flow, majority-voted into up / mixed / "
        "down. Mirrors corpus_keep_decision's composition pattern on "
        "the stock side: registry plans reused as sub-pipelines, "
        "their oracles nested as MATERIALIZED sub-CTEs. All four "
        "signals reduce to one row per symbol before the joins, so "
        "the verdict layer moves symbols-count rows however large "
        "the tick history is.",
    )
    def trend_consensus_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
        mk = REGISTRY["mann_kendall_banded"].fn(spark, sf_dir).select(
            "symbol", "trend_score"
        )
        tsl = REGISTRY["theil_sen_banded_slope"].fn(spark, sf_dir).select(
            "symbol", "ts_slope"
        )
        rsi = (
            REGISTRY["rsi_cutler_14"].fn(spark, sf_dir)
            .where(F.col("rsi14").isNotNull())
            .groupBy("symbol")
            .agg(F.max_by("rsi14", "ts").alias("rsi_last"))
        )
        obv = (
            REGISTRY["obv_tick_flow"].fn(spark, sf_dir)
            .groupBy("symbol")
            .agg(F.max_by("obv_ticks", "ts").alias("obv_last"))
        )
        j = mk.join(tsl, "symbol").join(rsi, "symbol").join(obv, "symbol")
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
