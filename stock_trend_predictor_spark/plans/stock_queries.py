"""Stock-domain queries — the reference's analytical core, Spark-first.

The flagship re-expresses the reference's end-to-end question (label
each bar with movement, then learn/aggregate movement per symbol —
ml_model/predict_from_vm4.py:29-39,57-61) as one declarative plan over
the derived ticks view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    exact_avg,
    exact_avg_sql,
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.functions.stock import change_pct, movement
from stock_trend_predictor_spark.sources.tables import TICKS_ORACLE_CTE, ticks


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "flagship_movement_rate",
        oracle=f"""
WITH {TICKS_ORACLE_CTE},
labeled AS (
    SELECT symbol,
           CAST(close > open AS INT) AS movement,
           {stable_round_sql('(close - open) / nullif(open, 0) * 100', 2)} AS chg
    FROM ticks WHERE open IS NOT NULL
)
SELECT symbol,
       COUNT(*) AS n_bars,
       CAST(SUM(movement) AS BIGINT) AS n_up,
       {stable_round_sql('CAST(SUM(movement) AS DOUBLE) / COUNT(*)', 6)} AS movement_rate,
       {stable_round_sql(exact_avg_sql('chg'), 6)} AS avg_change_pct
FROM labeled
GROUP BY symbol
""",
        doc="Per-symbol movement rate over the derived ticks view "
        "(label law from reference ml_model/predict_from_vm4.py:31,61).",
    )
    def flagship_movement_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir).where(F.col("open").isNotNull())
        labeled = t.select(
            "symbol",
            movement().alias("movement"),
            change_pct().alias("chg"),
        )
        return labeled.groupBy("symbol").agg(
            F.count(F.lit(1)).alias("n_bars"),
            F.sum("movement").cast("bigint").alias("n_up"),
            stable_round(
                F.sum("movement").cast("double") / F.count(F.lit(1)), 6
            ).alias("movement_rate"),
            stable_round(exact_avg("chg"), 6).alias("avg_change_pct"),
        )

    @register(
        "tick_projection",
        oracle=f"""
WITH {TICKS_ORACLE_CTE}
SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS timestamp,
       symbol,
       close AS close_price
FROM ticks
""",
        doc="P1: close-only tick projection + wire-format timestamp "
        "(reference data_collection/fetch_stock.py:54-58).",
    )
    def tick_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.functions.stock import wire_timestamp

        return ticks(spark, sf_dir).select(
            wire_timestamp("ts").alias("timestamp"),
            "symbol",
            F.col("close").alias("close_price"),
        )

    @register(
        "unpivot_bar_fields",
        oracle=f"""
WITH {TICKS_ORACLE_CTE}
SELECT tick_id, symbol, field, value
FROM (
    SELECT tick_id, symbol, open, close FROM ticks WHERE open IS NOT NULL
) UNPIVOT (value FOR field IN (open, close))
""",
        doc="Unpivot (melt): wide OHLC fields to long (field, value) "
        "rows — the inverse of pivot, used to feed per-field pipelines "
        "(normalization, per-field stats) from one bar table. Narrow "
        "generator, no shuffle.",
    )
    def unpivot_bar_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir).where(F.col("open").isNotNull())
        return t.select("tick_id", "symbol", "open", "close").unpivot(
            ids=["tick_id", "symbol"],
            values=["open", "close"],
            variableColumnName="field",
            valueColumnName="value",
        )

    @register(
        "null_handling_battery",
        oracle=f"""
WITH {TICKS_ORACLE_CTE}
SELECT tick_id,
       symbol,
       coalesce(open, 0.0) AS open_filled,
       CAST(open IS NULL AS INT) AS is_series_head,
       CAST(open IS NOT DISTINCT FROM close AS INT) AS flat_bar_nullsafe,
       nullif(close, 0.0) AS close_nonzero,
       ifnull(volume_missing.v, -1.0) AS volume_or_sentinel
FROM ticks
LEFT JOIN (SELECT NULL AS k, NULL::DOUBLE AS v) volume_missing ON FALSE
""",
        doc="Null-handling battery over the ticks view (whose lag()-"
        "derived open IS NULL at each series head): coalesce fill, "
        "null test, null-safe equality (Spark <=> / IS NOT DISTINCT "
        "FROM), nullif, and sentinel default for a missing joined "
        "column — the P5-P7 family generalized.",
    )
    def null_handling_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir)
        return t.select(
            "tick_id",
            "symbol",
            F.coalesce("open", F.lit(0.0)).alias("open_filled"),
            F.col("open").isNull().cast("int").alias("is_series_head"),
            F.col("open").eqNullSafe(F.col("close")).cast("int").alias(
                "flat_bar_nullsafe"
            ),
            F.nullif(F.col("close"), F.lit(0.0)).alias("close_nonzero"),
            F.lit(None).cast("double").alias("_missing"),
        ).withColumn(
            "volume_or_sentinel", F.ifnull(F.col("_missing"), F.lit(-1.0))
        ).drop("_missing")

    @register(
        "prediction_frame",
        oracle=f"""
WITH {TICKS_ORACLE_CTE}
SELECT symbol, ts, open, close,
       CAST(close > open AS INT) AS prediction,
       {stable_round_sql('(close - open) / nullif(open, 0) * 100', 2)} AS change_pct
FROM ticks
WHERE open IS NOT NULL AND symbol IN ('click', 'view', 'purchase')
""",
        doc="Shape of the scoring output (FIXTURES §4; reference "
        "ml_model/predict_from_vm4.py:57-65) with the deterministic "
        "label law standing in for the model column; includes the "
        "model-known-key semi-filter P10 (predict_from_vm4.py:53-55).",
    )
    def prediction_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
        known = ["click", "view", "purchase"]  # symbols with a "model"
        t = ticks(spark, sf_dir).where(F.col("open").isNotNull())
        return t.where(F.col("symbol").isin(known)).select(
            "symbol",
            "ts",
            "open",
            "close",
            movement().alias("prediction"),
            change_pct().alias("change_pct"),
        )


_register()
