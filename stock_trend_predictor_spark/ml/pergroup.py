"""Per-key model training/scoring — the Spark-first form of the
reference's sequential per-symbol loop (ml_model/predict_from_vm4.py:29-39
trains one RandomForest per symbol in a driver for-loop; :47-65 scores
one document at a time).

Here: ``groupBy(symbol).applyInPandas(train)`` fits every key's model
in parallel (one task per key group), the fitted models land in a tiny
models DataFrame, and scoring is a broadcast join + native expressions
— set-oriented end to end.

The model intentionally has a closed form (OLS of close on open):
with sums accumulated in quantized Decimal (mirroring the engine's
decimal(27,6) aggregation), the fitted coefficients are bit-exact
reproducible — so even the *training* step has a DuckDB oracle
(plans/ml_queries.py). The same applyInPandas harness fits sklearn-
style estimators 1:1 when exactness isn't required (see ml/pipeline.py
for the MLlib pipeline variant).

Scale note (SURVEY §7 phase 4 hard part): thousands of per-key models
stay in a DataFrame keyed by symbol; scoring broadcasts that table —
never a driver-side dict.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MODEL_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("n_rows", LongType()),
        StructField("slope", DoubleType()),
        StructField("intercept", DoubleType()),
    ]
)

_Q6 = Decimal("0.000001")


def _dec_sum(values) -> float:
    """Sum float64 values in 6-dp-quantized Decimal — identical to the
    engines' SUM(CAST(x AS DECIMAL(27,6))) and therefore
    order-independent and cross-engine exact."""
    total = Decimal(0)
    for v in values:
        total += Decimal(v).quantize(_Q6, rounding=ROUND_HALF_UP)
    return float(total)


def train_linreg_per_key(
    ticks: DataFrame,
    key: str = "symbol",
    x: str = "open",
    y: str = "close",
) -> DataFrame:
    """Fit y = intercept + slope*x per key, one Arrow task per group."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = pdf.dropna(subset=[x, y])
        n = float(len(rows))
        sx = _dec_sum(rows[x])
        sy = _dec_sum(rows[y])
        sxy = _dec_sum((rows[x].to_numpy() * rows[y].to_numpy()))
        sxx = _dec_sum((rows[x].to_numpy() * rows[x].to_numpy()))
        denom = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / denom if denom != 0 else 0.0
        intercept = (sy - slope * sx) / n if n > 0 else 0.0
        return pd.DataFrame(
            {
                "symbol": [pdf[key].iloc[0]],
                "n_rows": [int(n)],
                "slope": [slope],
                "intercept": [intercept],
            }
        )

    return ticks.groupBy(key).applyInPandas(fit, schema=MODEL_SCHEMA)


def score_with_models(ticks: DataFrame, models: DataFrame) -> DataFrame:
    """Broadcast-join scoring + the reference's derived outputs
    (movement prediction law predict_from_vm4.py:31, change%
    predict_from_vm4.py:61) — no Python in the scoring path."""
    from stock_trend_predictor_spark.functions.exact import stable_round
    from stock_trend_predictor_spark.functions.stock import change_pct

    scored = ticks.join(F.broadcast(models), "symbol", "left_semi").join(
        F.broadcast(models), "symbol"
    )
    predicted = F.col("intercept") + F.col("slope") * F.col("open")
    return scored.select(
        "symbol",
        "ts",
        "open",
        "close",
        stable_round(predicted, 6).alias("predicted_close"),
        (predicted > F.col("open")).cast("int").alias("prediction"),
        change_pct().alias("change_pct"),
    )
