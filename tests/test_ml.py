"""ML surface tests (SURVEY §5.4): schema, label law, determinism,
better-than-baseline accuracy on separable synthetic data, save/load.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from stock_trend_predictor_spark.ml.pergroup import (
    score_with_models,
    train_linreg_per_key,
)
from stock_trend_predictor_spark.ml.pipeline import (
    train_and_evaluate,
    with_movement_label,
)


@pytest.fixture(scope="module")
def separable_ticks(spark):
    """FIXTURES §5: movement is predictable from volume (volume > 50
    implies close > open with 95% probability), seed 42."""
    rng = random.Random(42)
    rows = []
    for i in range(3000):
        symbol = ["AAPL", "MSFT", "GOOGL"][i % 3]
        open_ = 100.0 + rng.random() * 10
        volume = rng.random() * 100
        up = (volume > 50) == (rng.random() < 0.95)
        close = open_ + (1.0 if up else -1.0) * (0.5 + rng.random())
        rows.append(
            (symbol, open_, open_ + 2, open_ - 2, close, volume)
        )
    return spark.createDataFrame(
        rows, "symbol string, open double, high double, low double, close double, volume double"
    )


def test_movement_label_law(spark):
    df = spark.createDataFrame(
        [("A", 10.0, 11.0), ("A", 10.0, 10.0), ("A", 10.0, 9.0)],
        "symbol string, open double, close double",
    )
    labels = [r["movement"] for r in with_movement_label(df).collect()]
    # strict inequality: flat bar labels 0 (predict_from_vm4.py:31)
    assert labels == [1, 0, 0]


def test_rf_pipeline_beats_baseline_and_is_deterministic(separable_ticks, tmp_path):
    labeled = with_movement_label(separable_ticks)
    res = train_and_evaluate(labeled)
    assert res.n_train + res.n_test == 3000
    assert res.accuracy > 0.85, f"accuracy {res.accuracy} not above baseline"

    # determinism under fixed seed
    res2 = train_and_evaluate(labeled)
    assert res2.accuracy == res.accuracy

    # M4 model persistence round-trip
    path = str(tmp_path / "model")
    res.model.write().overwrite().save(path)
    from pyspark.ml import PipelineModel

    reloaded = PipelineModel.load(path)
    a = res.model.transform(labeled).select("prediction").collect()
    b = reloaded.transform(labeled).select("prediction").collect()
    assert a == b


def test_mllib_stream_batch_scoring(spark, separable_ticks):
    """ST7 MLlib variant: score_stream_batch applies the trained
    pipeline to a micro-batch set-oriented."""
    from pyspark.sql import functions as F

    from stock_trend_predictor_spark.ml.pipeline import score_stream_batch

    labeled = with_movement_label(separable_ticks)
    res = train_and_evaluate(labeled)
    batch = labeled.limit(50).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 09:30:00"))
    )
    scored = score_stream_batch(res.model, batch)
    rows = scored.collect()
    assert len(rows) == 50
    assert set(scored.columns) == {"symbol", "ts", "prediction", "change_pct"}
    assert all(r["prediction"] in (0, 1) for r in rows)


def test_pergroup_linreg_recovers_slope(spark):
    # close = 2*open + 5 exactly → slope 2, intercept 5 per key
    rows = [
        (sym, float(x), 2.0 * x + 5.0)
        for sym in ("A", "B")
        for x in range(1, 51)
    ]
    df = spark.createDataFrame(rows, "symbol string, open double, close double")
    models = {r["symbol"]: r for r in train_linreg_per_key(df).collect()}
    assert set(models) == {"A", "B"}
    for m in models.values():
        assert m["n_rows"] == 50
        assert abs(m["slope"] - 2.0) < 1e-9
        assert abs(m["intercept"] - 5.0) < 1e-6


def test_score_with_models_outputs(spark):
    df = spark.createDataFrame(
        [("A", f"2024-01-01 00:0{i}:00", 10.0 + i, 20.0 + 2 * i) for i in range(5)],
        "symbol string, ts string, open double, close double",
    ).withColumn("ts", F.to_timestamp("ts"))
    models = train_linreg_per_key(df)
    scored = score_with_models(df, models)
    rows = scored.collect()
    assert len(rows) == 5
    assert set(scored.columns) == {
        "symbol", "ts", "open", "close", "predicted_close", "prediction", "change_pct"
    }
    # close = 2*open → prediction always 1 (predicted_close > open)
    assert all(r["prediction"] == 1 for r in rows)
    assert all(abs(r["change_pct"] - round((r["close"] - r["open"]) / r["open"] * 100, 2)) < 0.01 for r in rows)
