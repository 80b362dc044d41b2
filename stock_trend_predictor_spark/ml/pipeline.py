"""MLlib movement-classification pipeline (SURVEY §2.10 M1-M6).

The reference trains sklearn RandomForests per symbol in a driver loop
with no holdout (ml_model/predict_from_vm4.py:29-39 — accuracy is
evaluated on the training set at :38). This is the distributed,
properly-evaluated equivalent:

- label law M1: movement = int(close > open)  (predict_from_vm4.py:31)
- features M2: [open, high, low, close, volume] (predict_from_vm4.py:32)
- one global RandomForest with the symbol one-hot-encoded (scales to
  any number of symbols; per-key closed-form models live in
  ml/pergroup.py)
- a real randomSplit holdout + MulticlassClassificationEvaluator
  (fixing the reference's train-set-only evaluation)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURES = ["open", "high", "low", "close", "volume"]


def with_movement_label(ticks: DataFrame) -> DataFrame:
    from stock_trend_predictor_spark.functions.stock import movement

    return ticks.withColumn("movement", movement())


def build_pipeline(features: list[str] | None = None) -> Pipeline:
    features = features or FEATURES
    return Pipeline(
        stages=[
            StringIndexer(inputCol="symbol", outputCol="symbol_idx",
                          handleInvalid="keep"),
            OneHotEncoder(inputCols=["symbol_idx"], outputCols=["symbol_oh"]),
            VectorAssembler(inputCols=features + ["symbol_oh"],
                            outputCol="features"),
            RandomForestClassifier(
                labelCol="movement",
                featuresCol="features",
                numTrees=20,
                maxDepth=5,
                seed=42,
            ),
        ]
    )


@dataclass
class TrainResult:
    model: PipelineModel
    accuracy: float
    n_train: int
    n_test: int


def _strip_training_summaries(model: PipelineModel) -> PipelineModel:
    """Drop the per-stage training summary from a fitted pipeline.

    MLlib classification models keep a TrainingSummary that holds a
    SparkSession reference. Serializing the model's transform closure
    (which every action on model.transform(...) does) then drags the
    session into the task closure — and once ANY ``df.observe`` has run
    in the session, the session's ObservationManager is instantiated
    and java-serialization dies with ``Task not serializable:
    ObservationManager`` (observed on Spark 4.1). We never read
    ``.summary``; stripping it makes the fitted model closure-safe in
    sessions that also run the observe-fused iterative operators."""
    for stage in model.stages:
        jobj = getattr(stage, "_java_obj", None)
        if jobj is None:
            continue
        try:
            if jobj.hasSummary():
                from pyspark import SparkContext

                jvm = SparkContext._active_spark_context._jvm
                jobj.setSummary(getattr(getattr(jvm.scala, "None$"), "MODULE$"))
        except Exception:  # noqa: BLE001 - stage without the summary API
            pass
    return model


def train_and_evaluate(
    labeled: DataFrame, features: list[str] | None = None, seed: int = 42
) -> TrainResult:
    """Proper 80/20 holdout evaluation (M6 fixed)."""
    train, test = labeled.randomSplit([0.8, 0.2], seed=seed)
    model = _strip_training_summaries(build_pipeline(features).fit(train))
    preds = model.transform(test)
    acc = MulticlassClassificationEvaluator(
        labelCol="movement", predictionCol="prediction", metricName="accuracy"
    ).evaluate(preds)
    return TrainResult(
        model=model,
        accuracy=acc,
        n_train=train.count(),
        n_test=test.count(),
    )


def score_stream_batch(model: PipelineModel, batch: DataFrame) -> DataFrame:
    """ST7: set-oriented scoring of a micro-batch (used inside
    foreachBatch), replacing the reference's one-document-at-a-time
    change-stream predict (predict_from_vm4.py:57-61)."""
    from stock_trend_predictor_spark.functions.stock import change_pct

    return model.transform(batch).select(
        "symbol",
        "ts",
        F.col("prediction").cast("int").alias("prediction"),
        change_pct().alias("change_pct"),
    )
