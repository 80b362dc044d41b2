"""Streaming model inference (SURVEY §2.9 ST7, §2.10 M5).

The reference scores one Mongo change-stream document at a time
(ml_model/predict_from_vm4.py:47-65: per-event model.predict on a
1-row frame, insert_many per event). Spark-first, scoring is
set-oriented inside foreachBatch: each micro-batch is one broadcast
join against the (tiny, pre-trained) models table plus native
expressions — thousands of rows per task, zero Python in the scoring
path — written to a per-symbol partitioned parquet sink (S9, replacing
the predicted_output_{symbol} dynamic collections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from stock_trend_predictor_spark.ml.pergroup import score_with_models


def streaming_score(
    ticks_stream: DataFrame,
    models: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """Score a parsed tick stream against pre-trained per-key models.

    ``models`` is a static DataFrame (train once, broadcast each
    batch); ticks whose symbol has no model drop out in the join —
    the reference's model-known-key filter (P10). Returns the started
    StreamingQuery (availableNow: drain whatever is in the source,
    then stop — swap for a processingTime trigger in production).
    """

    def score_batch(batch: DataFrame, _batch_id: int) -> None:
        scored = score_with_models(
            batch.select("symbol", "ts", "open", "close"), models
        )
        scored.write.mode("append").partitionBy("symbol").parquet(out_path)

    return (
        ticks_stream.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
