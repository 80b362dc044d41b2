"""Content-based stream routing + partitioned sinks.

Replaces the reference's Mongo CDC router
(streaming_processing/mongo_stream_etl.py:34-38: per-event
`if source == "history": insert_one(A) else insert_one(B)`) with
set-oriented foreachBatch writes, and the per-symbol dynamic
collections (ml_model/predict_from_vm4.py:64-65:
`predicted_output_{symbol}`) with a partitionBy("symbol") layout.

Scale notes: each micro-batch performs two filtered columnar writes
(predicate evaluated once per batch, not per row); partitionBy gives
the per-key layout without one-connection-per-key; checkpointing makes
the router exactly-once per batch id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def route_by_source(
    ticks: DataFrame,
    history_path: str,
    realtime_path: str,
    checkpoint: str,
    corrupt_path: str | None = None,
) -> StreamingQuery:
    """history/realtime/DLQ three-way split, exactly-once per batch."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            good = batch.where(~F.col("is_corrupt"))
            good.where(F.col("source") == "history").drop(
                "is_corrupt", "_raw"
            ).write.mode("append").parquet(history_path)
            good.where(F.col("source") != "history").drop(
                "is_corrupt", "_raw"
            ).write.mode("append").parquet(realtime_path)
            if corrupt_path is not None:
                batch.where(F.col("is_corrupt")).select("_raw").write.mode(
                    "append"
                ).parquet(corrupt_path)
        finally:
            batch.unpersist()

    return (
        ticks.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def write_partitioned_by_symbol(
    df: DataFrame, path: str, checkpoint: str
) -> StreamingQuery:
    """S9: per-key partitioned sink — the scalable form of the
    reference's per-symbol output collections."""
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("symbol")
        .trigger(availableNow=True)
        .start()
    )
