"""CSV source/sink (SURVEY §2.1 S5).

The reference dumps concatenated pandas frames to date-stamped CSV
paths (data_collection/kafka_producer.py:72-74,100-102 —
``df.to_csv(f"stock_data_{date}.csv")``). Spark-first, the date token
moves out of the filename and into a partition column: one declarative
``partitionBy(dt)`` write gives the same date-addressable layout plus
partition pruning on read-back, and works identically from local[32]
to a 1000-executor cluster (each task writes its own files; no driver
concat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: §1.4 canonical tick schema, as CSV has no embedded types (the
#: reference round-trips through untyped CSV and re-infers; we declare).
TICKS_CSV_SCHEMA = (
    "symbol string, ts timestamp, open double, high double, low double, "
    "close double, volume double, source string"
)


def write_csv_daily(
    df: DataFrame, path: str, ts_col: str = "ts", mode: str = "append"
) -> None:
    """Date-partitioned CSV sink — the S5 equivalent of the
    reference's ``stock_data_{yyyymmdd}.csv`` filenames."""
    (
        df.withColumn("dt", F.to_date(ts_col))
        .write.mode(mode)
        .option("header", True)
        .partitionBy("dt")
        .csv(path)
    )


def read_csv_ticks(
    spark: SparkSession, path: str, schema: StructType | str = TICKS_CSV_SCHEMA
) -> DataFrame:
    """Typed CSV scan. An explicit schema (never inferSchema) keeps the
    read single-pass — schema inference is an extra full scan, which at
    100 TB doubles the cost of every read."""
    return (
        spark.read.option("header", True)
        .schema(schema)
        .csv(path)
    )
