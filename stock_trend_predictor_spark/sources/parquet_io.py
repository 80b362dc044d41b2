"""Partitioned parquet sink / source — the table layout layer a
100 TB training-data pipeline actually lives on (north-star extension;
the reference's only persistent sinks are CSV files and a Mongo
collection).

Design rules encoded here:

- **Partition columns are the coarse pruning axis** (source, dt, lang
  — low-cardinality, stable): a filter on them never touches
  non-matching files (PartitionFilters in the scan node).
- **Sort-within-partitions on the fine axis** before writing: parquet
  row-group min/max stats then prune *inside* files too
  (PushedFilters), and downstream equi-operations on the sort key get
  mostly-clustered input.
- **maxRecordsPerFile bounds file size** instead of coalesce(1)-style
  single-file writes that serialize the sink through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int = 5_000_000,
) -> None:
    """Hive-style partitioned parquet write.

    ``sortWithinPartitions`` (NOT a global orderBy — no extra shuffle)
    clusters rows inside each task's files so row-group stats are
    selective on the sort key.
    """
    out = df
    if sort_within:
        out = out.sortWithinPartitions(*partition_by, *sort_within)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Scan of a partitioned parquet table. Partition-column filters
    prune directories before any IO; ordinary column filters push to
    row-group stats — both asserted in
    tests/test_io.py::test_partitioned_parquet_prunes."""
    return spark.read.parquet(path)
