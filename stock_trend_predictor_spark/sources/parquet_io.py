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


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int,
    sort_by: list[str] | None = None,
) -> tuple[int, int]:
    """OPTIMIZE-style small-file compaction: rewrite a parquet
    directory into `target_files` files, optionally re-clustering on
    `sort_by` so row-group min/max stats become selective again.

    The small-files problem is the steady-state failure of any
    streaming/upsert sink (every micro-batch appends a few files; scan
    cost and driver file-listing grow without bound). Compaction is
    the standing repair: read, materialize OFF the target directory
    (localCheckpoint — overwriting a directory the same plan reads is
    undefined), rewrite coalesced. `repartition` (a shuffle) rather
    than `coalesce` when sorting: coalesce would collapse the sort's
    parallelism upstream.

    Returns (files_before, files_after) for observability.
    """
    import glob
    import os

    def _count() -> int:
        return len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))

    before = _count()
    df = spark.read.parquet(path)
    if sort_by:
        out = df.repartition(target_files).sortWithinPartitions(*sort_by)
    else:
        out = df.coalesce(target_files)
    out.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)
    return before, _count()
