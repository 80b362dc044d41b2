"""Bucketed parquet tables — pre-shuffled storage so repeated joins
and aggregations on the bucket key run with ZERO exchanges.

This is the storage half of the co-location story (north-star
extension; the reference re-reads its CSV/Mongo data and re-groups in
pandas on every run). Writing `bucketBy(n, key)` hash-partitions rows
into n buckets AT WRITE TIME and records the layout in the catalog;
every later equi-join or groupBy on the key reuses that placement, so
the per-query shuffle cost of the hottest join in a pipeline is paid
once, at ingest. At 100 TB this converts the nightly
fact-joins-fact workload from two full-data exchanges per run into
none — the scan itself is the co-partitioning.

Rules encoded here:

- Both join sides must use the SAME bucket count (Spark only elides
  the exchange when output partitionings match; a 256-bucket table
  joined to a 512-bucket one re-shuffles the smaller side).
- `sortBy` the bucket key too: with one file per bucket the scan is
  also sort-ordered, removing the SMJ's per-task sort.
- Bucket pruning: an equality filter on the bucket key with
  `spark.sql.sources.bucketing.enabled` reads 1/n of the files.
- Tables are EXTERNAL (caller-owned path) so the data outlives the
  metastore and tests can point anywhere.

Verified in tests/test_bucketed.py: the bucketed fact-fact join plan
contains no Exchange, the bucketed groupBy plan contains no Exchange,
and results are row-identical to the plain-parquet equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    spark: SparkSession,
    table: str,
    path: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external bucketed parquet table.

    One shuffle now (rows route to their bucket) buys every future
    equi-operation on ``bucket_by`` a shuffle-free plan. ``sort_by``
    defaults to the bucket key so single-file buckets scan pre-sorted.
    """
    sort_cols = sort_by if sort_by is not None else bucket_by
    # Route each bucket's rows to one task so each bucket is one file
    # per write-task wave — n output files total, and the sortBy
    # metadata is actually usable by the reader (Spark ignores it for
    # multi-file buckets).
    routed = df.repartition(n_buckets, *bucket_by)
    (
        routed.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_by)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog scan of a bucketed table. MUST go through the table
    name — `spark.read.parquet(path)` on the same files loses the
    bucket metadata and every downstream join shuffles again."""
    return spark.table(table)
