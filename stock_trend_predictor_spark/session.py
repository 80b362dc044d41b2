"""SparkSession factory with scale-oriented defaults.

The reference sets exactly one knob (``spark.sql.shuffle.partitions=2``,
reference streaming_processing/features_engineering.py:19) on a plan that
has no shuffle. Here we centralize a configuration that is meant to hold
from local[32] tests up to a 1000-executor cluster:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic
  join-strategy switch) so the same declarative plan adapts at any SF;
- Arrow on for every Pandas-UDF boundary (the only sanctioned Python
  hot path);
- session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle and are cluster-node independent.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Defaults chosen for scale-out behavior, not just local runs.
SCALE_CONF: dict[str, str] = {
    # Adaptive execution: re-plan with runtime statistics. At 100 TB this
    # is what turns a static 'shuffle.partitions' guess into right-sized
    # partitions and splits skewed join partitions automatically.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.localShuffleReader.enabled": "true",
    # Deterministic timestamp semantics (matches DuckDB's naive ts).
    "spark.sql.session.timeZone": "UTC",
    # Arrow for pandas_udf / applyInPandas / toPandas boundaries.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast small dimension tables (region/nation/supplier-sized).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Columnar scan hygiene — filter pushdown is on by default in
    # Spark, pinned explicitly because the engine's scale story depends
    # on it. (aggregatePushdown is also set but only takes effect under
    # the v2 parquet reader; the default v1 path ignores it.)
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Input split sizing: 128 MiB splits keep scan tasks uniform whether
    # the input is 600 MB or 100 TB.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
}


def get_spark(
    app_name: str = "stock-trend-predictor-spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` is only set when given — under the driver harness the
    session already exists and ``getOrCreate`` just returns it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    conf = dict(SCALE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
