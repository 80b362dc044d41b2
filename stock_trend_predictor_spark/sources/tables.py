"""Batch table sources over the driver's parquet test data.

Scans here are the engine's S1/S2/S7 surface (SURVEY §2.1): in the
reference these are yfinance HTTP pulls into pandas
(data_collection/fetch_stock.py:21-29, data_collection/kafka_producer.py:39-53)
and a full Mongo collection scan (ml_model/predict_from_vm4.py:15,21).
Spark-first, each becomes a parquet scan expressed declaratively so
Catalyst gets predicate pushdown + column pruning for free — at 100 TB
the scan IS the query cost, so nothing here ever collects or caches
eagerly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver generates per scale factor (TESTDATA.md).
TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table. Lazy — no job runs until an action.

    ``events.ts`` has shipped in two physical encodings across driver
    test-data generations: INT64 TIMESTAMP(NANOS, NTZ) — which the
    vectorized Spark parquet reader rejects unless read via the legacy
    nanos-as-long path — and plain TIMESTAMP(MICROS, NTZ). The loader
    sniffs the resolved read schema and normalizes BOTH to a session-TZ
    ``timestamp`` column: nanos are floor-divided to µs (the same ns→µs
    truncation DuckDB applies, so oracle comparisons stay bit-exact);
    micros-NTZ is cast to timestamp (a value-identity under the UTC
    session TZ both the engine and the driver run with). The conf is a
    session-level runtime conf, set here so the fix also holds under
    the driver's own SparkSession.
    """
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type == "bigint":  # INT64 TIMESTAMP(NANOS) via nanosAsLong
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type != "timestamp":  # timestamp_ntz (micros encoding)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Scan every test table; keys match DuckDB's pre-registered views."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the canonical ``ticks`` bar table (SURVEY §1.4) from `events`.

    The driver's test data has no stock table, so the engine derives a
    deterministic OHLCV-bar-shaped view from the `events` stream table:
    each event becomes a bar close; the previous event of the same
    symbol supplies the open (mirrors how the reference's close-only
    tick stream at data_collection/fetch_stock.py:54-58 implies bar
    boundaries). ``symbol`` ← event_type (low-cardinality key, like the
    3-symbol universe at fetch_stock.py:42), ``close`` ← value.

    The per-symbol ordering window is (ts, event_id) — a deterministic
    total order, required for oracle-exact lag/lead results.

    Scale note: the lag() shuffles once on symbol. Symbol is the natural
    partition key downstream too (per-key training, per-key sinks), so
    this one shuffle is reused by every consumer of the view. With a
    low-cardinality symbol universe at 100 TB, swap the plain window
    for operators/windows.py::bucketed_lag (oracle-proven identical,
    parallelism #keys × #buckets — see query rolling_lag_bucketed).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_type").alias("symbol"),
        F.col("ts"),
        F.lag("value").over(w).alias("open"),
        F.col("value").alias("close"),
        F.col("event_id").alias("tick_id"),
        F.col("user_id"),
    )


#: DuckDB-dialect CTE equivalent of :func:`ticks`, reused by oracle SQL
#: strings so Spark queries and their oracles share one derivation.
TICKS_ORACLE_CTE = """
ticks AS (
    SELECT event_type AS symbol,
           ts,
           lag(value) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS open,
           value AS close,
           event_id AS tick_id,
           user_id
    FROM events
)
"""


def materialize_once(df: DataFrame) -> DataFrame:
    """Compute-once sharing for a DataFrame consumed by several
    downstream jobs, without pinning cache for the session.

    ``persist()`` shares the scan but leaks: the CacheManager holds the
    entry until an explicit ``unpersist()``, which a lazily-returned
    query plan has no safe point to issue (the caller collects after
    the function returns). ``localCheckpoint(eager=True)`` materializes
    the same blocks, but they are owned by the checkpointed RDD, so the
    ContextCleaner frees them as soon as the result DataFrame is
    garbage-collected — the right lifetime for registry queries that
    run hundreds to a session. Trade-off (documented, acceptable for
    derived inputs): checkpoint blocks are not lineage-recoverable, so
    an executor loss means job retry rather than partition recompute.
    """
    return df.localCheckpoint(eager=True)
