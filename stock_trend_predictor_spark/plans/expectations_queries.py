"""Data-contract expectations audit — the validation gate a pipeline
runs BEFORE trusting a batch (Great-Expectations-style, engine-side).

The reference ingests whatever the API/Kafka/Mongo hand it
(data_collection/fetch_stock.py writes rows unchecked;
streaming_processing/features_engineering.py:23-27's schema silently
nulls mismatched payloads) — this query is the missing admission gate:
one row per expectation with exact checked/violation counts, unioned
into a single result so a scheduler can alert on any `pass = false`
row. Includes cross-TABLE referential checks (anti-join counts), not
just per-column predicates.

Every check is a count aggregate or an anti-join count — combinable,
one shuffle each at most, and the result is #expectations rows at any
scale. The `value > 0` expectation REALLY fails on the test data (the
known bad prints) — the audit reports truth, it does not paper over
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.sources.tables import load_table


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "expectations_audit",
        oracle="""
WITH checks AS (
    SELECT 'events' AS table_name, 'value_not_null' AS expectation,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT)
               AS n_violations
    FROM events
    UNION ALL
    SELECT 'events', 'value_positive', CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE value <= 0) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'events', 'ts_not_null', CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE ts IS NULL) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'orders', 'custkey_references_customer',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem', 'orderkey_references_orders',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'orders', 'totalprice_non_negative',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE o_totalprice < 0) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'documents', 'text_non_empty', CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE text IS NULL OR text = '')
                AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'documents', 'n_chars_matches_text',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE n_chars != len(text)) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'embeddings', 'dim_is_64', CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE len(embedding) != 64) AS BIGINT)
    FROM embeddings
)
SELECT table_name, expectation, n_rows, n_violations,
       n_violations = 0 AS pass
FROM checks
""",
        doc="Composed data-contract audit: 9 expectations over 5 "
        "tables — null gates, range gates, schema-consistency gates "
        "(n_chars vs len(text), embedding dim), and CROSS-TABLE "
        "referential integrity (orders→customer, lineitem→orders as "
        "left-join orphan counts) — one exact (checked, violations, "
        "pass) row each, unioned into the single frame a scheduler "
        "alerts on. The value_positive expectation genuinely FAILS "
        "on this corpus (the known bad prints the volatility tier "
        "filters) — the audit reports it rather than hiding it. "
        "Every check is a combinable count or an orphan-count join; "
        "output is #expectations rows at any scale.",
    )
    def expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        orders = load_table(spark, sf_dir, "orders")
        customer = load_table(spark, sf_dir, "customer")
        lineitem = load_table(spark, sf_dir, "lineitem")
        docs = load_table(spark, sf_dir, "documents")
        emb = load_table(spark, sf_dir, "embeddings")

        def check(df: DataFrame, table: str, name: str, bad) -> DataFrame:
            return df.agg(
                F.lit(table).alias("table_name"),
                F.lit(name).alias("expectation"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.count_if(bad).cast("bigint").alias("n_violations"),
            )

        orphans_orders = orders.join(
            customer.select(F.col("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left",
        )
        orphans_lineitem = lineitem.join(
            orders.select(F.col("o_orderkey").alias("_ok")),
            lineitem.l_orderkey == F.col("_ok"),
            "left",
        )
        checks = (
            check(ev, "events", "value_not_null", F.col("value").isNull())
            .unionAll(
                check(ev, "events", "value_positive", F.col("value") <= 0)
            )
            .unionAll(
                check(ev, "events", "ts_not_null", F.col("ts").isNull())
            )
            .unionAll(
                check(
                    orphans_orders,
                    "orders",
                    "custkey_references_customer",
                    F.col("c_custkey").isNull(),
                )
            )
            .unionAll(
                check(
                    orphans_lineitem,
                    "lineitem",
                    "orderkey_references_orders",
                    F.col("_ok").isNull(),
                )
            )
            .unionAll(
                check(
                    orders,
                    "orders",
                    "totalprice_non_negative",
                    F.col("o_totalprice") < 0,
                )
            )
            .unionAll(
                check(
                    docs,
                    "documents",
                    "text_non_empty",
                    F.col("text").isNull() | (F.col("text") == ""),
                )
            )
            .unionAll(
                check(
                    docs,
                    "documents",
                    "n_chars_matches_text",
                    F.col("n_chars") != F.length("text"),
                )
            )
            .unionAll(
                check(
                    emb,
                    "embeddings",
                    "dim_is_64",
                    F.size("embedding") != 64,
                )
            )
        )
        return checks.withColumn("pass", F.col("n_violations") == 0)


_register()
