"""Round-2 extension batch: robust statistics, time-grid gap-fill,
TF-IDF ranking, chunk-level corpus dedup, and two classic selective
relational shapes (TPC-H Q6/Q18 analogues).

These widen the engine beyond the reference's surface (the reference's
features_engineering.py computes nothing like this — it is the
"analytics a user of a timeseries/corpus engine expects" tier), while
staying pure Catalyst expressions: no Python in any hot path, every
aggregate map-side combinable, every small side broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stock_trend_predictor_spark.functions.exact import (
    DECIMAL_T,
    exact_sum,
    exact_sum_sql,
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.functions.text import hash60, hash60_sql, tokens
from stock_trend_predictor_spark.sources.tables import load_table

#: chunk-dedup granule: 8 whitespace tokens (RefinedWeb-style line/
#: chunk dedup adapted to the newline-less synthetic corpus).
CHUNK_TOKENS = 8


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "gapfill_hourly_forward",
        oracle=f"""
WITH hourly AS (
    SELECT event_type,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           count(*) AS n_obs,
           {stable_round_sql(
               "CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / count(*)",
               6)} AS avg_value
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT event_type, min(hour_start) AS h0, max(hour_start) AS h1
    FROM hourly GROUP BY 1
), grid AS (
    SELECT event_type,
           unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_start
    FROM bounds
)
SELECT g.event_type, g.hour_start,
       coalesce(h.n_obs, 0) AS n_obs,
       last_value(h.avg_value IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.hour_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff,
       CASE WHEN h.n_obs IS NULL THEN 1 ELSE 0 END AS is_gap
FROM grid g LEFT JOIN hourly h
  ON g.event_type = h.event_type AND g.hour_start = h.hour_start
""",
        doc="Time-grid gap-fill + forward-fill resample: build the "
        "dense hourly grid per key with sequence()/explode, left-join "
        "the observed hourly aggregate, then carry the last observation "
        "forward with last(ignorenulls) over one per-key sort — the "
        "standard timeseries-engine FILL/LOCF operator the reference's "
        "pandas resample would do driver-side. Grid size is "
        "#keys x #buckets (tiny vs the event log), the observed agg is "
        "map-side combinable, and the fill is one narrow window pass.",
    )
    def gapfill_hourly_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        hourly = ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour_start")
        ).agg(
            F.count(F.lit(1)).alias("n_obs"),
            stable_round(
                F.sum(F.col("value").cast(DECIMAL_T)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_value"),
        )
        grid = (
            hourly.groupBy("event_type")
            .agg(F.min("hour_start").alias("h0"), F.max("hour_start").alias("h1"))
            .select(
                "event_type",
                F.explode(
                    F.sequence("h0", "h1", F.expr("interval 1 hour"))
                ).alias("hour_start"),
            )
        )
        w = (
            Window.partitionBy("event_type")
            .orderBy("hour_start")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return (
            grid.join(hourly, ["event_type", "hour_start"], "left")
            .select(
                "event_type",
                "hour_start",
                F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
                F.last("avg_value", ignorenulls=True).over(w).alias("value_ff"),
                F.when(F.col("n_obs").isNull(), 1).otherwise(0).alias("is_gap"),
            )
        )

    @register(
        "event_value_anomaly_mad",
        oracle=f"""
WITH med AS (
    SELECT event_type, median(value) AS med FROM events GROUP BY 1
), mad AS (
    SELECT e.event_type, median(abs(e.value - m.med)) AS mad
    FROM events e JOIN med m ON e.event_type = m.event_type
    GROUP BY 1
)
SELECT e.event_type,
       {stable_round_sql('m.med', 6)} AS med,
       {stable_round_sql('d.mad', 6)} AS mad,
       count(*) AS n_events,
       CAST(sum(CASE WHEN abs(e.value - m.med) > 3 * d.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM events e
JOIN med m ON e.event_type = m.event_type
JOIN mad d ON e.event_type = d.event_type
GROUP BY e.event_type, m.med, d.mad
""",
        doc="Robust per-key outlier detection: exact median + MAD "
        "(median absolute deviation) per event_type, then count rows "
        "beyond 3 MADs — the robust z-score rule that, unlike "
        "mean/stddev, is not itself dragged by the outliers it hunts. "
        "Two grouped exact-percentile passes over a 5-key frame plus "
        "broadcast joins of the one-row-per-key stats back to the "
        "events; at 100 TB swap median for approx_percentile "
        "(sketch_quantiles is that scale path) without changing shape.",
    )
    def event_value_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select("event_type", "value")
        med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
        withmed = ev.join(F.broadcast(med), "event_type")
        mad = (
            withmed.groupBy("event_type")
            .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
        )
        return (
            withmed.join(F.broadcast(mad), "event_type")
            .groupBy("event_type", "med", "mad")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(
                    F.when(
                        F.abs(F.col("value") - F.col("med"))
                        > 3 * F.col("mad"),
                        1,
                    ).otherwise(0)
                ).alias("n_anomalies"),
            )
            .select(
                "event_type",
                stable_round("med", 6).alias("med"),
                stable_round("mad", 6).alias("mad"),
                "n_events",
                "n_anomalies",
            )
        )

    @register(
        "q6_selective_revenue",
        oracle=f"""
SELECT {exact_sum_sql('l_extendedprice * l_discount')} AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
        doc="TPC-H Q6 analogue: highly selective scan-and-sum. The "
        "whole query is one parquet scan with ALL four predicates "
        "pushed (timestamp range + two doubles), a decimal partial "
        "aggregate per partition, and a single-row final combine — "
        "zero wide shuffles; at 100 TB this is the min-max-pruned "
        "scan benchmark.",
    )
    def q6_selective_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        return (
            li.where(
                (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
                & (F.col("l_discount").between(0.05, 0.07))
                & (F.col("l_quantity") < 24)
            ).agg(
                exact_sum(
                    F.col("l_extendedprice") * F.col("l_discount"), "revenue"
                ),
                F.count(F.lit(1)).alias("n_lines"),
            )
        )

    @register(
        "q18_big_spenders",
        oracle=f"""
WITH big AS (
    SELECT l_orderkey, {exact_sum_sql('l_quantity')} AS total_qty
    FROM lineitem GROUP BY l_orderkey
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, b.total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE b.total_qty > 300
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
        doc="TPC-H Q18 analogue (large-volume orders): group lineitem "
        "by orderkey, HAVING-filter to the rare big orders (the filter "
        "runs on the aggregated frame, so only ~1e-3 of orderkeys "
        "survive), then join the small survivor set to orders and "
        "customer — AQE turns both joins into broadcasts at runtime "
        "because the filtered side is tiny, regardless of table "
        "statistics. Top-100 by totalprice via TakeOrderedAndProject "
        "(no global sort); o_orderkey tie-break keeps the LIMIT set "
        "deterministic.",
    )
    def q18_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer")
        big = (
            li.groupBy("l_orderkey")
            .agg(exact_sum("l_quantity", "total_qty"))
            .where(F.col("total_qty") > 300)
        )
        return (
            big.join(orders, big.l_orderkey == orders.o_orderkey)
            .join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .select(
                "c_custkey",
                "c_name",
                "o_orderkey",
                "o_orderdate",
                "o_totalprice",
                "total_qty",
            )
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .limit(100)
        )

    @register(
        "tfidf_top_terms",
        oracle=f"""
WITH tf AS (
    SELECT doc_id, token, count(*) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents)
    GROUP BY 1, 2
), df AS (
    SELECT token, count(*) AS df FROM tf GROUP BY 1
), n AS (
    SELECT count(*) AS n_docs FROM documents
), scored AS (
    SELECT t.doc_id, t.token, t.tf,
           {stable_round_sql(
               't.tf * ln((n.n_docs + 1.0) / (d.df + 1.0))', 6)} AS tfidf
    FROM tf t JOIN df d ON t.token = d.token CROSS JOIN n
)
SELECT doc_id, term_rank, token, tf, tfidf FROM (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, token) AS term_rank
    FROM scored
) WHERE term_rank <= 3
""",
        doc="TF-IDF term ranking: per-(doc, token) term frequency, "
        "vocabulary-sized document-frequency table broadcast back, "
        "smoothed idf = ln((N+1)/(df+1)), top-3 terms per doc by "
        "row_number over the doc partition. The window key (doc_id) is "
        "maximal-cardinality so the rank pass is embarrassingly "
        "parallel; tfidf is stable-rounded BEFORE ranking so the "
        "(tfidf, token) sort order is engine-exact. df and N are "
        "vocabulary/scalar-sized — both broadcast, never shuffled "
        "against the token stream.",
    )
    def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        tf = (
            docs.select(
                "doc_id", F.explode(tokens("text")).alias("token")
            )
            .groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
        scored = (
            tf.join(F.broadcast(df), "token")
            .crossJoin(F.broadcast(n))
            .select(
                "doc_id",
                "token",
                "tf",
                stable_round(
                    F.col("tf")
                    * F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    ),
                    6,
                ).alias("tfidf"),
            )
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.col("tfidf").desc(), "token"
        )
        return (
            scored.withColumn("term_rank", F.row_number().over(w))
            .where(F.col("term_rank") <= 3)
            .select("doc_id", "term_rank", "token", "tf", "tfidf")
        )

    @register(
        "chunk_dup_fraction",
        oracle=f"""
WITH tokd AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), chunks AS (
    SELECT doc_id,
           unnest(generate_series(
               0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT) - 1))
             AS chunk_idx,
           toks
    FROM tokd
), hashed AS (
    SELECT doc_id,
           {hash60_sql(
               "array_to_string(toks[chunk_idx * " + str(CHUNK_TOKENS)
               + " + 1 : chunk_idx * " + str(CHUNK_TOKENS) + " + "
               + str(CHUNK_TOKENS) + "], ' ')")} AS chunk_hash
    FROM chunks
), counts AS (
    SELECT chunk_hash, count(*) AS n_occ FROM hashed GROUP BY 1
)
SELECT h.doc_id,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN c.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks,
       {stable_round_sql(
           'CAST(sum(CASE WHEN c.n_occ > 1 THEN 1 ELSE 0 END) AS DOUBLE)'
           ' / count(*)', 6)} AS dup_fraction
FROM hashed h JOIN counts c ON h.chunk_hash = c.chunk_hash
GROUP BY h.doc_id
""",
        doc=f"Chunk-level duplication rate (RefinedWeb line-dedup "
        f"adapted to a newline-less corpus): split each doc into "
        f"{CHUNK_TOKENS}-token chunks via transform(sequence)/slice "
        f"(no row blow-up until the hash projection), hash each chunk "
        f"to 60 bits, count global occurrences, and report the "
        f"per-doc fraction of chunks that appear elsewhere in the "
        f"corpus. Only 8-byte chunk hashes ever shuffle — the chunk "
        f"TEXT never leaves the scan stage; exact duplicate docs "
        f"surface as dup_fraction 1.0, partial boilerplate as "
        f"intermediate fractions.",
    )
    def chunk_dup_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").withColumn(
            "_toks", tokens("text")
        )
        k = CHUNK_TOKENS
        chunks = docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, cast(ceil(size(_toks) / {k}.0)"
                    f" as int) - 1),"
                    f" i -> array_join(slice(_toks, i * {k} + 1, {k}), ' '))"
                )
            ).alias("chunk"),
        ).select("doc_id", hash60("chunk").alias("chunk_hash"))
        counts = chunks.groupBy("chunk_hash").agg(
            F.count(F.lit(1)).alias("n_occ")
        )
        dup = F.when(F.col("n_occ") > 1, 1).otherwise(0)
        return (
            chunks.join(counts, "chunk_hash")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_chunks"),
                F.sum(dup).cast("bigint").alias("n_dup_chunks"),
                stable_round(
                    F.sum(dup).cast("double") / F.count(F.lit(1)), 6
                ).alias("dup_fraction"),
            )
        )

    @register(
        "scd2_user_value_intervals",
        oracle="""
SELECT user_id,
       CAST(row_number() OVER w AS BIGINT) AS version_seq,
       value,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts)
""",
        doc="Slowly-changing-dimension type-2 build from a change log: "
        "each event becomes a version row with [valid_from, valid_to) "
        "interval via lead(ts) over the per-key sort, open interval "
        "flagged current — the standard warehouse operator for turning "
        "a CDC stream (the reference's Mongo change feed, "
        "mongo_stream_etl.py) into a point-in-time-queryable dimension. "
        "One shuffle on the key, evaluated narrow; pairs with asof_join "
        "for time-travel lookups.",
    )
    def scd2_user_value_intervals(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        w = Window.partitionBy("user_id").orderBy("ts")
        nxt = F.lead("ts").over(w)
        return ev.select(
            "user_id",
            F.row_number().over(w).cast("bigint").alias("version_seq"),
            "value",
            F.col("ts").alias("valid_from"),
            nxt.alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )

    # ONE SQL text, both engines: the decimal-exact sum idiom is valid
    # Spark SQL and DuckDB alike, so the query IS its own oracle —
    # the strongest possible demonstration of the SQL front-end.
    _PART_HIERARCHY_SQL = """
WITH RECURSIVE chain AS (
    SELECT p_partkey AS node, p_partkey AS cur,
           0 AS depth,
           CAST(p_retailprice AS DECIMAL(27,6)) AS path_cost
    FROM part
    UNION ALL
    SELECT c.node, p.p_partkey AS cur, c.depth + 1,
           CAST(c.path_cost + CAST(p.p_retailprice AS DECIMAL(27,6))
                AS DECIMAL(27,6)) AS path_cost
    FROM chain c JOIN part p
      ON p.p_partkey = CAST(floor(c.cur / 2.0) AS BIGINT)
    WHERE c.cur > 0
)
SELECT node,
       CAST(max(depth) AS BIGINT) AS chain_len,
       -- 100.0 literals must be cast: Spark SQL parses bare x.y as
       -- DECIMAL (DuckDB as DOUBLE); the shared text pins DOUBLE
       floor(CAST(max(path_cost) AS DOUBLE) * CAST(100 AS DOUBLE)
             + CAST(0.5 AS DOUBLE)) / CAST(100 AS DOUBLE)
           AS ancestor_cost
FROM chain GROUP BY node
"""

    _NATION_REVENUE_SQL = f"""
SELECT n_name,
       {exact_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*) AS n_lines
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""

    @register(
        "sql_nation_revenue",
        oracle=_NATION_REVENUE_SQL,
        doc="Raw-SQL front-end demo: the identical ANSI text runs on "
        "spark.sql over registered temp views (sources/views.py) and "
        "on DuckDB as the oracle. Views are metadata only — Catalyst "
        "still prunes columns, pushes filters, and broadcasts nation "
        "exactly as the DataFrame form would.",
    )
    def sql_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.sources.views import register_views

        register_views(
            spark, sf_dir, ("customer", "orders", "lineitem", "nation")
        )
        return spark.sql(_NATION_REVENUE_SQL)

    @register(
        "recursive_part_hierarchy",
        oracle=_PART_HIERARCHY_SQL,
        doc="Recursive CTE (new in Spark 4): walk the derived part "
        "hierarchy parent(k) = floor(k/2) from every node to the "
        "root, returning chain length and the decimal-exact ancestor "
        "price rollup. The IDENTICAL text runs on spark.sql and "
        "DuckDB — anchor/step schemas are pinned (explicit decimal "
        "re-cast in the step) because both engines require "
        "union-compatible recursion. Spark executes this as an "
        "iterative union of joins (depth rounds = log2(maxkey), each "
        "one broadcast-joinable); the per-round row set only shrinks, "
        "so at 100 TB the driver-side iteration count stays ~40 even "
        "at trillion-row part tables. Hierarchy is synthetic (no "
        "parent column in the schema) — the operator is the point.",
    )
    def recursive_part_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.sources.views import register_views

        register_views(spark, sf_dir, ("part",))
        return spark.sql(_PART_HIERARCHY_SQL)

    @register(
        "q14_promo_revenue",
        oracle=f"""
WITH j AS (
    SELECT p_type, l_extendedprice * (1 - l_discount) AS rev
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
)
SELECT {exact_sum_sql("CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END")}
         AS promo_revenue,
       {exact_sum_sql('rev')} AS total_revenue,
       {stable_round_sql(
           "100.0 * " + exact_sum_sql(
               "CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END")
           + " / " + exact_sum_sql('rev'), 6)} AS promo_pct
FROM j
""",
        doc="TPC-H Q14 analogue (promo revenue share): date-pruned "
        "lineitem scan broadcast-joined to the part dimension, then "
        "ONE conditional decimal aggregate produces numerator and "
        "denominator together — no second pass, no shuffle beyond the "
        "single-row combine. Completes table coverage: every test "
        "table now feeds at least one oracle-checked query.",
    )
    def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        part = load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_type"
        )
        rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
        joined = li.join(
            F.broadcast(part), li.l_partkey == part.p_partkey
        )
        return joined.agg(
            exact_sum(promo, "promo_revenue"),
            exact_sum(rev, "total_revenue"),
            stable_round(
                F.lit(100.0) * exact_sum(promo) / exact_sum(rev), 6
            ).alias("promo_pct"),
        )

    @register(
        "tick_api_quotes",
        oracle="""
WITH syms(symbol) AS (VALUES ('AAPL'), ('GOOGL'), ('MSFT')),
h AS (
    SELECT symbol, t.seq,
           CAST(('0x' || substr(
               md5(symbol || ':' || CAST(t.seq AS VARCHAR)), 1, 16))
             AS UBIGINT) AS hv
    FROM syms, range(0, 50) t(seq)
)
SELECT symbol,
       CAST(seq AS BIGINT) AS seq,
       CAST(to_timestamp(1704067200 + seq * 60) AS TIMESTAMP) AS ts,
       100.0 + (hv % 100000) / 1000.0 AS price,
       CAST(1 + (hv >> 20) % 10000 AS BIGINT) AS volume
FROM h
""",
        doc="The custom Python DataSource connector (sources/"
        "tick_api.py) proven through the oracle gate: Spark reads "
        "spark.read.format('tick_api') — one InputPartition per "
        "symbol, quote kernel evaluated executor-side — while DuckDB "
        "independently recomputes the md5-derived quote formula in "
        "SQL. A value-hash match means the connector's partitioning, "
        "schema, and kernel are all faithful end-to-end.",
    )
    def tick_api_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.sources.tick_api import (
            register_tick_api,
        )

        register_tick_api(spark)
        return (
            spark.read.format("tick_api")
            .option("symbols", "AAPL,GOOGL,MSFT")
            .option("rows_per_symbol", 50)
            .load()
        )

    # one text, both engines — decimal-exact so the correlated average
    # is order-independent (a plain avg(double) would hash-mismatch)
    _ABOVE_AVG_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > (
    SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
           / count(*)
    FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""

    @register(
        "orders_above_customer_avg",
        oracle=_ABOVE_AVG_SQL,
        doc="Correlated scalar subquery (each order vs its own "
        "customer's average) through the SQL front-end — Catalyst "
        "DECORRELATES it into one grouped aggregate + an equi-join "
        "(plan-asserted: no per-row subquery execution exists in the "
        "physical plan), which is why the pattern is safe at 100 TB "
        "where a nested-loop evaluation would be quadratic. Identical "
        "text runs as the DuckDB oracle.",
    )
    def orders_above_customer_avg(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from stock_trend_predictor_spark.sources.views import register_views

        register_views(spark, sf_dir, ("orders",))
        return spark.sql(_ABOVE_AVG_SQL)

    _LATERAL_TOPK_SQL = """
SELECT s.o_orderstatus, t.o_orderkey, t.o_totalprice
FROM (SELECT DISTINCT o_orderstatus FROM orders) s,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_orderstatus = s.o_orderstatus
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
"""

    @register(
        "lateral_topk_per_status",
        oracle=_LATERAL_TOPK_SQL,
        doc="Correlated LATERAL subquery with ORDER BY + LIMIT (top-2 "
        "orders per status) through the SQL front-end; the identical "
        "text is the DuckDB oracle. Catalyst decorrelates the lateral "
        "into a set-oriented plan (no per-outer-row re-execution — "
        "asserted in tests/test_plans.py), so the construct scales "
        "like the window-function top-k it is equivalent to "
        "(`topk_orders_per_status`) rather than like a nested loop.",
    )
    def lateral_topk_per_status(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from stock_trend_predictor_spark.sources.views import register_views

        register_views(spark, sf_dir, ("orders",))
        return spark.sql(_LATERAL_TOPK_SQL)

    @register(
        "daily_rollup_incremental",
        oracle="""
SELECT event_type AS key,
       CAST(date_trunc('day', ts) AS DATE) AS day,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total,
       CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / count(*)
         AS mean,
       min(value) AS min_v,
       max(value) AS max_v
FROM events
GROUP BY 1, 2
""",
        doc="Materialized-view maintenance law, proven through the "
        "oracle gate: the input is split into three arbitrary slices, "
        "each reduced to mergeable partial state (count / decimal sum "
        "/ min / max per key×day), the partials merged pairwise, and "
        "only then finalized — the oracle is the PLAIN one-shot daily "
        "rollup. Bit-identical because every state component is a "
        "commutative monoid (operators/incremental_agg.py); this is "
        "why a 100 TB rollup updates per-partition instead of "
        "recomputing.",
    )
    def daily_rollup_incremental(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from stock_trend_predictor_spark.operators.incremental_agg import (
            daily_partials,
            finalize,
            merge_partials,
        )

        ev = load_table(spark, sf_dir, "events")
        c1 = F.lit("2024-01-08 00:00:00").cast("timestamp")
        c2 = F.lit("2024-01-21 12:34:56").cast("timestamp")
        slices = [
            ev.where(F.col("ts") < c1),
            ev.where((F.col("ts") >= c1) & (F.col("ts") < c2)),
            ev.where(F.col("ts") >= c2),
        ]
        partials = [daily_partials(s, key="event_type") for s in slices]
        return finalize(merge_partials(*partials))

    @register(
        "hot_window_purchase_count",
        oracle="""
WITH wc AS (
    SELECT CAST(to_timestamp(floor(epoch(ts) / 21600) * 21600)
                AS TIMESTAMP) AS w_start,
           count(*) AS n_errors
    FROM events WHERE event_type = 'error' GROUP BY 1
), hot AS (
    SELECT w_start, w_start + INTERVAL 21600 SECOND AS w_end, n_errors
    FROM wc WHERE n_errors > (SELECT avg(n_errors) FROM wc)
)
SELECT h.w_start, h.n_errors,
       CAST(count(p.event_id) AS BIGINT) AS n_purchases
FROM hot h LEFT JOIN (
    SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
  ON p.ts >= h.w_start AND p.ts < h.w_end
GROUP BY h.w_start, h.n_errors
""",
        doc="Interval-containment analytics: find 6-hour windows with "
        "above-average error counts, then count purchases falling in "
        "each via operators/intervals.py::bucketed_interval_join — the "
        "equi-join-on-exploded-buckets form of a range join, so the "
        "plan has NO BroadcastNestedLoopJoin/cartesian (plan-asserted) "
        "and survives an interval side too big to broadcast. "
        "Left-interval semantics (hot windows with zero purchases kept) "
        "via a join of the counts back onto the interval frame.",
    )
    def hot_window_purchase_count(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from stock_trend_predictor_spark.operators.intervals import (
            bucketed_interval_join,
        )

        ev = load_table(spark, sf_dir, "events")
        w6 = F.timestamp_seconds(
            F.unix_timestamp("ts") - (F.unix_timestamp("ts") % 21600)
        )
        wc = (
            ev.where(F.col("event_type") == "error")
            .groupBy(w6.alias("w_start"))
            .agg(F.count(F.lit(1)).alias("n_errors"))
        )
        thr = wc.agg(F.avg("n_errors").alias("thr"))
        hot = (
            wc.crossJoin(F.broadcast(thr))
            .where(F.col("n_errors") > F.col("thr"))
            .select(
                "w_start",
                (F.col("w_start") + F.expr("interval 21600 seconds")).alias(
                    "w_end"
                ),
                "n_errors",
            )
        )
        purchases = ev.where(F.col("event_type") == "purchase").select(
            "event_id", "ts"
        )
        matched = bucketed_interval_join(
            purchases, hot, point_ts="ts", start="w_start", end="w_end"
        )
        counts = matched.groupBy("w_start").agg(
            F.count(F.lit(1)).alias("n_matched")
        )
        return (
            hot.join(counts, "w_start", "left")
            .select(
                "w_start",
                "n_errors",
                F.coalesce("n_matched", F.lit(0))
                .cast("bigint")
                .alias("n_purchases"),
            )
        )

    @register(
        "scd2_point_in_time",
        oracle="""
WITH scd AS (
    SELECT user_id, value, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
    FROM events
)
SELECT user_id, value AS value_asof, valid_from
FROM scd
WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
""",
        doc="Point-in-time (time-travel) lookup over the SCD2 interval "
        "table: the one version row per key whose [valid_from, "
        "valid_to) interval covers the query timestamp. Interval "
        "membership on lead() output — no range join, one per-key "
        "window pass; on a materialized SCD2 table this is a pure "
        "filter with valid_from/valid_to min-max pruning.",
    )
    def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = F.lit("2024-01-15 00:00:00").cast("timestamp")
        ev = load_table(spark, sf_dir, "events")
        w = Window.partitionBy("user_id").orderBy("ts")
        scd = ev.select(
            "user_id",
            "value",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
        return scd.where(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        ).select("user_id", F.col("value").alias("value_asof"), "valid_from")

    @register(
        "value_histogram",
        oracle=f"""
WITH bounds AS (
    SELECT min(value) AS lo, max(value) AS hi,
           (max(value) - min(value)) / 20 AS w
    FROM events
)
SELECT CAST(least(floor((e.value - b.lo) / b.w), 19) AS BIGINT) AS bin,
       {stable_round_sql(
           'b.lo + CAST(least(floor((e.value - b.lo) / b.w), 19)'
           ' AS BIGINT) * b.w', 6)} AS bin_lo,
       count(*) AS n_values
FROM events e CROSS JOIN bounds b
GROUP BY 1, 2
""",
        doc="Equi-width histogram (20 bins) over the value column: "
        "global min/max/width computed in one single-row aggregate and "
        "broadcast back, bin assignment as pure arithmetic (identical "
        "IEEE op sequence in both engines, so bin edges are bit-exact), "
        "counts map-side combinable. Two passes over the data but the "
        "second shuffles only (bin, count) partials — the profiling "
        "primitive behind feature_decile_binning's equi-DEPTH variant.",
    )
    def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select("value")
        bounds = ev.agg(
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            ((F.max("value") - F.min("value")) / 20).alias("w"),
        )
        bin_ = (
            F.least(
                F.floor((F.col("value") - F.col("lo")) / F.col("w")),
                F.lit(19),
            )
            .cast("bigint")
        )
        return (
            ev.crossJoin(F.broadcast(bounds))
            .select(
                bin_.alias("bin"),
                stable_round(
                    F.col("lo") + bin_ * F.col("w"), 6
                ).alias("bin_lo"),
            )
            .groupBy("bin", "bin_lo")
            .agg(F.count(F.lit(1)).alias("n_values"))
        )

    @register(
        "retention_cohorts",
        oracle="""
WITH first_seen AS (
    SELECT user_id,
           CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
    FROM events GROUP BY 1
), activity AS (
    SELECT DISTINCT e.user_id, f.cohort_week,
           CAST((epoch(date_trunc('week', e.ts))
                 - epoch(f.cohort_week)) / 604800 AS BIGINT) AS weeks_since
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
)
SELECT cohort_week, weeks_since, count(*) AS n_active
FROM activity
GROUP BY 1, 2
""",
        doc="Weekly retention cohorts: users bucketed by first-seen "
        "week, activity counted per (cohort, weeks-since-cohort) — the "
        "standard product-analytics triangle. First-seen is one "
        "map-side-combinable min; the join back is key-partitioned "
        "(AQE broadcasts the per-user frame when it fits); the "
        "DISTINCT dedups (user, cohort, week) before the count so a "
        "burst-active user counts once. Week arithmetic is pure "
        "integer epoch math — engine-exact.",
    )
    def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
        first_seen = ev.groupBy("user_id").agg(
            F.date_trunc("week", F.min("ts")).alias("cohort_week")
        )
        activity = (
            ev.join(first_seen, "user_id")
            .select(
                "user_id",
                "cohort_week",
                (
                    (
                        F.unix_timestamp(F.date_trunc("week", "ts"))
                        - F.unix_timestamp("cohort_week")
                    )
                    / 604800
                )
                .cast("bigint")
                .alias("weeks_since"),
            )
            .distinct()
        )
        return activity.groupBy("cohort_week", "weeks_since").agg(
            F.count(F.lit(1)).alias("n_active")
        )

    @register(
        "trimmed_mean_per_type",
        oracle=f"""
WITH cuts AS (
    SELECT event_type,
           quantile_cont(value, 0.05) AS p05,
           quantile_cont(value, 0.95) AS p95
    FROM events GROUP BY 1
)
SELECT e.event_type,
       count(*) AS n_kept,
       {exact_sum_sql('e.value')} / count(*) AS trimmed_mean,
       {stable_round_sql('c.p05', 6)} AS p05,
       {stable_round_sql('c.p95', 6)} AS p95
FROM events e JOIN cuts c ON e.event_type = c.event_type
WHERE e.value BETWEEN c.p05 AND c.p95
GROUP BY e.event_type, c.p05, c.p95
""",
        doc="5% two-sided trimmed mean per key: exact interpolated "
        "percentile cut points (one-row-per-key, broadcast back), "
        "filter to the central 90%, decimal-exact mean of the "
        "survivors — the robust-location estimator complementing "
        "event_value_anomaly_mad's robust-scale one. At 100 TB the "
        "exact percentile pass swaps for approx_percentile with no "
        "shape change.",
    )
    def trimmed_mean_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select("event_type", "value")
        cuts = ev.groupBy("event_type").agg(
            F.percentile("value", F.lit(0.05)).alias("p05"),
            F.percentile("value", F.lit(0.95)).alias("p95"),
        )
        return (
            ev.join(F.broadcast(cuts), "event_type")
            .where(F.col("value").between(F.col("p05"), F.col("p95")))
            .groupBy("event_type", "p05", "p95")
            .agg(
                F.count(F.lit(1)).alias("n_kept"),
                (exact_sum("value") / F.count(F.lit(1))).alias(
                    "trimmed_mean"
                ),
            )
            .select(
                "event_type",
                "n_kept",
                "trimmed_mean",
                stable_round("p05", 6).alias("p05"),
                stable_round("p95", 6).alias("p95"),
            )
        )

    @register(
        "weighted_median_price",
        oracle="""
WITH cum AS (
    SELECT l_returnflag,
           l_extendedprice,
           sum(CAST(l_quantity AS DECIMAL(27,6)))
             OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
             AS cum_w,
           sum(CAST(l_quantity AS DECIMAL(27,6)))
             OVER (PARTITION BY l_returnflag) AS tot_w
    FROM lineitem
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(max(tot_w) AS DOUBLE) AS total_weight,
       min(CASE WHEN cum_w * 2 >= tot_w THEN l_extendedprice END)
         AS weighted_median_price
FROM cum
GROUP BY l_returnflag
""",
        doc="Quantity-weighted median price per returnflag — the "
        "set-oriented weighted-median construction (sort within key, "
        "decimal-exact cumulative weight, first price whose cumulative "
        "weight reaches half the total). The cumulative window uses "
        "the default RANGE frame so tied prices share one cumulative "
        "value — selection is deterministic under any shuffle order, "
        "and the decimal accumulator makes the >= comparison exact in "
        "both engines. One shuffle on the group key; both windows and "
        "the final aggregate reuse that single sort. No NTILE / "
        "percentile_cont detour: those are unweighted.",
    )
    def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        wq = F.col("l_quantity").cast(DECIMAL_T)
        w_cum = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
        w_all = Window.partitionBy("l_returnflag")
        cum = li.select(
            "l_returnflag",
            "l_extendedprice",
            F.sum(wq).over(w_cum).alias("cum_w"),
            F.sum(wq).over(w_all).alias("tot_w"),
        )
        return cum.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.max("tot_w").cast("double").alias("total_weight"),
            F.min(
                F.when(
                    F.col("cum_w") * 2 >= F.col("tot_w"),
                    F.col("l_extendedprice"),
                )
            ).alias("weighted_median_price"),
        )

    @register(
        "user_event_sequences",
        oracle=f"""
WITH o AS (
    SELECT user_id, event_type, ts,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM events
)
SELECT user_id,
       CAST(max(n) AS BIGINT) AS n_events,
       min(CASE WHEN rn = 1 THEN event_type END) AS first_type,
       min(CASE WHEN rn = n THEN event_type END) AS last_type,
       CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT)
         AS span_us,
       CASE WHEN max(n) > 1 THEN
         {stable_round_sql(
             "date_diff('microsecond', min(ts), max(ts)) / 1000000.0"
             " / (max(n) - 1)", 6)}
       END AS mean_gap_s
FROM o
GROUP BY user_id
""",
        doc="Per-user ordered event-sequence materialization — the "
        "shape that turns a log into transformer training sequences: "
        "sort_array(collect_list(struct(ts, event_id, ...))) builds "
        "the whole per-key sequence in ONE aggregation (no window "
        "pass), then scalar features read off the array ends. The "
        "struct's (ts, event_id) prefix makes the sort total, so the "
        "assembled sequence is deterministic under any partitioning — "
        "the collect_list-without-an-order trap, solved. The oracle "
        "derives the same features via row_number windows: two "
        "constructions, one result. At 100 TB per-key sequences are "
        "memory-bounded by the largest key — cap with slice() or "
        "segment by session (sequence_packing) before assembling.",
    )
    def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        seq = ev.groupBy("user_id").agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("seq")
        )
        first = F.element_at("seq", 1)
        last = F.element_at("seq", -1)
        n = F.size("seq").cast("bigint")
        span_us = F.unix_micros(last.getField("ts")) - F.unix_micros(
            first.getField("ts")
        )
        return seq.select(
            "user_id",
            n.alias("n_events"),
            first.getField("event_type").alias("first_type"),
            last.getField("event_type").alias("last_type"),
            span_us.alias("span_us"),
            F.when(
                n > 1,
                stable_round(
                    span_us / F.lit(1_000_000.0) / (n - 1).cast("double"), 6
                ),
            ).alias("mean_gap_s"),
        )

    @register(
        "pareto_customer_revenue",
        oracle=f"""
WITH rev AS (
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DECIMAL(27,6))
             AS revenue
    FROM orders
    GROUP BY o_custkey
), ranked AS (
    SELECT o_custkey, revenue,
           CAST(sum(revenue) OVER (ORDER BY revenue DESC, o_custkey)
                AS DECIMAL(38,6)) AS cum_rev,
           CAST(sum(revenue) OVER () AS DECIMAL(38,6)) AS total_rev,
           CAST(row_number() OVER (ORDER BY revenue DESC, o_custkey)
                AS BIGINT) AS rk
    FROM rev
)
SELECT o_custkey, rk,
       CAST(revenue AS DOUBLE) AS revenue,
       {stable_round_sql(
           "CAST(cum_rev AS DOUBLE) / CAST(total_rev AS DOUBLE)", 6)}
         AS cum_share
FROM ranked
WHERE cum_rev - revenue < total_rev * 0.8
""",
        doc="Pareto (80/20) contribution analysis: the smallest set of "
        "customers whose cumulative revenue covers 80% of the total — "
        "a row is kept when the mass BEFORE it is still under the "
        "cutoff, so the crossing customer is included and the "
        "selection is exactly the minimal prefix. All mass arithmetic "
        "is decimal-exact (sums AND the cutoff comparison), making "
        "the kept set bit-deterministic cross-engine; only the "
        "reported shares round to double. The ranking is total "
        "(revenue DESC, custkey). One shuffle for the per-customer "
        "rollup; rank AND running revenue then come from the "
        "two-level prefix scan (operators/rank.py, r4 verdict #2 — "
        "the mitigation this docstring used to merely describe): 64 "
        "broadcast-percentile revenue bands, per-band decimal "
        "count/sum carry-ins, windows partitioned by band. The grand "
        "total is an aggregate broadcast back, not a global window.",
    )
    def pareto_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.operators.rank import (
            prefix_scan_rank,
            quantile_bucket,
        )

        orders = load_table(spark, sf_dir, "orders")
        rev = orders.groupBy("o_custkey").agg(
            F.sum(F.col("o_totalprice").cast(DECIMAL_T))
            .cast(DECIMAL_T)
            .alias("revenue")
        )
        # descending revenue order: reverse the ascending band id
        bucket = F.lit(63) - quantile_bucket(rev, "revenue", 64)
        tot = rev.agg(
            F.sum("revenue").cast("decimal(38,6)").alias("total_rev")
        )
        ranked = (
            prefix_scan_rank(
                rev,
                bucket,
                [F.col("revenue").desc(), F.col("o_custkey")],
                "rk",
                sum_col="revenue",
                cumsum_name="cum_rev_raw",
            )
            .join(F.broadcast(tot))
            .select(
                "o_custkey",
                "revenue",
                F.col("cum_rev_raw").cast("decimal(38,6)").alias("cum_rev"),
                "total_rev",
                "rk",
            )
        )
        return ranked.where(
            F.col("cum_rev") - F.col("revenue")
            < F.col("total_rev") * F.expr("CAST(0.8 AS DECIMAL(2,1))")
        ).select(
            "o_custkey",
            "rk",
            F.col("revenue").cast("double").alias("revenue"),
            stable_round(
                F.col("cum_rev").cast("double")
                / F.col("total_rev").cast("double"),
                6,
            ).alias("cum_share"),
        )

    # ------------------------------------------------------------------
    @register(
        "gini_customer_revenue",
        oracle=f"""
WITH rev AS (
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
               AS revenue
    FROM orders GROUP BY 1
), ranked AS (
    SELECT revenue,
           CAST(row_number() OVER (ORDER BY revenue, o_custkey) AS DOUBLE)
               AS rk
    FROM rev
), sums AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(revenue AS DECIMAL(27,6))) AS DOUBLE) AS s,
           CAST(SUM(CAST(rk * revenue AS DECIMAL(38,6))) AS DOUBLE) AS srx
    FROM ranked
)
SELECT n AS n_customers,
       {stable_round_sql('s', 2)} AS total_revenue,
       {stable_round_sql(
           '2.0 * srx / (n * s) - (n + 1.0) / n', 6)} AS gini
FROM sums
""",
        doc="Gini coefficient of customer revenue: the inequality "
        "summary behind pareto_customer_revenue's 80% prefix — one "
        "number for 'how concentrated is the book'. Computed from "
        "the rank-weighted sum identity G = 2*sum(i*x_i)/(n*sum x) "
        "- (n+1)/n over revenues ranked ascending with the custkey "
        "tiebreak (a total order, so ranks are deterministic). Ranks "
        "come from the two-level prefix scan (operators/rank.py, r4 "
        "verdict #2): 64 broadcast-percentile revenue bands, per-band "
        "count carry-ins, row_number partitioned by band — no window "
        "in the plan ever sees more than one band of the customer "
        "aggregate; rank x revenue products sum at decimal(38,6) "
        "since rank reaches n.",
    )
    def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.operators.rank import (
            prefix_scan_rank,
            quantile_bucket,
        )

        o = load_table(spark, sf_dir, "orders")
        rev = o.groupBy("o_custkey").agg(
            F.sum(F.col("o_totalprice").cast(DECIMAL_T))
            .cast("double")
            .alias("revenue")
        )
        ranked = prefix_scan_rank(
            rev,
            quantile_bucket(rev, "revenue", 64),
            ["revenue", "o_custkey"],
            "rk_i",
        ).select("revenue", F.col("rk_i").cast("double").alias("rk"))
        sums = ranked.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("revenue").cast(DECIMAL_T)).cast("double").alias("s"),
            F.sum((F.col("rk") * F.col("revenue")).cast("decimal(38,6)"))
            .cast("double")
            .alias("srx"),
        )
        n, s = F.col("n"), F.col("s")
        return sums.select(
            n.alias("n_customers"),
            stable_round(s, 2).alias("total_revenue"),
            stable_round(
                2.0 * F.col("srx") / (n * s) - (n + 1.0) / n, 6
            ).alias("gini"),
        )

    # ------------------------------------------------------------------
    @register(
        "supplier_concentration_hhi",
        oracle=f"""
WITH rev AS (
    SELECT s.s_nationkey AS nationkey, l.l_suppkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY 1, 2
), tot AS (
    SELECT nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(revenue AS DECIMAL(27,6))) AS DOUBLE) AS total
    FROM rev GROUP BY 1
)
SELECT n.n_name AS nation,
       t.n_suppliers,
       {stable_round_sql(
           'CAST(SUM(CAST((r.revenue / t.total) * (r.revenue / t.total)'
           ' AS DECIMAL(27,18))) AS DOUBLE)', 6)} AS hhi,
       {stable_round_sql('max(r.revenue / t.total)', 6)} AS top_share
FROM rev r
JOIN tot t ON t.nationkey = r.nationkey
JOIN nation n ON n.n_nationkey = r.nationkey
GROUP BY 1, 2
""",
        doc="Herfindahl-Hirschman supplier concentration per nation: "
        "sum of squared revenue shares plus the single largest share "
        "— the market-structure audit (HHI > 0.25 = concentrated "
        "under the DOJ convention). Supplier revenues aggregate at "
        "the (nation, supplier) grain first (decimal-exact, "
        "combinable); totals are nation-grain one-row aggregates "
        "broadcast back; each squared share is an identical IEEE "
        "tree both engines and the terms sum at decimal(27,18) so "
        "the total is partition-order independent.",
    )
    def supplier_concentration_hhi(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        sup = load_table(spark, sf_dir, "supplier")
        nat = load_table(spark, sf_dir, "nation")
        rev = (
            li.join(
                F.broadcast(sup.select("s_suppkey", "s_nationkey")),
                li["l_suppkey"] == sup["s_suppkey"],
            )
            .groupBy(
                F.col("s_nationkey").alias("nationkey"),
                "l_suppkey",
            )
            .agg(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast(DECIMAL_T)
                )
                .cast("double")
                .alias("revenue")
            )
        )
        tot = rev.groupBy("nationkey").agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("revenue").cast(DECIMAL_T)).cast("double").alias(
                "total"
            ),
        )
        share = F.col("revenue") / F.col("total")
        return (
            rev.join(F.broadcast(tot), "nationkey")
            .join(
                F.broadcast(nat.select("n_nationkey", "n_name")),
                F.col("nationkey") == F.col("n_nationkey"),
            )
            .groupBy(F.col("n_name").alias("nation"), "n_suppliers")
            .agg(
                stable_round(
                    F.sum((share * share).cast("decimal(27,18)")).cast(
                        "double"
                    ),
                    6,
                ).alias("hhi"),
                stable_round(F.max(share), 6).alias("top_share"),
            )
        )


_register()
