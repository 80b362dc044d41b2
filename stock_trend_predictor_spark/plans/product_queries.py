"""Product-analytics tier: cohort LTV accumulation, price elasticity,
session-depth distribution, and a multibyte encoding audit.

These compose primitives the engine already proves (cohorting,
sufficient-sum OLS, gap sessionization, bit-length histograms) into
the reports a product/growth team actually ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    DECIMAL_T,
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table

#: sessionization gap (seconds) — matches sessionize_events.
SESSION_GAP_S = 1800


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "cohort_ltv_curve",
        oracle=f"""
WITH firsts AS (
    SELECT user_id,
           CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
    FROM events GROUP BY 1
), cohort_size AS (
    SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
    FROM firsts GROUP BY 1
), pur AS (
    SELECT f.cohort_week,
           CAST((epoch(date_trunc('week', e.ts))
                 - epoch(f.cohort_week)) / 604800 AS BIGINT) AS week_idx,
           e.value
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    WHERE e.event_type = 'purchase'
), weekly AS (
    SELECT cohort_week, week_idx,
           SUM(CAST(value AS DECIMAL(27,6))) AS rev
    FROM pur GROUP BY 1, 2
), cum AS (
    SELECT cohort_week, week_idx,
           CAST(SUM(rev) OVER (PARTITION BY cohort_week ORDER BY week_idx
                ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_rev
    FROM weekly
)
SELECT c.cohort_week, c.week_idx, s.n_users,
       {stable_round_sql('c.cum_rev', 6)} AS cum_revenue,
       {stable_round_sql('c.cum_rev / s.n_users', 6)} AS ltv_per_user
FROM cum c JOIN cohort_size s ON c.cohort_week = s.cohort_week
""",
        doc="Cohort lifetime-value accumulation curve: users cohorted "
        "by first-activity week, purchase revenue accumulated per "
        "(cohort, weeks-since) cell — cumulative in DECIMAL inside "
        "the window so the running totals are partition-order exact "
        "— and normalized per cohort user. The weekly grid is "
        "calendar x calendar sized (the window input is the "
        "aggregated weekly table, never raw events); cohort sizes "
        "broadcast back. The revenue companion to retention_cohorts' "
        "presence matrix.",
    )
    def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        firsts = ev.groupBy("user_id").agg(
            F.date_trunc("week", F.min("ts")).alias("cohort_week")
        )
        sizes = firsts.groupBy("cohort_week").agg(
            F.count(F.lit(1)).alias("n_users")
        )
        pur = (
            ev.where(F.col("event_type") == "purchase")
            .join(firsts, "user_id")
            .select(
                "cohort_week",
                (
                    (
                        F.unix_timestamp(F.date_trunc("week", "ts"))
                        - F.unix_timestamp("cohort_week")
                    )
                    / 604800
                )
                .cast("long")
                .alias("week_idx"),
                "value",
            )
        )
        weekly = pur.groupBy("cohort_week", "week_idx").agg(
            F.sum(F.col("value").cast(DECIMAL_T)).alias("rev")
        )
        wcum = (
            Window.partitionBy("cohort_week")
            .orderBy("week_idx")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = weekly.withColumn(
            "cum_rev", F.sum("rev").over(wcum).cast("double")
        )
        return cum.join(F.broadcast(sizes), "cohort_week").select(
            "cohort_week",
            "week_idx",
            "n_users",
            stable_round("cum_rev", 6).alias("cum_revenue"),
            stable_round(
                F.col("cum_rev") / F.col("n_users"), 6
            ).alias("ltv_per_user"),
        )

    @register(
        "price_elasticity_by_brand",
        oracle=f"""
WITH obs AS (
    SELECT p.p_brand,
           ln(l.l_quantity) AS ly,
           ln(l.l_extendedprice / l.l_quantity) AS lx
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
), sums AS (
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS m,
           CAST(SUM(CAST(lx AS DECIMAL(27,6))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(ly AS DECIMAL(27,6))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(lx * ly AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
           CAST(SUM(CAST(lx * lx AS DECIMAL(38,6))) AS DOUBLE) AS sxx
    FROM obs GROUP BY 1
)
SELECT p_brand, m AS n_lines,
       {stable_round_sql(
           '(m * sxy - sx * sy) / (m * sxx - sx * sx)', 6)} AS elasticity,
       {stable_round_sql(
           '(sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m',
           6)} AS log_intercept
FROM sums
""",
        doc="Log-log price elasticity of demand per brand: OLS slope "
        "of ln(quantity) on ln(unit price) — the standard demand-"
        "curve estimate, elasticity < 0 meaning higher price, lower "
        "volume. Logs feed decimal sufficient sums (the engine's "
        "one-pass OLS contract), so the whole regression is one "
        "combinable aggregate per brand after a single broadcast "
        "part join. Slope/intercept are fixed double expressions on "
        "the sums.",
    )
    def price_elasticity_by_brand(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").where(
            (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
        )
        p = load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_brand"
        )
        obs = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
            "p_brand",
            F.log(F.col("l_quantity")).alias("ly"),
            F.log(
                F.col("l_extendedprice") / F.col("l_quantity")
            ).alias("lx"),
        )
        lx, ly = F.col("lx"), F.col("ly")
        sums = obs.groupBy("p_brand").agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(lx.cast(DECIMAL_T)).cast("double").alias("sx"),
            F.sum(ly.cast(DECIMAL_T)).cast("double").alias("sy"),
            F.sum((lx * ly).cast("decimal(38,6)"))
            .cast("double")
            .alias("sxy"),
            F.sum((lx * lx).cast("decimal(38,6)"))
            .cast("double")
            .alias("sxx"),
        )
        m = F.col("m")
        b = (m * F.col("sxy") - F.col("sx") * F.col("sy")) / (
            m * F.col("sxx") - F.col("sx") * F.col("sx")
        )
        return sums.select(
            "p_brand",
            m.alias("n_lines"),
            stable_round(b, 6).alias("elasticity"),
            stable_round(
                (F.col("sy") - b * F.col("sx")) / m, 6
            ).alias("log_intercept"),
        )

    @register(
        "session_length_histogram",
        oracle=f"""
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL THEN 1
                WHEN ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1
                ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
    SELECT user_id,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
    FROM flagged
), sizes AS (
    SELECT user_id, session_seq, CAST(count(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY 1, 2
)
SELECT CAST(length(printf('%b', n_events)) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_sessions,
       min(n_events) AS min_events,
       max(n_events) AS max_events
FROM sizes GROUP BY 1
""",
        doc="Session-depth distribution: the same 30-minute gap "
        "sessionization as sessionize_events, reduced to a binary-"
        "bit-length histogram of events-per-session (bucket b holds "
        "sizes in [2^(b-1), 2^b) — the integer-exact log2 bucketing "
        "copurchase_degree_distribution established). The "
        "engagement-depth report on top of the session primitive; "
        "one per-user sort + two hash aggregates.",
    )
    def session_length_histogram(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
        worder = Window.partitionBy("user_id").orderBy("ts")
        flagged = ev.withColumn(
            "is_new",
            F.when(F.lag("ts").over(worder).isNull(), 1)
            .when(
                F.col("ts").cast("long")
                > F.lag("ts").over(worder).cast("long") + SESSION_GAP_S,
                1,
            )
            .otherwise(0),
        )
        sessions = flagged.withColumn(
            "session_seq",
            F.sum("is_new").over(
                worder.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        sizes = sessions.groupBy("user_id", "session_seq").agg(
            F.count(F.lit(1)).alias("n_events")
        )
        return sizes.groupBy(
            F.length(F.expr("bin(n_events)")).cast("int").alias("bucket")
        ).agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.min("n_events").alias("min_events"),
            F.max("n_events").alias("max_events"),
        )

    @register(
        "multibyte_ratio_by_lang",
        oracle=f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(strlen(text) AS BIGINT)) AS BIGINT) AS total_bytes,
       CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_chars,
       {stable_round_sql(
           'CAST(SUM(CAST(strlen(text) AS BIGINT)) AS DOUBLE)'
           ' / SUM(CAST(length(text) AS BIGINT))', 6)} AS bytes_per_char
FROM documents GROUP BY 1
""",
        doc="UTF-8 bytes-per-character audit per language label: "
        "exact byte (octet_length) and codepoint (char_length) "
        "totals — ratio 1.0 is pure ASCII, ~3 is CJK-heavy; a label "
        "claiming 'zh' at ratio 1.0 is mislabeled or transliterated "
        "(the cheap encoding-level companion to lang_id_heuristic's "
        "token-level check, and the number a tokenizer-budget "
        "planner needs before choosing byte- vs char-level units). "
        "One combinable aggregate; integer-exact except the final "
        "ratio.",
    )
    def multibyte_ratio_by_lang(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        d = load_table(spark, sf_dir, "documents")
        return d.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.octet_length("text").cast("long")).alias(
                "total_bytes"
            ),
            F.sum(F.char_length("text").cast("long")).alias(
                "total_chars"
            ),
            stable_round(
                F.sum(F.octet_length("text").cast("long")).cast("double")
                / F.sum(F.char_length("text").cast("long")),
                6,
            ).alias("bytes_per_char"),
        )


_register()
