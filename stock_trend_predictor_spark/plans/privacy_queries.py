"""Privacy & causal-inference audits: k-anonymity / l-diversity and
difference-in-differences.

pii_redaction_stats handles detecting identifiers in text; this
module audits STRUCTURED re-identification risk (the release gate a
data-clearance review runs) and adds the standard quasi-experimental
effect estimator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table

#: k-anonymity threshold for the risk report.
K_ANON = 5

#: DiD period boundary: events on/after Jan 16 are the "post" period.
DID_CUT = "2024-01-16"


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "k_anonymity_audit",
        oracle=f"""
WITH groups AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS gsize,
           CAST(count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
                AS BIGINT) AS l_div
    FROM customer GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(gsize) AS BIGINT) AS n_rows,
       min(gsize) AS min_group_size,
       CAST(count(*) FILTER (WHERE gsize < {K_ANON}) AS BIGINT)
           AS groups_below_k,
       CAST(sum(CASE WHEN gsize < {K_ANON} THEN gsize ELSE 0 END)
            AS BIGINT) AS rows_below_k,
       {stable_round_sql(
           'CAST(sum(CASE WHEN gsize < ' + str(K_ANON)
           + ' THEN gsize ELSE 0 END) AS DOUBLE) / sum(gsize)', 6)}
           AS risk_fraction,
       min(l_div) AS min_l_diversity
FROM groups
""",
        doc=f"Structured re-identification audit over the customer "
        f"quasi-identifier pair (nation, market segment): group "
        f"sizes (k-anonymity — any group under k={K_ANON} is a "
        f"linkage risk, reported as group count AND row fraction) "
        f"and l-diversity of the sensitive attribute (distinct "
        f"account-balance bands per group — a k-anonymous group "
        f"where everyone shares one balance band still leaks). One "
        f"combinable two-level aggregate; the release-gate numbers "
        f"a privacy review needs before publishing a slice.",
    )
    def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
        c = load_table(spark, sf_dir, "customer")
        groups = c.groupBy("c_nationkey", "c_mktsegment").agg(
            F.count(F.lit(1)).alias("gsize"),
            F.countDistinct(
                F.floor(F.col("c_acctbal") / 1000.0).cast("long")
            ).alias("l_div"),
        )
        below = F.when(F.col("gsize") < K_ANON, F.col("gsize")).otherwise(0)
        return groups.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("gsize").alias("n_rows"),
            F.min("gsize").alias("min_group_size"),
            F.sum(
                F.when(F.col("gsize") < K_ANON, 1).otherwise(0)
            ).alias("groups_below_k"),
            F.sum(below).alias("rows_below_k"),
            stable_round(
                F.sum(below).cast("double") / F.sum("gsize"), 6
            ).alias("risk_fraction"),
            F.min("l_div").alias("min_l_diversity"),
        )

    @register(
        "did_value_estimate",
        oracle=f"""
WITH tagged AS (
    SELECT CAST(user_id % 2 AS BIGINT) AS arm,
           CASE WHEN ts >= TIMESTAMP '{DID_CUT}' THEN 1 ELSE 0 END
               AS post,
           value
    FROM events
), cells AS (
    SELECT arm, post,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
               / count(*) AS mean_v
    FROM tagged GROUP BY 1, 2
), wide AS (
    SELECT
        max(CASE WHEN arm = 1 AND post = 1 THEN mean_v END) AS t1,
        max(CASE WHEN arm = 1 AND post = 0 THEN mean_v END) AS t0,
        max(CASE WHEN arm = 0 AND post = 1 THEN mean_v END) AS c1,
        max(CASE WHEN arm = 0 AND post = 0 THEN mean_v END) AS c0,
        CAST(sum(n) AS BIGINT) AS n_total
    FROM cells
)
SELECT n_total,
       {stable_round_sql('t0', 6)} AS treat_pre,
       {stable_round_sql('t1', 6)} AS treat_post,
       {stable_round_sql('c0', 6)} AS control_pre,
       {stable_round_sql('c1', 6)} AS control_post,
       {stable_round_sql('(t1 - t0) - (c1 - c0)', 6)} AS did_estimate
FROM wide
""",
        doc=f"Difference-in-differences estimate of the event-value "
        f"shift: user-parity arms x pre/post-{DID_CUT} periods, "
        f"decimal-exact cell means, effect = (treat_post - "
        f"treat_pre) - (control_post - control_pre) — the parallel-"
        f"trends causal estimator that subtracts out the common time "
        f"shock the naive pre/post comparison absorbs. One 4-cell "
        f"combinable aggregate pivoted by conditional max; pairs "
        f"with ab_conversion_ztest (randomized comparison) for the "
        f"quasi-experimental case.",
    )
    def did_value_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.functions.exact import exact_sum

        tagged = load_table(spark, sf_dir, "events").select(
            (F.col("user_id") % 2).alias("arm"),
            F.when(
                F.col("ts") >= F.lit(DID_CUT).cast("timestamp"), 1
            )
            .otherwise(0)
            .alias("post"),
            "value",
        )
        cells = tagged.groupBy("arm", "post").agg(
            F.count(F.lit(1)).alias("n"),
            (exact_sum("value") / F.count(F.lit(1))).alias("mean_v"),
        )

        def cell(a: int, p: int):
            return F.max(
                F.when(
                    (F.col("arm") == a) & (F.col("post") == p),
                    F.col("mean_v"),
                )
            )

        wide = cells.agg(
            F.sum("n").alias("n_total"),
            cell(1, 0).alias("t0"),
            cell(1, 1).alias("t1"),
            cell(0, 0).alias("c0"),
            cell(0, 1).alias("c1"),
        )
        return wide.select(
            "n_total",
            stable_round("t0", 6).alias("treat_pre"),
            stable_round("t1", 6).alias("treat_post"),
            stable_round("c0", 6).alias("control_pre"),
            stable_round("c1", 6).alias("control_post"),
            stable_round(
                (F.col("t1") - F.col("t0"))
                - (F.col("c1") - F.col("c0")),
                6,
            ).alias("did_estimate"),
        )


_register()
