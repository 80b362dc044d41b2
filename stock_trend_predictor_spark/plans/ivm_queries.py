"""Incremental view maintenance and join planning diagnostics.

The reference recomputes everything from scratch on every poll cycle
(ml_model/predict_from_vm4.py re-reads the whole collection); a 100 TB
engine can't. This module proves the delta-join maintenance algebra
through the driver's hash gate and ships the skew diagnostic a planner
consults before choosing a join strategy:

- ``incremental_join_view``: maintain the aggregated join view
  G = orders |><| lineitem grouped by (priority, returnflag) via the
  four-term delta decomposition — the ORACLE computes the same view
  as one monolithic join+agg, so hash equality is a machine-checked
  proof that old + dA|><|B_old + A_old|><|dB + dA|><|dB == full
  recompute, decimal-exact.
- ``join_key_skew_profile``: the per-key-count distribution of the
  two lineitem join keys (distinct keys, p50/p99/max multiplicity,
  top-10 share) — the numbers that decide broadcast vs SMJ vs salting
  (operators/skew.py) before a 100 TB join is launched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    DECIMAL_T,
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table

#: Delta split points: orders on/after this date are the "new" batch,
#: lineitems with l_orderkey % 7 < 2 are the "new" batch. The two
#: cuts are deliberately uncorrelated so every delta term is nonempty.
IVM_DATE_CUT = "1997-07-01"
IVM_LI_MOD, IVM_LI_NEW = 7, 2


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "incremental_join_view",
        oracle=f"""
SELECT o.o_orderpriority, l.l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                     AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
""",
        doc="Delta-join incremental view maintenance, hash-proven: "
        "the maintained view G(priority, returnflag) -> (count, "
        "revenue) is computed as the MERGE of four partial "
        "aggregates — A_old|><|B_old (the standing state), plus the "
        "three delta terms dA|><|B_old, A_old|><|dB, dA|><|dB — "
        "while the oracle runs the monolithic join+agg. Equality is "
        "exact because the measures are decimal partials (order-"
        "independent) and count/sum merge by addition. At 100 TB "
        "only the delta terms run per refresh: dA and dB are "
        "day-sized, each joins the OTHER side's standing table once "
        "(delta side broadcast when day-sized), and the standing "
        "join A_old|><|B_old is never re-executed — here it is "
        "evaluated once to seed the state, exactly as a backfill "
        "would. Merge is a groupBy-sum over #groups rows. "
        "Complements daily_rollup_incremental (single-table agg "
        "maintenance) with the two-sided JOIN maintenance algebra.",
    )
    def incremental_join_view(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderpriority",
            (
                F.col("o_orderdate")
                >= F.lit(IVM_DATE_CUT).cast("timestamp")
            ).alias("is_new"),
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_returnflag",
            (
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("rev"),
            (F.col("l_orderkey") % IVM_LI_MOD < IVM_LI_NEW).alias("is_new"),
        )
        o_old, o_new = o.where(~F.col("is_new")), o.where(F.col("is_new"))
        l_old, l_new = li.where(~F.col("is_new")), li.where(F.col("is_new"))

        def partial(orders: DataFrame, lines: DataFrame) -> DataFrame:
            return (
                orders.join(
                    lines, orders.o_orderkey == lines.l_orderkey
                )
                .groupBy("o_orderpriority", "l_returnflag")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(F.col("rev").cast(DECIMAL_T)).alias("rev_d"),
                )
            )

        # standing state + the three delta terms, merged by addition
        merged = (
            partial(o_old, l_old)
            .unionAll(partial(o_new, l_old))
            .unionAll(partial(o_old, l_new))
            .unionAll(partial(o_new, l_new))
            .groupBy("o_orderpriority", "l_returnflag")
            .agg(
                F.sum("n_rows").alias("n_rows"),
                F.sum("rev_d").cast("double").alias("revenue"),
            )
        )
        return merged

    _SKEW_SQL = """
SELECT '{key}' AS join_key,
       CAST(count(*) AS BIGINT) AS n_distinct_keys,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(max(c) AS BIGINT) AS max_multiplicity,
       {p50} AS p50_multiplicity,
       {p99} AS p99_multiplicity,
       {share} AS top10_share
FROM (
    SELECT c, row_number() OVER (ORDER BY c DESC, k) AS rk
    FROM (SELECT {key} AS k, count(*) AS c FROM lineitem GROUP BY 1)
)
"""

    @register(
        "join_key_skew_profile",
        oracle="\nUNION ALL\n".join(
            _SKEW_SQL.format(
                key=key,
                p50=stable_round_sql("quantile_cont(c, 0.5)", 6),
                p99=stable_round_sql("quantile_cont(c, 0.99)", 6),
                share=stable_round_sql(
                    "CAST(sum(CASE WHEN rk <= 10 THEN c ELSE 0 END)"
                    " AS DOUBLE) / sum(c)",
                    6,
                ),
            )
            for key in ("l_orderkey", "l_partkey")
        ),
        doc="Join-key skew diagnostic for the two lineitem join keys: "
        "distinct-key count, p50/p99/max per-key multiplicity, and "
        "the row share held by the 10 hottest keys — exactly the "
        "numbers that pick a 100 TB join strategy (max multiplicity "
        "x row width bounds the biggest hash bucket; top-10 share "
        "near 1 says salt (operators/skew.py), near uniform says "
        "plain SMJ/AQE). One combinable count per key column, then "
        "percentile/rank over the distinct-key-sized count table — "
        "the profile never shuffles the fact rows themselves.",
    )
    def join_key_skew_profile(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")

        def profile(key: str) -> DataFrame:
            counts = li.groupBy(F.col(key).alias("k")).agg(
                F.count(F.lit(1)).alias("c")
            )
            # top-10 hottest keys via orderBy+limit =
            # TakeOrderedAndProject (heap per partition + driver
            # merge) — never a global rank window
            top10 = (
                counts.orderBy(F.col("c").desc(), "k")
                .limit(10)
                .agg(F.sum("c").alias("top10_rows"))
            )
            agg = counts.agg(
                F.count(F.lit(1)).alias("n_distinct_keys"),
                F.sum("c").alias("n_rows"),
                F.max("c").alias("max_multiplicity"),
                stable_round(
                    F.percentile("c", F.lit(0.5)), 6
                ).alias("p50_multiplicity"),
                stable_round(
                    F.percentile("c", F.lit(0.99)), 6
                ).alias("p99_multiplicity"),
            )
            return agg.crossJoin(F.broadcast(top10)).select(
                F.lit(key).alias("join_key"),
                "n_distinct_keys",
                "n_rows",
                "max_multiplicity",
                "p50_multiplicity",
                "p99_multiplicity",
                stable_round(
                    F.col("top10_rows").cast("double") / F.col("n_rows"),
                    6,
                ).alias("top10_share"),
            )

        return profile("l_orderkey").unionAll(profile("l_partkey"))


_register()
