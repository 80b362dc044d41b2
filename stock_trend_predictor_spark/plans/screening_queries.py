"""Screening passes: feature-correlation pruning, inverse-propensity
weighting, and the 2-D histogram.

Three one-pass reductions a modeling pipeline runs before any fit:

- ``feature_correlation_prune`` — the full pairwise Pearson matrix of
  the numeric lineitem features from ONE combinable aggregate (all
  n/sums/cross-moments in a single pass), plus the greedy
  drop-the-later-column verdict at |r| > {CORR_DROP_ABS}. The
  multicollinearity screen.
- ``ipw_ate`` — average treatment effect of a user-parity "treatment"
  on event value via stratified inverse-propensity weighting
  (strata = event_type), reported beside the direct-adjustment and
  naive estimates. The causal companion to did_value_estimate.
- ``histogram2d_qty_price`` — equi-width 2-D density of (quantity,
  extended price), the joint-distribution heat map feeding both
  outlier screens and join-selectivity estimates.

All three reduce to decimal/integer sufficient statistics before any
floating-point division, so results are partitioning-proof.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table

#: lineitem features screened for multicollinearity, in priority
#: order — the LATER column of a correlated pair is the drop candidate.
CORR_FEATURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

#: |Pearson r| above which the later feature is flagged for drop.
CORR_DROP_ABS = 0.4

#: 2-D histogram geometry: value-space widths and bin-count clamps.
H2_QTY_W, H2_QTY_BINS = 5.0, 10
H2_PRICE_W, H2_PRICE_BINS = 10_000.0, 12


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    pairs = list(combinations(range(len(CORR_FEATURES)), 2))

    def s(i):  # sum alias helpers
        return f"s{i}"

    def ss(i, j):
        return f"s{min(i, j)}{max(i, j)}"

    sum_sql = ",\n           ".join(
        [f"CAST(count(*) AS BIGINT) AS n"]
        + [
            f"CAST(SUM(CAST({c} AS DECIMAL(27,6))) AS DOUBLE) AS {s(i)}"
            for i, c in enumerate(CORR_FEATURES)
        ]
        + [
            f"CAST(SUM(CAST({CORR_FEATURES[i]} * {CORR_FEATURES[j]}"
            f" AS DECIMAL(38,6))) AS DOUBLE) AS {ss(i, j)}"
            for i in range(len(CORR_FEATURES))
            for j in range(i, len(CORR_FEATURES))
        ]
    )

    def corr_sql(i, j):
        return (
            f"(({ss(i, j)} - {s(i)} * {s(j)} / n)"
            f" / (sqrt(greatest({ss(i, i)} - {s(i)} * {s(i)} / n, 0.0))"
            f" * sqrt(greatest({ss(j, j)} - {s(j)} * {s(j)} / n, 0.0))))"
        )

    pair_rows_sql = "\n    UNION ALL\n".join(
        f"    SELECT '{CORR_FEATURES[i]}' AS feature_a,"
        f" '{CORR_FEATURES[j]}' AS feature_b,"
        f" {corr_sql(i, j)} AS r FROM sums"
        for i, j in pairs
    )

    @register(
        "feature_correlation_prune",
        oracle=f"""
WITH sums AS (
    SELECT {sum_sql}
    FROM lineitem
), pairs AS (
{pair_rows_sql}
)
SELECT feature_a, feature_b,
       {stable_round_sql('r', 6)} AS pearson_r,
       CAST(abs(r) > {CORR_DROP_ABS} AS BOOLEAN) AS drop_b
FROM pairs
""",
        doc=f"Pairwise Pearson matrix over the numeric lineitem "
        f"features {CORR_FEATURES}, all {len(pairs)} correlations "
        f"from ONE combinable aggregate (counts + sums + the full "
        f"upper-triangle of cross-moments in decimal — a single "
        f"pass, no per-pair rescans, no corr() over raw doubles "
        f"whose partial order would drift), then the greedy "
        f"multicollinearity verdict: |r| > {CORR_DROP_ABS} flags "
        f"the LATER feature of the pair for drop. The pre-fit "
        f"screen every tabular pipeline runs; at 100 TB it is "
        f"exactly one map-side-combinable shuffle of "
        f"{1 + len(CORR_FEATURES) + len(CORR_FEATURES) * (len(CORR_FEATURES) + 1) // 2} "
        f"numbers.",
    )
    def feature_correlation_prune(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        aggs = [F.count(F.lit(1)).alias("n")] + [
            F.sum(F.col(c).cast("decimal(27,6)"))
            .cast("double")
            .alias(s(i))
            for i, c in enumerate(CORR_FEATURES)
        ] + [
            F.sum(
                (F.col(CORR_FEATURES[i]) * F.col(CORR_FEATURES[j])).cast(
                    "decimal(38,6)"
                )
            )
            .cast("double")
            .alias(ss(i, j))
            for i in range(len(CORR_FEATURES))
            for j in range(i, len(CORR_FEATURES))
        ]
        sums = li.agg(*aggs)

        def corr(i, j):
            n = F.col("n")
            # greatest(, 0): a constant feature's variance radicand
            # can cancel epsilon-negative; DuckDB's sqrt would abort
            # the oracle run where Spark yields NaN — clamp on both
            # (the 0/0 then yields NULL/NaN consistently)
            return (
                F.col(ss(i, j)) - F.col(s(i)) * F.col(s(j)) / n
            ) / (
                F.sqrt(
                    F.greatest(
                        F.col(ss(i, i)) - F.col(s(i)) * F.col(s(i)) / n,
                        F.lit(0.0),
                    )
                )
                * F.sqrt(
                    F.greatest(
                        F.col(ss(j, j)) - F.col(s(j)) * F.col(s(j)) / n,
                        F.lit(0.0),
                    )
                )
            )

        # One scan: explode a 1-row array of per-pair structs instead
        # of a 6-way union (Catalyst would NOT common-subexpression
        # the shared aggregate across union branches — the union form
        # re-scans lineitem once per pair, verified in PLANS.md).
        pair_structs = F.array(
            *[
                F.struct(
                    F.lit(CORR_FEATURES[i]).alias("feature_a"),
                    F.lit(CORR_FEATURES[j]).alias("feature_b"),
                    corr(i, j).alias("r"),
                )
                for i, j in pairs
            ]
        )
        return (
            sums.select(F.explode(pair_structs).alias("p"))
            .select(
                F.col("p.feature_a").alias("feature_a"),
                F.col("p.feature_b").alias("feature_b"),
                stable_round(F.col("p.r"), 6).alias("pearson_r"),
                (F.abs(F.col("p.r")) > CORR_DROP_ABS).alias("drop_b"),
            )
        )

    # ------------------------------------------------------------------
    @register(
        "ipw_ate",
        oracle=f"""
WITH tagged AS (
    SELECT event_type AS stratum,
           CAST(user_id % 2 AS BIGINT) AS t,
           value AS y
    FROM events
), cells AS (
    SELECT stratum,
           CAST(count(*) AS BIGINT) AS n_s,
           CAST(SUM(t) AS BIGINT) AS n1,
           CAST(SUM(CAST(CASE WHEN t = 1 THEN y ELSE 0 END
                         AS DECIMAL(27,6))) AS DOUBLE) AS sy1,
           CAST(SUM(CAST(CASE WHEN t = 0 THEN y ELSE 0 END
                         AS DECIMAL(27,6))) AS DOUBLE) AS sy0
    FROM tagged GROUP BY stratum
), terms AS (
    SELECT n_s, n1,
           CAST(sy1 / (CAST(n1 AS DOUBLE) / n_s)
                AS DECIMAL(38,12)) AS ipw1,
           CAST(sy0 / (1.0 - CAST(n1 AS DOUBLE) / n_s)
                AS DECIMAL(38,12)) AS ipw0,
           CAST(n_s * (sy1 / n1 - sy0 / (n_s - n1))
                AS DECIMAL(38,12)) AS direct,
           CAST(sy1 AS DECIMAL(38,12)) AS t1,
           CAST(sy0 AS DECIMAL(38,12)) AS t0
    FROM cells
)
SELECT CAST(SUM(n_s) AS BIGINT) AS n_events,
       {stable_round_sql(
           'CAST(SUM(ipw1) - SUM(ipw0) AS DOUBLE) / SUM(n_s)', 6)}
           AS ate_ipw,
       {stable_round_sql(
           'CAST(SUM(direct) AS DOUBLE) / SUM(n_s)', 6)} AS ate_direct,
       {stable_round_sql(
           'CAST(SUM(t1) AS DOUBLE) / SUM(n1)'
           ' - CAST(SUM(t0) AS DOUBLE) / (SUM(n_s) - SUM(n1))', 6)}
           AS naive_diff
FROM terms
""",
        doc="Stratified inverse-propensity-weighted ATE of the "
        "user-parity treatment on event value, strata = event_type: "
        "propensity per stratum is its observed treated share, the "
        "IPW sums Sum(t*y)/e_s and Sum((1-t)*y)/(1-e_s) come from "
        "the same per-stratum decimal cells as the direct-"
        "adjustment estimate Sum(n_s * mean-difference) and the "
        "naive difference — three causal estimators, one aggregate. "
        "Per-stratum terms re-enter the final sum as DECIMAL(38,12) "
        "so the cross-strata addition is order-independent. "
        "Companion to did_value_estimate (time x arm) — this is the "
        "covariate-adjustment axis.",
    )
    def ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        tagged = ev.select(
            F.col("event_type").alias("stratum"),
            (F.col("user_id") % 2).alias("t"),
            F.col("value").alias("y"),
        )
        cells = tagged.groupBy("stratum").agg(
            F.count(F.lit(1)).alias("n_s"),
            F.sum("t").alias("n1"),
            F.sum(
                F.when(F.col("t") == 1, F.col("y"))
                .otherwise(0.0)
                .cast("decimal(27,6)")
            )
            .cast("double")
            .alias("sy1"),
            F.sum(
                F.when(F.col("t") == 0, F.col("y"))
                .otherwise(0.0)
                .cast("decimal(27,6)")
            )
            .cast("double")
            .alias("sy0"),
        )
        e_s = F.col("n1").cast("double") / F.col("n_s")
        terms = cells.select(
            "n_s",
            "n1",
            (F.col("sy1") / e_s).cast("decimal(38,12)").alias("ipw1"),
            (F.col("sy0") / (F.lit(1.0) - e_s))
            .cast("decimal(38,12)")
            .alias("ipw0"),
            (
                F.col("n_s")
                * (
                    F.col("sy1") / F.col("n1")
                    - F.col("sy0") / (F.col("n_s") - F.col("n1"))
                )
            )
            .cast("decimal(38,12)")
            .alias("direct"),
            F.col("sy1").cast("decimal(38,12)").alias("t1"),
            F.col("sy0").cast("decimal(38,12)").alias("t0"),
        )
        return terms.agg(
            F.sum("n_s").alias("n_events"),
            stable_round(
                (F.sum("ipw1") - F.sum("ipw0")).cast("double")
                / F.sum("n_s"),
                6,
            ).alias("ate_ipw"),
            stable_round(
                F.sum("direct").cast("double") / F.sum("n_s"), 6
            ).alias("ate_direct"),
            stable_round(
                F.sum("t1").cast("double") / F.sum("n1")
                - F.sum("t0").cast("double")
                / (F.sum("n_s") - F.sum("n1")),
                6,
            ).alias("naive_diff"),
        )

    # ------------------------------------------------------------------
    @register(
        "histogram2d_qty_price",
        oracle=f"""
WITH binned AS (
    SELECT least(CAST(floor(l_quantity / {H2_QTY_W}) AS BIGINT),
                 {H2_QTY_BINS - 1}) AS qty_bin,
           least(CAST(floor(l_extendedprice / {H2_PRICE_W}) AS BIGINT),
                 {H2_PRICE_BINS - 1}) AS price_bin
    FROM lineitem
), cells AS (
    SELECT qty_bin, price_bin, CAST(count(*) AS BIGINT) AS n
    FROM binned GROUP BY 1, 2
)
SELECT qty_bin, price_bin, n,
       {stable_round_sql(
           'CAST(n AS DOUBLE) / SUM(n) OVER ()', 6)} AS frac,
       {stable_round_sql(
           'CAST(n AS DOUBLE)'
           ' / SUM(n) OVER (PARTITION BY qty_bin)', 6)}
           AS frac_within_qty_row
FROM cells
""",
        doc=f"Equi-width 2-D histogram of (l_quantity / {H2_QTY_W}, "
        f"l_extendedprice / {H2_PRICE_W}) clamped to "
        f"{H2_QTY_BINS}x{H2_PRICE_BINS} bins: joint cell counts, "
        f"overall density, and the within-row conditional density "
        f"(price distribution given quantity band — the shape a "
        f"join-selectivity estimator or an outlier screen reads). "
        f"Bin ids are integer floor divisions, counts are exact; "
        f"the global/row share windows run over the <= "
        f"{H2_QTY_BINS * H2_PRICE_BINS}-row cell table, not data.",
    )
    def histogram2d_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import Window

        li = load_table(spark, sf_dir, "lineitem")
        binned = li.select(
            F.least(
                F.floor(F.col("l_quantity") / H2_QTY_W).cast("long"),
                F.lit(H2_QTY_BINS - 1),
            ).alias("qty_bin"),
            F.least(
                F.floor(F.col("l_extendedprice") / H2_PRICE_W).cast(
                    "long"
                ),
                F.lit(H2_PRICE_BINS - 1),
            ).alias("price_bin"),
        )
        cells = binned.groupBy("qty_bin", "price_bin").agg(
            F.count(F.lit(1)).alias("n")
        )
        return cells.select(
            "qty_bin",
            "price_bin",
            "n",
            stable_round(
                F.col("n").cast("double")
                / F.sum("n").over(Window.partitionBy()),
                6,
            ).alias("frac"),
            stable_round(
                F.col("n").cast("double")
                / F.sum("n").over(Window.partitionBy("qty_bin")),
                6,
            ).alias("frac_within_qty_row"),
        )


_register()
