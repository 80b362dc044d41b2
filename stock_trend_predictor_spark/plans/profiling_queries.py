"""Data-profiling / quality / audit tier: the ANALYZE-style column
profile, declarative data-quality rules, snapshot diffing, and the
scalable cumulative-distinct curve.

A 100 TB ingestion pipeline runs these continuously — profile drift
and rule violations are how corpus regressions get caught before they
reach training. Everything here is one-pass where possible and
pre-aggregated before any join/window, so no shape degrades with table
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.functions.text import hash60, hash60_sql
from stock_trend_predictor_spark.sources.tables import load_table

PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    profile_oracle_parts = [
        f"""
SELECT '{c}' AS column_name,
       {stable_round_sql(f'min({c})', 6)} AS min_value,
       {stable_round_sql(f'max({c})', 6)} AS max_value,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM lineitem"""
        for c in PROFILE_COLS
    ]

    @register(
        "table_profile_numeric",
        oracle="\nUNION ALL\n".join(profile_oracle_parts),
        doc="ANALYZE-style numeric column profile (min/max/nulls/exact "
        "NDV) for every measure column of lineitem — in ONE scan: all "
        "per-column aggregates computed in a single agg node, then "
        "stacked to long format driver-free. The oracle's UNION-ALL-of-"
        "scans form is the naive shape this query deliberately avoids; "
        "at 100 TB swap count_distinct for approx_count_distinct "
        "(sketch_cardinality is that path) without changing shape.",
    )
    def table_profile_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        aggs = []
        for c in PROFILE_COLS:
            aggs += [
                stable_round(F.min(c), 6).alias(f"{c}__min"),
                stable_round(F.max(c), 6).alias(f"{c}__max"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias(f"{c}__null"),
                F.count_distinct(F.col(c)).alias(f"{c}__ndv"),
            ]
        wide = li.agg(*aggs)
        stack_args = ", ".join(
            f"'{c}', {c}__min, {c}__max, {c}__null, {c}__ndv"
            for c in PROFILE_COLS
        )
        return wide.select(
            F.expr(
                f"stack({len(PROFILE_COLS)}, {stack_args}) AS "
                "(column_name, min_value, max_value, n_null, n_distinct)"
            )
        )

    @register(
        "dq_checks",
        oracle="""
SELECT 'lineitem_null_quantity' AS rule, count(*) FILTER (
    WHERE l_quantity IS NULL) AS n_violations FROM lineitem
UNION ALL
SELECT 'lineitem_discount_range' AS rule, count(*) FILTER (
    WHERE l_discount < 0 OR l_discount > 1) AS n_violations FROM lineitem
UNION ALL
SELECT 'lineitem_orphan_orderkey' AS rule, count(*) AS n_violations
FROM lineitem l WHERE NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders_orphan_custkey' AS rule, count(*) AS n_violations
FROM orders o WHERE NOT EXISTS (
    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'orders_duplicate_orderkey' AS rule,
       count(*) - count(DISTINCT o_orderkey) AS n_violations FROM orders
""",
        doc="Declarative data-quality rule battery (Deequ-style): "
        "null-rate and range rules fold into ONE conditional-count "
        "scan per table; referential-integrity rules are LEFT ANTI "
        "joins (orders' key side broadcast when it fits, AQE "
        "otherwise); uniqueness is count vs distinct-count. Output is "
        "a (rule, n_violations) frame a pipeline gates on — all rules "
        "must read 0 on the clean test data.",
    )
    def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer")

        def rule(name: str, df: DataFrame, cnt) -> DataFrame:
            return df.agg(cnt.alias("n_violations")).select(
                F.lit(name).alias("rule"), "n_violations"
            )

        scans = rule(
            "lineitem_null_quantity",
            li,
            F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).cast(
                "bigint"
            ),
        ).unionByName(
            rule(
                "lineitem_discount_range",
                li,
                F.sum(
                    F.when(
                        (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
                        1,
                    ).otherwise(0)
                ).cast("bigint"),
            )
        )
        orphan_li = rule(
            "lineitem_orphan_orderkey",
            li.join(
                orders.select("o_orderkey"),
                li.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            ),
            F.count(F.lit(1)),
        )
        orphan_orders = rule(
            "orders_orphan_custkey",
            orders.join(
                F.broadcast(cust.select("c_custkey")),
                orders.o_custkey == F.col("c_custkey"),
                "left_anti",
            ),
            F.count(F.lit(1)),
        )
        dup_orders = rule(
            "orders_duplicate_orderkey",
            orders,
            (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))),
        )
        return (
            scans.unionByName(orphan_li)
            .unionByName(orphan_orders)
            .unionByName(dup_orders)
        )

    @register(
        "cumulative_unique_users",
        oracle="""
WITH first_seen AS (
    SELECT user_id,
           CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS first_day
    FROM events GROUP BY 1
), days AS (
    SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
    FROM events
), new_per_day AS (
    SELECT first_day AS day, count(*) AS n_new FROM first_seen GROUP BY 1
)
SELECT d.day,
       coalesce(n.n_new, 0) AS n_new,
       CAST(sum(coalesce(n.n_new, 0)) OVER (
           ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM days d LEFT JOIN new_per_day n ON d.day = n.day
""",
        doc="Cumulative distinct users per day — the scalable form of "
        "COUNT(DISTINCT) OVER, which Spark (rightly) refuses to "
        "evaluate directly: a user contributes on exactly their "
        "first-seen day, so cumulative-distinct = running sum of "
        "first-seen counts. The only single-partition window runs over "
        "the #days frame (tiny by construction), never the event log.",
    )
    def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
        first_seen = ev.groupBy("user_id").agg(
            F.date_trunc("day", F.min("ts")).alias("first_day")
        )
        days = ev.select(
            F.date_trunc("day", "ts").alias("day")
        ).distinct()
        new_per_day = first_seen.groupBy(
            F.col("first_day").alias("day")
        ).agg(F.count(F.lit(1)).alias("n_new"))
        w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        return (
            days.join(new_per_day, "day", "left")
            .select("day", F.coalesce("n_new", F.lit(0)).alias("n_new"))
            .select(
                "day",
                "n_new",
                F.sum("n_new").over(w).cast("bigint").alias("cum_users"),
            )
        )

    @register(
        "snapshot_diff",
        oracle="""
WITH a AS (
    SELECT user_id, max_by(value, ts) AS v FROM events
    WHERE ts < TIMESTAMP '2024-01-02 00:00:00' GROUP BY 1
), b AS (
    SELECT user_id, max_by(value, ts) AS v FROM events
    WHERE ts < TIMESTAMP '2024-01-03 00:00:00' GROUP BY 1
)
SELECT CASE WHEN a.user_id IS NULL THEN 'added'
            WHEN b.user_id IS NULL THEN 'removed'
            WHEN a.v <> b.v THEN 'changed'
            ELSE 'unchanged' END AS change_type,
       count(*) AS n_keys
FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
GROUP BY 1
""",
        doc="Snapshot diff (the batch form of a change data feed): "
        "per-key last-value state at two points in time, full-outer "
        "joined and classified added/removed/changed/unchanged. Both "
        "inputs are pre-aggregated to one row per key BEFORE the "
        "always-shuffle full outer join — the join moves state-sized "
        "frames, not the event log; max_by keeps snapshot construction "
        "one combinable pass.",
    )
    def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "value"
        )

        def snap(cutoff: str) -> DataFrame:
            return (
                ev.where(F.col("ts") < F.lit(cutoff).cast("timestamp"))
                .groupBy("user_id")
                .agg(F.max_by("value", "ts").alias("v"))
            )

        a = snap("2024-01-02 00:00:00")
        b = snap("2024-01-03 00:00:00")
        joined = a.alias("a").join(
            b.alias("b"), F.col("a.user_id") == F.col("b.user_id"), "full"
        )
        change = (
            F.when(F.col("a.user_id").isNull(), "added")
            .when(F.col("b.user_id").isNull(), "removed")
            .when(F.col("a.v") != F.col("b.v"), "changed")
            .otherwise("unchanged")
        )
        return joined.groupBy(change.alias("change_type")).agg(
            F.count(F.lit(1)).alias("n_keys")
        )

    @register(
        "reconcile_snapshot_buckets",
        oracle=f"""
WITH snap_a AS (
    SELECT o_orderkey, o_orderstatus,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders WHERE o_orderdate < TIMESTAMP '1999-07-01'
), snap_b AS (
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 97 = 0
                THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 1
                ELSE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END
               AS cents
    FROM orders WHERE o_orderdate < TIMESTAMP '1999-07-01'
), dig_a AS (
    SELECT o_orderkey % 256 AS bucket,
           CAST(count(*) AS BIGINT) AS rows_a,
           bit_xor({hash60_sql(
               "CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus"
               " || '|' || CAST(cents AS VARCHAR)")}) AS digest_a
    FROM snap_a GROUP BY 1
), dig_b AS (
    SELECT o_orderkey % 256 AS bucket,
           CAST(count(*) AS BIGINT) AS rows_b,
           bit_xor({hash60_sql(
               "CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus"
               " || '|' || CAST(cents AS VARCHAR)")}) AS digest_b
    FROM snap_b GROUP BY 1
)
SELECT coalesce(a.bucket, b.bucket) AS bucket, a.rows_a, b.rows_b
FROM dig_a a FULL OUTER JOIN dig_b b ON a.bucket = b.bucket
WHERE a.digest_a IS DISTINCT FROM b.digest_b
   OR a.rows_a IS DISTINCT FROM b.rows_b
""",
        doc="Merkle-style table reconciliation: compare two snapshots "
        "of a 100 TB table WITHOUT shuffling rows — each side reduces "
        "to 256 (bucket, count, xor-of-row-hashes) digests computed "
        "map-side-combinably in place, and only the digest tables "
        "(KB-sized) move and full-outer join; output is exactly the "
        "buckets needing row-level repair. XOR is the right digest "
        "combiner: order-independent, overflow-free, and any single "
        "row change flips it. Doubles are digested as exact cents "
        "(floor(x*100+0.5)) so the row hash is engine-portable. The "
        "second snapshot here simulates corrections on keys "
        "divisible by 97 — the detector finds precisely those "
        "buckets.",
    )
    def reconcile_snapshot_buckets(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        base = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderdate")
            < F.lit("1999-07-01 00:00:00").cast("timestamp_ntz")
        )
        cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
            "bigint"
        )

        def digest(df, rows_alias, digest_alias):
            row_str = F.concat_ws(
                "|",
                F.col("o_orderkey").cast("string"),
                F.col("o_orderstatus"),
                F.col("cents").cast("string"),
            )
            return (
                df.withColumn("h", hash60(row_str))
                .groupBy((F.col("o_orderkey") % 256).alias("bucket"))
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias(rows_alias),
                    F.expr("bit_xor(h)").alias(digest_alias),
                )
            )

        snap_a = base.withColumn("cents", cents)
        snap_b = base.withColumn(
            "cents",
            F.when(F.col("o_orderkey") % 97 == 0, cents + 1).otherwise(cents),
        )
        dig_a = digest(snap_a, "rows_a", "digest_a")
        dig_b = digest(snap_b, "rows_b", "digest_b")
        joined = dig_a.alias("a").join(
            dig_b.alias("b"), F.col("a.bucket") == F.col("b.bucket"), "full"
        )
        return joined.where(
            ~F.col("digest_a").eqNullSafe(F.col("digest_b"))
            | ~F.col("rows_a").eqNullSafe(F.col("rows_b"))
        ).select(
            F.coalesce(F.col("a.bucket"), F.col("b.bucket")).alias("bucket"),
            "rows_a",
            "rows_b",
        )

    # ------------------------------------------------------------------
    # Poisson(1) CDF steps for the deterministic Poisson bootstrap.
    _POIS = (
        "0.36787944117144233",
        "0.7357588823428847",
        "0.9196986029286058",
        "0.9810118431238462",
        "0.9963401531726563",
    )
    _B = 100

    from stock_trend_predictor_spark.functions.text import hash28, hash28_sql

    _u_sql = (
        hash28_sql(
            "CAST(e.event_id AS VARCHAR) || ':' || CAST(r.b AS VARCHAR)"
        )
        + " / 268435456.0"
    )
    _w_sql = (
        f"CASE WHEN u < {_POIS[0]} THEN 0 WHEN u < {_POIS[1]} THEN 1"
        f" WHEN u < {_POIS[2]} THEN 2 WHEN u < {_POIS[3]} THEN 3"
        f" WHEN u < {_POIS[4]} THEN 4 ELSE 5 END"
    )

    @register(
        "bootstrap_ci_value_mean",
        oracle=f"""
WITH reps AS (
    SELECT e.event_type, e.value, r.b,
           {_u_sql} AS u
    FROM events e, range({_B}) r(b)
), weighted AS (
    SELECT event_type, b,
           CAST(SUM({_w_sql}) AS BIGINT) AS sw,
           CAST(SUM(CAST(({_w_sql}) * value AS DECIMAL(27,6))) AS DOUBLE)
               AS sxw
    FROM reps GROUP BY 1, 2
), means AS (
    SELECT event_type, b, sxw / sw AS mean_b
    FROM weighted WHERE sw > 0
), point AS (
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / count(*)
               AS point_mean
    FROM events GROUP BY 1
)
SELECT m.event_type,
       CAST(count(*) AS BIGINT) AS n_reps,
       {stable_round_sql('any_value(p.point_mean)', 6)} AS point_mean,
       {stable_round_sql('quantile_cont(m.mean_b, 0.025)', 6)} AS ci_lo,
       {stable_round_sql('quantile_cont(m.mean_b, 0.975)', 6)} AS ci_hi
FROM means m JOIN point p USING (event_type)
GROUP BY 1
""",
        doc=f"Deterministic Poisson bootstrap: a 95% CI for the mean "
        f"value per event_type from {_B} replicates, each row's "
        "replicate weight drawn Poisson(1) via the md5-hash uniform "
        "of (event_id, replicate) pushed through the exact CDF steps "
        "— the DISTRIBUTED bootstrap (Kleiner et al.'s observation: "
        "multinomial resampling needs global coordination, "
        "per-row Poisson weights need none and are exchangeable). "
        "Hash-seeded, so both engines draw the identical weights and "
        "the CI is bit-reproducible — rerunnable on any cluster "
        "layout. Shuffle cost: the replicate explode map-side "
        "combines to #types x B weighted-sum rows; percentiles run "
        "over B-row groups. The same shape bootstraps ANY "
        "decimal-summable statistic at 100 TB.",
    )
    def bootstrap_ci_value_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        reps = ev.select(
            "event_type",
            "value",
            "event_id",
            F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
        )
        u = hash28(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            )
        ) / F.lit(268435456.0)
        reps = reps.withColumn("u", u)
        w = (
            F.when(F.col("u") < float(_POIS[0]), 0)
            .when(F.col("u") < float(_POIS[1]), 1)
            .when(F.col("u") < float(_POIS[2]), 2)
            .when(F.col("u") < float(_POIS[3]), 3)
            .when(F.col("u") < float(_POIS[4]), 4)
            .otherwise(5)
        )
        weighted = reps.groupBy("event_type", "b").agg(
            F.sum(w).cast("bigint").alias("sw"),
            F.sum((w * F.col("value")).cast("decimal(27,6)"))
            .cast("double")
            .alias("sxw"),
        )
        means = weighted.where(F.col("sw") > 0).select(
            "event_type", (F.col("sxw") / F.col("sw")).alias("mean_b")
        )
        point = ev.groupBy("event_type").agg(
            (
                F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("point_mean")
        )
        return (
            means.join(point, "event_type")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_reps"),
                stable_round(F.any_value("point_mean"), 6).alias("point_mean"),
                stable_round(
                    F.percentile("mean_b", F.lit(0.025)), 6
                ).alias("ci_lo"),
                stable_round(
                    F.percentile("mean_b", F.lit(0.975)), 6
                ).alias("ci_hi"),
            )
        )


_register()
