"""Ordering analytics: rank-list comparison, ordinal dependence, and
position-weighted credit assignment.

Three operators built on exact integer ranks over set-oriented plans:

- ``rank_biased_overlap_halves``: RBO (Webber et al. TOIS'10) between
  the top-50 part-revenue rankings of the early and late order-date
  halves — the top-weighted list-similarity metric eval harnesses use
  to compare retrieval/recommendation runs; prefix intersections come
  from one max-rank distribution, never a per-depth rescan.
- ``kendall_tau_hourly``: exact Kendall tau-b for every unordered
  symbol pair over aligned hourly returns — concordant/discordant/tie
  counting on the calendar-bounded grid (the O(n^2) pair table is
  hours-squared regardless of tick volume), completing the dependence
  tier next to Spearman (rank-linear) and Pearson (linear).
- ``attribution_position_based``: U-shaped multi-touch attribution —
  each purchase splits credit 40/20/40 over its preceding-24h views
  (1.0 / 0.5-0.5 for 1- and 2-touch paths), credited to the view's
  hour-of-day bucket; the daypart-mix report single-touch last-click
  (attribution_forward_asof) cannot express.
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

#: RBO geometric persistence and evaluation depth.
RBO_P, RBO_DEPTH = 0.9, 50
#: order-date cut separating the "early" and "late" ranking halves.
RBO_DATE_CUT = "1998-01-01"
#: attribution lookback window (seconds).
ATTR_LOOKBACK_S = 86400


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "rank_biased_overlap_halves",
        oracle=f"""
WITH rev AS (
    SELECT CASE WHEN o.o_orderdate < TIMESTAMP '{RBO_DATE_CUT}'
                THEN 'early' ELSE 'late' END AS half,
           l.l_partkey,
           SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                    AS DECIMAL(27,6))) AS r
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
), ranked AS (
    SELECT half, l_partkey,
           row_number() OVER (PARTITION BY half
                              ORDER BY r DESC, l_partkey) AS rk
    FROM rev
), topa AS (
    SELECT l_partkey, rk FROM ranked
    WHERE half = 'early' AND rk <= {RBO_DEPTH}
), topb AS (
    SELECT l_partkey, rk FROM ranked
    WHERE half = 'late' AND rk <= {RBO_DEPTH}
), common AS (
    SELECT greatest(a.rk, b.rk) AS m
    FROM topa a JOIN topb b USING (l_partkey)
), depths AS (
    SELECT unnest(generate_series(1, {RBO_DEPTH})) AS d
), terms AS (
    SELECT d.d,
           CAST((1.0 - {RBO_P}) * pow({RBO_P}, d.d - 1)
                * (SELECT count(*) FROM common c WHERE c.m <= d.d) / d.d
                AS DECIMAL(38,18)) AS term
    FROM depths d
)
SELECT CAST((SELECT count(*) FROM common) AS BIGINT) AS overlap_at_depth,
       {stable_round_sql('CAST(sum(term) AS DOUBLE)', 6)} AS rbo_min
FROM terms
""",
        doc=f"Rank-biased overlap (p={RBO_P}, depth {RBO_DEPTH}) "
        f"between the top-part-revenue rankings of the pre/post-"
        f"{RBO_DATE_CUT} order halves: RBO = (1-p) * sum_d p^(d-1) * "
        f"|A_d intersect B_d| / d. The prefix-intersection counts "
        f"X_d come from ONE distribution — a common part enters "
        f"every prefix d >= max(rank_a, rank_b), so a single "
        f"greatest-rank table answers all {RBO_DEPTH} depths via a "
        f"bounded depth-table join (never {RBO_DEPTH} rescans of the "
        f"rankings). Rankings are decimal-exact revenue with partkey "
        f"tie-break; the {RBO_DEPTH}-term weighted sum accumulates "
        f"in decimal(38,18) so partition order cannot perturb it. "
        f"Top-{RBO_DEPTH} extraction is TakeOrderedAndProject-"
        f"shaped per half; everything downstream is O(depth).",
    )
    def rank_biased_overlap_halves(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.when(
                F.col("o_orderdate") < F.lit(RBO_DATE_CUT).cast("timestamp"),
                "early",
            )
            .otherwise("late")
            .alias("half"),
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_partkey",
            (
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("rev"),
        )
        rev = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("half", "l_partkey")
            .agg(F.sum(F.col("rev").cast(DECIMAL_T)).alias("r"))
        )
        ranked = rev.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("half").orderBy(
                    F.col("r").desc(), "l_partkey"
                )
            ),
        ).where(F.col("rk") <= RBO_DEPTH)
        a = ranked.where(F.col("half") == "early").select(
            "l_partkey", F.col("rk").alias("rka")
        )
        b = ranked.where(F.col("half") == "late").select(
            "l_partkey", F.col("rk").alias("rkb")
        )
        common = a.join(b, "l_partkey").select(
            F.greatest("rka", "rkb").alias("m")
        )
        depths = spark.range(1, RBO_DEPTH + 1).select(
            F.col("id").cast("int").alias("d")
        )
        xd = (
            depths.join(
                F.broadcast(common), F.col("m") <= F.col("d"), "left"
            )
            .groupBy("d")
            .agg(F.count(F.col("m")).alias("x"))
        )
        term = (
            (F.lit(1.0) - F.lit(RBO_P))
            * F.pow(F.lit(RBO_P), F.col("d") - 1)
            * F.col("x")
            / F.col("d")
        ).cast("decimal(38,18)")
        total = xd.agg(
            F.max(F.when(F.col("d") == RBO_DEPTH, F.col("x"))).alias(
                "overlap_at_depth"
            ),
            F.sum(term).cast("double").alias("rbo_raw"),
        )
        return total.select(
            F.col("overlap_at_depth").cast("long").alias("overlap_at_depth"),
            stable_round("rbo_raw", 6).alias("rbo_min"),
        )

    @register(
        "kendall_tau_hourly",
        oracle=f"""
WITH hourly AS (
    SELECT event_type AS symbol,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           arg_min(value, ts) AS first_px,
           arg_max(value, ts) AS last_px
    FROM events GROUP BY 1, 2
), rets AS (
    SELECT symbol, hour, (last_px - first_px) / first_px AS r
    FROM hourly WHERE first_px > 0
), aligned AS (
    SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.hour,
           a.r AS ra, b.r AS rb
    FROM rets a JOIN rets b USING (hour)
    WHERE a.symbol < b.symbol
), pairs AS (
    SELECT x.sym_a, x.sym_b,
           CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0 THEN 1 ELSE 0 END AS con,
           CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) < 0 THEN 1 ELSE 0 END AS dis,
           CASE WHEN x.ra = y.ra THEN 1 ELSE 0 END AS tie_a,
           CASE WHEN x.rb = y.rb THEN 1 ELSE 0 END AS tie_b
    FROM aligned x JOIN aligned y
      ON x.sym_a = y.sym_a AND x.sym_b = y.sym_b AND x.hour < y.hour
), sums AS (
    SELECT sym_a, sym_b,
           CAST(count(*) AS BIGINT) AS n0,
           CAST(sum(con) AS BIGINT) AS c,
           CAST(sum(dis) AS BIGINT) AS d,
           CAST(sum(tie_a) AS BIGINT) AS n1,
           CAST(sum(tie_b) AS BIGINT) AS n2
    FROM pairs GROUP BY 1, 2
)
SELECT sym_a, sym_b, n0 AS n_pairs, c AS concordant, d AS discordant,
       {stable_round_sql(
           'CAST(c - d AS DOUBLE)'
           ' / sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE))',
           6)} AS tau_b
FROM sums
""",
        doc="Exact Kendall tau-b per unordered symbol pair over the "
        "aligned hourly return grid: concordant/discordant/tied "
        "counting on the all-hour-pairs table, tau_b = (C - D) / "
        "sqrt((n0 - t_a)(n0 - t_b)) with tie corrections as pairwise "
        "tie counts (algebraically identical to the per-group "
        "t(t-1)/2 form). The quadratic pair table is CALENDAR-"
        "bounded — hours^2 x symbol-pairs rows no matter how many "
        "ticks exist, the same budget contract as the rest of the "
        "pairs tier (spearman_rank_matrix, ks_test_pairwise); all "
        "counts are exact integers, the statistic one fixed double "
        "expression. For calendar spans where hours^2 bites, the "
        "merge-sort inversion-count formulation drops it to "
        "O(n log n) per pair — documented swap, same counts.",
    )
    def kendall_tau_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        hourly = ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("hour", "ts").alias("hour"),
        ).agg(
            F.min_by("value", "ts").alias("first_px"),
            F.max_by("value", "ts").alias("last_px"),
        )
        rets = hourly.where(F.col("first_px") > 0).select(
            "symbol",
            "hour",
            ((F.col("last_px") - F.col("first_px")) / F.col("first_px"))
            .alias("r"),
        )
        a = rets.select(
            F.col("symbol").alias("sym_a"), "hour", F.col("r").alias("ra")
        )
        b = rets.select(
            F.col("symbol").alias("sym_b"), "hour", F.col("r").alias("rb")
        )
        aligned = a.join(b, "hour").where(F.col("sym_a") < F.col("sym_b"))
        x = aligned.select(
            "sym_a", "sym_b", F.col("hour").alias("hx"),
            F.col("ra").alias("rax"), F.col("rb").alias("rbx"),
        )
        y = aligned.select(
            "sym_a", "sym_b", F.col("hour").alias("hy"),
            F.col("ra").alias("ray"), F.col("rb").alias("rby"),
        )
        pairs = x.join(y, ["sym_a", "sym_b"]).where(
            F.col("hx") < F.col("hy")
        )
        prod = (F.col("rax") - F.col("ray")) * (
            F.col("rbx") - F.col("rby")
        )
        sums = pairs.groupBy("sym_a", "sym_b").agg(
            F.count(F.lit(1)).alias("n0"),
            F.sum(F.when(prod > 0, 1).otherwise(0)).alias("c"),
            F.sum(F.when(prod < 0, 1).otherwise(0)).alias("d"),
            F.sum(
                F.when(F.col("rax") == F.col("ray"), 1).otherwise(0)
            ).alias("n1"),
            F.sum(
                F.when(F.col("rbx") == F.col("rby"), 1).otherwise(0)
            ).alias("n2"),
        )
        return sums.select(
            "sym_a",
            "sym_b",
            F.col("n0").alias("n_pairs"),
            F.col("c").alias("concordant"),
            F.col("d").alias("discordant"),
            stable_round(
                (F.col("c") - F.col("d")).cast("double")
                / F.sqrt(
                    (F.col("n0") - F.col("n1")).cast("double")
                    * (F.col("n0") - F.col("n2")).cast("double")
                ),
                6,
            ).alias("tau_b"),
        )

    @register(
        "attribution_position_based",
        oracle=f"""
WITH pur AS (
    SELECT event_id AS pid, user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS pts, value AS pval
    FROM events WHERE event_type = 'purchase'
), vw AS (
    SELECT event_id AS vid, user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS vts
    FROM events WHERE event_type = 'view'
), touch AS (
    SELECT p.pid, p.pval, v.vid, v.vts,
           (v.vts // 3600) % 24 AS hod,
           row_number() OVER (PARTITION BY p.pid
                              ORDER BY v.vts, v.vid) AS pos,
           count(*) OVER (PARTITION BY p.pid) AS n
    FROM pur p JOIN vw v
      ON v.user_id = p.user_id
     AND v.vts <= p.pts AND v.vts > p.pts - {ATTR_LOOKBACK_S}
), credited AS (
    SELECT pid, pval, hod,
           CASE WHEN n = 1 THEN 1.0
                WHEN n = 2 THEN 0.5
                WHEN pos = 1 OR pos = n THEN 0.4
                ELSE 0.2 / (n - 2) END AS credit
    FROM touch
)
SELECT CAST(hod // 6 AS BIGINT) AS daypart,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(CAST(credit AS DECIMAL(27,6))) AS DOUBLE)
           AS credited_conversions,
       CAST(sum(CAST(credit * pval AS DECIMAL(27,6))) AS DOUBLE)
           AS credited_value
FROM credited GROUP BY 1
""",
        doc="U-shaped (position-based) multi-touch attribution: every "
        "purchase distributes credit over its same-user views in the "
        "preceding 24h — 40% first touch, 40% last, 20% split across "
        "the middle (degenerating to 1.0 / 0.5+0.5 for 1- and "
        "2-touch paths, so credit per converting purchase sums to "
        "EXACTLY 1, law-tested) — rolled up by the view's 6-hour "
        "daypart. Path position comes from one window over the "
        "purchase-keyed touch table; the range join is user-keyed "
        "and time-bounded (the streaming twin would be a watermarked "
        "interval join). Credits are dyadic or 0.2/(n-2) doubles — "
        "identical cross-engine — and the rollup sums are decimal. "
        "The multi-touch generalization of attribution_forward_asof "
        "(which is exactly the last-touch special case).",
    )
    def attribution_position_based(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.unix_timestamp("ts").cast("long").alias("es"),
        )
        pur = ev.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("pid"),
            F.col("user_id").alias("pu"),
            F.col("es").alias("pts"),
            F.col("value").alias("pval"),
        )
        vw = ev.where(F.col("event_type") == "view").select(
            F.col("event_id").alias("vid"),
            F.col("user_id").alias("vu"),
            F.col("es").alias("vts"),
        )
        touch = pur.join(
            vw,
            (F.col("vu") == F.col("pu"))
            & (F.col("vts") <= F.col("pts"))
            & (F.col("vts") > F.col("pts") - ATTR_LOOKBACK_S),
        ).select(
            "pid",
            "pval",
            "vid",
            "vts",
            (F.floor(F.col("vts") / 3600) % 24).alias("hod"),
        )
        wp = Window.partitionBy("pid")
        pos = touch.withColumns(
            {
                "pos": F.row_number().over(wp.orderBy("vts", "vid")),
                "n": F.count(F.lit(1)).over(wp),
            }
        )
        credit = (
            F.when(F.col("n") == 1, F.lit(1.0))
            .when(F.col("n") == 2, F.lit(0.5))
            .when(
                (F.col("pos") == 1) | (F.col("pos") == F.col("n")),
                F.lit(0.4),
            )
            .otherwise(F.lit(0.2) / (F.col("n") - 2))
        )
        return (
            pos.withColumn("credit", credit)
            .groupBy(F.expr("hod div 6").cast("long").alias("daypart"))
            .agg(
                F.count(F.lit(1)).alias("n_touches"),
                F.sum(F.col("credit").cast(DECIMAL_T))
                .cast("double")
                .alias("credited_conversions"),
                F.sum((F.col("credit") * F.col("pval")).cast(DECIMAL_T))
                .cast("double")
                .alias("credited_value"),
            )
        )


_register()
