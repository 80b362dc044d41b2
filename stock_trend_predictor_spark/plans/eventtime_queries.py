"""Event-time analytics & forecasting: Holt trend forecast, sliding
distinct counts, interval-union coverage, survival curve, seat
allocation.

The reference's only event-time handling is a row-at-a-time loop over a
polled tick stream (data_collection/fetch_stock.py:54-58); this module
supplies the set-oriented event-time toolkit a 100 TB log pipeline
needs:

- ``holt_linear_forecast_daily``: double-exponential (Holt) smoothing
  per symbol over daily bars — a genuinely sequential recurrence, run
  as one Arrow batch per symbol via applyInPandas and oracle-proven
  against a DuckDB RECURSIVE CTE stepping the identical IEEE ops.
- ``sliding_distinct_users``: exact distinct users per 6h window
  sliding hourly — each event fans out to the 6 windows that contain
  it (bounded 6x explode, no self-join), then one hash aggregate.
- ``interval_union_coverage``: per-user union-of-intervals length via
  the gap-and-island sweep (running-max window), all integer-exact.
- ``kaplan_meier_conversion``: Kaplan-Meier survival curve for
  view->purchase conversion with right-censoring at 72h — life table
  by discrete hour, at-risk via prefix sums, survival via
  exp(cumulative decimal-cast log) so the running product is
  partition-order independent.
- ``largest_remainder_allocation``: Hamilton/largest-remainder
  apportionment of 100 points across nations by revenue — floor the
  ideal shares, hand the deficit to the largest remainders; the
  integer total is exactly 100 by construction.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stock_trend_predictor_spark.functions.exact import (
    DECIMAL_T,
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table

#: Holt smoothing constants — exact binary fractions so the recurrence
#: is bit-identical between Python floats and DuckDB doubles.
HOLT_ALPHA, HOLT_BETA = 0.5, 0.25

#: Kaplan-Meier right-censoring horizon (hours).
KM_HORIZON_H = 72


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    _HOLT_SCHEMA = T.StructType(
        [
            T.StructField("symbol", T.StringType()),
            T.StructField("n_days", T.LongType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
        ]
    )

    @register(
        "holt_linear_forecast_daily",
        oracle=f"""
WITH RECURSIVE bars AS (
    SELECT symbol, day, close FROM (
        SELECT event_type AS symbol,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               value AS close,
               row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
), idx AS (
    SELECT symbol, close,
           row_number() OVER (PARTITION BY symbol ORDER BY day) AS i
    FROM bars
), rec AS (
    SELECT symbol, i, close AS l, CAST(0.0 AS DOUBLE) AS b
    FROM idx WHERE i = 1
    UNION ALL
    SELECT idx.symbol, idx.i,
           {HOLT_ALPHA} * idx.close + {1 - HOLT_ALPHA} * (rec.l + rec.b),
           {HOLT_BETA} * (({HOLT_ALPHA} * idx.close
                           + {1 - HOLT_ALPHA} * (rec.l + rec.b)) - rec.l)
             + {1 - HOLT_BETA} * rec.b
    FROM rec JOIN idx ON idx.symbol = rec.symbol AND idx.i = rec.i + 1
), last AS (
    SELECT symbol, max(i) AS n FROM idx GROUP BY 1
)
SELECT r.symbol,
       CAST(l2.n AS BIGINT) AS n_days,
       {stable_round_sql('r.l', 6)} AS level,
       {stable_round_sql('r.b', 6)} AS trend,
       {stable_round_sql('r.l + 1 * r.b', 6)} AS fc_1,
       {stable_round_sql('r.l + 2 * r.b', 6)} AS fc_2,
       {stable_round_sql('r.l + 3 * r.b', 6)} AS fc_3
FROM rec r JOIN last l2 ON r.symbol = l2.symbol AND r.i = l2.n
""",
        doc="Holt double-exponential smoothing (alpha=.5, beta=.25, "
        "init l1=y1 b1=0) over each symbol's daily closing series, "
        "plus 1/2/3-step linear forecasts l + h*b. The recurrence is "
        "inherently sequential, so the scale shape is one Arrow batch "
        "per symbol (applyInPandas — state is 2 floats, group size is "
        "#days, never the tick count: the daily last-bar aggregation "
        "happens set-side first). The oracle steps the IDENTICAL "
        "IEEE double ops through a DuckDB recursive CTE, so hash "
        "equality proves the Python loop and the SQL recursion "
        "compute the same trajectory — the driver-checkable shape "
        "for per-key iterative fitting (same contract as "
        "ml/pergroup.py per-key models).",
    )
    def holt_linear_forecast_daily(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        rn = F.row_number().over(
            Window.partitionBy(
                "event_type", F.date_trunc("day", "ts")
            ).orderBy(F.col("ts").desc(), F.col("event_id").desc())
        )
        bars = (
            ev.select(
                F.col("event_type").alias("symbol"),
                F.date_trunc("day", "ts").alias("day"),
                F.col("value").alias("close"),
                rn.alias("rn"),
            )
            .where(F.col("rn") == 1)
            .select("symbol", "day", "close")
        )

        def fit(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("day")
            ys = pdf["close"].tolist()
            lev, tr = ys[0], 0.0
            for y in ys[1:]:
                new_lev = HOLT_ALPHA * y + (1 - HOLT_ALPHA) * (lev + tr)
                tr = HOLT_BETA * (new_lev - lev) + (1 - HOLT_BETA) * tr
                lev = new_lev
            return pd.DataFrame(
                {
                    "symbol": [pdf["symbol"].iloc[0]],
                    "n_days": [len(ys)],
                    "level": [lev],
                    "trend": [tr],
                }
            )

        fitted = bars.groupBy("symbol").applyInPandas(fit, _HOLT_SCHEMA)
        return fitted.select(
            "symbol",
            "n_days",
            stable_round("level", 6).alias("level"),
            stable_round("trend", 6).alias("trend"),
            *[
                stable_round(
                    F.col("level") + h * F.col("trend"), 6
                ).alias(f"fc_{h}")
                for h in (1, 2, 3)
            ],
        )

    @register(
        "sliding_distinct_users",
        oracle="""
WITH ev AS (
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, user_id
    FROM events
), fan AS (
    SELECT (h - k) AS w, user_id
    FROM ev, LATERAL (SELECT unnest(generate_series(0, 5)) AS k)
)
SELECT w * 3600 AS window_start_epoch,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM fan GROUP BY 1
""",
        doc="Exact distinct users per 6-hour window sliding hourly: "
        "every event belongs to exactly 6 hourly-aligned windows, so "
        "a bounded 6x explode + one hash aggregate replaces any "
        "range self-join — shuffle volume is 6x the event count of "
        "(window, user) pairs, partitioned by window start, with no "
        "skew beyond real traffic skew. Timestamps reduce to integer "
        "hour indexes (floor of epoch seconds) so the window "
        "arithmetic is integer-exact cross-engine. At 100 TB the "
        "exact COUNT(DISTINCT) swaps for the HLL sketch "
        "(sketch_cardinality) with no fan-out change.",
    )
    def sliding_distinct_users(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select(
            F.floor(F.unix_timestamp("ts") / F.lit(3600))
            .cast("long")
            .alias("h"),
            "user_id",
        )
        fan = ev.select(
            "h", "user_id", F.explode(F.sequence(F.lit(0), F.lit(5))).alias("k")
        ).select((F.col("h") - F.col("k")).alias("w"), "user_id")
        return fan.groupBy(
            (F.col("w") * 3600).alias("window_start_epoch")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )

    @register(
        "interval_union_coverage",
        oracle="""
WITH iv AS (
    SELECT user_id, event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS s,
           CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS e
    FROM events
), mrk AS (
    SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS pmax
    FROM iv
), isl AS (
    SELECT *, sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY s, event_id
                      ROWS UNBOUNDED PRECEDING) AS isl_id
    FROM mrk
), per AS (
    SELECT user_id, isl_id,
           max(e) - min(s) AS len, count(*) AS n
    FROM isl GROUP BY 1, 2
)
SELECT user_id,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(len) AS BIGINT) AS covered_seconds
FROM per GROUP BY 1
""",
        doc="Union-of-intervals length per user (each event opens a "
        "30-minute activity interval; overlaps must not double-"
        "count): the gap-and-island sweep — running max of interval "
        "ends marks island starts, a prefix sum numbers islands, and "
        "each island's coverage is max(end) - min(start) (within an "
        "island every interval starts before the running max, so "
        "islands have no internal gaps). One shuffle on user_id that "
        "every per-user window shares; all epoch-second integer "
        "arithmetic, so cross-engine exact. The measure behind "
        "'billable active time' dashboards that sessionize_events' "
        "gap-based sessions can't express (sessions dedupe by gap, "
        "not by overlap length).",
    )
    def interval_union_coverage(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select(
            "user_id",
            "event_id",
            F.unix_timestamp("ts").cast("long").alias("s"),
        )
        iv = ev.withColumn("e", F.col("s") + 1800)
        order = Window.partitionBy("user_id").orderBy("s", "event_id")
        pmax = (
            F.max("e")
            .over(order.rowsBetween(Window.unboundedPreceding, -1))
        )
        isl = iv.withColumn(
            "isl_id",
            F.sum(
                F.when(
                    pmax.isNull() | (F.col("s") > pmax), 1
                ).otherwise(0)
            ).over(order.rowsBetween(Window.unboundedPreceding, 0)),
        )
        per = isl.groupBy("user_id", "isl_id").agg(
            (F.max("e") - F.min("s")).alias("len"),
            F.count(F.lit(1)).alias("n"),
        )
        return per.groupBy("user_id").agg(
            F.sum("n").alias("n_events"),
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("len").alias("covered_seconds"),
        )

    @register(
        "kaplan_meier_conversion",
        oracle=f"""
WITH fv AS (
    SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS vts
    FROM events WHERE event_type = 'view' GROUP BY 1
), fp AS (
    SELECT f.user_id, f.vts,
           min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS pts
    FROM fv f LEFT JOIN events e
      ON e.user_id = f.user_id AND e.event_type = 'purchase'
     AND CAST(floor(epoch(e.ts)) AS BIGINT) >= f.vts
    GROUP BY 1, 2
), subj AS (
    SELECT user_id,
           CASE WHEN pts IS NOT NULL
                 AND (pts - vts) // 3600 < {KM_HORIZON_H}
                THEN (pts - vts) // 3600 ELSE {KM_HORIZON_H} END AS dur_h,
           CASE WHEN pts IS NOT NULL
                 AND (pts - vts) // 3600 < {KM_HORIZON_H}
                THEN 1 ELSE 0 END AS ev
    FROM fp
), lt AS (
    SELECT dur_h, CAST(sum(ev) AS BIGINT) AS d,
           CAST(sum(1 - ev) AS BIGINT) AS c
    FROM subj GROUP BY 1
), ar AS (
    SELECT dur_h, d, c,
           sum(d + c) OVER () - coalesce(
               sum(d + c) OVER (ORDER BY dur_h
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS n_risk
    FROM lt
), km AS (
    SELECT dur_h, d, c, n_risk,
           CASE WHEN min(1.0 - CAST(d AS DOUBLE) / n_risk)
                     OVER (ORDER BY dur_h ROWS UNBOUNDED PRECEDING) <= 0
                THEN 0.0
                ELSE exp(CAST(sum(CAST(
                    ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                    AS DECIMAL(27,6))) OVER (ORDER BY dur_h
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE))
           END AS surv
    FROM ar
)
SELECT CAST(dur_h AS BIGINT) AS dur_h,
       CAST(n_risk AS BIGINT) AS n_risk,
       d AS d_events, c AS c_censored,
       {stable_round_sql('surv', 6)} AS survival
FROM km
""",
        doc=f"Kaplan-Meier survival curve for first-view -> first-"
        f"purchase conversion, right-censored at {KM_HORIZON_H}h: one "
        f"subject per viewing user, discrete-hour life table, at-risk "
        f"counts from integer prefix sums, and S(t) as the running "
        f"product of (1 - d/n) factors computed as exp of a "
        f"CUMULATIVE DECIMAL-CAST log sum — the same order-"
        f"independence trick functions/exact.py uses for sums, "
        f"applied to a product, so the curve is reproducible under "
        f"any partitioning. The life table is {KM_HORIZON_H + 1} rows "
        f"max, so the final windows are trivially small; the heavy "
        f"lifting (per-user firsts) is two hash aggregates and one "
        f"range-constrained join on user_id.",
    )
    def kaplan_meier_conversion(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select(
            "user_id",
            "event_type",
            F.unix_timestamp("ts").cast("long").alias("es"),
        )
        fv = (
            ev.where(F.col("event_type") == "view")
            .groupBy("user_id")
            .agg(F.min("es").alias("vts"))
        )
        pur = ev.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("pu"), F.col("es").alias("pes")
        )
        fp = (
            fv.join(
                pur,
                (F.col("user_id") == F.col("pu"))
                & (F.col("pes") >= F.col("vts")),
                "left",
            )
            .groupBy("user_id", "vts")
            .agg(F.min("pes").alias("pts"))
        )
        raw_dur = F.floor((F.col("pts") - F.col("vts")) / 3600)
        converted = F.col("pts").isNotNull() & (raw_dur < KM_HORIZON_H)
        subj = fp.select(
            F.when(converted, raw_dur)
            .otherwise(F.lit(KM_HORIZON_H))
            .alias("dur_h"),
            F.when(converted, 1).otherwise(0).alias("ev"),
        )
        lt = subj.groupBy("dur_h").agg(
            F.sum("ev").alias("d"),
            F.sum(F.lit(1) - F.col("ev")).alias("c"),
        )
        whole = Window.orderBy("dur_h").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        before = Window.orderBy("dur_h").rowsBetween(
            Window.unboundedPreceding, -1
        )
        cum = Window.orderBy("dur_h").rowsBetween(
            Window.unboundedPreceding, 0
        )
        ar = lt.withColumn(
            "n_risk",
            F.sum(F.col("d") + F.col("c")).over(whole)
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(before), F.lit(0)
            ),
        )
        factor = F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")
        km = ar.withColumn(
            "surv",
            F.when(F.min(factor).over(cum) <= 0, F.lit(0.0)).otherwise(
                F.exp(
                    F.sum(F.log(factor).cast(DECIMAL_T))
                    .over(cum)
                    .cast("double")
                )
            ),
        )
        return km.select(
            F.col("dur_h").cast("long").alias("dur_h"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").alias("d_events"),
            F.col("c").alias("c_censored"),
            stable_round("surv", 6).alias("survival"),
        )

    @register(
        "largest_remainder_allocation",
        oracle=f"""
WITH rev AS (
    SELECT n.n_nationkey, n.n_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS r
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
), sh AS (
    SELECT n_nationkey, n_name, r,
           100.0 * r / CAST(sum(CAST(r AS DECIMAL(27,6))) OVER ()
                            AS DOUBLE) AS ideal
    FROM rev
), fl AS (
    SELECT *, CAST(floor(ideal) AS BIGINT) AS base,
           ideal - floor(ideal) AS rem
    FROM sh
), rk AS (
    SELECT *, row_number() OVER (ORDER BY rem DESC, n_nationkey) AS rk,
           100 - sum(base) OVER () AS deficit
    FROM fl
)
SELECT n_name,
       {stable_round_sql('ideal', 6)} AS ideal_share,
       CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END
            AS BIGINT) AS points
FROM rk
""",
        doc="Hamilton largest-remainder apportionment: allocate "
        "exactly 100 integer points across nations proportional to "
        "revenue — floor every ideal share, then hand the remaining "
        "deficit to the largest fractional remainders (nationkey "
        "tie-break). Revenue totals are decimal-exact (including the "
        "windowed grand total, decimal-cast so partition order can't "
        "perturb it); the nation-level windows run on ~25 rows after "
        "full map-side aggregation, so the single-partition window "
        "is trivially safe. The integer output provably sums to 100 "
        "(law-tested) — the allocation primitive behind budget/quota "
        "splits that naive rounding breaks.",
    )
    def largest_remainder_allocation(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        o = load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_totalprice"
        )
        c = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey"
        )
        n = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name"
        )
        rev = (
            o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_nationkey", "n_name")
            .agg(
                F.sum(F.col("o_totalprice").cast(DECIMAL_T))
                .cast("double")
                .alias("r")
            )
        )
        whole = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        sh = rev.withColumn(
            "ideal",
            F.lit(100.0)
            * F.col("r")
            / F.sum(F.col("r").cast(DECIMAL_T)).over(whole).cast("double"),
        )
        fl = sh.select(
            "n_nationkey",
            "n_name",
            "ideal",
            F.floor("ideal").cast("long").alias("base"),
            (F.col("ideal") - F.floor("ideal")).alias("rem"),
        )
        rk = fl.select(
            "n_name",
            "ideal",
            "base",
            F.row_number()
            .over(Window.orderBy(F.col("rem").desc(), "n_nationkey"))
            .alias("rk"),
            (F.lit(100) - F.sum("base").over(whole)).alias("deficit"),
        )
        return rk.select(
            "n_name",
            stable_round("ideal", 6).alias("ideal_share"),
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("deficit"), 1).otherwise(0)
            )
            .cast("long")
            .alias("points"),
        )


_register()
