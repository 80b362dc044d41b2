"""Signal-analysis tier over the event log: autocorrelation, CUSUM
drift detection, linear-interpolation gap-fill, and Markov transition
matrices.

These are the "statistical timeseries engine" operators a user of the
reference would reach for next (the reference itself never got there:
streaming_processing/features_engineering.py:1-54 parses the Kafka
JSON and prints to console — no features); each is re-expressed as
pure Catalyst expressions — window functions over one per-key sort,
decimal-exact sufficient sums, no Python in any path.

Determinism notes (the driver value-hashes Spark vs DuckDB):
- Correlations/stddevs come from decimal-exact sufficient sums, never
  the engines' streaming moment kernels (partition-order dependent).
- Running sums accumulate in decimal over a uniquely-ordered window
  (ts, event_id) so both engines add the same numbers in the same
  order exactly.
- Every derived double is a fixed tree of IEEE ops on those exact
  inputs, then `stable_round`ed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stock_trend_predictor_spark.functions.exact import (
    DECIMAL_T,
    exact_sum_sql,
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table

#: CUSUM alarm threshold in standardized units (classic 3-sigma).
CUSUM_THRESHOLD = 3.0


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    # ------------------------------------------------------------------
    @register(
        "acf_event_value",
        oracle=f"""
WITH ordered AS (
    SELECT event_type, value,
           lag(value, 1) OVER w AS y1,
           lag(value, 2) OVER w AS y2,
           lag(value, 3) OVER w AS y3
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), pairs AS (
    SELECT event_type, 1 AS lag, value AS x, y1 AS y FROM ordered WHERE y1 IS NOT NULL
    UNION ALL
    SELECT event_type, 2 AS lag, value AS x, y2 AS y FROM ordered WHERE y2 IS NOT NULL
    UNION ALL
    SELECT event_type, 3 AS lag, value AS x, y3 AS y FROM ordered WHERE y3 IS NOT NULL
), sums AS (
    SELECT event_type, lag,
           count(*) AS n_pairs,
           {exact_sum_sql('x')} AS sx,
           {exact_sum_sql('y')} AS sy,
           {exact_sum_sql('x * x')} AS sxx,
           {exact_sum_sql('y * y')} AS syy,
           {exact_sum_sql('x * y')} AS sxy
    FROM pairs GROUP BY 1, 2
)
SELECT event_type, lag, n_pairs,
       {stable_round_sql(
           '(n_pairs * sxy - sx * sy)'
           ' / sqrt((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy))',
           6)} AS acf
FROM sums
""",
        doc="Autocorrelation function at lags 1-3 per event_type: one "
        "per-key sort produces all three lag columns, stack() unpivots "
        "them to (lag, x, y) pairs, and the correlation comes from "
        "decimal-exact sufficient sums (map-side combinable). At "
        "100 TB this is one shuffle for the sort (reused by all lags) "
        "plus one combinable aggregate — the standard ACF-over-"
        "hypertable operator; extend lags by widening the stack, not "
        "by re-sorting.",
    )
    def acf_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        w = Window.partitionBy("event_type").orderBy("ts", "event_id")
        ordered = ev.select(
            "event_type",
            "value",
            F.lag("value", 1).over(w).alias("y1"),
            F.lag("value", 2).over(w).alias("y2"),
            F.lag("value", 3).over(w).alias("y3"),
        )
        pairs = ordered.selectExpr(
            "event_type",
            "value AS x",
            "stack(3, 1, y1, 2, y2, 3, y3) AS (lag, y)",
        ).where(F.col("y").isNotNull())
        x, y = F.col("x"), F.col("y")
        sums = pairs.groupBy("event_type", "lag").agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(x.cast(DECIMAL_T)).cast("double").alias("sx"),
            F.sum(y.cast(DECIMAL_T)).cast("double").alias("sy"),
            F.sum((x * x).cast(DECIMAL_T)).cast("double").alias("sxx"),
            F.sum((y * y).cast(DECIMAL_T)).cast("double").alias("syy"),
            F.sum((x * y).cast(DECIMAL_T)).cast("double").alias("sxy"),
        )
        n = F.col("n_pairs")
        sx, sy = F.col("sx"), F.col("sy")
        sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
        return sums.select(
            "event_type",
            "lag",
            "n_pairs",
            stable_round(
                (n * sxy - sx * sy)
                / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                6,
            ).alias("acf"),
        )

    # ------------------------------------------------------------------
    @register(
        "cusum_drift_summary",
        oracle=f"""
WITH stats AS (
    SELECT event_type,
           count(*) AS n,
           {exact_sum_sql('value')} AS sx,
           {exact_sum_sql('value * value')} AS sxx
    FROM events GROUP BY 1
), keyed AS (
    SELECT e.event_type, e.ts, e.event_id,
           CAST(row_number() OVER w AS DOUBLE) AS rn,
           CAST(sum(CAST(e.value AS DECIMAL(27,6))) OVER w AS DOUBLE)
               AS cusum_raw,
           s.sx / s.n AS mu,
           sqrt((s.n * s.sxx - s.sx * s.sx) / (s.n * (s.n - 1))) AS sigma
    FROM events e JOIN stats s USING (event_type)
    WINDOW w AS (PARTITION BY e.event_type ORDER BY e.ts, e.event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), scored AS (
    SELECT event_type, ts, event_id,
           abs((cusum_raw - rn * mu) / (nullif(sigma, 0.0) * sqrt(rn)))
               AS z_abs
    FROM keyed
), peak AS (
    SELECT event_type, ts, event_id, z_abs,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY z_abs DESC, event_id) AS rk
    FROM scored
)
SELECT s.event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE s.z_abs > {CUSUM_THRESHOLD}) AS BIGINT)
           AS n_alarm,
       {stable_round_sql('max(s.z_abs)', 6)} AS peak_z,
       max(p.ts) AS peak_ts
FROM scored s
JOIN peak p ON p.event_type = s.event_type AND p.rk = 1
GROUP BY 1
""",
        doc="CUSUM drift detector per event_type: standardized "
        "cumulative deviation from the key mean, alarm where "
        "|Z_t| = |S_t - t*mu| / (sigma*sqrt(t)) exceeds 3. The running "
        "sum accumulates in decimal over the uniquely-ordered window "
        "so it is exact; mu/sigma come from decimal sufficient sums "
        "joined back (broadcast — one row per key). One sort shuffle "
        "+ one combinable aggregate at any scale; the alarm summary "
        "(count, peak Z, peak time) is what a monitoring pipeline "
        "sinks, not the per-row scores.",
    )
    def cusum_drift_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        stats = ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DECIMAL_T)).cast("double").alias("sx"),
            F.sum((F.col("value") * F.col("value")).cast(DECIMAL_T))
            .cast("double")
            .alias("sxx"),
        )
        n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
        stats = stats.select(
            "event_type",
            (sx / n).alias("mu"),
            F.sqrt((n * sxx - sx * sx) / (n * (n - F.lit(1)))).alias("sigma"),
        )
        w = (
            Window.partitionBy("event_type")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        keyed = ev.join(F.broadcast(stats), "event_type").select(
            "event_type",
            "ts",
            "event_id",
            F.row_number()
            .over(Window.partitionBy("event_type").orderBy("ts", "event_id"))
            .cast("double")
            .alias("rn"),
            F.sum(F.col("value").cast(DECIMAL_T))
            .over(w)
            .cast("double")
            .alias("cusum_raw"),
            "mu",
            "sigma",
        )
        scored = keyed.select(
            "event_type",
            "ts",
            "event_id",
            F.abs(
                (F.col("cusum_raw") - F.col("rn") * F.col("mu"))
                / (F.nullif(F.col("sigma"), F.lit(0.0)) * F.sqrt(F.col("rn")))
            ).alias("z_abs"),
        )
        peak = scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.col("z_abs").desc(), "event_id"
                )
            ),
        ).where(F.col("rk") == 1)
        return (
            scored.alias("s")
            .join(
                F.broadcast(peak.select("event_type", F.col("ts").alias("pts"))),
                "event_type",
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.count_if(F.col("z_abs") > CUSUM_THRESHOLD)
                .cast("bigint")
                .alias("n_alarm"),
                stable_round(F.max("z_abs"), 6).alias("peak_z"),
                F.max("pts").alias("peak_ts"),
            )
        )

    # ------------------------------------------------------------------
    @register(
        "gapfill_hourly_interp",
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
), joined AS (
    SELECT g.event_type, g.hour_start,
           coalesce(h.n_obs, 0) AS n_obs,
           h.avg_value AS obs_val,
           CASE WHEN h.n_obs IS NOT NULL THEN g.hour_start END AS obs_hour
    FROM grid g LEFT JOIN hourly h
      ON g.event_type = h.event_type AND g.hour_start = h.hour_start
), filled AS (
    SELECT event_type, hour_start, n_obs, obs_val,
           last_value(obs_val IGNORE NULLS) OVER wb AS pv,
           last_value(obs_hour IGNORE NULLS) OVER wb AS ph,
           first_value(obs_val IGNORE NULLS) OVER wf AS nv,
           first_value(obs_hour IGNORE NULLS) OVER wf AS nh
    FROM joined
    WINDOW wb AS (PARTITION BY event_type ORDER BY hour_start
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wf AS (PARTITION BY event_type ORDER BY hour_start
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, hour_start, n_obs,
       CASE WHEN n_obs > 0 THEN 0 ELSE 1 END AS is_gap,
       {stable_round_sql(
           "CASE WHEN n_obs > 0 THEN obs_val"
           " ELSE pv + (nv - pv)"
           "  * (CAST(epoch(hour_start) - epoch(ph) AS DOUBLE)"
           "     / CAST(epoch(nh) - epoch(ph) AS DOUBLE)) END", 6)}
           AS value_interp
FROM filled
""",
        doc="Time-grid gap-fill with LINEAR interpolation (the "
        "companion to gapfill_hourly_forward's LOCF): dense hourly "
        "grid per key via sequence()/explode, left-join the observed "
        "hourly decimal-exact average, then bracket every gap hour "
        "with last_value/first_value(IGNORE NULLS) over one per-key "
        "sort and interpolate on the epoch fraction. Grid rows are "
        "#keys x #buckets (tiny vs the log); the two window frames "
        "share the same sort order so Catalyst evaluates them in one "
        "Window pass each direction. Endpoints are always bracketed "
        "because the grid spans observed min..max per key.",
    )
    def gapfill_hourly_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            .agg(
                F.min("hour_start").alias("h0"), F.max("hour_start").alias("h1")
            )
            .select(
                "event_type",
                F.explode(
                    F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
                ).alias("hour_start"),
            )
        )
        joined = grid.join(hourly, ["event_type", "hour_start"], "left").select(
            "event_type",
            "hour_start",
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
            F.col("avg_value").alias("obs_val"),
            F.when(F.col("n_obs").isNotNull(), F.col("hour_start")).alias(
                "obs_hour"
            ),
        )
        order = Window.partitionBy("event_type").orderBy("hour_start")
        wb = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wf = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        filled = joined.select(
            "event_type",
            "hour_start",
            "n_obs",
            "obs_val",
            F.last("obs_val", ignorenulls=True).over(wb).alias("pv"),
            F.last("obs_hour", ignorenulls=True).over(wb).alias("ph"),
            F.first("obs_val", ignorenulls=True).over(wf).alias("nv"),
            F.first("obs_hour", ignorenulls=True).over(wf).alias("nh"),
        )
        frac = (
            F.unix_timestamp("hour_start") - F.unix_timestamp("ph")
        ).cast("double") / (
            F.unix_timestamp("nh") - F.unix_timestamp("ph")
        ).cast("double")
        return filled.select(
            "event_type",
            "hour_start",
            "n_obs",
            F.when(F.col("n_obs") > 0, F.lit(0)).otherwise(F.lit(1)).alias(
                "is_gap"
            ),
            stable_round(
                F.when(F.col("n_obs") > 0, F.col("obs_val")).otherwise(
                    F.col("pv") + (F.col("nv") - F.col("pv")) * frac
                ),
                6,
            ).alias("value_interp"),
        )

    # ------------------------------------------------------------------
    @register(
        "markov_event_transitions",
        oracle="""
WITH seq AS (
    SELECT user_id, event_type AS cur_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
), trans AS (
    SELECT cur_type, next_type, CAST(count(*) AS BIGINT) AS n_trans
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT cur_type, next_type, n_trans,
       floor((CAST(n_trans AS DOUBLE)
              / CAST(sum(n_trans) OVER (PARTITION BY cur_type) AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS prob
FROM trans
""",
        doc="First-order Markov transition matrix over per-user event "
        "sequences: lead() over one per-user sort emits (cur, next) "
        "bigram pairs, a combinable count aggregates them, and the "
        "row-normalized probability is a window sum over the tiny "
        "transition table. The expensive part (the per-user sort) "
        "shuffles once on user_id — the natural partitioning for any "
        "sequence feature; the #types^2 matrix is driver-sized at any "
        "corpus scale. The user-journey analogue of the reference's "
        "movement labels (ml_model/predict_from_vm4.py:31).",
    )
    def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        seq = ev.select(
            "user_id",
            F.col("event_type").alias("cur_type"),
            F.lead("event_type")
            .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("next_type"),
        )
        trans = (
            seq.where(F.col("next_type").isNotNull())
            .groupBy("cur_type", "next_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_trans"))
        )
        total = F.sum("n_trans").over(Window.partitionBy("cur_type"))
        return trans.select(
            "cur_type",
            "next_type",
            "n_trans",
            stable_round(
                F.col("n_trans").cast("double") / total.cast("double"), 6
            ).alias("prob"),
        )

    # ------------------------------------------------------------------
    @register(
        "twap_time_weighted_value",
        oracle=f"""
WITH stepped AS (
    SELECT event_type, value,
           lead(epoch_us(ts)) OVER (PARTITION BY event_type
                                    ORDER BY ts, event_id)
               - epoch_us(ts) AS dt_us
    FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(dt_us) AS BIGINT) AS span_us,
       {stable_round_sql(
           exact_sum_sql('value * CAST(dt_us AS DOUBLE)')
           + ' / CAST(CAST(sum(dt_us) AS BIGINT) AS DOUBLE)', 6)}
           AS twap,
       {stable_round_sql(
           exact_sum_sql('value') + ' / count(*)', 6)} AS plain_avg
FROM stepped WHERE dt_us IS NOT NULL AND dt_us > 0
GROUP BY event_type
""",
        doc="Time-weighted average (TWAP): each observation is "
        "weighted by how long it was the live value (lead(ts) - ts in "
        "exact integer microseconds), versus the naive per-row mean — "
        "THE correct aggregate for irregularly-sampled feeds like the "
        "reference's ticks (its pandas mean treats a value held for "
        "an hour and one held for a second equally). One per-key "
        "sort for the lead(), then a combinable aggregate: weights "
        "are exact bigints, weighted terms sum in decimal, and the "
        "final division is a single IEEE op — engine-exact before "
        "rounding.",
    )
    def twap_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        w = Window.partitionBy("event_type").orderBy("ts", "event_id")
        stepped = ev.select(
            "event_type",
            "value",
            (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias(
                "dt_us"
            ),
        ).where(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
        return stepped.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum("dt_us").cast("bigint").alias("span_us"),
            stable_round(
                F.sum(
                    (F.col("value") * F.col("dt_us").cast("double")).cast(
                        DECIMAL_T
                    )
                ).cast("double")
                / F.sum("dt_us").cast("bigint").cast("double"),
                6,
            ).alias("twap"),
            stable_round(
                F.sum(F.col("value").cast(DECIMAL_T)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("plain_avg"),
        )

    @register(
        "max_drawdown_per_symbol",
        oracle=f"""
WITH run AS (
    SELECT event_type AS symbol, value,
           max(value) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS peak
    FROM events
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_ticks,
       max(value) AS global_max,
       min(value) AS global_min,
       {stable_round_sql('max((peak - value) / nullif(peak, 0))', 6)}
         AS max_drawdown
FROM run
GROUP BY symbol
""",
        doc="Maximum drawdown per symbol — the classic risk metric the "
        "reference's pandas pipeline would compute with .cummax() on "
        "the driver (the ml_model/predict_from_vm4.py pandas shape — "
        "whole collection into one frame): running peak "
        "via an UNBOUNDED PRECEDING window over the deterministic "
        "(ts, event_id) order, drawdown = (peak-value)/peak, one MAX "
        "per key. One shuffle on symbol (reused by every per-symbol "
        "feature); the window is evaluated narrow after the sort. At "
        "100 TB the low-cardinality-symbol variant swaps in "
        "operators/windows.py::bucketed running aggregates (see "
        "rolling_lag_bucketed) — the running max is associative so a "
        "two-level bucket scan preserves exactness.",
    )
    def max_drawdown_per_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        w = (
            Window.partitionBy("event_type")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        run = ev.select(
            F.col("event_type").alias("symbol"),
            F.col("value"),
            F.max("value").over(w).alias("peak"),
        )
        dd = (F.col("peak") - F.col("value")) / F.nullif(F.col("peak"), F.lit(0.0))
        return run.groupBy("symbol").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
            F.max("value").alias("global_max"),
            F.min("value").alias("global_min"),
            stable_round(F.max(dd), 6).alias("max_drawdown"),
        )

    @register(
        "concurrent_intervals_profile",
        oracle="""
WITH v AS (
    SELECT ts FROM events WHERE event_type = 'view'
), pts AS (
    SELECT ts AS t, 1 AS delta FROM v
    UNION ALL
    SELECT ts + INTERVAL 5 MINUTE AS t, -1 AS delta FROM v
), sweep AS (
    SELECT t,
           CAST(sum(delta) OVER (ORDER BY t, delta) AS BIGINT) AS conc
    FROM pts
)
SELECT date_trunc('hour', t) AS hour,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(max(conc) AS BIGINT) AS peak_concurrency
FROM sweep
GROUP BY date_trunc('hour', t)
""",
        doc="Peak concurrent active intervals per hour (each view "
        "opens a 5-minute activity interval) — the classic sweep-line "
        "+1/-1 boundary sum, DISTRIBUTED: a naive implementation is "
        "one global ORDER BY window (single task — the scale-killer); "
        "here the sweep runs per-DAY partitions and a day-level "
        "prefix-sum of daily deltas (a broadcast-sized table) supplies "
        "each day's carry-in offset — the textbook two-level parallel "
        "prefix scan, exact for intervals crossing partition "
        "boundaries. Ends sort before starts at equal timestamps "
        "(delta -1 < +1) giving half-open [start, end) semantics in "
        "both engines; the default RANGE frame makes tied boundary "
        "points share one cumulative value, so the hourly MAX is "
        "deterministic under any shuffle. Oracle = the single-window "
        "global sweep: two constructions, one result.",
    )
    def concurrent_intervals_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        views = ev.where(F.col("event_type") == "view").select("ts")
        pts = (
            views.select(F.col("ts").alias("t"), F.lit(1).alias("delta"))
            .unionByName(
                views.select(
                    (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t"),
                    F.lit(-1).alias("delta"),
                )
            )
            .withColumn("day", F.to_date("t"))
        )
        w_day = Window.partitionBy("day").orderBy("t", "delta")
        day_offsets = (
            pts.groupBy("day")
            .agg(F.sum("delta").alias("day_tot"))
            .select(
                "day",
                F.coalesce(
                    F.sum("day_tot").over(
                        Window.orderBy("day").rowsBetween(
                            Window.unboundedPreceding, -1
                        )
                    ),
                    F.lit(0),
                ).alias("carry_in"),
            )
        )
        swept = pts.join(F.broadcast(day_offsets), "day").select(
            "t",
            (F.sum("delta").over(w_day) + F.col("carry_in"))
            .cast("bigint")
            .alias("conc"),
        )
        return swept.groupBy(
            F.date_trunc("hour", "t").alias("hour")
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.max("conc").cast("bigint").alias("peak_concurrency"),
        )

    corr_sql = stable_round_sql(
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)"
        "                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        "             * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)"
        "                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0)",
        6,
    )

    @register(
        "rolling_pair_correlation",
        oracle="""
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS hour, event_type,
           CAST(SUM(CAST(value AS DECIMAL(15,6))) AS DECIMAL(15,6)) AS s
    FROM events
    WHERE event_type IN ('click', 'view')
    GROUP BY 1, 2
), paired AS (
    SELECT x.hour, x.s AS x, y.s AS y
    FROM (SELECT hour, s FROM hourly WHERE event_type = 'click') x
    JOIN (SELECT hour, s FROM hourly WHERE event_type = 'view') y
      USING (hour)
), sums AS (
    SELECT hour,
           count(*) OVER w AS n,
           CAST(sum(x) OVER w AS DECIMAL(38,6)) AS sx,
           CAST(sum(y) OVER w AS DECIMAL(38,6)) AS sy,
           -- operands widened to DECIMAL(19,6): DuckDB multiplies
           -- DECIMAL(<=18) pairs in int64 with the result width capped
           -- at 18, which overflows once the hourly sums pass ~1e3
           -- (scaled products > 1e18); width 19 forces the int128 path
           -- and the DECIMAL(38,12) product is exact. Spark multiplies
           -- DECIMAL(15,6) to DECIMAL(31,12) natively — both exact.
           CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)))
                OVER w AS DECIMAL(38,12)) AS sxy,
           CAST(sum(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6)))
                OVER w AS DECIMAL(38,12)) AS sx2,
           CAST(sum(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)))
                OVER w AS DECIMAL(38,12)) AS sy2
    FROM paired
    WINDOW w AS (ORDER BY hour ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT hour, CAST(n AS BIGINT) AS n_win,
       {corr_sql} AS corr24
FROM sums
WHERE n >= 2
""".replace("{corr_sql}", corr_sql),
        doc="Rolling 24-hour correlation between the click and view "
        "hourly volume series — the pair-trading / co-movement signal "
        "a stock engine computes between two tickers. The raw event "
        "stream reduces to EXACT decimal hourly sums first (one "
        "map-side-combinable shuffle); all five rolling sufficient "
        "sums (sx, sy, sxy, sx2, sy2) accumulate in decimal over the "
        "24-bucket frame — order-independent, so cross-engine "
        "bit-equality survives any partitioning — and only the final "
        "Pearson formula runs in (identical-IEEE) double. The window "
        "runs on the AGGREGATED hourly series: 8 760 rows/year "
        "however large the raw stream, which is why a single-"
        "partition window is the right plan here, not a scale bug.",
    )
    def rolling_pair_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        hourly = (
            ev.where(F.col("event_type").isin("click", "view"))
            .groupBy(
                F.date_trunc("hour", "ts").alias("hour"), "event_type"
            )
            .agg(
                F.sum(F.col("value").cast("decimal(15,6)"))
                .cast("decimal(15,6)")
                .alias("s")
            )
        )
        x = hourly.where(F.col("event_type") == "click").select(
            "hour", F.col("s").alias("x")
        )
        y = hourly.where(F.col("event_type") == "view").select(
            "hour", F.col("s").alias("y")
        )
        paired = x.join(y, "hour")
        w = Window.orderBy("hour").rowsBetween(-23, 0)
        d = lambda c: F.col(c).cast("double")  # noqa: E731
        sums = paired.select(
            "hour",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum("x").over(w).cast("decimal(38,6)").alias("sx"),
            F.sum("y").over(w).cast("decimal(38,6)").alias("sy"),
            F.sum(F.col("x") * F.col("y")).over(w).cast("decimal(38,12)").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).over(w).cast("decimal(38,12)").alias("sx2"),
            F.sum(F.col("y") * F.col("y")).over(w).cast("decimal(38,12)").alias("sy2"),
        )
        num = d("n") * d("sxy") - d("sx") * d("sy")
        den = F.nullif(
            F.sqrt(
                (d("n") * d("sx2") - d("sx") * d("sx"))
                * (d("n") * d("sy2") - d("sy") * d("sy"))
            ),
            F.lit(0.0),
        )
        return sums.where(F.col("n") >= 2).select(
            "hour",
            F.col("n").cast("bigint").alias("n_win"),
            stable_round(num / den, 6).alias("corr24"),
        )

    @register(
        "seasonality_profile",
        oracle=f"""
SELECT CAST(dayofweek(ts) AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER) AS hod,
       CAST(count(*) AS BIGINT) AS n_events,
       {exact_sum_sql('value')} / count(*) AS mean_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY 1, 2
""",
        doc="Day-of-week x hour-of-day seasonality profile — the "
        "seasonal-naive baseline every timeseries model is judged "
        "against. Sunday-based dow (Spark dayofweek()-1 == DuckDB "
        "extract(dow)); decimal-exact means. One map-side-combinable "
        "shuffle onto a 168-cell grid — the profile table is "
        "constant-size at any stream scale, which is what makes it a "
        "broadcastable residual-baseline for anomaly scoring "
        "downstream (join it back to the stream for value - "
        "expected).",
    )
    def seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        return ev.groupBy(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (
                F.sum(F.col("value").cast(DECIMAL_T)).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    @register(
        "interarrival_histogram",
        oracle="""
WITH gaps AS (
    SELECT event_type,
           date_diff('microsecond',
                     lag(ts) OVER (PARTITION BY event_type
                                   ORDER BY ts, event_id),
                     ts) AS gap_us
    FROM events
), bucketed AS (
    SELECT event_type, gap_us,
           CASE WHEN gap_us < 1000000 THEN '0_lt_1s'
                WHEN gap_us < 10000000 THEN '1_1s_10s'
                WHEN gap_us < 60000000 THEN '2_10s_1m'
                WHEN gap_us < 600000000 THEN '3_1m_10m'
                WHEN gap_us < 3600000000 THEN '4_10m_1h'
                WHEN gap_us < 86400000000 THEN '5_1h_24h'
                ELSE '6_ge_24h' END AS bucket
    FROM gaps
    WHERE gap_us IS NOT NULL
)
SELECT event_type, bucket,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us
FROM bucketed
GROUP BY event_type, bucket
""",
        doc="Inter-arrival-time histogram per stream key: lag() gap in "
        "integer microseconds, bucketed by an explicit CASE ladder of "
        "integer thresholds — deliberately NOT floor(log10(gap)): "
        "libm log10 can differ in the last ulp across engines and a "
        "boundary-straddling gap would flip buckets, while integer "
        "comparisons are exact everywhere. The arrival-process audit "
        "behind watermark sizing (streaming/ingest.py) — pick the "
        "late-data tolerance from the tail buckets. One per-key sort "
        "reused from every other per-key window in the engine.",
    )
    def interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        w = Window.partitionBy("event_type").orderBy("ts", "event_id")
        gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        bucket = (
            F.when(gap < 1_000_000, "0_lt_1s")
            .when(gap < 10_000_000, "1_1s_10s")
            .when(gap < 60_000_000, "2_10s_1m")
            .when(gap < 600_000_000, "3_1m_10m")
            .when(gap < 3_600_000_000, "4_10m_1h")
            .when(gap < 86_400_000_000, "5_1h_24h")
            .otherwise("6_ge_24h")
        )
        return (
            ev.select("event_type", gap.alias("gap_us"), bucket.alias("bucket"))
            .where(F.col("gap_us").isNotNull())
            .groupBy("event_type", "bucket")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
                F.min("gap_us").cast("bigint").alias("min_gap_us"),
                F.max("gap_us").cast("bigint").alias("max_gap_us"),
            )
        )

    @register(
        "runlength_encode_user_events",
        oracle="""
WITH flagged AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
    SELECT user_id, event_type, ts,
           CAST(sum(is_new) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS BIGINT)
             AS run_id
    FROM flagged
)
SELECT user_id, run_id,
       min(event_type) AS event_type,
       CAST(count(*) AS BIGINT) AS run_len,
       min(ts) AS start_ts,
       max(ts) AS end_ts
FROM runs
GROUP BY user_id, run_id
""",
        doc="Run-length encoding of each user's event stream — the "
        "gaps-and-islands pattern: change-point flag via "
        "lag IS DISTINCT FROM, cumulative sum assigns run ids, one "
        "aggregate collapses runs to (type, length, start, end). "
        "Compresses repeated-action bursts before sequence modeling "
        "(the RLE front-end to user_event_sequences). The (ts, "
        "event_id) order is total so run boundaries are "
        "deterministic; both window passes and the final aggregate "
        "share the single user_id shuffle.",
    )
    def runlength_encode_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        flagged = ev.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.when(
                ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")),
                1,
            )
            .otherwise(0)
            .alias("is_new"),
        )
        runs = flagged.select(
            "user_id",
            "event_type",
            "ts",
            F.sum("is_new")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint")
            .alias("run_id"),
        )
        return runs.groupBy("user_id", "run_id").agg(
            F.min("event_type").alias("event_type"),
            F.count(F.lit(1)).cast("bigint").alias("run_len"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )

    # ------------------------------------------------------------------
    # Stock-domain technical indicators (round-3 surface)
    # ------------------------------------------------------------------
    from stock_trend_predictor_spark.sources.tables import (
        TICKS_ORACLE_CTE,
        ticks,
    )

    @register(
        "rsi_cutler_14",
        oracle=f"""
WITH {TICKS_ORACLE_CTE},
deltas AS (
    SELECT symbol, ts, tick_id, close, close - open AS delta
    FROM ticks WHERE open IS NOT NULL
), win AS (
    SELECT symbol, ts, tick_id, close,
           CAST(SUM(CAST(greatest(delta, 0) AS DECIMAL(27,6))) OVER w
                AS DOUBLE) AS sg,
           CAST(SUM(CAST(greatest(-delta, 0) AS DECIMAL(27,6))) OVER w
                AS DOUBLE) AS sl,
           COUNT(*) OVER w AS cnt
    FROM deltas
    WINDOW w AS (PARTITION BY symbol ORDER BY ts, tick_id
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts, tick_id, close,
       CASE WHEN cnt = 14 THEN
           CASE WHEN sl = 0 THEN 100.0
                ELSE {stable_round_sql('100 - 100 / (1 + sg / sl)', 6)} END
       END AS rsi14
FROM win
""",
        doc="Cutler's RSI(14) per symbol: simple-moving-average gains "
        "vs losses over the last 14 deltas (the SMA variant is chosen "
        "over Wilder's recursive smoothing because it is expressible "
        "as ONE window aggregate — scalable and oracle-exact; the "
        "recursive form is not a window aggregate). Decimal-summed "
        "gains/losses make the ratio bit-deterministic; rows before a "
        "full 14-delta window yield NULL, loss-free streaks pin to "
        "100. One shuffle on symbol, shared by both window sums.",
    )
    def rsi_cutler_14(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir).where(F.col("open").isNotNull())
        delta = F.col("close") - F.col("open")
        w = (
            Window.partitionBy("symbol")
            .orderBy("ts", "tick_id")
            .rowsBetween(-13, 0)
        )
        # Bind each window aggregate to a REAL column before deriving
        # the indicator: Catalyst does not CSE structurally-identical
        # window expressions, so reusing the Column object inline plans
        # one sliding aggregate per reference (measured 37 window
        # columns instead of 3 in the Bollinger twin). One withColumns
        # projection = one Window operator with exactly 3 aggregates.
        t = t.withColumns(
            {
                "_sg": F.sum(F.greatest(delta, F.lit(0.0)).cast(DECIMAL_T))
                .over(w)
                .cast("double"),
                "_sl": F.sum(F.greatest(-delta, F.lit(0.0)).cast(DECIMAL_T))
                .over(w)
                .cast("double"),
                "_cnt": F.count(F.lit(1)).over(w),
            }
        )
        sg, sl = F.col("_sg"), F.col("_sl")
        rsi = F.when(
            F.col("_cnt") == 14,
            F.when(sl == 0.0, F.lit(100.0)).otherwise(
                stable_round(100.0 - 100.0 / (1.0 + sg / sl), 6)
            ),
        )
        return t.select("symbol", "ts", "tick_id", "close", rsi.alias("rsi14"))

    @register(
        "bollinger_bands_20",
        oracle=f"""
WITH {TICKS_ORACLE_CTE},
win AS (
    SELECT symbol, ts, tick_id, close,
           CAST(SUM(CAST(close AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sx,
           CAST(SUM(CAST(close * close AS DECIMAL(27,6))) OVER w
                AS DOUBLE) AS sxx,
           COUNT(*) OVER w AS cnt
    FROM ticks
    WINDOW w AS (PARTITION BY symbol ORDER BY ts, tick_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
), bands AS (
    SELECT symbol, ts, tick_id, close, cnt,
           sx / cnt AS sma,
           sqrt(greatest((sxx - sx * sx / cnt) / (cnt - 1), 0)) AS sd
    FROM win
)
SELECT symbol, ts, tick_id, close,
       CASE WHEN cnt = 20 THEN {stable_round_sql('sma', 6)} END AS sma20,
       CASE WHEN cnt = 20 THEN {stable_round_sql('sma + 2 * sd', 6)} END
         AS upper_band,
       CASE WHEN cnt = 20 THEN {stable_round_sql('sma - 2 * sd', 6)} END
         AS lower_band,
       CASE WHEN cnt = 20 AND sd > 0
            THEN {stable_round_sql('(close - (sma - 2 * sd)) / (4 * sd)', 6)}
       END AS pct_b
FROM bands
""",
        doc="Bollinger bands (20, 2σ) per symbol: rolling mean ± 2 "
        "sample standard deviations and the %B position of the close "
        "inside the band. Variance from decimal-exact sufficient sums "
        "(Σx, Σx²) — never the engines' streaming stddev kernels, "
        "whose accumulation order is partition-dependent — so the "
        "bands are bit-identical cross-engine. Both window sums and "
        "the count share one symbol shuffle.",
    )
    def bollinger_bands_20(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir)
        w = (
            Window.partitionBy("symbol")
            .orderBy("ts", "tick_id")
            .rowsBetween(-19, 0)
        )
        # Window aggregates bound ONCE (see rsi_cutler_14 note: no CSE
        # across window expressions — inline reuse planned 37 sliding
        # aggregates, 3.2s at sf0.1; bound columns plan 3, 0.5s).
        t = t.withColumns(
            {
                "_sx": F.sum(F.col("close").cast(DECIMAL_T))
                .over(w)
                .cast("double"),
                "_sxx": F.sum(
                    (F.col("close") * F.col("close")).cast(DECIMAL_T)
                )
                .over(w)
                .cast("double"),
                "_cnt": F.count(F.lit(1)).over(w),
            }
        )
        # Derived terms likewise bound before fan-out into four outputs.
        # greatest(cnt-1, 1): bound columns evaluate on EVERY row (no
        # CASE shield any more), and the first row of a symbol has
        # cnt=1 — an ANSI divide-by-zero. The clamped value is only
        # ever read under the cnt=20 gate, where cnt-1 = 19.
        sx, sxx, cnt = F.col("_sx"), F.col("_sxx"), F.col("_cnt")
        t = t.withColumns(
            {
                "_sma": sx / cnt,
                "_sd": F.sqrt(
                    F.greatest(
                        (sxx - sx * sx / cnt)
                        / F.greatest(cnt - 1, F.lit(1)),
                        F.lit(0.0),
                    )
                ),
            }
        )
        sma, sd = F.col("_sma"), F.col("_sd")
        full = cnt == 20
        return t.select(
            "symbol",
            "ts",
            "tick_id",
            "close",
            F.when(full, stable_round(sma, 6)).alias("sma20"),
            F.when(full, stable_round(sma + 2 * sd, 6)).alias("upper_band"),
            F.when(full, stable_round(sma - 2 * sd, 6)).alias("lower_band"),
            F.when(
                full & (sd > 0),
                stable_round((F.col("close") - (sma - 2 * sd)) / (4 * sd), 6),
            ).alias("pct_b"),
        )

    @register(
        "stochastic_oscillator_14",
        oracle=f"""
WITH {TICKS_ORACLE_CTE},
win AS (
    SELECT symbol, ts, tick_id, close,
           min(close) OVER w AS mn,
           max(close) OVER w AS mx,
           count(*) OVER w AS cnt
    FROM ticks
    WINDOW w AS (PARTITION BY symbol ORDER BY ts, tick_id
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
), k AS (
    SELECT symbol, ts, tick_id, close,
           CASE WHEN cnt = 14 AND mx > mn
                THEN {stable_round_sql('100 * (close - mn) / (mx - mn)', 6)}
           END AS pct_k
    FROM win
), d AS (
    SELECT symbol, ts, tick_id, close, pct_k,
           CAST(SUM(CAST(pct_k AS DECIMAL(27,6))) OVER w3 AS DOUBLE) AS ks,
           COUNT(pct_k) OVER w3 AS kc
    FROM k
    WINDOW w3 AS (PARTITION BY symbol ORDER BY ts, tick_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts, tick_id, close, pct_k,
       CASE WHEN kc = 3 THEN {stable_round_sql('ks / 3', 6)} END AS pct_d
FROM d
""",
        doc="Stochastic oscillator %K(14)/%D(3) per symbol: close "
        "position inside the rolling 14-row [min, max] range, smoothed "
        "by a 3-row SMA. Window min/max of doubles are exact "
        "cross-engine; the %D average sums the 6-dp-rounded %K in "
        "decimal so the smoothing is order-independent. A flat 14-row "
        "window (max == min) yields NULL %K, and %D requires 3 defined "
        "%K rows — both gates identical in the oracle. Nested windows "
        "share ONE symbol shuffle (the %K projection is bound before "
        "the %D frame, per the no-window-CSE rule).",
    )
    def stochastic_oscillator_14(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir)
        w14 = (
            Window.partitionBy("symbol")
            .orderBy("ts", "tick_id")
            .rowsBetween(-13, 0)
        )
        t = t.withColumns(
            {
                "_mn": F.min("close").over(w14),
                "_mx": F.max("close").over(w14),
                "_cnt": F.count(F.lit(1)).over(w14),
            }
        )
        t = t.withColumn(
            "pct_k",
            F.when(
                (F.col("_cnt") == 14) & (F.col("_mx") > F.col("_mn")),
                stable_round(
                    100.0
                    * (F.col("close") - F.col("_mn"))
                    / (F.col("_mx") - F.col("_mn")),
                    6,
                ),
            ),
        )
        w3 = (
            Window.partitionBy("symbol")
            .orderBy("ts", "tick_id")
            .rowsBetween(-2, 0)
        )
        t = t.withColumns(
            {
                "_ks": F.sum(F.col("pct_k").cast(DECIMAL_T))
                .over(w3)
                .cast("double"),
                "_kc": F.count("pct_k").over(w3),
            }
        )
        return t.select(
            "symbol",
            "ts",
            "tick_id",
            "close",
            "pct_k",
            F.when(
                F.col("_kc") == 3, stable_round(F.col("_ks") / 3.0, 6)
            ).alias("pct_d"),
        )

    # ------------------------------------------------------------------
    # MACD: truncated-tap EMAs with SHARED weight literals (the
    # recursive EMA is not window-expressible; the tap form is the
    # scalable equivalent — same policy as ewma_time_decay, weights
    # below ~1% of head weight dropped). repr(float) feeds BOTH
    # engines, so every product/sum is IEEE-identical.
    # ------------------------------------------------------------------
    def _ema_weights(alpha: float, taps: int) -> list[str]:
        return [repr((1.0 - alpha) ** k) for k in range(taps)]

    _W12 = _ema_weights(2.0 / 13.0, 18)
    _W26 = _ema_weights(2.0 / 27.0, 36)
    _WSIG = _ema_weights(2.0 / 10.0, 20)

    def _ema_sql(col: str, weights: list[str], win: str) -> str:
        # CAST every weight to DOUBLE: DuckDB parses a bare decimal
        # literal as DECIMAL, and a 36-term decimal sum overflows
        # DECIMAL(18); the cast also makes the den accumulate in
        # double exactly like the Spark side — identical IEEE trees.
        num = " + ".join(
            f"coalesce(lag({col}, {k}) OVER {win}, 0.0)"
            f" * CAST({w} AS DOUBLE)"
            if k
            else f"{col} * CAST({w} AS DOUBLE)"
            for k, w in enumerate(weights)
        )
        den = " + ".join(
            f"(CASE WHEN lag({col}, {k}) OVER {win} IS NULL"
            f" THEN 0.0 ELSE CAST({w} AS DOUBLE) END)"
            if k
            else f"CAST({w} AS DOUBLE)"
            for k, w in enumerate(weights)
        )
        return f"(({num}) / ({den}))"

    def _ema_col(col: str, w: Window, weights: list[str]):
        num = None
        den = None
        for k, wl in enumerate(weights):
            wk = F.lit(float(wl))
            tap = F.col(col) if k == 0 else F.lag(col, k).over(w)
            tn = tap * wk if k == 0 else F.coalesce(tap, F.lit(0.0)) * wk
            td = wk if k == 0 else F.when(tap.isNull(), F.lit(0.0)).otherwise(wk)
            num = tn if num is None else num + tn
            den = td if den is None else den + td
        return num / den

    @register(
        "macd_crossover",
        oracle=f"""
WITH {TICKS_ORACLE_CTE},
m AS (
    SELECT symbol, ts, tick_id, close,
           {_ema_sql('close', _W12, 'w')}
           - {_ema_sql('close', _W26, 'w')} AS macd
    FROM ticks
    WINDOW w AS (PARTITION BY symbol ORDER BY ts, tick_id)
), s AS (
    SELECT symbol, ts, tick_id, close, macd,
           macd - {_ema_sql('macd', _WSIG, 'w')} AS hist
    FROM m
    WINDOW w AS (PARTITION BY symbol ORDER BY ts, tick_id)
), x AS (
    SELECT symbol, ts, tick_id, close, macd, hist,
           lag(hist) OVER (PARTITION BY symbol ORDER BY ts, tick_id)
               AS prev_hist
    FROM s
)
SELECT symbol, ts, tick_id, close,
       {stable_round_sql('macd', 6)} AS macd,
       {stable_round_sql('macd - hist', 6)} AS macd_signal,
       {stable_round_sql('hist', 6)} AS hist,
       CASE WHEN prev_hist IS NOT NULL AND hist > 0 AND prev_hist <= 0
                THEN 'bullish'
            WHEN prev_hist IS NOT NULL AND hist < 0 AND prev_hist >= 0
                THEN 'bearish'
       END AS crossover
FROM x
""",
        doc="MACD(12, 26, 9) per symbol with crossover signals: fast "
        "minus slow truncated-tap EMA, a 9-span EMA signal line over "
        "the bound macd column (nested EMA — second Window batch, "
        "same symbol shuffle), and bullish/bearish flags where the "
        "histogram crosses zero. Weights are shared repr(float) "
        "literals and every tap sum is a fixed IEEE tree, so both "
        "engines agree to the last ulp before 6-dp rounding. All "
        "54+20 taps are lag() reads over ONE per-symbol sort — no "
        "extra exchange versus a single moving average.",
    )
    def macd_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir)
        w = Window.partitionBy("symbol").orderBy("ts", "tick_id")
        t = t.withColumn(
            "macd", _ema_col("close", w, _W12) - _ema_col("close", w, _W26)
        )
        # signal EMA runs over the BOUND macd column (next Window
        # batch); hist likewise binds before its double use in the
        # output and the crossover sign test (no window-expression CSE)
        t = t.withColumn("hist", F.col("macd") - _ema_col("macd", w, _WSIG))
        t = t.withColumn("prev_hist", F.lag("hist").over(w))
        prev = F.col("prev_hist")
        hist = F.col("hist")
        return t.select(
            "symbol",
            "ts",
            "tick_id",
            "close",
            stable_round(F.col("macd"), 6).alias("macd"),
            stable_round(F.col("macd") - hist, 6).alias("macd_signal"),
            stable_round(hist, 6).alias("hist"),
            F.when(
                prev.isNotNull() & (hist > 0) & (prev <= 0), F.lit("bullish")
            )
            .when(
                prev.isNotNull() & (hist < 0) & (prev >= 0), F.lit("bearish")
            )
            .alias("crossover"),
        )


_register()
