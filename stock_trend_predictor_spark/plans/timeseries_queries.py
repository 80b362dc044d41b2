"""Time-series feature-engineering queries (SURVEY §7 phase 2) — the
moving averages / returns / resampling / as-of alignment that the
reference's features_engineering.py names but never implements, plus
the per-key high-watermark state (A3, reference
data_collection/fetch_stock.py:43,57,64) as a batch aggregate.
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
from stock_trend_predictor_spark.operators.windows import (
    asof_join,
    resample_bars,
    sessionize,
)
from stock_trend_predictor_spark.sources.tables import load_table


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "rolling_features",
        oracle=f"""
SELECT event_id, event_type AS symbol, value,
       CAST(sum(CAST(value AS DECIMAL(27,6)))
            OVER (PARTITION BY event_type ORDER BY ts
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / count(value) OVER (PARTITION BY event_type ORDER BY ts
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ma5,
       min(value) OVER (PARTITION BY event_type ORDER BY ts
                  ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS roll_min20,
       max(value) OVER (PARTITION BY event_type ORDER BY ts
                  ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS roll_max20,
       {stable_round_sql(
           '(value - lag(value) OVER (PARTITION BY event_type ORDER BY ts))'
           ' / nullif(lag(value) OVER (PARTITION BY event_type ORDER BY ts), 0)'
           ' * 100', 6)}
         AS return_pct
FROM events
""",
        doc="Rolling window features per symbol: 5-row moving average "
        "(decimal-exact), 20-row min/max channel, lag-1 return. The "
        "canonical Window.partitionBy(symbol).orderBy(ts).rowsBetween "
        "form (SURVEY §2.5); one shuffle, evaluated narrow.",
    )
    def rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        w = Window.partitionBy("event_type").orderBy("ts")
        w5 = w.rowsBetween(-4, 0)
        w20 = w.rowsBetween(-19, 0)
        prev = F.lag("value").over(w)
        return ev.select(
            "event_id",
            F.col("event_type").alias("symbol"),
            "value",
            (
                F.sum(F.col("value").cast(DECIMAL_T)).over(w5).cast("double")
                / F.count("value").over(w5)
            ).alias("ma5"),
            F.min("value").over(w20).alias("roll_min20"),
            F.max("value").over(w20).alias("roll_max20"),
            # nullif guard: a 0 prior value yields NULL return (not an
            # ANSI divide-by-zero error) — identical semantics in DuckDB.
            stable_round(
                (F.col("value") - prev) / F.nullif(prev, F.lit(0.0)) * 100, 6
            ).alias("return_pct"),
        )

    @register(
        "rolling_lag_bucketed",
        oracle="""
SELECT event_id, event_type AS symbol, value,
       lag(value) OVER (PARTITION BY event_type ORDER BY ts)
         AS prev_value
FROM events
""",
        doc="Scalable lag for LOW-cardinality keys: lag within "
        "(key, day-bucket) + previous-bucket last-value carry — "
        "parallelism #keys x #buckets instead of #keys (a plain "
        "per-symbol window puts a third of 100 TB in one sort task "
        "for a 3-symbol universe). Oracle is the PLAIN per-key lag: "
        "the two-pass form must be row-identical.",
    )
    def rolling_lag_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.operators.windows import bucketed_lag

        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "ts", "value"
        )
        out = bucketed_lag(
            ev, key="event_type", ts="ts", value="value", bucket="1 day"
        )
        return out.select(
            "event_id",
            F.col("event_type").alias("symbol"),
            "value",
            "prev_value",
        )

    @register(
        "resample_ohlc_bars",
        oracle=f"""
SELECT event_type AS symbol,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS bar_start,
       arg_min(value, ts) AS open,
       max(value) AS high,
       min(value) AS low,
       arg_max(value, ts) AS close,
       count(*) AS n_ticks,
       {exact_sum_sql('value')} AS total_value
FROM events
GROUP BY 1, 2
""",
        doc="Resample the tick stream to daily OHLC bars via "
        "min_by/max_by aggregates (SURVEY §7 phase 2; the batch twin of "
        "groupBy(window(ts))). Deterministic because driver timestamps "
        "are globally unique.",
    )
    def resample_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").withColumnRenamed(
            "event_type", "symbol"
        )
        return resample_bars(ev, key="symbol", ts="ts", value="value", bucket="1 day")

    @register(
        "high_watermark_per_key",
        oracle="""
SELECT user_id, max(ts) AS last_ts, count(*) AS n_events,
       max_by(value, ts) AS last_value
FROM events
GROUP BY user_id
""",
        doc="A3: the per-key high-watermark the reference keeps in a "
        "driver dict (fetch_stock.py:43,64), as a distributed aggregate.",
    )
    def high_watermark_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
        return (
            load_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(
                F.max("ts").alias("last_ts"),
                F.count(F.lit(1)).alias("n_events"),
                F.max_by("value", "ts").alias("last_value"),
            )
        )

    @register(
        "incremental_tick_filter",
        oracle="""
WITH wm AS (
    SELECT user_id, max(ts) AS wm_ts
    FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY user_id
)
SELECT e.event_id, e.user_id, e.ts, e.value
FROM events e JOIN wm ON e.user_id = wm.user_id
WHERE e.ts > wm.wm_ts
""",
        doc="P4: the incremental high-watermark predicate "
        "(fetch_stock.py:57) — keep only rows newer than each key's "
        "watermark, computed distributed instead of in driver memory.",
    )
    def incremental_tick_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        wm = (
            ev.where(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
            .groupBy("user_id")
            .agg(F.max("ts").alias("wm_ts"))
        )
        # No broadcast hint: wm's size is the distinct-user count, which
        # only the optimizer can judge at runtime — AQE broadcasts it
        # when it fits and shuffles both sides when it doesn't.
        return (
            ev.join(wm, "user_id")
            .where(F.col("ts") > F.col("wm_ts"))
            .select("event_id", "user_id", "ts", "value")
        )

    @register(
        "asof_join_purchase_view",
        oracle="""
SELECT p.event_id, p.user_id, p.ts, p.value,
       v.ts AS ts_asof, v.value AS value_asof
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
""",
        doc="As-of join: each purchase aligned to the user's latest "
        "prior view. Spark has no ASOF JOIN; implemented as tagged "
        "union + last(ignorenulls) over one per-key sort "
        "(operators/windows.py::asof_join) — O(n log n), no range-join "
        "explosion at 100 TB.",
    )
    def asof_join_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        purchases = ev.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        )
        views = ev.where(F.col("event_type") == "view").select(
            "user_id", "ts", "value"
        )
        return asof_join(
            purchases, views, by=["user_id"], ts="ts", right_cols=["ts", "value"]
        )

    @register(
        "sessionize_events",
        oracle=f"""
WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL THEN 1
                WHEN ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1
                ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
    SELECT user_id, ts, value,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_seq
    FROM flagged
)
SELECT user_id, session_seq,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       {exact_sum_sql('value')} AS session_value
FROM sessions
GROUP BY user_id, session_seq
""",
        doc="Gap-based sessionization (30 min) + per-session rollup — "
        "the batch twin of streaming session_window (ST5 gap the "
        "reference lacks, SURVEY §2.9).",
    )
    def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
        s = sessionize(ev, key="user_id", ts="ts", gap="30 minutes")
        return s.groupBy("user_id", "session_seq").agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", "session_value"),
        )

    @register(
        "rolling_time_range_features",
        oracle="""
SELECT event_id, user_id,
       count(*) OVER w AS n_30m,
       CAST(sum(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sum_30m
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
             RANGE BETWEEN 1800000 PRECEDING AND CURRENT ROW)
""",
        doc="Time-RANGE window frame (vs rolling_features' ROWS "
        "frames): trailing 30-minute event count and decimal-exact "
        "value sum per user — the frame is defined by event-time "
        "distance, so sparse and bursty activity windows are correct "
        "where a fixed row count is not. Millisecond epoch as the "
        "range key (unix_millis == DuckDB epoch_ms, both floor); one "
        "shuffle on user_id, evaluated narrow.",
    )
    def rolling_time_range_features(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        w = (
            Window.partitionBy("user_id")
            .orderBy(F.unix_millis("ts"))
            .rangeBetween(-1_800_000, 0)
        )
        return ev.select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).alias("n_30m"),
            F.sum(F.col("value").cast(DECIMAL_T))
            .over(w)
            .cast("double")
            .alias("sum_30m"),
        )

    @register(
        "funnel_view_click_purchase",
        oracle="""
WITH stages AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events GROUP BY user_id
)
SELECT 'viewed' AS stage, COUNT(*) AS n_users FROM stages
WHERE t_view IS NOT NULL
UNION ALL
SELECT 'clicked_after_view' AS stage, COUNT(*) AS n_users FROM stages
WHERE t_view IS NOT NULL AND t_click > t_view
UNION ALL
SELECT 'purchased_after_click' AS stage, COUNT(*) AS n_users FROM stages
WHERE t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
""",
        doc="Event-sequence funnel (first view -> later first click -> "
        "later first purchase): ONE shuffle on user_id computing all "
        "per-stage first-times as conditional min aggregates "
        "(map-side combinable), then three filters over the one-row-"
        "per-user frame. The naive form — one self-join per funnel "
        "stage — shuffles the event log per stage; this shape is flat "
        "in the number of stages.",
    )
    def funnel_view_click_purchase(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        stages = ev.groupBy("user_id").agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
                "t_view"
            ),
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
                "t_click"
            ),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("t_purchase"),
        )

        def stage(df: DataFrame, name: str) -> DataFrame:
            return df.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(name).alias("stage"), "n_users"
            )

        viewed = stages.where(F.col("t_view").isNotNull())
        clicked = viewed.where(F.col("t_click") > F.col("t_view"))
        purchased = clicked.where(F.col("t_purchase") > F.col("t_click"))
        return (
            stage(viewed, "viewed")
            .unionByName(stage(clicked, "clicked_after_view"))
            .unionByName(stage(purchased, "purchased_after_click"))
        )

    @register(
        "tumbling_window_agg",
        oracle=f"""
SELECT event_type,
       CAST(to_timestamp(floor(epoch(ts) / 21600) * 21600) AS TIMESTAMP)
         AS window_start,
       count(*) AS n_events,
       {exact_sum_sql('value')} AS total_value,
       max(value) AS max_value
FROM events
GROUP BY 1, 2
""",
        doc="6-hour tumbling event-time windows per symbol — batch form "
        "of the streaming groupBy(window(ts, '6 hours')) aggregation "
        "(ST5); epoch-aligned buckets identical to Spark window().",
    )
    def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        return (
            ev.groupBy("event_type", F.window("ts", "6 hours").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                exact_sum("value", "total_value"),
                F.max("value").alias("max_value"),
            )
            .select(
                "event_type",
                F.col("w.start").alias("window_start"),
                "n_events",
                "total_value",
                "max_value",
            )
        )

    @register(
        "vwap_per_supplier",
        oracle=f"""
SELECT l_suppkey,
       {exact_sum_sql('l_extendedprice * l_quantity')}
         / {exact_sum_sql('l_quantity')} AS vwap,
       count(*) AS n_lines
FROM lineitem
GROUP BY l_suppkey
""",
        doc="Volume-weighted average price per supplier — ratio of two "
        "exact decimal sums (deterministic at any parallelism).",
    )
    def vwap_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        return li.groupBy("l_suppkey").agg(
            (
                exact_sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / exact_sum("l_quantity")
            ).alias("vwap"),
            F.count(F.lit(1)).alias("n_lines"),
        )

    # Exponential time-decay weights as SHARED literals: 0.7**k is
    # computed once in Python and its shortest-round-trip repr feeds
    # both engines, so the weighted sums are IEEE-identical.
    _EWMA_K = 10
    _EWMA_W = [repr(0.7**k) for k in range(_EWMA_K)]
    _ewma_num_sql = " + ".join(
        f"coalesce(lag(value, {k}) OVER w, 0.0) * {w}" if k else f"value * {w}"
        for k, w in enumerate(_EWMA_W)
    )
    _ewma_den_sql = " + ".join(
        f"(CASE WHEN lag(value, {k}) OVER w IS NULL THEN 0.0 ELSE {w} END)"
        if k
        else f"{w}"
        for k, w in enumerate(_EWMA_W)
    )

    @register(
        "ewma_time_decay",
        oracle=f"""
SELECT event_id, event_type AS symbol, value,
       {stable_round_sql(f"({_ewma_num_sql}) / ({_ewma_den_sql})", 6)}
         AS ewma10
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
""",
        doc="Exponentially-weighted moving average (halflife ~2 rows, "
        "10-tap truncation) as TEN lag() taps over ONE window — no "
        "collect_list, no per-row array, no recursive scan. All taps "
        "share the single (symbol) shuffle and evaluate in one "
        "codegen'd projection; the head-of-series partial window "
        "renormalizes by the present-tap weight sum. The classic "
        "recursive EWMA is not expressible as a window aggregate — "
        "the truncated-tap form is the scalable equivalent (weights "
        "below 0.03 dropped) and is what keeps it oracle-exact.",
    )
    def ewma_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        w = Window.partitionBy("event_type").orderBy("ts", "event_id")
        num = None
        den = None
        for k, wl in enumerate(_EWMA_W):
            wk = F.lit(float(wl))
            tap = F.col("value") if k == 0 else F.lag("value", k).over(w)
            t_num = (
                F.coalesce(tap, F.lit(0.0)) * wk if k else tap * wk
            )
            t_den = (
                F.when(tap.isNull(), F.lit(0.0)).otherwise(wk) if k else wk
            )
            num = t_num if num is None else num + t_num
            den = t_den if den is None else den + t_den
        return ev.select(
            "event_id",
            F.col("event_type").alias("symbol"),
            "value",
            stable_round(num / den, 6).alias("ewma10"),
        )

    @register(
        "attribution_forward_asof",
        oracle="""
SELECT v.event_id, v.user_id, v.ts,
       CASE WHEN p.ts <= v.ts + INTERVAL 1 HOUR THEN p.ts END AS ts_next,
       CASE WHEN p.ts <= v.ts + INTERVAL 1 HOUR THEN p.value END
         AS value_next
FROM (SELECT * FROM events WHERE event_type = 'view') v
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id AND p.ts >= v.ts
""",
        doc="Forward as-of join with tolerance — conversion "
        "attribution: each view matched to the user's NEXT purchase, "
        "but only if it lands within a 1-hour attribution window. "
        "Mirror-image of asof_join_purchase_view: tagged union + "
        "first(ignorenulls) over CURRENT ROW..UNBOUNDED FOLLOWING "
        "(operators/windows.py::asof_join_forward), tolerance as a "
        "post-filter on the matched timestamp so the window stays "
        "single-pass. O(n log n) per user key; no range join. The "
        "oracle is DuckDB's native forward ASOF JOIN plus the same "
        "tolerance CASE — two independent constructions, one result.",
    )
    def attribution_forward_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.operators.windows import (
            asof_join_forward,
        )

        ev = load_table(spark, sf_dir, "events")
        views = ev.where(F.col("event_type") == "view").select(
            "event_id", "user_id", "ts"
        )
        purchases = ev.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        )
        return asof_join_forward(
            views,
            purchases,
            by=["user_id"],
            ts="ts",
            right_cols=["value"],
            tolerance_seconds=3600,
        )


_register()
