"""Distribution and trajectory distances: exact 1-D Wasserstein and
dynamic time warping.

Two distances that finish the comparison toolkit: PSI (psi_price_drift)
and KS (ks_test_pairwise) compare distributions through bins and a max
gap; Wasserstein-1 integrates the WHOLE CDF gap (the drift measure
that weighs how FAR mass moved, not only that it moved). DTW compares
time-series SHAPES under temporal misalignment, which every lag-based
correlation in the dependence tier is blind to.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stock_trend_predictor_spark.functions.exact import (
    exact_sum_sql,
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table

#: Sakoe-Chiba band half-width for DTW (days).
DTW_BAND = 5


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "wasserstein_value_distance",
        oracle=f"""
WITH types AS (
    SELECT DISTINCT event_type FROM events
), pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b
    FROM types a JOIN types b ON a.event_type < b.event_type
), tagged AS (
    SELECT p.type_a, p.type_b, e.event_type AS src, e.value
    FROM events e JOIN pairs p
      ON e.event_type = p.type_a OR e.event_type = p.type_b
), grain AS (
    SELECT type_a, type_b, value,
           CAST(sum(CASE WHEN src = type_a THEN 1 ELSE 0 END) AS BIGINT)
               AS da,
           CAST(sum(CASE WHEN src = type_b THEN 1 ELSE 0 END) AS BIGINT)
               AS db
    FROM tagged GROUP BY 1, 2, 3
), cum AS (
    SELECT type_a, type_b, value,
           sum(da) OVER w AS ca, sum(db) OVER w AS cb,
           sum(da) OVER p AS na, sum(db) OVER p AS nb,
           lead(value) OVER (PARTITION BY type_a, type_b
                             ORDER BY value) AS nxt
    FROM grain
    WINDOW w AS (PARTITION BY type_a, type_b ORDER BY value
                 ROWS UNBOUNDED PRECEDING),
           p AS (PARTITION BY type_a, type_b)
), terms AS (
    SELECT type_a, type_b, na, nb,
           CAST(abs(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
                * (nxt - value) AS DECIMAL(38,18)) AS term
    FROM cum WHERE nxt IS NOT NULL
)
SELECT type_a, type_b,
       CAST(max(na) AS BIGINT) AS n_a,
       CAST(max(nb) AS BIGINT) AS n_b,
       {stable_round_sql('CAST(sum(term) AS DOUBLE)', 6)} AS w1
FROM terms GROUP BY 1, 2
""",
        doc="Exact 1-D Wasserstein (earth-mover) distance between the "
        "value distributions of every unordered event-type pair: "
        "W1 = integral |F_a - F_b| dx, computed at the distinct-value "
        "grain — one tagged union per pair, running-count CDFs over "
        "one per-pair sort, |CDF gap| x value gap terms accumulated "
        "in decimal(38,18) so partition order cannot perturb the "
        "integral. Completes the drift toolkit: PSI weighs binned "
        "mass shifts, KS the worst single gap, W1 the full transport "
        "cost. Pair fan-out is type-universe-bounded (each event row "
        "appears once per pair containing its type — 4x here), the "
        "same budget contract as ks_test_pairwise.",
    )
    def wasserstein_value_distance(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select(
            "event_type", "value"
        )
        types = ev.select("event_type").distinct()
        ta = types.select(F.col("event_type").alias("type_a"))
        tb = types.select(F.col("event_type").alias("type_b"))
        pairs = ta.join(tb, F.col("type_a") < F.col("type_b"))
        tagged = ev.join(
            F.broadcast(pairs),
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        grain = tagged.groupBy("type_a", "type_b", "value").agg(
            F.sum(
                F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0)
            ).alias("da"),
            F.sum(
                F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0)
            ).alias("db"),
        )
        wp = Window.partitionBy("type_a", "type_b")
        wcum = wp.orderBy("value").rowsBetween(
            Window.unboundedPreceding, 0
        )
        cum = grain.withColumns(
            {
                "ca": F.sum("da").over(wcum),
                "cb": F.sum("db").over(wcum),
                "na": F.sum("da").over(wp),
                "nb": F.sum("db").over(wp),
                "nxt": F.lead("value").over(wp.orderBy("value")),
            }
        )
        term = (
            F.abs(
                F.col("ca").cast("double") / F.col("na")
                - F.col("cb").cast("double") / F.col("nb")
            )
            * (F.col("nxt") - F.col("value"))
        ).cast("decimal(38,18)")
        return (
            cum.where(F.col("nxt").isNotNull())
            .groupBy("type_a", "type_b")
            .agg(
                F.max("na").alias("n_a"),
                F.max("nb").alias("n_b"),
                stable_round(
                    F.sum(term).cast("double"), 6
                ).alias("w1"),
            )
        )

    _DTW_SCHEMA = T.StructType(
        [
            T.StructField("sym_a", T.StringType()),
            T.StructField("sym_b", T.StringType()),
            T.StructField("n_days", T.LongType()),
            T.StructField("dtw", T.DoubleType()),
        ]
    )

    @register(
        "dtw_distance_daily_pairs",
        # Full oracle since r9 (was rows-only): the 2-D dynamic
        # program replays as an ANTI-DIAGONAL wavefront recursion.
        # Cell (i,j) depends on (i-1,j), (i,j-1) — diagonal d-1 — and
        # (i-1,j-1) — diagonal d-2 — so cells of one diagonal are
        # mutually independent and the recursive CTE computes one
        # diagonal per iteration: the working table carries the fresh
        # diagonal (i+j == wave) plus a re-emitted copy of the one
        # before (i+j == wave-1), every pair advancing in lockstep on
        # the global wave counter (max(wave) over the working set —
        # DuckDB permits aggregation over the recursive reference).
        # The banded cost grid is non-recursive prep; missing
        # predecessors coalesce to +infinity exactly like the
        # Python DP's band edges; the virtual origin (0,0) = 0.0 is
        # the seed row. Termination is natural: past the last
        # diagonal nothing is fresh and nothing is carried. Floats
        # are bit-stable cross-engine because the DP evaluation tree
        # per cell — abs(a_i - b_j) + min of three doubles — is
        # IDENTICAL regardless of schedule, and the z-normalized
        # inputs come from the exact_sum decimal idiom both engines
        # share. tests/test_ranking.py keeps the Python-DP equality
        # and metric-axiom laws.
        oracle=f"""
WITH RECURSIVE bars AS (
    SELECT event_type AS symbol, day, close FROM (
        SELECT event_type, date_trunc('day', ts) AS day,
               value AS close,
               row_number() OVER (
                   PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
), stats AS (
    SELECT symbol,
           {exact_sum_sql('close')} / count(*) AS mu,
           count(*) AS n,
           {exact_sum_sql('close * close')} AS ssq
    FROM bars GROUP BY symbol
), z AS (
    SELECT b.symbol,
           row_number() OVER (
               PARTITION BY b.symbol ORDER BY b.day) AS idx,
           (b.close - s.mu)
             / sqrt((s.ssq - s.n * s.mu * s.mu) / (s.n - 1)) AS zy
    FROM bars b JOIN stats s ON s.symbol = b.symbol
), sizes AS (
    SELECT symbol, count(*) AS len FROM z GROUP BY symbol
), prs AS (
    SELECT sa.symbol AS sym_a, sb.symbol AS sym_b,
           sa.len AS n, sb.len AS m
    FROM sizes sa JOIN sizes sb ON sa.symbol < sb.symbol
), grid AS (
    SELECT p.sym_a, p.sym_b, za.idx AS i, zb.idx AS j,
           abs(za.zy - zb.zy) AS cost
    FROM prs p
    JOIN z za ON za.symbol = p.sym_a
    JOIN z zb ON zb.symbol = p.sym_b
             AND zb.idx >= greatest(1, za.idx - {DTW_BAND})
             AND zb.idx <= least(p.m, za.idx + {DTW_BAND})
), dp(wave, sym_a, sym_b, i, j, v) AS (
    SELECT 0, sym_a, sym_b, 0, 0, CAST(0.0 AS DOUBLE) FROM prs
    UNION ALL
    SELECT * FROM (
        SELECT mw.w + 1 AS wave, g.sym_a, g.sym_b, g.i, g.j,
               g.cost + least(
                   coalesce(up.v, CAST('infinity' AS DOUBLE)),
                   coalesce(lf.v, CAST('infinity' AS DOUBLE)),
                   coalesce(dg.v, CAST('infinity' AS DOUBLE))) AS v
        FROM grid g
        CROSS JOIN (SELECT max(wave) AS w FROM dp) mw
        LEFT JOIN dp up ON up.i + up.j = up.wave
                       AND up.sym_a = g.sym_a AND up.sym_b = g.sym_b
                       AND up.i = g.i - 1 AND up.j = g.j
        LEFT JOIN dp lf ON lf.i + lf.j = lf.wave
                       AND lf.sym_a = g.sym_a AND lf.sym_b = g.sym_b
                       AND lf.i = g.i AND lf.j = g.j - 1
        LEFT JOIN dp dg ON dg.i + dg.j = dg.wave - 1
                       AND dg.sym_a = g.sym_a AND dg.sym_b = g.sym_b
                       AND dg.i = g.i - 1 AND dg.j = g.j - 1
        WHERE g.i + g.j = mw.w + 1
        UNION ALL
        SELECT wave + 1, sym_a, sym_b, i, j, v
        FROM dp WHERE i + j = wave
    )
)
SELECT d.sym_a, d.sym_b,
       CAST(p.n AS BIGINT) AS n_days,
       {stable_round_sql('d.v', 6)} AS dtw
FROM dp d
JOIN prs p ON p.sym_a = d.sym_a AND p.sym_b = d.sym_b
WHERE d.i = p.n AND d.j = p.m AND d.wave = d.i + d.j
""",
        doc=f"Dynamic-time-warping distance between every unordered "
        f"symbol pair's z-normalized daily close series (Sakoe-Chiba "
        f"band +/-{DTW_BAND} days, |.| local cost): the shape "
        f"similarity measure robust to temporal misalignment that "
        f"lag correlations (crosscorr_leadlag_hourly) cannot see. "
        f"Set side does everything data-sized — daily last-bar "
        f"aggregation, per-symbol z-normalization from decimal "
        f"sums, pair fan-out (symbol-universe-bounded broadcast) — "
        f"so each applyInPandas group is one pair x 2 calendar-"
        f"bounded series and the DP is O(days x band) per pair.",
    )
    def dtw_distance_daily_pairs(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from stock_trend_predictor_spark.functions.exact import exact_sum

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
        stats = bars.groupBy("symbol").agg(
            (exact_sum("close") / F.count(F.lit(1))).alias("mu"),
            F.count(F.lit(1)).alias("n"),
            exact_sum(F.col("close") * F.col("close")).alias("ssq"),
        )
        sd = F.sqrt(
            (F.col("ssq") - F.col("n") * F.col("mu") * F.col("mu"))
            / (F.col("n") - 1)
        )
        z = (
            bars.join(F.broadcast(stats), "symbol")
            .select(
                "symbol",
                "day",
                ((F.col("close") - F.col("mu")) / sd).alias("zy"),
            )
        )
        syms = z.select("symbol").distinct()
        sa = syms.select(F.col("symbol").alias("sym_a"))
        sb = syms.select(F.col("symbol").alias("sym_b"))
        pairs = sa.join(sb, F.col("sym_a") < F.col("sym_b"))
        tagged = z.join(
            F.broadcast(pairs),
            (F.col("symbol") == F.col("sym_a"))
            | (F.col("symbol") == F.col("sym_b")),
        ).select("sym_a", "sym_b", "symbol", "day", "zy")

        def dtw(pdf: pd.DataFrame) -> pd.DataFrame:
            sym_a = pdf["sym_a"].iloc[0]
            sym_b = pdf["sym_b"].iloc[0]
            a = pdf[pdf.symbol == sym_a].sort_values("day")["zy"].tolist()
            b = pdf[pdf.symbol == sym_b].sort_values("day")["zy"].tolist()
            n, m = len(a), len(b)
            inf = float("inf")
            prev = [inf] * (m + 1)
            prev[0] = 0.0
            for i in range(1, n + 1):
                cur = [inf] * (m + 1)
                lo = max(1, i - DTW_BAND)
                hi = min(m, i + DTW_BAND)
                for j in range(lo, hi + 1):
                    cost = abs(a[i - 1] - b[j - 1])
                    cur[j] = cost + min(
                        prev[j], cur[j - 1], prev[j - 1]
                    )
                prev = cur
            return pd.DataFrame(
                {
                    "sym_a": [sym_a],
                    "sym_b": [sym_b],
                    "n_days": [n],
                    "dtw": [prev[m]],
                }
            )

        out = tagged.groupBy("sym_a", "sym_b").applyInPandas(
            dtw, _DTW_SCHEMA
        )
        return out.select(
            "sym_a",
            "sym_b",
            "n_days",
            stable_round("dtw", 6).alias("dtw"),
        )


_register()
