"""SAX — Symbolic Aggregate approXimation of the daily price series.

The classic time-series-mining representation (Lin/Keogh 2003): z-
normalize the per-symbol daily series, Piecewise Aggregate Approximate
it into W equal segments, and map each segment mean to a letter via
the Gaussian equiprobable breakpoints. The resulting short string is
what motif discovery, anomaly search, and index structures consume
instead of the raw series.

Determinism: daily means, the normalization moments and the PAA
segment means are all decimal-summed (order-independent), and the
letter mapping is literal-breakpoint comparisons, so the string is
bit-stable across engines and partitionings. The final ordered
concatenation is the ordered-string-agg surface: DuckDB
``string_agg(... ORDER BY)``, Spark ``array_join(sort_array(
collect_list(struct(...))))`` — same string by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import DECIMAL_T
from stock_trend_predictor_spark.sources.tables import load_table

#: PAA segment count and the alphabet-4 Gaussian breakpoints.
SAX_SEGMENTS = 8
SAX_BREAKS = (-0.6745, 0.0, 0.6745)  # a | b | c | d


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    b1, b2, b3 = SAX_BREAKS

    @register(
        "sax_daily_symbols",
        oracle=f"""
WITH dm AS (
    SELECT event_type AS symbol,
           CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
           CAST(SUM(CAST(value AS {DECIMAL_T})) AS DOUBLE)
               / count(*) AS x
    FROM events WHERE value > 0 GROUP BY 1, 2
), st AS (
    SELECT symbol, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)
               / count(*) AS mx,
           sqrt(greatest(CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE)
                    / count(*)
                - pow(CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)
                          / count(*), 2), 0.0)) AS sd
    FROM dm GROUP BY symbol
), idx AS (
    SELECT symbol, x,
           row_number() OVER (PARTITION BY symbol ORDER BY day) - 1
               AS t
    FROM dm
), z AS (
    SELECT i.symbol,
           CAST(floor(i.t * {SAX_SEGMENTS}.0 / s.n) AS BIGINT) AS seg,
           (i.x - s.mx) / s.sd AS z
    FROM idx i JOIN st s ON s.symbol = i.symbol
), paa AS (
    SELECT symbol, seg,
           CAST(SUM(CAST(z AS DECIMAL(38,18))) AS DOUBLE) / count(*)
               AS pv,
           CAST(count(*) AS BIGINT) AS seg_days
    FROM z GROUP BY 1, 2
), sym AS (
    SELECT symbol, seg, seg_days,
           CASE WHEN pv < {b1} THEN 'a'
                WHEN pv < {b2} THEN 'b'
                WHEN pv < {b3} THEN 'c'
                ELSE 'd' END AS letter
    FROM paa
)
SELECT symbol,
       string_agg(letter, '' ORDER BY seg) AS sax,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(min(seg_days) AS BIGINT) AS min_seg_days
FROM sym GROUP BY symbol
""",
        doc=f"SAX symbolization per symbol: decimal-exact daily means "
        f"-> z-normalize with decimal moment sums -> {SAX_SEGMENTS}-"
        f"segment PAA (segment = floor(t*{SAX_SEGMENTS}/n), each "
        f"mean decimal-summed) -> alphabet-4 letters at the Gaussian "
        f"breakpoints {SAX_BREAKS}. Output is the {SAX_SEGMENTS}-"
        f"char motif string per symbol via ORDERED string "
        f"aggregation (sort_array(collect_list(struct)) — Spark's "
        f"listagg-with-ORDER-BY). Everything after the (symbol, "
        f"day) collapse runs on #symbols x #days rows; the string "
        f"is the index key a 100 TB motif search shuffles instead "
        f"of series.",
    )
    def sax_daily_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
        # value > 0: same bad-print exclusion _DAILIES_CTE applies —
        # zero ticks are data errors, not prices; keeps daily means
        # consistent across the volatility/EVT/spectral/symbolic tier
        ev = load_table(spark, sf_dir, "events").where(F.col("value") > 0)
        dm = ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.floor(F.unix_timestamp("ts") / F.lit(86400))
            .cast("long")
            .alias("day"),
        ).agg(
            (
                F.sum(F.col("value").cast(DECIMAL_T)).cast("double")
                / F.count(F.lit(1))
            ).alias("x")
        )
        st = dm.groupBy("symbol").agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mx"),
            # greatest(, 0): clamp the double-cancellation radicand —
            # a (near-)constant series would hand DuckDB's sqrt a tiny
            # negative and ABORT the oracle run (Spark returns NaN)
            F.sqrt(
                F.greatest(
                    F.sum(
                        (F.col("x") * F.col("x")).cast("decimal(38,18)")
                    ).cast("double")
                    / F.count(F.lit(1))
                    - F.pow(
                        F.sum(F.col("x").cast("decimal(38,18)")).cast(
                            "double"
                        )
                        / F.count(F.lit(1)),
                        2,
                    ),
                    F.lit(0.0),
                )
            ).alias("sd"),
        )
        idx = dm.select(
            "symbol",
            "x",
            (
                F.row_number().over(
                    Window.partitionBy("symbol").orderBy("day")
                )
                - 1
            ).alias("t"),
        )
        z = idx.join(st, "symbol").select(
            "symbol",
            F.floor(
                F.col("t") * F.lit(float(SAX_SEGMENTS)) / F.col("n")
            )
            .cast("long")
            .alias("seg"),
            ((F.col("x") - F.col("mx")) / F.col("sd")).alias("z"),
        )
        paa = z.groupBy("symbol", "seg").agg(
            (
                F.sum(F.col("z").cast("decimal(38,18)")).cast("double")
                / F.count(F.lit(1))
            ).alias("pv"),
            F.count(F.lit(1)).alias("seg_days"),
        )
        letter = (
            F.when(F.col("pv") < b1, "a")
            .when(F.col("pv") < b2, "b")
            .when(F.col("pv") < b3, "c")
            .otherwise("d")
        )
        sym = paa.select("symbol", "seg", "seg_days", letter.alias("letter"))
        return sym.groupBy("symbol").agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("seg", "letter"))
                    ),
                    lambda s: s["letter"],
                ),
                "",
            ).alias("sax"),
            F.count(F.lit(1)).alias("n_segments"),
            F.min("seg_days").alias("min_seg_days"),
        )


_register()
