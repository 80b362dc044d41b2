"""KMV (k-minimum-values) distinct-count sketch, oracle-exact.

Complements the HLL++ (sketch_cardinality) and CMS families in
plans/summary_queries.py with the third classic cardinality sketch —
and unlike HLL, KMV is ENGINE-REPRODUCIBLE: the estimate is a pure
function of the k smallest md5-derived hash values, so the DuckDB
oracle replays it bit-for-bit and the driver hash-gate applies (HLL's
estimate is implementation-defined, its query is law-tested instead).

Scale shape: "k smallest distinct hashes per key" is a combinable
aggregate — each partition keeps its local top-k minima and the merge
keeps the k smallest of the union, constant state like HLL. The batch
query expresses it as distinct + one ranked window per key, which AQE
handles fine at test SF; the streaming/huge-key swap is the same
bounded-heap per partition (documented, not a different algorithm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.functions.text import hash60, hash60_sql
from stock_trend_predictor_spark.sources.tables import load_table

#: sketch size — k smallest hash values retained per key.
KMV_K = 64

#: hash60 range: hashes are uniform on [0, 2^60).
_H_RANGE = float(1 << 60)


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "kmv_distinct_users",
        oracle=f"""
WITH h AS (
    SELECT DISTINCT event_type,
           {hash60_sql("CAST(user_id AS VARCHAR)")} AS hv
    FROM events
), ranked AS (
    SELECT event_type, hv,
           row_number() OVER (PARTITION BY event_type ORDER BY hv)
               AS rn
    FROM h
), sk AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hashes,
           max(CASE WHEN rn = {KMV_K} THEN hv END) AS hk
    FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
), exact AS (
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
    FROM events GROUP BY event_type
)
SELECT s.event_type, e.n_exact,
       {stable_round_sql(
           f"CASE WHEN s.n_hashes >= {KMV_K}"
           f" THEN ({KMV_K} - 1) / (CAST(s.hk AS DOUBLE) / {_H_RANGE!r})"
           f" ELSE CAST(s.n_hashes AS DOUBLE) END", 4)} AS kmv_estimate,
       {stable_round_sql(
           f"abs(CASE WHEN s.n_hashes >= {KMV_K}"
           f" THEN ({KMV_K} - 1) / (CAST(s.hk AS DOUBLE) / {_H_RANGE!r})"
           f" ELSE CAST(s.n_hashes AS DOUBLE) END - e.n_exact)"
           f" / e.n_exact", 4)} AS rel_error
FROM sk s JOIN exact e ON e.event_type = s.event_type
""",
        doc=f"KMV distinct-user sketch per event type, k={KMV_K}: "
        f"hash users with the shared 60-bit md5 hash, keep the k "
        f"smallest distinct values, estimate N = (k-1)/h_(k) with "
        f"h_(k) normalized to [0,1) — the Bar-Yossef et al. "
        f"bottom-k estimator. Keys with fewer than k distinct "
        f"hashes report the exact count (the sketch IS the set). "
        f"Exact distinct runs alongside so the row carries its own "
        f"relative error. Deterministic end-to-end (hash + ranked "
        f"comparison, one double division), hence oracle-exact — "
        f"the property HLL can't offer. At scale the ranked window "
        f"swaps for per-partition bounded k-minima merged "
        f"associatively; state is {KMV_K} longs per key.",
    )
    def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        h = ev.select(
            "event_type",
            hash60(F.col("user_id").cast("string")).alias("hv"),
        ).distinct()
        w = Window.partitionBy("event_type").orderBy("hv")
        ranked = h.select(
            "event_type", "hv", F.row_number().over(w).alias("rn")
        ).where(F.col("rn") <= KMV_K)
        sk = ranked.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_hashes"),
            F.max(
                F.when(F.col("rn") == KMV_K, F.col("hv"))
            ).alias("hk"),
        )
        exact = ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n_exact")
        )
        est = F.when(
            F.col("n_hashes") >= KMV_K,
            F.lit(float(KMV_K - 1))
            / (F.col("hk").cast("double") / F.lit(_H_RANGE)),
        ).otherwise(F.col("n_hashes").cast("double"))
        return (
            sk.join(exact, "event_type")
            .select(
                "event_type",
                "n_exact",
                stable_round(est, 4).alias("kmv_estimate"),
                stable_round(
                    F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4
                ).alias("rel_error"),
            )
        )


_register()
