"""Bloom-filter membership with a MEASURED false-positive rate.

Spark uses Bloom filters internally (runtime row-group skipping, the
bloom-join injection plan-asserted in tests/test_plans.py); this query
builds one as data so its quality is observable: m bits, k hashes from
the shared md5-derived double-hashing scheme h_i = (h1 + i*h2) mod m
(Kirsch-Mitzenmacher), members = purchasing users, probes = a fixed set of synthetic keys
from a disjoint namespace ('probe:<i>' can never collide with a
numeric user id string), so every probe is a guaranteed non-member
and the measured rate is purely the filter's false-positive rate.
Because every bit position is a pure hash expression, the
DuckDB oracle replays the filter bit-for-bit — the sketch is
engine-reproducible, like KMV and unlike HLL.

Scale shape: the "filter" is the distinct set of set bit positions
(<= m rows, here {M_BITS}), broadcast to the probe side; probes fan
out k rows each and reduce immediately. State is m bits no matter how
many members — the whole point of the sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.functions.text import (
    hash28_sql,
    hash60,
    hash60_sql,
)
from stock_trend_predictor_spark.sources.tables import (
    load_table,
    materialize_once,
)

#: filter size in bits and number of hash functions.
M_BITS = 4096
K_HASHES = 3

#: synthetic non-member probes (namespace-disjoint from user ids).
N_PROBES = 2000


def _hash2(col):
    """Second, odd-valued hash for Kirsch-Mitzenmacher double hashing
    (odd => coprime with the power-of-two m, so the k probes are
    distinct mod m)."""
    from stock_trend_predictor_spark.functions.text import hash28

    return hash28(F.concat(F.lit("b:"), col)) * 2 + 1


def _hash2_sql(expr: str) -> str:
    inner = hash28_sql(f"('b:' || {expr})")
    return f"({inner} * 2 + 1)"


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    probes_sql = ", ".join(str(i) for i in range(K_HASHES))

    @register(
        "bloom_filter_fpr",
        oracle=f"""
WITH members AS (
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
), nonmembers AS (
    SELECT 'probe:' || CAST(pid AS VARCHAR) AS key
    FROM (SELECT unnest(generate_series(0, {N_PROBES} - 1)) AS pid)
), mh AS (
    SELECT user_id,
           {hash60_sql("CAST(user_id AS VARCHAR)")} AS h1,
           {_hash2_sql("CAST(user_id AS VARCHAR)")} AS h2
    FROM members
), bits AS (
    SELECT DISTINCT (h1 + i * h2) % {M_BITS} AS bit
    FROM mh CROSS JOIN (SELECT unnest([{probes_sql}]) AS i) g
), ph AS (
    SELECT key,
           {hash60_sql("key")} AS h1,
           {_hash2_sql("key")} AS h2
    FROM nonmembers
), probe AS (
    SELECT p.key,
           CAST(count(b.bit) AS BIGINT) AS n_hit
    FROM ph p
    CROSS JOIN (SELECT unnest([{probes_sql}]) AS i) g
    LEFT JOIN bits b ON b.bit = (p.h1 + g.i * p.h2) % {M_BITS}
    GROUP BY p.key
), agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(count(*) FILTER (WHERE n_hit = {K_HASHES}) AS BIGINT)
               AS n_false_pos
    FROM probe
), sizes AS (
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM members) AS n_members,
           (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set
)
SELECT s.n_members, s.n_bits_set, a.n_probes, a.n_false_pos,
       {stable_round_sql(
           'CAST(a.n_false_pos AS DOUBLE) / a.n_probes', 6)}
           AS measured_fpr,
       {stable_round_sql(
           f'pow(CAST(s.n_bits_set AS DOUBLE) / {M_BITS}, {K_HASHES})',
           6)} AS predicted_fpr
FROM sizes s CROSS JOIN agg a
""",
        doc=f"Bloom filter (m={M_BITS} bits, k={K_HASHES} double-"
        f"hashed probes) built over purchasing users and probed "
        f"with {N_PROBES} namespace-disjoint synthetic keys "
        f"(guaranteed non-members — no anti-join needed), "
        f"reporting the MEASURED false-positive rate next to the "
        f"load-factor prediction (set_fraction^k). Bit positions "
        f"are (h1 + i*h2) mod m from the shared md5 hashes, so "
        f"filter and verdicts are engine-reproducible and oracle-"
        f"exact. The filter materializes as <= m distinct bit rows "
        f"(broadcast side); probes fan out k rows and aggregate — "
        f"nothing in the plan grows with member count beyond one "
        f"distinct.",
    )
    def bloom_filter_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        # members feeds both the bit-set and n_members; bits feeds the
        # probe join and n_bits_set — both are bounded (distinct users
        # / <= m rows) and materialized once instead of re-scanning
        # events per consumer.
        members = materialize_once(
            ev.where(F.col("event_type") == "purchase")
            .select("user_id")
            .distinct()
        )
        nonmembers = spark.range(N_PROBES).select(
            F.concat(F.lit("probe:"), F.col("id").cast("string")).alias(
                "key"
            )
        )
        uid = F.col("user_id").cast("string")

        i = F.explode(
            F.array(*[F.lit(j) for j in range(K_HASHES)])
        ).alias("i")
        bits = (
            members.select(
                hash60(uid).alias("h1"), _hash2(uid).alias("h2")
            )
            .select("h1", "h2", i)
            .select(
                ((F.col("h1") + F.col("i") * F.col("h2")) % M_BITS).alias(
                    "bit"
                )
            )
            .distinct()
        )
        bits = materialize_once(bits)
        probe = (
            nonmembers.select(
                "key",
                hash60(F.col("key")).alias("h1"),
                _hash2(F.col("key")).alias("h2"),
            )
            .select("key", "h1", "h2", i)
            .select(
                "key",
                ((F.col("h1") + F.col("i") * F.col("h2")) % M_BITS).alias(
                    "bit"
                ),
            )
            .join(F.broadcast(bits.withColumn("hit", F.lit(1))), "bit", "left")
            .groupBy("key")
            .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("n_hit"))
        )
        agg = probe.agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(
                F.when(F.col("n_hit") == K_HASHES, 1).otherwise(0)
            ).alias("n_false_pos"),
        )
        sizes = members.agg(
            F.count(F.lit(1)).alias("n_members")
        ).crossJoin(bits.agg(F.count(F.lit(1)).alias("n_bits_set")))
        return sizes.crossJoin(agg).select(
            "n_members",
            "n_bits_set",
            "n_probes",
            "n_false_pos",
            stable_round(
                F.col("n_false_pos").cast("double") / F.col("n_probes"), 6
            ).alias("measured_fpr"),
            stable_round(
                F.pow(
                    F.col("n_bits_set").cast("double") / F.lit(M_BITS),
                    F.lit(K_HASHES),
                ),
                6,
            ).alias("predicted_fpr"),
        )


_register()
