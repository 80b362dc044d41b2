"""Law tests for plans/ivm_queries: the delta-join maintenance algebra
and the skew-profile invariants (oracle parity proves cross-engine
equality; these pin the semantics directly)."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from stock_trend_predictor_spark.plans import REGISTRY
from stock_trend_predictor_spark.plans.ivm_queries import (
    IVM_DATE_CUT,
    IVM_LI_MOD,
    IVM_LI_NEW,
)


def test_ivm_merge_equals_monolithic_recompute(spark, sf_dir):
    """The four-partial merge must equal a direct join+agg computed
    in Python from the raw rows."""
    orders = {
        r.o_orderkey: r.o_orderpriority
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    agg = defaultdict(lambda: [0, 0.0])
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        pri = orders.get(r.l_orderkey)
        if pri is None:
            continue
        cell = agg[(pri, r.l_returnflag)]
        cell[0] += 1
        cell[1] += r.l_extendedprice * (1.0 - r.l_discount)
    rows = REGISTRY["incremental_join_view"].fn(spark, sf_dir).collect()
    got = {(r.o_orderpriority, r.l_returnflag): r for r in rows}
    assert set(got) == set(agg)
    for key, (n, rev) in agg.items():
        assert got[key].n_rows == n
        assert abs(got[key].revenue - rev) < 1e-3


def test_ivm_deltas_are_all_nonempty(spark, sf_dir):
    """The split points must exercise every term of the delta algebra
    — if a delta quadrant is empty the law proves less than claimed."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        (
            F.col("o_orderdate") >= F.lit(IVM_DATE_CUT).cast("timestamp")
        ).alias("o_new"),
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        (F.col("l_orderkey") % IVM_LI_MOD < IVM_LI_NEW).alias("l_new"),
    )
    quad = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_new", "l_new")
        .count()
        .collect()
    )
    assert len(quad) == 4 and all(r["count"] > 0 for r in quad)


def test_skew_profile_matches_python(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    rows = {
        r.join_key: r
        for r in REGISTRY["join_key_skew_profile"].fn(spark, sf_dir).collect()
    }
    for key in ("l_orderkey", "l_partkey"):
        counts = Counter(getattr(r, key) for r in li)
        r = rows[key]
        assert r.n_distinct_keys == len(counts)
        assert r.n_rows == len(li)
        assert r.max_multiplicity == max(counts.values())
        top10 = sum(
            c for _, c in sorted(
                counts.items(), key=lambda kv: (-kv[1], kv[0])
            )[:10]
        )
        assert abs(r.top10_share - top10 / len(li)) < 1e-6
        assert r.p50_multiplicity <= r.p99_multiplicity <= r.max_multiplicity
