"""Approximate-aggregate error bounds (sketches have no value oracle;
their contract is the error envelope)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_trend_predictor_spark.plans import REGISTRY
from stock_trend_predictor_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_approx_quantiles_within_error_bound(spark):
    approx = {
        r["o_orderpriority"]: (r["p50"], r["p95"], r["p99"])
        for r in REGISTRY["sketch_quantiles"].fn(spark, SF_DIR).collect()
    }
    exact = {
        r["o_orderpriority"]: r["p"]
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr(
                "percentile(o_totalprice, array(0.5, 0.95, 0.99))"
            ).alias("p")
        )
        .collect()
    }
    for k, ex in exact.items():
        for a, e in zip(approx[k], ex):
            assert abs(a - e) / e <= 0.02, f"{k}: {a} vs {e}"


def test_hll_rollup_merge_consistent(spark):
    """Merged sketches (union of per-group sketches) must estimate the
    SAME population as a sketch built directly over the raw data — the
    mergeability law the 100 TB rollup depends on. <=2% of exact."""
    rows = REGISTRY["sketch_cardinality_rollup"].fn(spark, SF_DIR).collect()
    got = {
        (r["orderstatus"], r["orderpriority"]): r["approx_customers"]
        for r in rows
    }
    orders = load_table(spark, SF_DIR, "orders")
    exact_total = orders.select("o_custkey").distinct().count()
    merged_total = got[("ALL", "ALL")]
    assert abs(merged_total - exact_total) / exact_total <= 0.02
    # every per-status merged estimate within 2% of its exact count
    exact_status = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for status, exact in exact_status.items():
        est = got[(status, "ALL")]
        assert abs(est - exact) / exact <= 0.02, f"{status}: {est} vs {exact}"
    # row count: fine cells + one per status + grand total
    n_fine = orders.select("o_orderstatus", "o_orderpriority").distinct().count()
    assert len(rows) == n_fine + len(exact_status) + 1


def test_hll_within_error_bound(spark):
    approx = {
        r["o_orderpriority"]: r["approx_customers"]
        for r in REGISTRY["sketch_cardinality"].fn(spark, SF_DIR).collect()
    }
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, e in exact.items():
        rel_err = abs(approx[k] - e) / e
        assert rel_err <= 0.05, f"{k}: approx {approx[k]} vs exact {e}"
