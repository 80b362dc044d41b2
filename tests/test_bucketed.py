"""Bucketed-table co-location: join and aggregate with zero
exchanges, result-identical to the shuffled equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_trend_predictor_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)
from stock_trend_predictor_spark.sources.tables import load_table

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(
        li.select("l_orderkey", "l_quantity", "l_extendedprice"),
        spark,
        "li_bkt",
        str(base / "li"),
        bucket_by=["l_orderkey"],
        n_buckets=N_BUCKETS,
    )
    write_bucketed(
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        spark,
        "ord_bkt",
        str(base / "ord"),
        bucket_by=["o_orderkey"],
        n_buckets=N_BUCKETS,
    )
    yield "li_bkt", "ord_bkt"
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")


def _joined(spark, li, ord_):
    return (
        li.join(ord_, li["l_orderkey"] == ord_["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
        )
    )


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    li_t, ord_t = bucketed_tables
    li = read_bucketed(spark, li_t)
    ord_ = read_bucketed(spark, ord_t)
    with_smj = _joined(spark, li, ord_)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = with_smj._jdf.queryExecution().executedPlan().toString()
        # The join itself must consume the storage partitioning: no
        # shuffle below the SortMergeJoin. (The groupBy above it is on
        # a different key, so ONE exchange total — for the agg — is
        # expected; zero under the join.)
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part, plan
        # and the result matches the plain-parquet join bit-for-bit
        li_p = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        )
        ord_p = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        expect = sorted(
            map(tuple, _joined(spark, li_p, ord_p).collect())
        )
        got = sorted(map(tuple, with_smj.collect()))
        assert got == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    li_t, _ = bucketed_tables
    li = read_bucketed(spark, li_t)
    agg = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucket_pruning_on_key_equality(spark, bucketed_tables):
    """An equality filter on the bucket key scans 1/n of the buckets
    (SelectedBucketsCount in the scan node)."""
    li_t, _ = bucketed_tables
    li = read_bucketed(spark, li_t)
    one = li.where(F.col("l_orderkey") == 7)
    # autoBucketedScan downgrades a filter-only query to a plain scan
    # (no join/agg consumes the partitioning) — force the bucketed
    # scan so the pruning machinery is observable.
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in plan, plan
    finally:
        spark.conf.set(key, prev)


def test_path_read_loses_bucketing_doc(spark, bucketed_tables, sf_dir):
    """Negative control for read_bucketed's warning: the same files
    read by PATH have no bucket metadata, so the groupBy plan gains an
    Exchange."""
    li_t, _ = bucketed_tables
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {li_t}")
        .where(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    df = spark.read.parquet(loc)
    agg = df.groupBy("l_orderkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
