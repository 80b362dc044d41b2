"""Skew-mitigation laws: salted join / salted distinct must be
row-identical to their unsalted forms, and bucketed tables must join
without an exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_trend_predictor_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)


def _skewed_fact(spark):
    # 90% of rows on one key — the shape AQE/salting exists for
    rows = [("HOT" if i % 10 else f"k{i}", float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, "key string, v double")


def _dim(spark):
    keys = [("HOT", 1), ("k10", 2), ("k20", 3), ("k30", 4)]
    return spark.createDataFrame(keys, "key string, attr int")


def test_salted_join_equals_plain_join(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = fact.join(dim, "key").select("key", "v", "attr")
    salted = salted_join(fact, dim, "key").select("key", "v", "attr")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_outer(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = fact.join(dim, "key", "left").select("key", "v", "attr")
    salted = salted_join(fact, dim, "key", how="left").select("key", "v", "attr")
    assert sorted(map(tuple, plain.collect()), key=str) == sorted(
        map(tuple, salted.collect()), key=str
    )


def test_salted_count_distinct_exact(spark):
    fact = _skewed_fact(spark)
    plain = {
        r["key"]: r["n"]
        for r in fact.groupBy("key").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = {
        r["key"]: r["n_distinct"]
        for r in salted_count_distinct(fact, "key", "v").collect()
    }
    assert plain == salted


def test_pair_parallel_self_join_is_exact_pair_set(spark):
    """Triangle decomposition must enumerate every unordered
    within-block pair exactly once."""
    from itertools import combinations

    from stock_trend_predictor_spark.operators.skew import (
        pair_parallel_self_join,
    )

    rows = [(i, f"b{i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, blk string")
    got = sorted(
        (min(r["a_id"], r["b_id"]), max(r["a_id"], r["b_id"]))
        for r in pair_parallel_self_join(df, "blk", "id", n_splits=4)
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .collect()
    )
    want = sorted(
        (a, b)
        for blk in ("b0", "b1", "b2")
        for a, b in combinations(
            sorted(i for i, bl in rows if bl == blk), 2
        )
    )
    assert got == want


def test_pair_parallel_composite_block_and_spread(spark):
    """Composite (multi-column) block keys enumerate exactly the
    within-block pairs, and a single hot block's pairs land on more
    than one shuffle partition (the whole point of the triangle
    decomposition)."""
    from itertools import combinations

    from stock_trend_predictor_spark.operators.skew import (
        pair_parallel_self_join,
    )

    rows = [(i, f"l{i % 2}", i % 3) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, lang string, nc int")
    pairs = pair_parallel_self_join(
        df, block=["lang", "nc"], id_col="id", n_splits=4
    )
    got = sorted(
        (min(r["a_id"], r["b_id"]), max(r["a_id"], r["b_id"]))
        for r in pairs.select(
            F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id")
        ).collect()
    )
    want = sorted(
        pair
        for lg in ("l0", "l1")
        for nc in (0, 1, 2)
        for pair in combinations(
            sorted(i for i, l, n in rows if l == lg and n == nc), 2
        )
    )
    assert got == want

    # AQE coalesces the tiny test shuffle into one partition; disable
    # coalescing so the assertion sees the raw key distribution.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        hot = spark.createDataFrame(
            [(i, "only") for i in range(200)], "id long, blk string"
        )
        n_parts = (
            pair_parallel_self_join(hot, "blk", "id", n_splits=4)
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        assert n_parts > 1, "hot block's pair enumeration stayed on one task"
    finally:
        spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")


def test_salted_join_rejects_outer_modes(spark):
    import pytest

    fact, dim = _skewed_fact(spark), _dim(spark)
    with pytest.raises(ValueError, match="not supported"):
        salted_join(fact, dim, "key", how="full")
    with pytest.raises(ValueError, match="not supported"):
        salted_join(fact, dim, "key", how="right")


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Bucketed co-partitioned tables sort-merge-join with zero
    shuffle — the 100 TB co-location strategy, demonstrated on the
    local warehouse."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("x")
        )
        b = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("y")
        )
        a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bk_a")
        b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bk_b")
        joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
        plan = str(joined._jdf.queryExecution().executedPlan())
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffled"
        assert joined.count() == 10000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
