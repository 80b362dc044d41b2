"""Laws for operators/rank.py::prefix_scan_rank — the two-level
prefix scan must agree exactly with the single-window construction it
replaces, for every bucket source and for the partition_cols /
sum_col generalizations."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from stock_trend_predictor_spark.operators.rank import (
    prefix_scan_rank,
    quantile_bucket,
)


@pytest.fixture(scope="module")
def frame(spark):
    rng = random.Random(20260814)
    rows = [
        (
            i,
            rng.choice(["alpha", "beta", "gamma"]),
            rng.randint(0, 40),
            float(rng.randint(1, 999)) / 8.0,
        )
        for i in range(700)
    ]
    return spark.createDataFrame(
        rows, "id bigint, grp string, score int, weight double"
    )


def test_global_rank_matches_global_window(frame):
    got = prefix_scan_rank(
        frame, F.col("score"), ["score", "id"], rank_name="rk"
    )
    want = frame.withColumn(
        "rk", F.row_number().over(Window.orderBy("score", "id"))
    )
    assert (
        got.select("id", "rk")
        .exceptAll(want.select("id", "rk"))
        .count()
        == 0
    )


def test_partitioned_rank_and_cumsum_match_partitioned_window(frame):
    got = prefix_scan_rank(
        frame,
        F.col("score"),
        ["score", "id"],
        rank_name="rk",
        sum_col="weight",
        cumsum_name="cw",
        partition_cols=["grp"],
    )
    w = Window.partitionBy("grp").orderBy("score", "id")
    want = frame.withColumn(
        "rk", F.row_number().over(w)
    ).withColumn(
        "cw",
        F.sum("weight").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert (
        got.select("id", "rk", "cw")
        .exceptAll(want.select("id", "rk", "cw"))
        .count()
        == 0
    )


def test_descending_order_with_negated_bucket(frame):
    # the token_budget_selection shape: bucket = -value aligns with
    # a DESC ordering
    got = prefix_scan_rank(
        frame,
        (-F.col("score")).cast("int"),
        [F.col("score").desc(), F.col("id")],
        rank_name="rk",
        partition_cols=["grp"],
    )
    want = frame.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("grp").orderBy(
                F.col("score").desc(), F.col("id")
            )
        ),
    )
    assert (
        got.select("id", "rk")
        .exceptAll(want.select("id", "rk"))
        .count()
        == 0
    )


def test_hash_prefix_bucket_is_order_aligned(frame):
    # the epoch_shuffle_manifest shape: bucket = first hex byte of
    # the md5 order key itself
    keyed = frame.withColumn(
        "h", F.md5(F.col("id").cast("string"))
    )
    got = prefix_scan_rank(
        keyed,
        F.conv(F.substring("h", 1, 2), 16, 10).cast("int"),
        ["h", "id"],
        rank_name="rk",
    )
    want = keyed.withColumn(
        "rk", F.row_number().over(Window.orderBy("h", "id"))
    )
    assert (
        got.select("id", "rk")
        .exceptAll(want.select("id", "rk"))
        .count()
        == 0
    )


def test_quantile_bucket_equal_values_share_bucket(frame):
    b = frame.withColumn(
        "bkt", quantile_bucket(frame, "score", n_buckets=8)
    )
    assert (
        b.groupBy("score")
        .agg(F.count_distinct("bkt").alias("nb"))
        .where(F.col("nb") > 1)
        .count()
        == 0
    )
    # and bucket ids are order-aligned with the value
    viol = (
        b.groupBy("bkt")
        .agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
        .alias("a")
        .join(
            b.groupBy("bkt")
            .agg(F.min("score").alias("lo"))
            .alias("b"),
            F.col("a.bkt") < F.col("b.bkt"),
        )
        .where(F.col("a.hi") > F.col("b.lo"))
    )
    assert viol.count() == 0


def test_chunk_manifest_covers_every_token(spark, sf_dir):
    """Chunk-grid laws: windows tile [1, n] with exactly W-S overlap
    between neighbors, ids are dense from 0, and the only partial
    chunk is the last one."""
    from stock_trend_predictor_spark.plans.span_queries import (
        S_CHUNK,
        W_CHUNK,
        chunk_manifest,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_tok = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    c = chunk_manifest(docs)
    per_doc = c.groupBy("doc_id").agg(
        F.min("tok_start").alias("first_start"),
        F.max("tok_end").alias("last_end"),
        F.count(F.lit(1)).alias("k"),
        F.max("chunk_id").alias("max_id"),
        F.sum(F.when(F.col("is_partial"), 1).otherwise(0)).alias(
            "n_partial"
        ),
    )
    j = per_doc.join(n_tok, "doc_id")
    bad = j.where(
        (F.col("first_start") != 1)
        | (F.col("last_end") != F.col("n"))
        | (F.col("max_id") != F.col("k") - 1)
        | (F.col("n_partial") > 1)
    )
    assert bad.count() == 0
    # neighbor overlap is exactly W-S wherever a successor exists
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("chunk_id")
    succ = c.withColumn("next_start", F.lead("tok_start").over(w)).where(
        F.col("next_start").isNotNull()
    )
    assert (
        succ.where(
            F.col("next_start") - F.col("tok_start") != S_CHUNK
        ).count()
        == 0
    )
    full = c.where(~F.col("is_partial"))
    assert (
        full.where(
            F.col("tok_end") - F.col("tok_start") + 1 != W_CHUNK
        ).count()
        == 0
    )


def test_top_k_prune_matches_unpruned_rank(frame):
    """top_k must be a pure FILTER on the unpruned result: the
    bucket-level offset prune (drop whole buckets whose carry-in is
    already >= k before the window) and the final rank filter may
    never change a surviving row's rank — per group, for every bucket
    source, including ties broken by id."""
    full = prefix_scan_rank(
        frame,
        quantile_bucket(frame, "weight", 16),
        ["weight", "id"],
        rank_name="rk",
        partition_cols=["grp"],
    )
    want = {
        (r["grp"], r["id"], r["rk"])
        for r in full.collect()
        if r["rk"] <= 7
    }
    pruned = prefix_scan_rank(
        frame,
        quantile_bucket(frame, "weight", 16),
        ["weight", "id"],
        rank_name="rk",
        partition_cols=["grp"],
        top_k=7,
    )
    got = {(r["grp"], r["id"], r["rk"]) for r in pruned.collect()}
    assert got == want and got
    # and the global (unpartitioned) form
    g_want = {
        (r["id"], r["rk"])
        for r in prefix_scan_rank(
            frame, F.col("score"), ["score", "id"], rank_name="rk"
        ).collect()
        if r["rk"] <= 25
    }
    g_got = {
        (r["id"], r["rk"])
        for r in prefix_scan_rank(
            frame,
            F.col("score"),
            ["score", "id"],
            rank_name="rk",
            top_k=25,
        ).collect()
    }
    assert g_got == g_want and len(g_got) == 25
