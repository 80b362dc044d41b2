"""Similarity-search tests: ANN recall vs the exact baseline, and the
vectorized (numpy pandas_udf) path vs the expression path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_trend_predictor_spark.ml.vectorized import (
    brute_force_topk_vectorized,
)
from stock_trend_predictor_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from stock_trend_predictor_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_ann_recall_vs_bruteforce(spark, emb):
    queries = emb.where(F.col("vec_id") < 4)
    exact = brute_force_topk(emb, queries, k=5)
    approx = lsh_topk(emb, queries, k=5)

    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # every ANN hit must be a real corpus vector scored correctly; ANN
    # neighbors that ARE in the exact top-5 count toward recall
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.2, f"LSH recall {recall} collapsed"
    # ANN sims must match the exact sims for shared pairs
    exact_sim = {
        (r["query_id"], r["neighbor_id"]): r["sim"] for r in exact.collect()
    }
    for r in approx.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_sim:
            assert abs(r["sim"] - exact_sim[key]) < 1e-9


def test_ivf_recall_vs_bruteforce(spark, emb):
    from stock_trend_predictor_spark.operators.ivf import ivf_topk

    queries = emb.where(F.col("vec_id") < 4)
    exact = brute_force_topk(emb, queries, k=5)
    ivf = ivf_topk(emb, queries, k=5, n_clusters=4, nprobe=2, iters=2)

    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ivf_rows = ivf.collect()
    ivf_pairs = {(r["query_id"], r["neighbor_id"]) for r in ivf_rows}
    recall = len(exact_pairs & ivf_pairs) / len(exact_pairs)
    assert recall >= 0.3, f"IVF recall {recall} collapsed"
    # every IVF sim must equal the exact sim where pairs overlap
    exact_sim = {
        (r["query_id"], r["neighbor_id"]): r["sim"] for r in exact.collect()
    }
    for r in ivf_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_sim:
            assert abs(r["sim"] - exact_sim[key]) < 1e-9


def test_vectorized_matches_expression(spark, emb):
    qrow = emb.where(F.col("vec_id") == 0).collect()[0]
    qvec = [float(x) for x in qrow["embedding"]]

    expr_top = brute_force_topk(
        emb, emb.where(F.col("vec_id") == 0), k=8
    ).collect()
    np_top = brute_force_topk_vectorized(
        emb.where(F.col("vec_id") != 0), qvec, k=8
    ).collect()

    assert [r["neighbor_id"] for r in expr_top] == [
        r["neighbor_id"] for r in np_top
    ]
    for a, b in zip(expr_top, np_top):
        # BLAS vs sequential fold: identical to ~1e-12 relative
        assert abs(a["sim"] - b["sim"]) < 1e-9
