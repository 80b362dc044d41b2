"""PageRank operator laws."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_trend_predictor_spark.operators.components import pagerank


def test_pagerank_mass_conserved(spark):
    """With dangling redistribution, total rank mass stays 1."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("d", "a")],
        "src string, dst string",
    )
    ranks = pagerank(edges, iters=10)
    total = ranks.agg(F.sum("r")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-12)


def test_pagerank_cycle_is_uniform(spark):
    """On a directed cycle every node has the same rank (symmetry),
    and it equals 1/N exactly in the limit — after a few iterations
    already to high precision since the start is uniform."""
    n = 5
    edges = spark.createDataFrame(
        [(f"v{i}", f"v{(i + 1) % n}") for i in range(n)],
        "src string, dst string",
    )
    ranks = pagerank(edges, iters=3).collect()
    for r in ranks:
        assert r["r"] == pytest.approx(1.0 / n, abs=1e-12)


def test_pagerank_repartition_proof(spark):
    """Rounded ranks are identical at shuffle widths 2 and 16."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("d", "a"), ("c", "a")],
        "src string, dst string",
    )

    def run(n_parts):
        r = pagerank(edges.repartition(n_parts), iters=6)
        return {
            row["node"]: round(row["r"], 9) for row in r.collect()
        }

    assert run(2) == run(16)


def test_pagerank_sink_attracts_mass(spark):
    """A node every other node points at outranks its pointers."""
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")],
        "src string, dst string",
    )
    got = {r["node"]: r["r"] for r in pagerank(edges, iters=10).collect()}
    assert got["hub"] > got["b"]
    assert got["hub"] > got["c"]


def test_triangle_count_known_graphs(spark):
    """K4 has 4 triangles; adding a pendant star changes nothing."""
    from stock_trend_predictor_spark.operators.components import (
        oriented_triangle_count,
    )

    k4 = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
    star = [(1, 10 + i) for i in range(5)]  # pendant leaves: no new tri
    edges = spark.createDataFrame(k4 + star, "a long, b long")
    row = oriented_triangle_count(edges).collect()[0]
    assert row["n_triangles"] == 4
    assert row["n_edges"] == 11
    assert row["n_vertices"] == 9
    # wedges: deg(1)=8 -> 28, deg(2..4)=3 -> 3 each, leaves deg1 -> 0
    assert row["n_wedges"] == 28 + 3 * 3


def test_triangle_count_triangle_free(spark):
    """A bipartite (square) graph has zero triangles."""
    from stock_trend_predictor_spark.operators.components import (
        oriented_triangle_count,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "a long, b long"
    )
    row = oriented_triangle_count(edges).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 4
