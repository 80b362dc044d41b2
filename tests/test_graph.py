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


def _python_kcore(edges, k):
    """Brute-force peel; the k-core is unique so order is irrelevant."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj.pop(v):
                    adj[u].discard(v)
                changed = True
    return {v: len(ns) for v, ns in adj.items()}


def test_kcore_matches_brute_force(spark, sf_dir):
    from stock_trend_predictor_spark.plans import REGISTRY

    rows = REGISTRY["kcore_copurchase"].fn(spark, sf_dir).collect()
    got = {r.v: r.deg for r in rows}
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    o98 = {
        r.o_orderkey
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(
            "o_orderdate >= timestamp'1998-01-01'"
            " and o_orderdate < timestamp'1999-01-01'"
        )
        .collect()
    }
    from collections import defaultdict

    per_order = defaultdict(set)
    for r in li:
        if r.l_orderkey in o98:
            per_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in per_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                edges.add((a, b))
    truth = _python_kcore(edges, 12)
    assert got == truth
    for deg in got.values():
        assert deg >= 12


def test_kcore_operator_on_known_graph(spark):
    """Path 1-2-3-4 peels away entirely at k=2 once endpoints drop;
    a 4-clique plus a pendant vertex keeps exactly the clique."""
    from stock_trend_predictor_spark.operators.components import (
        kcore_subgraph,
    )

    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "a long, b long"
    )
    assert kcore_subgraph(path, k=2).count() == 0
    clique_pendant = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "a long, b long",
    )
    rows = kcore_subgraph(clique_pendant, k=3).collect()
    assert {r.v: r.deg for r in rows} == {1: 3, 2: 3, 3: 3, 4: 3}
