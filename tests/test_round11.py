"""Round-11 optimization laws.

Optimization round 1 changes correctness may not ride on: the CC
path-shortcut augmentation (labels-as-edges per batch) and the
broadcast-edges round join must leave the fixpoint — min reachable id
per node — exactly where the plain per-round loop had it, on the graph
shapes that motivated them (high-diameter chains) and on the shapes
the folds actually see (stars, merged components).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_trend_predictor_spark.operators.components import (
    connected_components,
)


def _labels(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_cc_chain_converges_to_min(spark):
    """A diameter-50 chain — the shape that needed 28+ plain rounds at
    sf0.1 and silently hit the old max_iter cliff — must fully
    converge (every node labeled with the chain's minimum id), well
    inside max_iter thanks to the label-tree augmentation (reach
    multiplies per batch instead of adding 1 per round)."""
    n = 51
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = _labels(connected_components(edges))
    assert got == {i: 0 for i in range(n)}


def test_cc_broadcast_edges_identical(spark):
    """broadcast_edges changes the join strategy, never the labels:
    both spellings equal each other and the exact component minima on
    a graph mixing a chain, a star, and singleton pairs."""
    rows = (
        [(i, i + 1) for i in range(20)]  # chain 0..20
        + [(100, 100 + j) for j in range(1, 6)]  # star at 100
        + [(200, 201), (300, 301)]  # pairs
    )
    edges = spark.createDataFrame(rows, "src long, dst long")
    plain = _labels(connected_components(edges, broadcast_edges=False))
    bcast = _labels(connected_components(edges, broadcast_edges=True))
    want = {i: 0 for i in range(21)}
    want.update({100 + j: 100 for j in range(6)})
    want.update({200: 200, 201: 200, 300: 300, 301: 300})
    assert plain == want
    assert bcast == want


def test_cc_augmentation_respects_components(spark):
    """Label edges must never leak labels ACROSS components: two
    interleaved chains (even ids / odd ids) stay separate."""
    edges = spark.createDataFrame(
        [(2 * i, 2 * i + 2) for i in range(15)]
        + [(2 * i + 1, 2 * i + 3) for i in range(15)],
        "src long, dst long",
    )
    got = _labels(connected_components(edges))
    for node, comp in got.items():
        assert comp == (0 if node % 2 == 0 else 1)


def test_cc_string_ids_chain(spark):
    """The entity-resolution caller feeds STRING node ids; the
    augmented loop (null-cast in the fan struct, `<` probe) must keep
    working for them on a high-diameter graph."""
    n = 30
    edges = spark.createDataFrame(
        [(f"v{i:03d}", f"v{i + 1:03d}") for i in range(n - 1)],
        "src string, dst string",
    )
    got = _labels(connected_components(edges, broadcast_edges=True))
    assert got == {f"v{i:03d}": "v000" for i in range(n)}


def test_cc_rounds_scale_log_not_linear(spark):
    """The augmentation's point: a diameter-d chain converges in
    O(log d) ROUNDS, not d — pinned by giving the loop a max_iter far
    below the diameter and requiring full convergence anyway (a
    199-diameter chain fully labels within 32 rounds; the plain
    per-round loop would need 199)."""
    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = _labels(connected_components(edges, max_iter=32))
    assert got == {i: 0 for i in range(n)}


def test_semdedup_edges_filter_before_dedup_identity(spark):
    """The r11 edges reorder (threshold before any pair dedup) must
    produce the identical edge SET as dedup-then-threshold: multiprobe
    co-occurring copies of a pair carry bit-identical sims, so the
    two orders agree. Exercised through _scored_new_vs_all directly."""
    from stock_trend_predictor_spark.operators.ivf import (
        assign_clusters_multiprobe,
    )
    from stock_trend_predictor_spark.operators.similarity import l2norm
    from stock_trend_predictor_spark.streaming.knngraph_maintenance import (
        _scored_new_vs_all,
    )

    vecs = [
        (i, [float((i * 7 + d * 3) % 11) / 11.0 + 0.1 for d in range(8)])
        for i in range(40)
    ]
    df = (
        spark.createDataFrame(vecs, "vec_id long, v array<double>")
        .withColumn("nrm", l2norm(F.col("v")))
    )
    cents = [
        [0.3] * 8,
        [0.8] * 8,
        [0.1, 0.9] * 4,
        [0.9, 0.1] * 4,
    ]
    m = assign_clusters_multiprobe(df, cents, nprobe=3).select(
        "vec_id", "v", "nrm", "cid"
    )
    thr = 0.9

    def canon(scored):
        return set(
            (r["doc_a"], r["doc_b"])
            for r in scored.where(F.col("sim") >= thr)
            .select(
                F.least("query_id", "neighbor_id").alias("doc_a"),
                F.greatest("query_id", "neighbor_id").alias("doc_b"),
            )
            .distinct()
            .collect()
        )

    old = canon(_scored_new_vs_all(m, m, cell_cap=3000, dedup=True))
    new = canon(_scored_new_vs_all(m, m, cell_cap=3000, dedup=False))
    assert old == new and len(new) > 0
