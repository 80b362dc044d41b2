"""Similarity-search tests: ANN recall vs the exact baseline, and the
vectorized (numpy pandas_udf) path vs the expression path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_trend_predictor_spark.ml.vectorized import (
    brute_force_topk_vectorized,
)
from stock_trend_predictor_spark.operators.similarity import (
    as_double,
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
    assert recall >= 0.8, f"LSH recall {recall} collapsed"
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


def test_ann_path_contract(spark):
    """The round-4 ANN contract, asserted at the bench scale factor
    (sf0.1, the RECALL.json protocol): the DECLARED ANN path (IVF,
    nlist=16/nprobe=2) must hold recall@10 >= 0.9 at candidate/probe
    fraction <= 0.15; the demoted LSH candidate-generator must hold
    recall >= 0.9 with its probe fraction published (no ceiling — its
    measured Pareto point is ~0.40, which is WHY it is not the ANN
    path; see operators/similarity.py)."""
    from pyspark.sql import functions as F

    from stock_trend_predictor_spark.operators.ivf import ivf_topk
    from stock_trend_predictor_spark.operators.similarity import (
        as_double,
        with_lsh_buckets,
        with_lsh_probes,
    )

    bench_sf = "/root/testdata/sf0.1"
    corpus = load_table(spark, bench_sf, "embeddings")
    queries = corpus.where(F.col("vec_id") < 8)
    n_corpus = corpus.count()
    n_queries = 8

    exact_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(corpus, queries, k=10).collect()
    }
    ivf_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(corpus, queries, k=10).collect()
    }
    ivf_recall = len(exact_pairs & ivf_pairs) / len(exact_pairs)
    assert ivf_recall >= 0.9, f"ANN-path (IVF) recall {ivf_recall} < 0.9"

    lsh_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(corpus, queries, k=10).collect()
    }
    lsh_recall = len(exact_pairs & lsh_pairs) / len(exact_pairs)
    assert lsh_recall >= 0.9, f"LSH recall {lsh_recall} < 0.9"

    # the composed IVF+PQ+refine pipeline must hold the same bar as
    # the declared path at the bench SF
    from stock_trend_predictor_spark.plans import REGISTRY

    ivfpq_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["ann_ivfpq_cosine"].fn(spark, bench_sf).collect()
    }
    ivfpq_recall = len(exact_pairs & ivfpq_pairs) / len(exact_pairs)
    assert ivfpq_recall >= 0.9, f"IVFPQ recall {ivfpq_recall} < 0.9"

    # IVF probe fraction: members of each query's nprobe nearest
    # clusters (same construction ivf_topk uses).
    from stock_trend_predictor_spark.operators.ivf import (
        _sq_dist_to,
        assign_clusters,
        kmeans_centroids,
    )

    cvec = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double("embedding").alias("cv"),
    )
    cents = kmeans_centroids(cvec, k=16, iters=2,
                             id_col="neighbor_id", vec_col="cv")
    assigned = assign_clusters(cvec, cents, "cv")
    qd = queries.select(
        F.col("vec_id").alias("query_id"),
        as_double("embedding").alias("qv"),
    ).withColumn(
        "_d", F.array(*[_sq_dist_to(F.col("qv"), cc) for cc in cents])
    )
    qprobe = qd.select(
        "query_id",
        F.explode(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.zip_with(
                            F.col("_d"),
                            F.sequence(F.lit(0), F.lit(len(cents) - 1)),
                            lambda d, i: F.struct(d.alias("d"),
                                                  i.alias("i")),
                        )
                    ),
                    lambda s: s["i"],
                ),
                1, 2,
            )
        ).alias("cid"),
    )
    n_ivf_cand = (
        assigned.join(F.broadcast(qprobe), "cid")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .count()
    )
    ivf_probe = n_ivf_cand / n_queries / n_corpus
    assert ivf_probe <= 0.15, f"ANN-path (IVF) probe {ivf_probe} > 0.15"

    c = with_lsh_buckets(cvec, "cv")
    q = with_lsh_probes(
        queries.select(
            F.col("vec_id").alias("query_id"),
            as_double("embedding").alias("qv"),
        ),
        "qv",
    )
    n_lsh_cand = (
        c.join(F.broadcast(q.select("query_id", "tbl", "bucket")),
               ["tbl", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .count()
    )
    lsh_probe = n_lsh_cand / n_queries / n_corpus
    # sanity ceiling only: demoted-LSH must stay better than the old
    # near-linear configuration (0.65), not meet the ANN-path bar
    assert lsh_probe <= 0.5, f"LSH probe {lsh_probe} regressed"


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


def test_mmr_selection_matches_python(spark, sf_dir):
    """The distributed MMR re-rank must equal an exact greedy Python
    MMR over the same candidates: same ids, same order, same scores."""
    import numpy as np

    from stock_trend_predictor_spark.plans import REGISTRY

    got = REGISTRY["mmr_diverse_topk"].fn(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    cands = brute_force_topk(emb, emb.where(F.col("vec_id") < 8), k=50).collect()
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    lam = 0.7
    by_q = {}
    for r in cands:
        by_q.setdefault(r.query_id, []).append((r.neighbor_id, r.sim))
    expect = {}
    for q, cl in by_q.items():
        cl.sort()  # neighbor_id order == operator's tie-break order
        ids = [c[0] for c in cl]
        rel = np.array([c[1] for c in cl])
        x = np.stack([vecs[i] for i in ids])
        norms = np.linalg.norm(x, axis=1)
        sims = (x @ x.T) / np.outer(norms, norms)
        chosen, max_to_sel = [], np.full(len(ids), -np.inf)
        avail = np.ones(len(ids), dtype=bool)
        sel = []
        for _ in range(10):
            pen = np.where(np.isfinite(max_to_sel), max_to_sel, 0.0) * (1 - lam)
            mmr = lam * rel - (pen if chosen else 0.0)
            mmr = np.where(avail, mmr, -np.inf)
            best = int(np.argmax(mmr))
            chosen.append(best)
            sel.append((ids[best], float(mmr[best])))
            avail[best] = False
            max_to_sel = np.maximum(max_to_sel, sims[:, best])
        expect[q] = sel
    assert got
    for r in got:
        nid, score = expect[r.query_id][r.mmr_rank - 1]
        assert r.neighbor_id == nid, (r.query_id, r.mmr_rank)
        assert abs(r.mmr_score - score) < 1e-5
    # diversity sanity: MMR must not simply replay the relevance order
    knn = {(r.query_id, r.rank): r.neighbor_id
           for r in REGISTRY["knn_bruteforce_cosine"].fn(spark, sf_dir).collect()}
    mmr_order = {(r.query_id, r.mmr_rank): r.neighbor_id for r in got}
    assert any(
        knn.get(k) != mmr_order.get(k) for k in mmr_order
    ), "MMR output identical to pure-relevance ranking"


def test_phrase_search_matches_python(spark, sf_dir):
    """Positional-index join == Python substring-over-token scan."""
    from stock_trend_predictor_spark.plans import REGISTRY
    from stock_trend_predictor_spark.plans.corpus_stats_queries import (
        PHRASE_W1,
        PHRASE_W2,
    )

    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in REGISTRY["phrase_search_positional"].fn(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    expect = {}
    for d in docs:
        toks = d.text.split(" ")
        pos = [
            i + 1
            for i in range(len(toks) - 1)
            if toks[i] == PHRASE_W1 and toks[i + 1] == PHRASE_W2
        ]
        if pos:
            expect[d.doc_id] = (len(pos), pos[0])
    assert got == expect and got  # non-empty at every SF


def test_ivf_maintained_recall_floor(spark):
    """The FORMAL freshness-bridge contract (r5 verdict #5,
    mirroring the r4 LSH demotion): the continuously-maintained
    index (streaming fold of two batches under a FROZEN half-corpus
    trainer, NO batch rebuild) is NOT the serving path — the
    periodic full retrain (`ann_ivf_cosine`, recall 1.000) is. The
    demotion is a measured CEILING, not a tuning gap: widening the
    serve-time probe budget at sf0.1 reads recall@10
    0.762 / 0.812 / 0.850 / 0.887 at nprobe 4 / 5 / 6 / 8 — still
    under the 0.9 ANN bar at probe fraction 0.5, where 'approximate'
    has stopped meaning anything; and letting assignments EVOLVE
    measures worse still (0.36-0.63, module docstring). This test
    pins the documented bridge floor at the contract nprobe=4:
    ~0.70 at sf0.001 (0.66 sf0.01 / 0.76 sf0.1), asserted at 0.6 to
    sit below the measured values but far above collapse."""
    from stock_trend_predictor_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    corpus = load_table(spark, sf, "embeddings")
    queries = corpus.where(F.col("vec_id") < 8)
    exact_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(corpus, queries, k=10).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["ann_ivf_maintained"].fn(spark, sf).collect()
    }
    recall = len(exact_pairs & got) / len(exact_pairs)
    assert recall >= 0.6, (
        f"maintained-IVF bridge recall {recall} fell below the "
        "pinned floor (documented ~0.70 @ nprobe=4, sf0.001)"
    )


def test_join_assignment_equals_literal_assignment(spark):
    """r5 verdict #4 law: the broadcast-join distance path (the
    past-the-codegen-cap strategy) must produce BIT-IDENTICAL cell
    assignments to the plan-literal path — same (a-b)*(a-b) left
    fold element-wise, so not just close: equal. Pinned on both the
    single-cell and the multiprobe form, with Lloyd-trained (not
    axis-aligned) centroids so ties and near-boundaries are real."""
    from stock_trend_predictor_spark.operators.ivf import (
        assign_clusters,
        assign_clusters_multiprobe,
        kmeans_centroids,
    )

    sf = "/root/testdata/sf0.001"
    corpus = load_table(spark, sf, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    cents = kmeans_centroids(corpus, k=12, iters=2, vec_col="v")

    lit = {
        (r["vec_id"], r["cid"])
        for r in assign_clusters(
            corpus, cents, "v", use_join=False
        ).collect()
    }
    joined = {
        (r["vec_id"], r["cid"])
        for r in assign_clusters(
            corpus, cents, "v", use_join=True
        ).collect()
    }
    assert lit == joined and lit

    lit_mp = {
        (r["vec_id"], r["cid"])
        for r in assign_clusters_multiprobe(
            corpus, cents, nprobe=3, vec_col="v", use_join=False
        ).collect()
    }
    join_mp = {
        (r["vec_id"], r["cid"])
        for r in assign_clusters_multiprobe(
            corpus, cents, nprobe=3, vec_col="v", use_join=True
        ).collect()
    }
    assert lit_mp == join_mp and lit_mp


def test_sample_trained_centroids_are_deterministic_and_valid(spark):
    """sample_mod trains Lloyd on the xxhash64 id-slice: the result
    must be reproducible run-to-run (pure function of ids) and every
    centroid must keep the corpus dimensionality; with sample_mod=1
    it must match the unsampled build exactly."""
    from stock_trend_predictor_spark.operators.ivf import (
        kmeans_centroids,
    )

    sf = "/root/testdata/sf0.001"
    corpus = load_table(spark, sf, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    a = kmeans_centroids(corpus, k=8, iters=2, vec_col="v", sample_mod=2)
    b = kmeans_centroids(corpus, k=8, iters=2, vec_col="v", sample_mod=2)
    assert a == b and len(a) == 8 and all(len(c) == 64 for c in a)
    full = kmeans_centroids(corpus, k=8, iters=2, vec_col="v")
    full1 = kmeans_centroids(corpus, k=8, iters=2, vec_col="v", sample_mod=1)
    assert full == full1


def test_two_level_assignment_laws(spark):
    """Hierarchical (IMI-style) assignment laws: (1) with a single
    group it IS the flat assignment (exact, bit-for-bit); (2) at the
    default sqrt(k) grouping with gprobe=2 it agrees with the exact
    flat argmin on >= 90% of vectors (measured 0.98+ on this corpus;
    floor sits well below to detect collapse, not luck); (3) exactly
    one cell per vector, all cells in range."""
    from stock_trend_predictor_spark.operators.ivf import (
        assign_clusters,
        assign_clusters_two_level,
        kmeans_centroids,
    )

    sf = "/root/testdata/sf0.01"
    corpus = load_table(spark, sf, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    cents = kmeans_centroids(corpus, k=16, iters=2, vec_col="v")
    flat = {
        r["vec_id"]: r["cid"]
        for r in assign_clusters(corpus, cents, "v").collect()
    }

    one_group = {
        r["vec_id"]: r["cid"]
        for r in assign_clusters_two_level(
            corpus, cents, n_groups=1, gprobe=1
        ).collect()
    }
    assert one_group == flat

    hier = {
        r["vec_id"]: r["cid"]
        for r in assign_clusters_two_level(corpus, cents).collect()
    }
    assert set(hier) == set(flat)  # one assignment per vector
    assert all(0 <= c < len(cents) for c in hier.values())
    agree = sum(hier[v] == flat[v] for v in flat) / len(flat)
    assert agree >= 0.9, f"two-level agreement {agree} collapsed"


def test_two_level_assignment_never_drops_vectors(spark):
    """Coverage contract under adversarial grouping: duplicated
    centroids with n_groups=k force empty centroid-groups after the
    driver-side Lloyd — probing is restricted to the dense non-empty
    group list, so every vector must still receive exactly one cell
    even at gprobe=1."""
    from stock_trend_predictor_spark.operators.ivf import (
        assign_clusters_two_level,
    )

    corpus = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = corpus.select("vec_id", as_double("embedding").alias("v"))
    base = [r["v"] for r in corpus.orderBy("vec_id").limit(3).collect()]
    cents = [list(map(float, base[0]))] * 3 + [
        list(map(float, base[1])),
        list(map(float, base[2])),
    ]
    out = assign_clusters_two_level(
        corpus, cents, n_groups=len(cents), gprobe=1
    ).collect()
    n = corpus.count()
    assert len(out) == n
    assert {r["vec_id"] for r in out} == set(range(n))
    assert all(0 <= r["cid"] < len(cents) for r in out)


def test_kmeans_centroids_are_partitioning_invariant(spark):
    """THE property the r6 decimal-sufficient-stat update buys:
    identical centroids — bit-for-bit, not approximately — under any
    physical layout of the corpus. Double summation in shuffle
    order (the old F.avg update) breaks this in the last ulp, which
    is exactly what kept the IVF-quantized queries un-oracle-able."""
    from stock_trend_predictor_spark.operators.ivf import (
        kmeans_centroids,
    )

    corpus = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    layouts = [
        corpus.repartition(1),
        corpus.repartition(13),
        corpus.repartition(32, "vec_id"),
        corpus.coalesce(2),
    ]
    builds = [
        kmeans_centroids(c, k=8, iters=3, vec_col="v") for c in layouts
    ]
    for other in builds[1:]:
        assert other == builds[0]
