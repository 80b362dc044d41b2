"""Mergeable-summary operators: Misra-Gries guarantees, gram-partial
covariance algebra, and the driver-side PCA tail."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stock_trend_predictor_spark.operators.summaries import (
    covariance_long,
    gram_partials,
    heavy_hitters_exact,
    misra_gries_candidates,
)
from stock_trend_predictor_spark.sources.tables import load_table


def _tokens(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    )


def _true_heavy(spark, sf_dir, frac):
    toks = _tokens(spark, sf_dir)
    total = toks.count()
    import math

    thr = math.ceil(frac * total)
    exact = (
        toks.groupBy("tok").count().where(F.col("count") >= thr).collect()
    )
    return {r["tok"]: r["count"] for r in exact}


def test_mg_candidates_superset_under_any_partitioning(spark, sf_dir):
    """Every true heavy hitter appears in the candidate set regardless
    of how rows land in partitions; candidate count is bounded by
    k * n_partitions."""
    frac = 0.02
    truth = _true_heavy(spark, sf_dir, frac)
    assert truth, "fixture should have heavy tokens"
    for n_parts in (1, 3, 16):
        toks = _tokens(spark, sf_dir).repartition(n_parts)
        cands = set(
            r["tok"]
            for r in misra_gries_candidates(toks, k=64).select("tok").collect()
        )
        assert set(truth) <= cands
        assert len(cands) <= 64 * n_parts


def test_heavy_hitters_exact_is_repartition_proof(spark, sf_dir):
    frac = 0.02
    truth = _true_heavy(spark, sf_dir, frac)
    for n_parts in (2, 16):
        got = {
            r["tok"]: r["freq"]
            for r in heavy_hitters_exact(
                _tokens(spark, sf_dir).repartition(n_parts),
                threshold_frac=frac,
            ).collect()
        }
        assert got == truth


def test_heavy_hitters_rejects_undersized_k(spark, sf_dir):
    with pytest.raises(ValueError, match="superset guarantee"):
        heavy_hitters_exact(
            _tokens(spark, sf_dir), threshold_frac=0.001, k=64
        )


def test_mg_counter_is_lower_bound(spark, sf_dir):
    """Single-partition MG: surviving counters never overcount."""
    toks = _tokens(spark, sf_dir).coalesce(1)
    truth = {
        r["tok"]: r["count"] for r in toks.groupBy("tok").count().collect()
    }
    for r in misra_gries_candidates(toks, k=8).collect():
        assert 0 < r["lower_bound"] <= truth[r["tok"]]


def _np_embeddings(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_covariance_long_matches_numpy(spark, sf_dir):
    x = _np_embeddings(spark, sf_dir)
    ref = np.cov(x, rowvar=False, ddof=1)
    emb = load_table(spark, sf_dir, "embeddings").repartition(7)
    got = covariance_long(emb).collect()
    assert len(got) == x.shape[1] * (x.shape[1] + 1) // 2
    for r in got:
        assert r["n"] == x.shape[0]
        assert r["cov"] == pytest.approx(ref[r["i"], r["j"]], abs=1e-9)


def test_gram_partials_row_count_is_partition_bounded(spark, sf_dir):
    """Each non-empty partition contributes exactly d(d+1)/2 rows —
    the summary size is independent of the rows it saw."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = 64
    tri = d * (d + 1) // 2
    for n_parts in (1, 5):
        cnt = gram_partials(emb.repartition(n_parts)).count()
        assert cnt == tri * n_parts


def test_pca_tail_from_covariance(spark, sf_dir):
    """Driver-side eigendecomposition of the d x d covariance result
    (the only thing that ever reaches the driver) reproduces numpy
    PCA's explained variance."""
    x = _np_embeddings(spark, sf_dir)
    rows = covariance_long(
        load_table(spark, sf_dir, "embeddings")
    ).collect()
    d = 64
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = r["cov"]
    evals = np.linalg.eigvalsh(cov)[::-1]
    ref = np.linalg.eigvalsh(np.cov(x, rowvar=False, ddof=1))[::-1]
    np.testing.assert_allclose(evals[:8], ref[:8], atol=1e-9)
    # top-8 explained-variance share is a meaningful spectrum summary
    assert 0.0 < evals[:8].sum() / evals.sum() <= 1.0


def test_ivf_semantic_dedup_recall(spark, sf_dir):
    """Label-free IVF-blocked near-dup pairs vs the exact all-pairs
    truth: every reported pair must be true (precision 1.0 — the
    verify step computes exact cosine), recall bounded below."""
    import itertools

    from stock_trend_predictor_spark.plans import REGISTRY

    got = {
        (r["vec_a"], r["vec_b"])
        for r in REGISTRY["dedup_embedding_ivf"].fn(spark, sf_dir).collect()
    }
    x = _np_embeddings(spark, sf_dir)
    n = np.linalg.norm(x, axis=1)
    sims = (x @ x.T) / np.outer(n, n)
    truth = {
        (i, j)
        for i, j in itertools.combinations(range(x.shape[0]), 2)
        if round(sims[i, j], 6) >= 0.35
    }
    assert truth, "fixture should contain near-dup pairs"
    assert got <= truth  # exact-verify step => no false positives
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, recall


def test_pca_projection_matches_numpy(spark, sf_dir):
    """The distributed PCA projection must equal numpy's: same top-2
    eigenvectors (after the same sign fix), same centered dot
    products, and a valid explained-variance split."""
    from stock_trend_predictor_spark.plans import REGISTRY

    rows = REGISTRY["embedding_pca_projection"].fn(spark, sf_dir).collect()
    x = _np_embeddings(spark, sf_dir)
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    comps = []
    for k in range(2):
        v = evecs[:, k]
        piv = int(np.argmax(np.abs(v)))
        comps.append(v if v[piv] > 0 else -v)
    proj = (x - mu) @ np.stack(comps, axis=1)
    got = {r.vec_id: r for r in rows}
    assert len(got) == x.shape[0]
    for i in range(x.shape[0]):
        r = got[i]
        assert abs(r.pc1 - proj[i, 0]) < 1e-4, i
        assert abs(r.pc2 - proj[i, 1]) < 1e-4, i
    one = rows[0]
    assert one.evr1 >= one.evr2 > 0.0
    assert one.evr1 + one.evr2 <= 1.0 + 1e-9
