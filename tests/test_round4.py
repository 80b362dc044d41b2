"""Round-4 additions: Mann-Whitney U, product quantization (codes +
ADC search), curriculum ordering."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stock_trend_predictor_spark.sources.tables import load_table


def test_mann_whitney_matches_python(spark, sf_dir):
    """U statistic and tie-corrected z must equal a direct Python
    computation (average ranks, full tie correction, no continuity
    correction) for every symbol pair."""
    from collections import defaultdict

    from stock_trend_predictor_spark.plans import REGISTRY
    from stock_trend_predictor_spark.sources.tables import ticks

    got = {
        (r.sym_a, r.sym_b): r
        for r in REGISTRY["mann_whitney_u_pairwise"].fn(spark, sf_dir).collect()
    }
    assert got

    by_sym = defaultdict(list)
    for r in (
        ticks(spark, sf_dir)
        .where(F.col("open").isNotNull())
        .select("symbol", (F.col("close") - F.col("open")).alias("r"))
        .collect()
    ):
        by_sym[r.symbol].append(r.r)

    syms = sorted(by_sym)
    for i, a in enumerate(syms):
        for b in syms[i + 1:]:
            xa, xb = by_sym[a], by_sym[b]
            allv = sorted(
                [(v, 1) for v in xa] + [(v, 0) for v in xb]
            )
            # average ranks with ties
            ra = 0.0
            tie_sum = 0
            idx = 0
            while idx < len(allv):
                j = idx
                while j < len(allv) and allv[j][0] == allv[idx][0]:
                    j += 1
                t = j - idx
                avg_rank = idx + 1 + (t - 1) / 2.0
                ra += avg_rank * sum(tag for _, tag in allv[idx:j])
                tie_sum += t * t * t - t
                idx = j
            na, nb = len(xa), len(xb)
            n = na + nb
            ua = ra - na * (na + 1) / 2.0
            mu = na * nb / 2.0
            sigma = (
                na * nb / 12.0 * ((n + 1) - tie_sum / (n * (n - 1)))
            ) ** 0.5
            z = (ua - mu) / sigma
            row = got[(a, b)]
            assert row.n_a == na and row.n_b == nb
            assert abs(row.u_a - ua) < 1e-4, (a, b)
            assert abs(row.z - z) < 1e-5, (a, b)


@pytest.fixture(scope="module")
def pq_setup(spark):
    from stock_trend_predictor_spark.operators.pq import (
        pq_codebooks,
        pq_encode,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    books = pq_codebooks(emb)
    enc = pq_encode(emb, books).collect()
    x = np.stack(
        [
            np.asarray(r.embedding, dtype=np.float64)
            for r in emb.orderBy("vec_id").collect()
        ]
    )
    return emb, books, enc, x


def test_pq_matches_numpy_replication(pq_setup):
    """Codes and reconstruction MSE must equal an exact local numpy
    replication of the deterministic Lloyd + assignment."""
    from stock_trend_predictor_spark.operators.pq import (
        PQ_ITERS,
        PQ_KSUB,
        PQ_M,
    )

    _, books, enc, x = pq_setup
    n, d = x.shape
    m, ksub, dsub = PQ_M, PQ_KSUB, d // PQ_M
    cb = x[:ksub].reshape(ksub, m, dsub).transpose(1, 0, 2).copy()
    xs = x.reshape(n, m, dsub)
    for _ in range(PQ_ITERS):
        cn2 = (cb * cb).sum(axis=2)
        dots = np.einsum("bmd,mkd->bmk", xs, cb)
        codes = (cn2[None] - 2 * dots).argmin(axis=2)
        for j in range(m):
            for c in range(ksub):
                mask = codes[:, j] == c
                if mask.any():
                    cb[j, c] = xs[mask, j].mean(axis=0)
    # codebooks agree (mean computed distributed vs locally: Spark
    # avg() over doubles vs numpy mean — equal to float tolerance)
    assert np.allclose(np.asarray(books), cb, atol=1e-9)
    cn2 = (cb * cb).sum(axis=2)
    dots = np.einsum("bmd,mkd->bmk", xs, cb)
    codes = (cn2[None] - 2 * dots).argmin(axis=2)
    recon = cb[np.arange(m)[None, :], codes]
    mse = ((xs - recon) ** 2).mean(axis=(1, 2))
    got = {r.vec_id: r for r in enc}
    for vid in range(n):
        assert list(got[vid].codes) == list(codes[vid]), vid
        assert abs(got[vid].recon_mse - mse[vid]) < 1e-9

    # compression must actually help: mean recon MSE well under the
    # per-dim variance (the 1-centroid baseline)
    var = x.var(axis=0).mean()
    assert mse.mean() < 0.5 * var


def test_pq_adc_refine_recall(spark):
    """The ADC + exact-refine pipeline must hold recall@10 >= 0.9 vs
    brute force at the test SF (published per round for the bench SF
    in RECALL.json)."""
    from stock_trend_predictor_spark.operators.similarity import (
        brute_force_topk,
    )
    from stock_trend_predictor_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(
            emb, emb.where(F.col("vec_id") < 8), k=10
        ).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_pq_adc_cosine"].fn(spark, sf).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"PQ+refine recall {recall}"


def test_curriculum_order_is_stratified_permutation(spark, sf_dir):
    from stock_trend_predictor_spark.plans import REGISTRY

    rows = REGISTRY["curriculum_quality_order"].fn(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    assert sorted(r.curriculum_pos for r in rows) == list(range(1, n + 1))
    # deciles are contiguous along the curriculum and balanced +-1
    by_dec = {}
    for r in rows:
        by_dec.setdefault(r.decile, []).append(r.curriculum_pos)
    sizes = {d: len(v) for d, v in by_dec.items()}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    hi = 0
    for d in sorted(by_dec):
        ps = sorted(by_dec[d])
        assert ps[0] == hi + 1 and ps[-1] == hi + len(ps)
        hi = ps[-1]
    # within a decile the order is NOT doc_id order (it was shuffled)
    some = sorted(by_dec)[0]
    ids_in_curriculum_order = [
        r.doc_id
        for r in sorted(
            (r for r in rows if r.decile == some),
            key=lambda r: r.curriculum_pos,
        )
    ]
    assert ids_in_curriculum_order != sorted(ids_in_curriculum_order)


def test_kneser_ney_matches_python_and_normalizes(spark, sf_dir):
    """P_KN must equal a direct Python computation for every reported
    bigram, and the UNFILTERED smoothed distribution must sum to 1
    per prefix (the defining property of Kneser-Ney)."""
    from collections import Counter, defaultdict

    from stock_trend_predictor_spark.plans import REGISTRY

    docs = load_table(spark, sf_dir, "documents").collect()
    c = Counter()
    for r in docs:
        t = r.text.split(" ")
        for i in range(len(t) - 1):
            c[(t[i], t[i + 1])] += 1
    prefix = defaultdict(int)
    followers = defaultdict(int)
    preceders = defaultdict(int)
    for (w1, w2), n in c.items():
        prefix[w1] += n
        followers[w1] += 1
        preceders[w2] += 1
    n_pairs = len(c)
    d = 0.75

    def pkn(w1, w2):
        return max(c[(w1, w2)] - d, 0.0) / prefix[w1] + d / prefix[
            w1
        ] * followers[w1] * (preceders[w2] / n_pairs)

    rows = REGISTRY["token_bigram_kneser_ney"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert c[(r.w1, r.w2)] == r.bigram_cnt
        assert abs(r.p_kn - pkn(r.w1, r.w2)) < 1e-5, (r.w1, r.w2)

    # normalization over the FULL (unfiltered) support of one prefix:
    # sum of discounted mass + backoff mass == 1 when every observed
    # continuation is included and P_cont sums over the full vocab.
    vocab2 = {w2 for (_, w2) in c}
    w1 = max(prefix, key=prefix.get)
    total = sum(
        max(c[(w1, w2)] - d, 0.0) / prefix[w1] for w2 in vocab2
        if (w1, w2) in c
    ) + d / prefix[w1] * followers[w1] * sum(
        preceders[w2] / n_pairs for w2 in vocab2
    )
    assert abs(total - 1.0) < 1e-9


def test_wilcoxon_matches_python(spark, sf_dir):
    """W+ and tie-corrected z must equal a direct Python computation
    (zero diffs dropped, average ranks, sigma^2 with tie term)."""
    from collections import defaultdict

    from stock_trend_predictor_spark.plans import REGISTRY

    got = {
        r.symbol: r
        for r in REGISTRY["wilcoxon_signed_rank_halves"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got

    ev = [
        r
        for r in load_table(spark, sf_dir, "events").collect()
        if r.value is not None and r.value > 0
    ]
    days = [int(r.ts.timestamp() // 86400) for r in ev]
    mid = (min(days) + max(days)) // 2
    sums = defaultdict(lambda: [0.0, 0])
    for r in ev:
        day = int(r.ts.timestamp() // 86400)
        hod = int(r.ts.timestamp() // 3600) % 24
        half = 1 if day <= mid else 2
        k = (r.event_type, hod, half)
        sums[k][0] += r.value
        sums[k][1] += 1
    by_sym = defaultdict(list)
    for (sym, hod, half), (tot, n) in sums.items():
        if half == 1 and (sym, hod, 2) in sums:
            m1 = tot / n
            t2, n2 = sums[(sym, hod, 2)]
            d = t2 / n2 - m1
            if d != 0:
                by_sym[sym].append(d)
    for sym, ds in by_sym.items():
        ds_sorted = sorted(ds, key=abs)
        n = len(ds)
        # average ranks over |d| with ties
        i = 0
        w_plus = 0.0
        tie_sum = 0
        while i < n:
            j = i
            while j < n and abs(ds_sorted[j]) == abs(ds_sorted[i]):
                j += 1
            t = j - i
            avg_rank = i + 1 + (t - 1) / 2.0
            w_plus += avg_rank * sum(1 for k in range(i, j)
                                     if ds_sorted[k] > 0)
            tie_sum += t * t * t - t
            i = j
        mu = n * (n + 1) / 4.0
        sigma = (n * (n + 1) * (2 * n + 1) / 24.0 - tie_sum / 48.0) ** 0.5
        z = (w_plus - mu) / sigma
        row = got[sym]
        assert row.n_pairs == n, sym
        assert abs(row.w_plus - w_plus) < 1e-4, sym
        assert abs(row.z - z) < 1e-5, sym
