"""Law tests for the round-3d batch: screening passes (correlation
prune, IPW, 2-D histogram), SAX symbolization, and the language-ID
confusion matrix."""

from __future__ import annotations

from collections import defaultdict

from stock_trend_predictor_spark.plans import REGISTRY


def test_corr_matrix_vs_python(spark, sf_dir):
    """Pearson correlations replayed in exact Python fractions-free
    arithmetic match to rounding, and are within [-1, 1]."""
    import math

    rows = REGISTRY["feature_correlation_prune"].fn(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    ).collect()
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    data = {c: [getattr(r, c) for r in li] for c in cols}
    n = len(li)
    for r in rows:
        xs, ys = data[r.feature_a], data[r.feature_b]
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        denom = math.sqrt(sxx - sx * sx / n) * math.sqrt(syy - sy * sy / n)
        expect = (sxy - sx * sy / n) / denom
        assert -1.0 - 1e-9 <= r.pearson_r <= 1.0 + 1e-9
        assert abs(r.pearson_r - expect) < 1e-4, (r.feature_a, r.feature_b)
        assert r.drop_b == (abs(r.pearson_r) > 0.4 or
                            (abs(abs(expect) - 0.4) < 1e-9 and r.drop_b))


def test_ipw_matches_direct_under_randomization(spark, sf_dir):
    """With strata defined by event_type and treatment = user parity,
    IPW and direct adjustment are algebraically DIFFERENT estimators
    but must agree closely under near-balanced assignment; the naive
    difference is finite and all three share a sign-scale sanity."""
    [r] = REGISTRY["ipw_ate"].fn(spark, sf_dir).collect()
    assert r.n_events > 0
    assert abs(r.ate_ipw - r.ate_direct) < 25.0
    for v in (r.ate_ipw, r.ate_direct, r.naive_diff):
        assert abs(v) < 500.0  # value scale bound of the test data


def test_histogram2d_shares(spark, sf_dir):
    """Cell fracs sum to 1; within-row fracs sum to 1 per row; counts
    sum to the lineitem row count."""
    rows = REGISTRY["histogram2d_qty_price"].fn(spark, sf_dir).collect()
    n_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r.n for r in rows) == n_li
    assert abs(sum(r.frac for r in rows) - 1.0) < 1e-3
    by_row = defaultdict(float)
    for r in rows:
        assert 0 <= r.qty_bin <= 9 and 0 <= r.price_bin <= 11
        by_row[r.qty_bin] += r.frac_within_qty_row
    for k, s in by_row.items():
        assert abs(s - 1.0) < 1e-3, k


def test_sax_string_shape(spark, sf_dir):
    """SAX strings have exactly n_segments letters from {a,b,c,d},
    n_segments <= 8, and every segment is non-empty."""
    rows = REGISTRY["sax_daily_symbols"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert len(r.sax) == r.n_segments <= 8
        assert set(r.sax) <= set("abcd")
        assert r.min_seg_days >= 1
        # z-normalized series must use more than one letter unless flat
        if r.n_segments == 8:
            assert len(set(r.sax)) >= 2, r.sax


def test_confusion_matrix_consistent_with_lang_id(spark, sf_dir):
    """Cell counts replayed from the per-doc lang_id_heuristic output
    match exactly, and row shares sum to 1 per true label."""
    cells = REGISTRY["lang_id_confusion_matrix"].fn(spark, sf_dir).collect()
    docs = REGISTRY["lang_id_heuristic"].fn(spark, sf_dir).collect()
    expect = defaultdict(int)
    for d in docs:
        expect[(d.labeled_lang, d.predicted_lang)] += 1
    assert {(c.labeled_lang, c.predicted_lang): c.n for c in cells} == dict(
        expect
    )
    by_true = defaultdict(float)
    for c in cells:
        by_true[c.labeled_lang] += c.row_share
    for lang, s in by_true.items():
        assert abs(s - 1.0) < 1e-3, lang


def test_auc_matches_sklearn_free_replay(spark, sf_dir):
    """AUC replayed in pure Python (pair-counting with 0.5 tie credit)
    matches the rank-identity result exactly."""
    rows = REGISTRY["auc_roc_movement"].fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    series = defaultdict(list)
    for e in ev:
        series[e.event_type].append((e.ts, e.event_id, e.value))
    for r in rows:
        xs = sorted(series[r.symbol])
        pairs = [
            (prev[2], 1 if cur[2] > prev[2] else 0)
            for prev, cur in zip(xs, xs[1:])
        ]
        pos = [s for s, y in pairs if y == 1]
        neg = [s for s, y in pairs if y == 0]
        assert (len(pos), len(neg)) == (r.n_pos, r.n_neg)
        wins = sum(1 for p in pos for q in neg if p > q)
        ties = sum(1 for p in pos for q in neg if p == q)
        auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
        assert abs(auc - r.auc) < 1e-5, r.symbol


def test_kappa_bounds_and_degenerate_convention(spark, sf_dir):
    [r] = REGISTRY["cohens_kappa_lang"].fn(spark, sf_dir).collect()
    assert 0.0 <= r.po <= 1.0
    assert 0.0 <= r.pe <= 1.0 + 1e-9
    assert -1.0 - 1e-9 <= r.kappa <= 1.0 + 1e-9
    if r.pe >= 1.0 - 1e-9:
        assert r.kappa == 0.0


def test_gumbel_return_level_dominates_mean_max(spark, sf_dir):
    """The once-per-100-weeks return level must exceed the mean block
    maximum (mu + 0.577*beta), and beta > 0 wherever blocks vary."""
    rows = REGISTRY["gumbel_weekly_maxima"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_blocks >= 2
        assert r.gumbel_beta >= 0.0
        level = getattr(r, "return_level_t100")
        # mean of Gumbel = mu + gamma*beta; the T=100 level sits above
        assert level >= r.gumbel_mu + 0.577 * r.gumbel_beta - 1e-9
