"""Law tests for the round-3b query batch: indicator tier 2 (ATR, OBV,
momentum battery, banded Mann-Kendall, realized volatility) and corpus
statistics (chi-square keyness, Benford, Zipf).

These complement the oracle-parity suite (which proves Spark == DuckDB
bit-for-bit) with properties an oracle can't express: bounds, window
gating, step-size invariants, and brute-force Python cross-checks.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from stock_trend_predictor_spark.plans import REGISTRY


def _by_symbol(rows, key="symbol"):
    out = defaultdict(list)
    for r in rows:
        out[getattr(r, key)].append(r)
    return out


def test_atr_gating_and_tr_floor(spark, sf_dir):
    """TR >= high-low >= 0 by construction; ATR is NULL until a full
    14-bar window exists (exactly 13 leading NULLs per symbol) and
    positive afterwards."""
    rows = REGISTRY["atr_14_daily"].fn(spark, sf_dir).collect()
    assert rows
    for sym, rs in _by_symbol(rows).items():
        rs.sort(key=lambda r: r.bar_start)
        nulls = [i for i, r in enumerate(rs) if r.atr14 is None]
        assert nulls == list(range(min(13, len(rs)))), sym
        for r in rs:
            assert r.true_range >= -1e-9
            if r.atr14 is not None:
                assert r.atr14 > 0.0


def test_obv_steps_and_consistency(spark, sf_dir):
    """obv_ticks moves by exactly sign(close-open) each tick — steps
    in {-1, 0, +1} — and the final value equals the sum of all
    steps; obv_value's step magnitude is |close| of the same tick."""
    rows = REGISTRY["obv_tick_flow"].fn(spark, sf_dir).collect()
    assert rows
    for sym, rs in _by_symbol(rows).items():
        rs.sort(key=lambda r: (r.ts, r.tick_id))
        prev_t, prev_v = 0, 0.0
        for r in rs:
            step = r.obv_ticks - prev_t
            assert step in (-1, 0, 1), sym
            vstep = r.obv_value - prev_v
            # decimal(27,6) truncation of dir*close -> 1e-6 tolerance
            assert abs(abs(vstep) - (abs(r.close) if step else 0.0)) < 2e-6
            prev_t, prev_v = r.obv_ticks, r.obv_value


def test_momentum_battery_gates_and_bounds(spark, sf_dir):
    """momentum/roc NULL for the first 10 rows per symbol; Williams %R
    in [-100, 0] wherever defined; roc sign == momentum sign."""
    rows = REGISTRY["roc_momentum_battery"].fn(spark, sf_dir).collect()
    assert rows
    for sym, rs in _by_symbol(rows).items():
        rs.sort(key=lambda r: (r.ts, r.tick_id))
        for i, r in enumerate(rs):
            if i < 10:
                assert r.momentum10 is None and r.roc10 is None
            if r.williams_r14 is not None:
                assert -100.0 - 1e-9 <= r.williams_r14 <= 1e-9
            if r.roc10 is not None and r.momentum10 is not None:
                assert (r.roc10 > 0) == (r.momentum10 > 0) or r.momentum10 == 0


def test_mann_kendall_pair_count_and_bounds(spark, sf_dir):
    """n_pairs == sum over k=1..10 of max(n_sym - k, 0) (every banded
    pair counted once); |S| <= n_pairs; trend_score == S/n_pairs."""
    rows = REGISTRY["mann_kendall_banded"].fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_by_sym = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    assert rows
    for r in rows:
        n = n_by_sym[r.symbol]
        expect_pairs = sum(max(n - k, 0) for k in range(1, 11))
        assert r.n_pairs == expect_pairs
        assert abs(r.s_stat) <= r.n_pairs
        assert abs(r.trend_score - r.s_stat / r.n_pairs) < 1e-6
        assert -1.0 <= r.trend_score <= 1.0


def test_realized_vol_matches_python(spark, sf_dir):
    """Brute-force the realized vol of every symbol-day in Python from
    the raw events; the engine must agree to rounding tolerance."""
    rows = REGISTRY["realized_vol_daily"].fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    series = defaultdict(list)
    for e in ev:
        series[e.event_type].append((e.ts, e.event_id, e.value))
    expect = {}
    for sym, ticks in series.items():
        ticks.sort()
        for (_, _, prev), (ts, _, cur) in zip(ticks, ticks[1:]):
            if prev > 0 and cur > 0:
                day = ts.replace(hour=0, minute=0, second=0, microsecond=0)
                expect.setdefault((sym, day), []).append(math.log(cur / prev))
    assert rows
    for r in rows:
        rets = expect[(r.symbol, r.day)]
        assert r.n_returns == len(rets)
        assert abs(r.realized_vol - math.sqrt(sum(x * x for x in rets))) < 1e-5
        assert r.realized_vol >= 0.0


def test_beta_vs_market_matches_python(spark, sf_dir):
    """Brute-force hourly returns, the equal-weight market, and the
    OLS beta per symbol in Python; the engine must agree."""
    rows = REGISTRY["beta_vs_market_hourly"].fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    px = defaultdict(list)
    for e in ev:
        px[(e.event_type, e.ts.replace(minute=0, second=0, microsecond=0))].append(
            (e.ts, e.value)
        )
    rets = {}
    for (sym, hour), ticks in px.items():
        ticks.sort()
        first, last = ticks[0][1], ticks[-1][1]
        if first > 0:
            rets[(sym, hour)] = (last - first) / first
    hours = defaultdict(list)
    for (sym, hour), r in rets.items():
        hours[hour].append(r)
    market = {h: sum(rs) / len(rs) for h, rs in hours.items()}
    per_sym = defaultdict(list)
    for (sym, hour), r in rets.items():
        per_sym[sym].append((r, market[hour]))
    assert rows
    for row in rows:
        pairs = per_sym[row.symbol]
        n = len(pairs)
        s_rs = sum(p[0] for p in pairs)
        s_rm = sum(p[1] for p in pairs)
        s_rsrm = sum(p[0] * p[1] for p in pairs)
        s_rmrm = sum(p[1] * p[1] for p in pairs)
        beta = (n * s_rsrm - s_rs * s_rm) / (n * s_rmrm - s_rm * s_rm)
        assert row.n_hours == n
        assert abs(row.beta - beta) < 1e-4
        assert abs(row.alpha - (s_rs - beta * s_rm) / n) < 1e-4
        assert -1.0 - 1e-9 <= row.corr_mkt <= 1.0 + 1e-9


def test_theil_sen_between_quartiles(spark, sf_dir):
    """q1 <= median slope <= q3, and the slope count equals the
    Mann-Kendall pair count (same banding)."""
    ts_rows = {r.symbol: r for r in REGISTRY["theil_sen_banded_slope"].fn(spark, sf_dir).collect()}
    mk_rows = {r.symbol: r for r in REGISTRY["mann_kendall_banded"].fn(spark, sf_dir).collect()}
    assert ts_rows.keys() == mk_rows.keys()
    for sym, r in ts_rows.items():
        assert r.slope_q1 <= r.ts_slope <= r.slope_q3
        assert r.n_slopes == mk_rows[sym].n_pairs


def test_pmi_bounds_and_support(spark, sf_dir):
    """npmi in [-1, 1]; every reported pair meets the support floor;
    marginals dominate the pair count."""
    rows = REGISTRY["token_pmi_collocations"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r.npmi <= 1.0 + 1e-9
        assert r.pair_cnt >= 5
        assert r.w1_cnt >= r.pair_cnt and r.w2_cnt >= r.pair_cnt


def test_novelty_first_doc_is_fully_novel(spark, sf_dir):
    """The lowest doc_id has novelty 1.0 by definition; novelty is a
    valid fraction and n_novel <= n_distinct_grams everywhere."""
    rows = REGISTRY["ngram_novelty_decay"].fn(spark, sf_dir).collect()
    assert rows
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty == 1.0
    for r in rows:
        assert 0.0 <= r.novelty <= 1.0
        assert 0 <= r.n_novel <= r.n_distinct_grams <= r.n_grams


def test_chi2_keyness_matches_python(spark, sf_dir):
    """Brute-force the 2x2 chi-square per token in Python; the
    engine's top-k set and statistics must agree."""
    rows = REGISTRY["chi2_token_keyness"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    en, rest = Counter(), Counter()
    for d in docs:
        (en if d.lang == "en" else rest).update(d.text.split(" "))
    ta, tb = sum(en.values()), sum(rest.values())
    scored = []
    for tok in set(en) | set(rest):
        a, b = float(en[tok]), float(rest[tok])
        if a + b < 5:
            continue
        c, d_ = ta - a, tb - b
        chi2 = (ta + tb) * (a * d_ - b * c) ** 2 / ((a + b) * (c + d_) * ta * tb)
        scored.append((chi2, tok, int(a), int(b)))
    scored.sort(key=lambda t: (-t[0], t[1]))
    expect = scored[:50]
    assert len(rows) == len(expect)
    for r, (chi2, tok, a, b) in zip(rows, expect):
        assert (r.token, r.en_count, r.rest_count) == (tok, a, b)
        assert abs(r.chi2 - chi2) < 1e-5


def test_benford_is_a_distribution(spark, sf_dir):
    """Digits 1..9 each present, observed fractions sum to ~1, expected
    fractions are exactly log10(1 + 1/d), chi2 terms nonnegative."""
    rows = REGISTRY["benford_first_digit"].fn(spark, sf_dir).collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    assert abs(sum(r.obs_frac for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.benford_frac - math.log10(1 + 1 / r.digit)) < 1e-5
        assert r.chi2_term >= 0.0


def test_zipf_slope_negative_and_topn(spark, sf_dir):
    """Every language's fitted rank-frequency slope is negative (more
    frequent tokens rank earlier by construction) and the fit uses at
    most ZIPF_TOP_N points."""
    from stock_trend_predictor_spark.plans.corpus_stats_queries import ZIPF_TOP_N

    rows = REGISTRY["zipf_fit_per_lang"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_points <= ZIPF_TOP_N
        assert r.zipf_slope < 0.0


def test_seasonal_decompose_identity_and_gates(spark, sf_dir):
    """trend is NULL at the first/last 12 rows per symbol; wherever
    trend is defined, close == trend + seasonal + residual (to
    rounding); per-(symbol,hod) residual means are ~0."""
    rows = REGISTRY["seasonal_decompose_hod"].fn(spark, sf_dir).collect()
    assert rows
    resid = defaultdict(list)
    for sym, rs in _by_symbol(rows).items():
        rs.sort(key=lambda r: (r.ts, r.tick_id))
        n = len(rs)
        for i, r in enumerate(rs):
            if i < 12 or i >= n - 12:
                assert r.trend is None, (sym, i)
            else:
                assert r.trend is not None
                assert abs(r.close - (r.trend + r.seasonal + r.residual)) < 5e-6
                resid[(sym, r.ts.hour)].append(r.residual)
    for key, vals in resid.items():
        assert abs(sum(vals) / len(vals)) < 1e-4, key


def test_changepoint_matches_python_bruteforce(spark, sf_dir):
    """The argmax split equals an O(n^2)-free Python prefix-sum brute
    force per symbol, and the SSE gain is nonnegative."""
    rows = {r.symbol: r for r in REGISTRY["changepoint_binary_split"].fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    series = defaultdict(list)
    for e in ev:
        series[e.event_type].append((e.ts, e.event_id, e.value))
    assert rows
    for sym, ticks in series.items():
        ticks.sort()
        xs = [t[2] for t in ticks]
        n = len(xs)
        sn, ssn = sum(xs), sum(x * x for x in xs)
        best = None
        sk = ssk = 0.0
        for k in range(1, n):
            sk += xs[k - 1]
            ssk += xs[k - 1] * xs[k - 1]
            gain = (ssn - sn * sn / n) - (
                (ssk - sk * sk / k) + ((ssn - ssk) - (sn - sk) ** 2 / (n - k))
            )
            if best is None or gain > best[0] + 1e-9:
                best = (gain, k)
        r = rows[sym]
        assert r.split_k == best[1], sym
        assert abs(r.sse_gain - best[0]) < 1e-3
        assert r.sse_gain >= 0.0


def test_trend_consensus_votes_consistent_with_components(spark, sf_dir):
    """up_votes must equal the recomputed vote sum from the component
    queries, and the verdict must follow the 3/1 thresholds."""
    rows = REGISTRY["trend_consensus_verdict"].fn(spark, sf_dir).collect()
    mk = {r.symbol: r.trend_score for r in REGISTRY["mann_kendall_banded"].fn(spark, sf_dir).collect()}
    assert rows and set(mk) == {r.symbol for r in rows}
    for r in rows:
        votes = (
            (1 if r.trend_score > 0.02 else 0)
            + (1 if r.ts_slope > 0 else 0)
            + (1 if r.rsi_last > 50 else 0)
            + (1 if r.obv_last > 0 else 0)
        )
        assert r.up_votes == votes
        assert r.trend_score == mk[r.symbol]
        expect = "up" if votes >= 3 else ("down" if votes <= 1 else "mixed")
        assert r.verdict == expect
        assert 0.0 <= r.rsi_last <= 100.0


def test_bootstrap_ci_matches_python_replay(spark, sf_dir):
    """Replay the hash-seeded Poisson bootstrap in Python for every
    event_type: identical replicate weights -> identical CI bounds
    (to rounding); basic CI laws hold."""
    import hashlib

    rows = REGISTRY["bootstrap_ci_value_mean"].fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    cdf = [0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
           0.9810118431238462, 0.9963401531726563]

    def weight(event_id, b):
        u = int(hashlib.md5(f"{event_id}:{b}".encode()).hexdigest()[:7], 16) / 268435456.0
        for k, c in enumerate(cdf):
            if u < c:
                return k
        return 5

    by_type = defaultdict(list)
    for e in ev:
        by_type[e.event_type].append((e.event_id, e.value))
    assert rows
    for r in rows:
        assert r.n_reps == 100
        assert r.ci_lo <= r.ci_hi
        assert r.ci_lo <= r.point_mean <= r.ci_hi  # CI brackets the mean
        data = by_type[r.symbol if hasattr(r, "symbol") else r.event_type]
        means = []
        for b in range(100):
            sw = sxw = 0.0
            for eid, v in data:
                w = weight(eid, b)
                sw += w
                sxw += w * v
            if sw > 0:
                means.append(sxw / sw)
        means.sort()

        def q(p):
            i = (len(means) - 1) * p
            lo, hi = int(i), min(int(i) + 1, len(means) - 1)
            return means[lo] + (means[hi] - means[lo]) * (i - lo)

        assert abs(r.ci_lo - q(0.025)) < 1e-4
        assert abs(r.ci_hi - q(0.975)) < 1e-4


def test_crosscorr_symmetry_and_bounds(spark, sf_dir):
    """xcorr in [-1, 1]; at lag 0 the matrix is symmetric
    (corr(a,b) == corr(b,a)); 80 rows = 20 ordered pairs x 4 lags
    when every pair overlaps >= 30 hours."""
    rows = REGISTRY["crosscorr_leadlag_hourly"].fn(spark, sf_dir).collect()
    assert rows
    lag0 = {}
    for r in rows:
        assert -1.0 - 1e-9 <= r.xcorr <= 1.0 + 1e-9
        assert 0 <= r.lag <= 3
        assert r.n_hours >= 30
        if r.lag == 0:
            lag0[(r.sym_a, r.sym_b)] = r.xcorr
    for (a, b), v in lag0.items():
        assert abs(lag0[(b, a)] - v) < 1e-9, (a, b)


def test_hurst_matches_python_and_range(spark, sf_dir):
    """Replay the R/S computation in Python (same blocks, same
    population std) and compare the fitted exponent; H must land in
    a sane (0, 1.2) band for real series."""
    rows = {r.symbol: r for r in REGISTRY["hurst_exponent_rs"].fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    series = defaultdict(list)
    for e in ev:
        series[e.event_type].append((e.ts, e.event_id, e.value))
    assert rows
    for sym, ticks in series.items():
        ticks.sort()
        xs = [t[2] for t in ticks]
        pts = []
        total_blocks = 0
        for n in (8, 32, 128):
            rs_vals = []
            for b in range(len(xs) // n):
                blk_vals = xs[b * n:(b + 1) * n]
                m = sum(blk_vals) / n
                cum, dev = 0.0, []
                for t_, x in enumerate(blk_vals, start=1):
                    cum += x
                    dev.append(cum - t_ * m)
                var = sum(x * x for x in blk_vals) / n - m * m
                if var > 0:
                    rs_vals.append((max(dev) - min(dev)) / math.sqrt(var))
            if rs_vals:
                pts.append((math.log(n), math.log(sum(rs_vals) / len(rs_vals))))
                total_blocks += len(rs_vals)
        xbar = sum(p[0] for p in pts) / len(pts)
        sxy = sum((p[0] - xbar) * p[1] for p in pts)
        sxx = sum((p[0] - xbar) ** 2 for p in pts)
        r = rows[sym]
        assert r.total_blocks == total_blocks
        assert abs(r.hurst - sxy / sxx) < 1e-3, sym
        assert 0.0 < r.hurst < 1.2


def test_cointegration_matches_python(spark, sf_dir):
    """Replay the two-stage Engle-Granger computation in Python and
    compare hedge ratio and DF statistic per ordered pair."""
    rows = {(r.sym_a, r.sym_b): r
            for r in REGISTRY["cointegration_engle_granger"].fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    px = {}
    for e in ev:
        h = e.ts.replace(minute=0, second=0, microsecond=0)
        k = (e.event_type, h)
        if k not in px or e.ts > px[k][0]:
            px[k] = (e.ts, e.value)
    syms = sorted({s for s, _ in px})
    hours = sorted({h for _, h in px})
    assert rows
    for sa in syms:
        for sb in syms:
            if sa == sb:
                continue
            pts = [(px[(sa, h)][1], px[(sb, h)][1])
                   for h in hours if (sa, h) in px and (sb, h) in px]
            n = len(pts)
            s_a = sum(p[0] for p in pts); s_b = sum(p[1] for p in pts)
            s_ab = sum(p[0] * p[1] for p in pts)
            s_bb = sum(p[1] * p[1] for p in pts)
            beta = (n * s_ab - s_a * s_b) / (n * s_bb - s_b * s_b)
            alpha = (s_a - beta * s_b) / n
            e_ = [pa - alpha - beta * pb for pa, pb in pts]
            e0 = e_[:-1]
            de = [b - a for a, b in zip(e_, e_[1:])]
            see = sum(x * x for x in e0)
            sed = sum(x * y for x, y in zip(e0, de))
            sdd = sum(y * y for y in de)
            g = sed / see
            se = math.sqrt(((sdd - 2 * g * sed + g * g * see) / (len(de) - 1)) / see)
            r = rows[(sa, sb)]
            assert r.n_obs == len(de)
            assert abs(r.hedge_beta - beta) < 1e-4
            assert abs(r.df_stat - g / se) < 1e-3
            assert r.cointegrated_5pct == (g / se < -1.95)


def test_stattest_battery_matches_python(spark, sf_dir):
    """Replay the runs test and ARCH LM in Python; Ljung-Box checked
    for structure (n_obs, Q >= 0) plus a lag-1 rho cross-check
    against the ACF-free direct computation."""
    runs = {r.symbol: r for r in REGISTRY["runs_test_updown"].fn(spark, sf_dir).collect()}
    arch = {r.symbol: r for r in REGISTRY["arch_lm_test"].fn(spark, sf_dir).collect()}
    lb = {r.symbol: r for r in REGISTRY["ljung_box_q"].fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    series = defaultdict(list)
    for e in ev:
        series[e.event_type].append((e.ts, e.event_id, e.value))
    assert runs and arch and lb
    for sym, ticks in series.items():
        ticks.sort()
        deltas = [b[2] - a[2] for a, b in zip(ticks, ticks[1:])]
        # runs test
        dirs = [1 if d > 0 else -1 for d in deltas if d != 0]
        n1 = sum(1 for d in dirs if d == 1)
        n2 = len(dirs) - n1
        r_count = 1 + sum(1 for a, b in zip(dirs, dirs[1:]) if a != b)
        mu = 2 * n1 * n2 / (n1 + n2) + 1
        sigma = math.sqrt(
            (2 * n1 * n2) * (2 * n1 * n2 - n1 - n2)
            / ((n1 + n2) ** 2 * (n1 + n2 - 1))
        )
        rr = runs[sym]
        assert (rr.n_up, rr.n_down, rr.runs) == (n1, n2, r_count)
        assert abs(rr.z_stat - (r_count - mu) / sigma) < 1e-5
        # ARCH LM
        xs = [d * d for d in deltas]
        pairs = list(zip(xs[1:], xs[:-1]))
        n = len(pairs)
        sx = sum(p[0] for p in pairs); sy = sum(p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        sxx = sum(p[0] ** 2 for p in pairs); syy = sum(p[1] ** 2 for p in pairs)
        r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        ar = arch[sym]
        assert ar.n_pairs == n
        assert abs(ar.lm_stat - n * r2) < 1e-3
        # Ljung-Box structure + lag-1 rho check
        q = lb[sym]
        assert q.n_obs == len(deltas)
        assert q.q_stat >= 0.0
        rbar = sum(deltas) / len(deltas)
        css = sum((d - rbar) ** 2 for d in deltas)
        rho1 = sum((a - rbar) * (b - rbar) for a, b in zip(deltas[1:], deltas[:-1])) / css
        nn = len(deltas)
        contrib1 = nn * (nn + 2) * rho1 * rho1 / (nn - 1)
        assert q.q_stat >= contrib1 - 1e-6  # lag-1 term is part of Q


def test_vr_and_kpss_match_python(spark, sf_dir):
    """Replay the variance ratio and KPSS computations in Python."""
    vr = {r.symbol: r for r in REGISTRY["variance_ratio_test"].fn(spark, sf_dir).collect()}
    kp = {r.symbol: r for r in REGISTRY["kpss_level_stat"].fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    series = defaultdict(list)
    for e in ev:
        series[e.event_type].append((e.ts, e.event_id, e.value))
    assert vr and kp
    q = 4
    for sym, ticks in series.items():
        ticks.sort()
        closes = [t[2] for t in ticks]
        r1 = [b - a for a, b in zip(closes, closes[1:])]
        # the query's lag(close, q) runs on the open-filtered sequence
        # (rows 2..n of the raw series)
        filt = closes[1:]
        rq = [filt[j] - filt[j - q] for j in range(q, len(filt))]

        def var(xs):
            m = sum(xs) / len(xs)
            return sum(x * x for x in xs) / len(xs) - m * m

        ratio = var(rq) / (q * var(r1))
        n1 = len(r1)
        z = (ratio - 1.0) / math.sqrt(2 * (q - 1) * (2 * q - 1) / (3 * q * n1))
        rv = vr[sym]
        assert rv.n_obs == n1
        assert abs(getattr(rv, f"vr{q}") - ratio) < 1e-4, sym
        assert abs(rv.z_stat - z) < 1e-3
        # KPSS
        rbar = sum(r1) / n1
        s2 = sum(x * x for x in r1) / n1 - rbar * rbar
        cum, ssq = 0.0, 0.0
        for x in r1:
            cum += x - rbar
            ssq += cum * cum
        stat = ssq / (n1 * n1 * s2)
        rk = kp[sym]
        assert rk.n_obs == n1
        assert abs(rk.kpss_stat - stat) < 1e-4, sym
        assert rk.nonstationary_5pct == (stat > 0.463)


def test_pairs_spread_and_portfolio_laws(spark, sf_dir):
    """Spread z-score gating (NULL until a full 24h window), entry
    flag consistency, and a Python replay of the portfolio summary."""
    rows = REGISTRY["pairs_spread_zscore"].fn(spark, sf_dir).collect()
    assert rows
    by_pair = defaultdict(list)
    for r in rows:
        by_pair[(r.sym_a, r.sym_b)].append(r)
        assert r.sym_a < r.sym_b
    for pair, rs in by_pair.items():
        rs.sort(key=lambda r: r.hour)
        for i, r in enumerate(rs):
            if i < 23:
                assert r.zscore is None and r.entry_signal is None
            elif r.zscore is not None:
                assert r.entry_signal == (abs(r.zscore) > 2.0)

    # portfolio: python replay on hourly geometric-mean log values
    row = REGISTRY["portfolio_equal_weight_summary"].fn(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    last = {}
    for e in ev:
        h = e.ts.replace(minute=0, second=0, microsecond=0)
        k = (e.event_type, h)
        if k not in last or e.ts > last[k][0]:
            last[k] = (e.ts, e.value)
    lv = defaultdict(list)
    for (sym, h), (_, px) in last.items():
        if px > 0:
            lv[h].append(math.log(px))
    hours = sorted(lv)
    series = [sum(v) / len(v) for h in hours for v in [lv[h]]]
    rets = [b - a for a, b in zip(series, series[1:])]
    assert row.n_hours == len(hours)
    assert abs(row.total_return - (math.exp(series[-1] - series[0]) - 1)) < 1e-4
    mean = sum(rets) / len(rets)
    var = sum((x - mean) ** 2 for x in rets) / (len(rets) - 1)
    assert abs(row.sharpe_hourly - mean / math.sqrt(var)) < 1e-4
    peak, mdd = series[0], 0.0
    for v in series:
        peak = max(peak, v)
        mdd = min(mdd, v - peak)
    assert abs(row.max_drawdown - (1 - math.exp(mdd))) < 1e-5
    assert 0.0 <= row.max_drawdown < 1.0


def test_drawdown_duration_and_anova_laws(spark, sf_dir):
    """Spell laws: worst ratio in (0, 1]; spell counts positive; the
    longest spell is at most the series length. ANOVA: F >= 0, groups
    match the distinct weekdays in the data, replayed in Python."""
    dd = {r.symbol: r for r in REGISTRY["drawdown_duration"].fn(spark, sf_dir).collect()}
    an = {r.symbol: r for r in REGISTRY["dow_anova_f"].fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    series = defaultdict(list)
    for e in ev:
        series[e.event_type].append((e.ts, e.event_id, e.value))
    assert dd and an
    for sym, ticks in series.items():
        ticks.sort()
        closes = [t[2] for t in ticks]
        r = dd[sym]
        assert 0.0 < r.worst_peak_ratio <= 1.0
        assert 0 < r.n_spells
        assert 0 < r.longest_spell_ticks <= len(closes)
        # python replay of the longest spell in ticks
        peak, cur, longest, spells = float("-inf"), 0, 0, 0
        for c in closes:
            peak = max(peak, c)
            if c < peak:
                cur += 1
                if cur == 1:
                    spells += 1
                longest = max(longest, cur)
            else:
                cur = 0
        assert (r.n_spells, r.longest_spell_ticks) == (spells, longest), sym
        # ANOVA replay
        deltas = [(b[0], b[2] - a[2]) for a, b in zip(ticks, ticks[1:])]
        groups = defaultdict(list)
        for ts, d in deltas:
            groups[ts.isoweekday() % 7 + 1].append(d)  # Spark dow: Sun=1
        a = an[sym]
        assert a.n_groups == len(groups)
        n = sum(len(g) for g in groups.values())
        s = sum(sum(g) for g in groups.values())
        ss = sum(x * x for g in groups.values() for x in g)
        sbg = sum(sum(g) ** 2 / len(g) for g in groups.values())
        k = len(groups)
        f = ((sbg - s * s / n) / (k - 1)) / ((ss - sbg) / (n - k))
        assert a.n_obs == n
        assert abs(a.f_stat - f) < 1e-3
        assert a.f_stat >= 0.0


def test_ks_and_mi_match_python(spark, sf_dir):
    """Python replays: exact KS D per pair and exact MI per symbol."""
    ks = {(r.sym_a, r.sym_b): r for r in REGISTRY["ks_test_pairwise"].fn(spark, sf_dir).collect()}
    mi = {r.symbol: r for r in REGISTRY["movement_mutual_information"].fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    series = defaultdict(list)
    for e in ev:
        series[e.event_type].append((e.ts, e.event_id, e.value))
    rets = {}
    for sym, ticks in series.items():
        ticks.sort()
        rets[sym] = [b[2] - a[2] for a, b in zip(ticks, ticks[1:])]
    syms = sorted(rets)
    assert ks and mi
    for i, sa in enumerate(syms):
        for sb in syms[i + 1:]:
            a, b = sorted(rets[sa]), sorted(rets[sb])
            na, nb = len(a), len(b)
            # merged-scan exact KS
            ia = ib = 0
            d = 0.0
            merged = sorted([(x, 0) for x in a] + [(x, 1) for x in b])
            for x, tag in merged:
                if tag == 0:
                    ia += 1
                else:
                    ib += 1
                d = max(d, abs(ia / na - ib / nb))
            r = ks[(sa, sb)]
            assert (r.n_a, r.n_b) == (na, nb)
            assert abs(r.ks_d - d) < 1e-6, (sa, sb)
            crit = 1.36 * math.sqrt((na + nb) / (na * nb))
            assert r.differ_5pct == (d > crit)
    for sym, rr in rets.items():
        dirs = [1 if d > 0 else 0 for d in rr if d != 0]
        cells = Counter(zip(dirs, dirs[1:]))
        n = sum(cells.values())
        cx = Counter(); cy = Counter()
        for (x, y), c in cells.items():
            cx[x] += c
            cy[y] += c
        mi_val = sum(
            (c / n) * math.log((c * n) / (cx[x] * cy[y]))
            for (x, y), c in cells.items()
        )
        r = mi[sym]
        assert r.n_pairs == n
        assert abs(r.mi_nats - mi_val) < 1e-6
        assert r.mi_nats >= -1e-12  # MI is nonnegative
        assert abs(r.g_stat - 2 * n * mi_val) < 1e-3


def test_granger_matches_numpy_ols(spark, sf_dir):
    """Replay the restricted/unrestricted regressions with numpy
    lstsq; the closed-form F statistic must agree."""
    import numpy as np

    rows = {(r.sym_a, r.sym_b): r
            for r in REGISTRY["granger_causality_hourly"].fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    px = {}
    for e in ev:
        h = e.ts.replace(minute=0, second=0, microsecond=0)
        k = (e.event_type, h)
        if k not in px:
            px[k] = []
        px[k].append((e.ts, e.value))
    rets = {}
    for (sym, h), ticks in px.items():
        ticks.sort()
        first, last = ticks[0][1], ticks[-1][1]
        if first > 0:
            rets[(sym, h)] = (last - first) / first
    syms = sorted({s for s, _ in rets})
    hours = sorted({h for _, h in rets})
    lagged = {}
    for sym in syms:
        hs = [h for h in hours if (sym, h) in rets]
        for prev, cur in zip(hs, hs[1:]):
            lagged[(sym, cur)] = rets[(sym, prev)]
    assert rows
    for sa in syms:
        for sb in syms:
            if sa == sb:
                continue
            data = [
                (rets[(sa, h)], lagged[(sa, h)], lagged[(sb, h)])
                for h in hours
                if (sa, h) in rets and (sa, h) in lagged and (sb, h) in lagged
            ]
            y = np.array([d[0] for d in data])
            X1 = np.column_stack([np.ones(len(data)), [d[1] for d in data]])
            X2 = np.column_stack(
                [np.ones(len(data)), [d[1] for d in data], [d[2] for d in data]]
            )
            rss_r = float(((y - X1 @ np.linalg.lstsq(X1, y, rcond=None)[0]) ** 2).sum())
            beta_u = np.linalg.lstsq(X2, y, rcond=None)[0]
            rss_u = float(((y - X2 @ beta_u) ** 2).sum())
            n = len(data)
            f = (rss_r - rss_u) / (rss_u / (n - 3))
            r = rows[(sa, sb)]
            assert r.n_obs == n
            assert abs(r.beta_cause - beta_u[2]) < 1e-4
            assert abs(r.f_stat - f) < 1e-2, (sa, sb)
            assert r.f_stat >= -1e-9  # RSS_u <= RSS_r always


def test_corpus_trio_laws(spark, sf_dir):
    """Vocab overlap: jaccard in [0,1] and symmetric coverage of all
    lang pairs. Burstiness: >= 1 always (cf >= df by definition) and
    Python replay of the top entry. Template groups: every group has
    >= 2 docs and genuinely shares the 8-token prefix."""
    ov = REGISTRY["lang_vocab_overlap"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    langs = sorted({d.lang for d in docs})
    assert len(ov) == len(langs) * (len(langs) - 1) // 2
    for r in ov:
        assert r.lang_a < r.lang_b
        assert 0.0 <= r.jaccard <= 1.0
        assert r.n_shared >= 0

    bu = REGISTRY["token_burstiness"].fn(spark, sf_dir).collect()
    assert bu
    cf, df = Counter(), Counter()
    for d in docs:
        toks = d.text.split(" ")
        cf.update(toks)
        df.update(set(toks))
    for r in bu:
        assert r.burstiness >= 1.0 - 1e-9
        assert (r.cf, r.df) == (cf[r.token], df[r.token])

    tg = REGISTRY["template_prefix_groups"].fn(spark, sf_dir).collect()
    prefixes = defaultdict(list)
    for d in docs:
        toks = d.text.split(" ")
        if len(toks) >= 8:
            prefixes[" ".join(toks[:8])].append(d.doc_id)
    expect = {tuple(sorted(v)) for v in prefixes.values() if len(v) >= 2}
    got = set()
    for r in tg:
        assert r.n_docs >= 2
        members = [
            d.doc_id for d in docs
            if len(d.text.split(" ")) >= 8
            and " ".join(d.text.split(" ")[:8])
            in {p for p, v in prefixes.items() if r.first_doc in v}
        ]
        got.add((r.n_docs, r.first_doc))
    # group multiset parity: same number of groups, same (size, rep)
    assert {(len(v), min(v)) for v in prefixes.values() if len(v) >= 2} == got


def test_var_cvar_and_drift_laws(spark, sf_dir):
    """CVaR <= VaR always (it averages the tail at or below the
    cut); tail count ~ 5% of observations; Python replay. Drift:
    jaccard in [0,1] with exact top-set sizes."""
    rows = {r.symbol: r for r in REGISTRY["var_cvar_per_symbol"].fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    series = defaultdict(list)
    for e in ev:
        series[e.event_type].append((e.ts, e.event_id, e.value))
    assert rows
    for sym, ticks in series.items():
        ticks.sort()
        deltas = sorted(b[2] - a[2] for a, b in zip(ticks, ticks[1:]))
        n = len(deltas)
        i = (n - 1) * 0.05
        lo, hi = int(i), min(int(i) + 1, n - 1)
        var5 = deltas[lo] + (deltas[hi] - deltas[lo]) * (i - lo)
        tail = [d for d in deltas if d <= var5]
        r = rows[sym]
        assert r.n_obs == n
        assert abs(r.var_5pct - var5) < 1e-5
        assert abs(r.cvar_5pct - sum(tail) / len(tail)) < 1e-4
        assert r.cvar_5pct <= r.var_5pct + 1e-9
        assert r.n_tail_obs == len(tail)
        assert 0.03 * n < r.n_tail_obs < 0.08 * n

    d = REGISTRY["vocab_drift_halves"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= d.jaccard <= 1.0
    assert 0 <= d.n_shared <= min(d.n_top_first, d.n_top_second)


def test_gini_and_hhi_laws(spark, sf_dir):
    """Gini in [0, 1) with a Python replay; HHI per nation in
    (1/n, 1] and >= top_share^2; shares consistent."""
    g = REGISTRY["gini_customer_revenue"].fn(spark, sf_dir).collect()[0]
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    rev = defaultdict(float)
    for o in orders:
        rev[o.o_custkey] += o.o_totalprice
    xs = sorted(rev.values())
    n = len(xs)
    s = sum(xs)
    srx = sum((i + 1) * x for i, x in enumerate(xs))
    gini = 2 * srx / (n * s) - (n + 1) / n
    assert g.n_customers == n
    assert abs(g.gini - gini) < 1e-4
    assert 0.0 <= g.gini < 1.0

    rows = REGISTRY["supplier_concentration_hhi"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1.0 / r.n_suppliers - 1e-9 <= r.hhi <= 1.0 + 1e-9
        assert r.hhi >= r.top_share ** 2 - 1e-9
        assert 0.0 < r.top_share <= 1.0


def test_spearman_matches_scipy_free_python(spark, sf_dir):
    """Python replay with row_number-style ranks; rho in [-1, 1]."""
    rows = {(r.sym_a, r.sym_b): r
            for r in REGISTRY["spearman_rank_matrix"].fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    px = {}
    for e in ev:
        h = e.ts.replace(minute=0, second=0, microsecond=0)
        k = (e.event_type, h)
        cur = px.get(k)
        px[k] = {
            "first": min(cur["first"], (e.ts, e.value)) if cur else (e.ts, e.value),
            "last": max(cur["last"], (e.ts, e.value)) if cur else (e.ts, e.value),
        }
    rets = {}
    for (sym, h), v in px.items():
        f, l = v["first"][1], v["last"][1]
        if f > 0:
            rets[(sym, h)] = (l - f) / f
    syms = sorted({s for s, _ in rets})
    hours = sorted({h for _, h in rets})
    assert rows
    for i, sa in enumerate(syms):
        for sb in syms[i + 1:]:
            sample = [(h, rets[(sa, h)], rets[(sb, h)])
                      for h in hours if (sa, h) in rets and (sb, h) in rets]
            n = len(sample)
            ra = {h: k + 1 for k, (h, _, _) in enumerate(
                sorted(sample, key=lambda t: (t[1], t[0])))}
            rb = {h: k + 1 for k, (h, _, _) in enumerate(
                sorted(sample, key=lambda t: (t[2], t[0])))}
            ka = [ra[h] for h, _, _ in sample]
            kb = [rb[h] for h, _, _ in sample]
            sa_, sb_ = sum(ka), sum(kb)
            sab = sum(x * y for x, y in zip(ka, kb))
            saa = sum(x * x for x in ka)
            sbb = sum(y * y for y in kb)
            rho = (n * sab - sa_ * sb_) / math.sqrt(
                (n * saa - sa_ * sa_) * (n * sbb - sb_ * sb_)
            )
            r = rows[(sa, sb)]
            assert r.n_hours == n
            assert abs(r.spearman_rho - rho) < 1e-5
            assert -1.0 - 1e-9 <= r.spearman_rho <= 1.0 + 1e-9


def test_sortino_gaps_and_mix_entropy_laws(spark, sf_dir):
    """Downside dev >= 0 and Sortino sign == mean sign; gaps replay;
    mix entropy in [0, ln(n_types)] with ln-k upper bound."""
    dd = {r.symbol: r for r in REGISTRY["downside_deviation_sortino"].fn(spark, sf_dir).collect()}
    assert dd
    for r in dd.values():
        assert r.downside_dev >= 0.0
        if r.downside_dev > 0:
            assert (r.sortino > 0) == (r.mean_ret > 0) or r.mean_ret == 0

    gaps = {r.symbol: r for r in REGISTRY["day_boundary_gaps"].fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    days = defaultdict(dict)
    for e in ev:
        d = e.ts.replace(hour=0, minute=0, second=0, microsecond=0)
        cur = days[e.event_type].get(d)
        if cur is None:
            days[e.event_type][d] = [(e.ts, e.value), (e.ts, e.value)]
        else:
            if e.ts < cur[0][0]:
                cur[0] = (e.ts, e.value)
            if e.ts > cur[1][0]:
                cur[1] = (e.ts, e.value)
    for sym, dmap in days.items():
        ds = sorted(dmap)
        gs = [dmap[b][0][1] - dmap[a][1][1] for a, b in zip(ds, ds[1:])]
        r = gaps[sym]
        assert r.n_gaps == len(gs)
        assert r.n_up_gaps == sum(1 for g in gs if g > 0)
        assert abs(r.mean_abs_gap - sum(abs(g) for g in gs) / len(gs)) < 1e-5
        assert abs(r.max_abs_gap - max(abs(g) for g in gs)) < 1e-9

    mix = REGISTRY["user_event_mix_entropy"].fn(spark, sf_dir).collect()
    assert mix
    for r in mix:
        assert -1e-9 <= r.mix_entropy <= math.log(r.n_types) + 1e-9
        assert r.n_types >= 1 and r.n_events >= r.n_types


def test_streaks_and_ar1_laws(spark, sf_dir):
    """Streak replay in Python; AR(1) phi replay and half-life
    consistency (defined only in (0,1), positive when defined)."""
    st = {r.symbol: r for r in REGISTRY["updown_streaks"].fn(spark, sf_dir).collect()}
    ar = {r.symbol: r for r in REGISTRY["ar1_half_life"].fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    series = defaultdict(list)
    for e in ev:
        series[e.event_type].append((e.ts, e.event_id, e.value))
    assert st and ar
    for sym, ticks in series.items():
        ticks.sort()
        closes = [t[2] for t in ticks]
        dirs = [1 if b > a else -1 for a, b in zip(closes, closes[1:]) if b != a]
        runs, cur = [], 1
        for a, b in zip(dirs, dirs[1:]):
            if a == b:
                cur += 1
            else:
                runs.append((a, cur))
                cur = 1
        runs.append((dirs[-1], cur))
        r = st[sym]
        assert r.max_up_streak == max((l for d, l in runs if d == 1), default=None)
        assert r.max_down_streak == max((l for d, l in runs if d == -1), default=None)
        assert r.n_streaks == len(runs)
        assert abs(r.mean_streak_len - sum(l for _, l in runs) / len(runs)) < 1e-6
        # AR(1)
        xs, ys = closes[:-1], closes[1:]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        phi = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a_ = ar[sym]
        assert a_.n_obs == n
        assert abs(a_.phi - phi) < 1e-5
        if 0 < phi < 1:
            assert abs(a_.half_life_ticks - (-math.log(2) / math.log(phi))) < 1e-3
            assert a_.half_life_ticks > 0
        else:
            assert a_.half_life_ticks is None
