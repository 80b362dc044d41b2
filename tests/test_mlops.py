"""Law tests for plans/mlops_queries."""

from __future__ import annotations

from collections import defaultdict

from stock_trend_predictor_spark.plans import REGISTRY
from stock_trend_predictor_spark.plans.mlops_queries import (
    CONF_Q,
    CONF_TRAIN_FRAC,
    MIX_BUDGET,
    MIX_INV_T,
    PSI_BINS,
)


def test_temperature_mix_budget_and_compression(spark, sf_dir):
    rows = REGISTRY["lang_temperature_mix"].fn(spark, sf_dir).collect()
    assert sum(r.alloc_docs for r in rows) == MIX_BUDGET
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    # temperature scaling compresses the mixture: the weight ratio of
    # the largest to the smallest language is share_ratio^(1/T) < ratio
    hi = max(rows, key=lambda r: r.share)
    lo = min(rows, key=lambda r: r.share)
    assert hi.share > lo.share
    ratio_w = hi.weight / lo.weight
    ratio_s = hi.share / lo.share
    assert abs(ratio_w - ratio_s**MIX_INV_T) < 1e-3
    assert ratio_w < ratio_s


def test_psi_bins_partition_both_halves(spark, sf_dir):
    rows = sorted(
        REGISTRY["psi_price_drift"].fn(spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    assert [r.bin for r in rows] == list(range(PSI_BINS))
    assert abs(sum(r.p_early for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.p_late for r in rows) - 1.0) < 1e-4
    # reference deciles: early-half bins are equal to within
    # interpolation slack of one item
    ne = [r.n_early for r in rows]
    assert max(ne) - min(ne) <= 2
    psi = sum(r.psi_term for r in rows)
    assert psi >= -1e-9  # PSI is a sum of (p-q)ln(p/q) >= 0 terms


def test_conformal_fit_and_coverage(spark, sf_dir):
    ticks = defaultdict(list)
    for r in (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "event_type as symbol", "ts", "event_id", "value"
        )
        .collect()
    ):
        ticks[r.symbol].append((r.ts, r.event_id, r.value))
    rows = {
        r.symbol: r
        for r in REGISTRY["conformal_interval_width"]
        .fn(spark, sf_dir)
        .collect()
    }
    for sym, series in ticks.items():
        series.sort()
        xy = [
            (series[i - 1][2], series[i][2])
            for i in range(1, len(series))
        ]
        n = len(xy)
        n_train = int(CONF_TRAIN_FRAC * n)
        tr = xy[:n_train]
        sx = sum(round(x, 6) for x, _ in tr)
        sy = sum(round(y, 6) for _, y in tr)
        sxy = sum(round(x * y, 6) for x, y in tr)
        sxx = sum(round(x * x, 6) for x, _ in tr)
        b = (n_train * sxy - sx * sy) / (n_train * sxx - sx * sx)
        a = (sy - b * sx) / n_train
        r = rows[sym]
        assert r.n_train == n_train and r.n_cal == n - n_train
        assert abs(r.slope - b) < 1e-4
        assert abs(r.intercept - a) < 1e-3
        # coverage: the interpolated quantile at rank 1+(m-1)q sits at
        # or above the floor(1+(m-1)q)-th order statistic, so at least
        # that many calibration residuals fall inside the width
        import math

        resid = sorted(
            abs(y - (a + b * x)) for x, y in xy[n_train:]
        )
        inside = sum(1 for e in resid if e <= r.qhat90 + 1e-9)
        assert inside >= math.floor(1 + (len(resid) - 1) * CONF_Q)


def test_pchart_limits_and_flags(spark, sf_dir):
    rows = (
        REGISTRY["pchart_purchase_rate_daily"].fn(spark, sf_dir).collect()
    )
    assert rows
    tot_x = sum(r.x for r in rows)
    tot_n = sum(r.n for r in rows)
    pbar = tot_x / tot_n
    for r in rows:
        assert 0 <= r.x <= r.n
        assert r.lcl >= 0.0 and r.lcl <= r.ucl
        assert r.lcl - 1e-6 <= pbar <= r.ucl + 1e-6
        expect_flag = 1 if (r.p > r.ucl or r.p < r.lcl) else 0
        assert r.out_of_control == expect_flag


def test_ridge_sweep_picks_validation_argmin(spark, sf_dir):
    """Recompute the closed-form sweep in Python from raw ticks and
    confirm the selected lambda minimizes validation MSE."""
    from stock_trend_predictor_spark.plans.estimator_queries import (
        RIDGE_LAMBDAS,
        RIDGE_TRAIN_FRAC,
    )

    ticks = defaultdict(list)
    for r in (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("event_type as symbol", "ts", "event_id", "value")
        .collect()
    ):
        ticks[r.symbol].append((r.ts, r.event_id, r.value))
    rows = {
        r.symbol: r
        for r in REGISTRY["ridge_lambda_sweep_best"]
        .fn(spark, sf_dir)
        .collect()
    }
    for sym, series in ticks.items():
        series.sort()
        xy = [
            (series[i - 1][2], series[i][2])
            for i in range(1, len(series))
        ]
        n_train = int(RIDGE_TRAIN_FRAC * len(xy))
        tr, va = xy[:n_train], xy[n_train:]

        def mse_for(lam):
            m = len(tr)
            sx = sum(round(x, 6) for x, _ in tr)
            sy = sum(round(y, 6) for _, y in tr)
            sxy = sum(round(x * y, 6) for x, y in tr)
            sxx = sum(round(x * x, 6) for x, _ in tr)
            b = (sxy - sx * sy / m) / ((sxx - sx * sx / m) + lam)
            a = sy / m - b * (sx / m)
            return (
                sum((y - a - b * x) ** 2 for x, y in va) / len(va),
                b,
                a,
            )

        scored = sorted(
            (mse_for(lam) + (lam,) for lam in RIDGE_LAMBDAS),
            key=lambda t: (t[0], t[3]),
        )
        best_mse, b, a, lam = scored[0]
        r = rows[sym]
        assert r.best_lambda == lam
        assert abs(r.val_mse - best_mse) < 1e-3
        assert abs(r.slope - b) < 1e-5


def test_roll_spread_matches_python(spark, sf_dir):
    ticks = defaultdict(list)
    for r in (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("event_type as symbol", "ts", "event_id", "value")
        .collect()
    ):
        ticks[r.symbol].append((r.ts, r.event_id, r.value))
    rows = {
        r.symbol: r
        for r in REGISTRY["roll_spread_estimator"].fn(spark, sf_dir).collect()
    }
    import math

    for sym, series in ticks.items():
        series.sort()
        deltas = [
            series[i][2] - series[i - 1][2]
            for i in range(1, len(series))
        ]
        pairs = [
            (deltas[i], deltas[i - 1]) for i in range(1, len(deltas))
        ]
        m = len(pairs)
        sd = sum(round(d, 6) for d, _ in pairs)
        sdl = sum(round(dl, 6) for _, dl in pairs)
        sddl = sum(round(d * dl, 6) for d, dl in pairs)
        acov = (sddl - sd * sdl / m) / (m - 1)
        r = rows[sym]
        assert r.n_pairs == m
        assert abs(r.autocov_1 - acov) < 1e-6
        expect = 2.0 * math.sqrt(-acov) if acov < 0 else 0.0
        assert abs(r.roll_spread - expect) < 1e-5


def test_ab_ztest_matches_python(spark, sf_dir):
    import math

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("user_id % 2 as arm", "event_type")
        .collect()
    )
    n = [0, 0]
    c = [0, 0]
    for r in ev:
        n[r.arm] += 1
        c[r.arm] += 1 if r.event_type == "purchase" else 0
    row = REGISTRY["ab_conversion_ztest"].fn(spark, sf_dir).collect()[0]
    assert (row.n_a, row.c_a, row.n_b, row.c_b) == (n[0], c[0], n[1], c[1])
    pp = (c[0] + c[1]) / (n[0] + n[1])
    z = (c[0] / n[0] - c[1] / n[1]) / math.sqrt(
        pp * (1 - pp) * (1 / n[0] + 1 / n[1])
    )
    assert abs(row.z - z) < 1e-6
    assert row.significant == (1 if abs(z) > 1.96 else 0)


def test_seasonal_outliers_exceed_threshold(spark, sf_dir):
    from stock_trend_predictor_spark.plans.experiment_queries import (
        OUTLIER_Z,
    )

    rows = (
        REGISTRY["seasonal_residual_outliers"].fn(spark, sf_dir).collect()
    )
    n_ticks = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert 0 < len(rows) < n_ticks * 0.05  # outliers are rare
    for r in rows:
        assert abs(r.robust_z) > OUTLIER_Z


def test_ship_lead_time_percentile_order(spark, sf_dir):
    rows = (
        REGISTRY["ship_lead_time_by_priority"].fn(spark, sf_dir).collect()
    )
    n_lines = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r.n_lines for r in rows) == n_lines
    for r in rows:
        assert 0 <= r.p50_days <= r.p90_days <= r.max_days


def test_k_anonymity_matches_python(spark, sf_dir):
    from collections import Counter

    from stock_trend_predictor_spark.plans.privacy_queries import K_ANON

    rows = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    groups = Counter(
        (r.c_nationkey, r.c_mktsegment) for r in rows
    )
    ldiv = defaultdict(set)
    for r in rows:
        ldiv[(r.c_nationkey, r.c_mktsegment)].add(
            int(r.c_acctbal // 1000)
        )
    out = REGISTRY["k_anonymity_audit"].fn(spark, sf_dir).collect()[0]
    assert out.n_groups == len(groups)
    assert out.n_rows == len(rows)
    assert out.min_group_size == min(groups.values())
    below = [g for g, n in groups.items() if n < K_ANON]
    assert out.groups_below_k == len(below)
    assert out.rows_below_k == sum(groups[g] for g in below)
    assert out.min_l_diversity == min(len(s) for s in ldiv.values())


def test_did_equals_cell_mean_arithmetic(spark, sf_dir):
    out = REGISTRY["did_value_estimate"].fn(spark, sf_dir).collect()[0]
    assert out.n_total == spark.read.parquet(
        f"{sf_dir}/events.parquet"
    ).count()
    expect = (out.treat_post - out.treat_pre) - (
        out.control_post - out.control_pre
    )
    assert abs(out.did_estimate - expect) < 2e-6
