"""Law tests for the event-time batch (plans/eventtime_queries).

Oracle parity proves Spark == DuckDB; these pin the semantics both
could get wrong together: Holt against an independent Python refit
from raw events, interval union against a brute-force second-set
union, KM monotonicity/accounting, the 6x fan-out invariant, and the
exactly-100 apportionment law.
"""

from __future__ import annotations

from collections import defaultdict

from stock_trend_predictor_spark.plans import REGISTRY
from stock_trend_predictor_spark.plans.eventtime_queries import (
    HOLT_ALPHA,
    HOLT_BETA,
    KM_HORIZON_H,
)


def test_holt_matches_independent_refit(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    last_per_day = {}
    for r in ev:
        key = (r.event_type, r.ts.date())
        cur = last_per_day.get(key)
        if cur is None or (r.ts, r.event_id) > (cur[0], cur[1]):
            last_per_day[key] = (r.ts, r.event_id, r.value)
    series = defaultdict(list)
    for (sym, day), (_, _, v) in sorted(last_per_day.items()):
        series[sym].append(v)
    rows = {
        r.symbol: r
        for r in REGISTRY["holt_linear_forecast_daily"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(rows) == set(series)
    for sym, ys in series.items():
        lev, tr = ys[0], 0.0
        for y in ys[1:]:
            nl = HOLT_ALPHA * y + (1 - HOLT_ALPHA) * (lev + tr)
            tr = HOLT_BETA * (nl - lev) + (1 - HOLT_BETA) * tr
            lev = nl
        r = rows[sym]
        assert r.n_days == len(ys)
        assert abs(r.level - lev) < 1e-6
        assert abs(r.trend - tr) < 1e-6
        for h in (1, 2, 3):
            assert abs(getattr(r, f"fc_{h}") - (lev + h * tr)) < 1e-5


def test_sliding_window_fanout_conservation(spark, sf_dir):
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    rows = (
        REGISTRY["sliding_distinct_users"].fn(spark, sf_dir).collect()
    )
    assert sum(r.n_events for r in rows) == 6 * n_events
    for r in rows:
        assert 1 <= r.n_users <= r.n_events
        assert r.window_start_epoch % 3600 == 0


def test_interval_union_brute_force(spark, sf_dir):
    iv = defaultdict(list)
    for r in (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("user_id", "cast(unix_timestamp(ts) as long) as s")
        .collect()
    ):
        iv[r.user_id].append((r.s, r.s + 1800))
    rows = {
        r.user_id: r
        for r in REGISTRY["interval_union_coverage"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(rows) == set(iv)
    for uid, spans in iv.items():
        spans.sort()
        covered, islands, cur_s, cur_e = 0, 0, None, None
        for s, e in spans:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e, islands = s, e, islands + 1
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
        r = rows[uid]
        assert r.n_events == len(spans)
        assert r.n_islands == islands
        assert r.covered_seconds == covered


def test_km_monotone_and_accounts_for_every_subject(spark, sf_dir):
    n_viewers = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where("event_type = 'view'")
        .select("user_id")
        .distinct()
        .count()
    )
    rows = sorted(
        REGISTRY["kaplan_meier_conversion"].fn(spark, sf_dir).collect(),
        key=lambda r: r.dur_h,
    )
    assert rows and rows[0].n_risk == n_viewers
    assert sum(r.d_events + r.c_censored for r in rows) == n_viewers
    prev_s, prev_risk = 1.0 + 1e-9, n_viewers + 1
    for r in rows:
        assert 0.0 <= r.survival <= prev_s + 1e-9
        assert r.n_risk < prev_risk or r is rows[0]
        assert 0 <= r.dur_h <= KM_HORIZON_H
        prev_s, prev_risk = r.survival, r.n_risk


def test_largest_remainder_sums_to_100_and_respects_quota(spark, sf_dir):
    rows = (
        REGISTRY["largest_remainder_allocation"].fn(spark, sf_dir).collect()
    )
    assert sum(r.points for r in rows) == 100
    for r in rows:
        # quota property: every allocation is floor or ceil of ideal
        assert abs(r.points - r.ideal_share) < 1.0


def test_stickiness_matches_python(spark, sf_dir):
    """DAU/MAU recomputed from raw events; stickiness in (0, 1]."""
    from stock_trend_predictor_spark.plans.growth_queries import (
        MAU_WINDOW_D,
    )

    du = set()
    for r in (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "cast(floor(unix_timestamp(ts) / 86400) as long) as day",
            "user_id",
        )
        .collect()
    ):
        du.add((r.day, r.user_id))
    days = sorted({d for d, _ in du})
    rows = {
        r.day_epoch_days: r
        for r in REGISTRY["stickiness_rolling_mau"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == set(days)
    for day in days:
        dau = sum(1 for d, _ in du if d == day)
        mau = len(
            {u for d, u in du if day - MAU_WINDOW_D < d <= day}
        )
        r = rows[day]
        assert (r.dau, r.mau) == (dau, mau)
        assert 0.0 < r.stickiness <= 1.0
