"""Law tests for the round-3c batches: spectral/microstructure,
text classification, reproducible sketches tier 2, lakehouse
maintenance, feature engineering, kNN vote, and lateness profiling.

The oracle-parity suite already proves Spark == DuckDB bit-for-bit for
each of these; here are the properties an oracle equality can't
express — estimator error bounds, Parseval-style sanity, packing
feasibility, gain non-negativity, and Python brute-force replays.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from stock_trend_predictor_spark.plans import REGISTRY


def test_dft_power_nonnegative_and_low_energy_bound(spark, sf_dir):
    """Every harmonic's power is >= 0, and (Parseval) the power at any
    harmonic cannot exceed the series' total variance — checked
    against a Python recompute of the daily-mean series."""
    rows = REGISTRY["dft_power_spectrum"].fn(spark, sf_dir).collect()
    assert rows
    days = defaultdict(lambda: defaultdict(list))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    for e in ev:
        days[e.event_type][int(e.ts.timestamp() // 86400)].append(e.value)
    var = {}
    for sym, by_day in days.items():
        xs = [sum(v) / len(v) for _, v in sorted(by_day.items())]
        m = sum(xs) / len(xs)
        var[sym] = sum((x - m) ** 2 for x in xs)
    for r in rows:
        assert r.power >= 0.0
        # |sum((x-m) e^{-iwt})|^2 / N <= N * var by Cauchy-Schwarz
        assert r.power <= var[r.symbol] * len(days[r.symbol]) + 1e-6


def test_permutation_entropy_bounds_and_replay(spark, sf_dir):
    """Entropy normalized by ln 6 lies in [0, 1]; pattern counts
    replayed in Python over the same (ts, tick_id) order match."""
    rows = REGISTRY["permutation_entropy"].fn(spark, sf_dir).collect()
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    series = defaultdict(list)
    for e in ev:
        series[e.event_type].append((e.ts, e.event_id, e.value))
    for r in rows:
        assert 0.0 <= r.perm_entropy <= 1.0
        assert 1 <= r.n_codes <= 6
        xs = [v for _, _, v in sorted(series[r.symbol])[: None]]
        pats = Counter()
        for a, b, c in zip(xs, xs[1:], xs[2:]):
            pats[(a <= b, b <= c, a <= c)] += 1
        n = sum(pats.values())
        assert n == r.n_triples
        h = -sum(p / n * math.log(p / n) for p in pats.values())
        assert abs(h / math.log(6) - r.perm_entropy) < 1e-5


def test_range_vol_dominates_and_positive(spark, sf_dir):
    """Parkinson vol is positive wherever any day had a real range,
    and the day count matches the >=2-tick positive-value days."""
    rows = REGISTRY["parkinson_gk_volatility"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_days > 0
        assert r.parkinson_vol >= 0.0
        # GK variance can be negative per-day but its mean should be
        # within an order of magnitude of the Parkinson variance.
        assert abs(r.gk_var) < 10.0 * (r.parkinson_vol**2 + 1e-9) + 1.0


def test_amihud_positive(spark, sf_dir):
    rows = REGISTRY["amihud_illiquidity"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.amihud_x1e6 >= 0.0
        assert r.n_days >= 1


def test_nb_classifier_counts_partition_test_docs(spark, sf_dir):
    """Per-language doc counts sum to the number of odd doc_ids, and
    accuracy is a valid fraction n_correct / n_docs."""
    rows = REGISTRY["nb_lang_classifier"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    n_odd = sum(1 for d in docs if d.doc_id % 2 == 1)
    assert sum(r.n_docs for r in rows) == n_odd
    for r in rows:
        assert 0 <= r.n_correct <= r.n_docs
        assert abs(r.accuracy - r.n_correct / r.n_docs) < 1e-6


def test_forcast_readability_replay(spark, sf_dir):
    """Python replay of the vowel-group syllable heuristic matches the
    per-language aggregates exactly (integer counts)."""
    import re

    rows = {r.lang: r for r in REGISTRY["forcast_readability"].fn(
        spark, sf_dir
    ).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])  # words, sylls, monos, polys
    for d in docs:
        for t in d.text.split(" "):
            s = max(len(re.findall(r"[aeiou]+", t)), 1)
            a = agg[d.lang]
            a[0] += 1
            a[1] += s
            a[2] += s == 1
            a[3] += len(re.findall(r"[aeiou]+", t)) >= 3
    for lang, (w, s, m, p) in agg.items():
        r = rows[lang]
        assert r.n_words == w
        assert abs(r.syllables_per_word - s / w) < 1e-5
        assert abs(r.forcast_grade - (20.0 - 15.0 * m / w)) < 1e-5
        assert abs(r.polysyllabic_frac - p / w) < 1e-5


def test_kmv_estimate_within_theoretical_error(spark, sf_dir):
    """KMV with k=64 has relative standard error ~ 1/sqrt(k-2) ~ 13%;
    every key's estimate must land within 5 sigma of exact."""
    rows = REGISTRY["kmv_distinct_users"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.kmv_estimate > 0
        assert r.rel_error <= 5.0 / math.sqrt(62), (
            r.event_type,
            r.rel_error,
        )


def test_bloom_fpr_sane(spark, sf_dir):
    """All bits set <= m; measured FPR is a valid fraction and within
    an order of magnitude + slack of the load-factor prediction."""
    [r] = REGISTRY["bloom_filter_fpr"].fn(spark, sf_dir).collect()
    assert 0 < r.n_bits_set <= 4096
    assert 0 <= r.n_false_pos <= r.n_probes
    assert r.measured_fpr <= 10.0 * r.predicted_fpr + 0.01


def test_degree_assortativity_in_range(spark, sf_dir):
    [r] = REGISTRY["degree_assortativity"].fn(spark, sf_dir).collect()
    assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9
    assert r.n_endpoints > 0 and r.n_endpoints % 2 == 0


def test_compaction_pack_feasible(spark, sf_dir):
    """Output file count is what the byte total implies: every bucket
    except possibly the last per source starts before the target
    boundary, so n_output_files == ceil-ish bound and fill <= slack."""
    from stock_trend_predictor_spark.plans.engineering_queries import (
        COMPACT_TARGET,
    )

    rows = REGISTRY["compaction_bin_packing"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        lo = math.ceil(r.total_bytes / (COMPACT_TARGET * 2))
        assert lo <= r.n_output_files <= r.n_input_files
        # offset-packing guarantee: a bucket spans < target + max file
        assert r.n_output_files >= r.total_bytes // COMPACT_TARGET - 1


def test_pruning_stats_consistent(spark, sf_dir):
    """Zone maps are internally consistent and the prunable verdict
    matches its own stats row."""
    from stock_trend_predictor_spark.plans.engineering_queries import (
        PRUNE_QTY_LO,
    )

    rows = REGISTRY["partition_pruning_stats"].fn(spark, sf_dir).collect()
    assert rows
    total = rows[0].total_prunable_rows
    acc = 0
    for r in rows:
        assert r.min_qty <= r.max_qty
        assert r.min_price <= r.max_price
        assert r.prunable == (r.max_qty < PRUNE_QTY_LO)
        assert r.total_prunable_rows == total
        if r.prunable:
            acc += r.n_rows
    assert acc == total


def test_decision_stump_gain_nonnegative_accuracy_floor(spark, sf_dir):
    """Gini gain of the best split is >= 0 (splitting can't hurt the
    weighted impurity) and train accuracy is at least the majority-
    class rate implied by a zero-gain split."""
    rows = REGISTRY["decision_stump_movement"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.gini_gain >= -1e-9, r.symbol
        assert 0.5 - 1e-9 <= r.train_accuracy <= 1.0


def test_target_encoding_excludes_own_fold(spark, sf_dir):
    """Brute-force replay: each (priority, fold) encoding equals the
    mean of o_totalprice over the OTHER folds."""
    rows = REGISTRY["target_encoding_kfold"].fn(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    sums = defaultdict(lambda: [0.0, 0])
    for o in orders:
        sums[(o.o_orderpriority, o.o_orderkey % 5)][0] += o.o_totalprice
        sums[(o.o_orderpriority, o.o_orderkey % 5)][1] += 1
    for r in rows:
        s = sum(v[0] for k, v in sums.items()
                if k[0] == r.priority and k[1] != r.fold)
        n = sum(v[1] for k, v in sums.items()
                if k[0] == r.priority and k[1] != r.fold)
        assert abs(r.target_encoding - s / n) < 1e-4, (r.priority, r.fold)


def test_knn_vote_counts(spark, sf_dir):
    """Per-label query counts sum to the fixed query-set size."""
    from stock_trend_predictor_spark.plans.similarity_queries import (
        KNN_VOTE_NQ,
    )

    rows = REGISTRY["knn_label_vote"].fn(spark, sf_dir).collect()
    n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_queries for r in rows) == min(KNN_VOTE_NQ, n_emb)
    for r in rows:
        assert 0 <= r.n_correct <= r.n_queries


def test_lateness_profile_replay(spark, sf_dir):
    """Python replay of the running-max lateness in event_id order
    matches n_late and the drop counts exactly."""
    rows = {r.event_type: r for r in REGISTRY[
        "watermark_lateness_profile"
    ].fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    streams = defaultdict(list)
    for e in ev:
        streams[e.event_type].append((e.event_id, int(e.ts.timestamp())))
    for et, xs in streams.items():
        xs.sort()
        hi, late, d60, d300, mx = -(10**18), 0, 0, 0, 0
        for _, t in xs:
            hi = max(hi, t)
            l = hi - t
            late += l > 0
            d60 += l > 60
            d300 += l > 300
            mx = max(mx, l)
        r = rows[et]
        assert r.n_events == len(xs)
        assert r.n_late == late
        assert r.n_drop_60s == d60
        assert r.n_drop_300s == d300
        assert r.max_late_s == mx
