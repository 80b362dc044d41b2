"""Law tests for the round-2c query batch: max drawdown, weighted
median, bigram LM, perceptual-hash dedup, count-min sketch.

Each query's value-exactness is already driver-gated by its DuckDB
oracle; these tests assert the *semantic laws* an oracle can't —
guarantee inequalities, candidate completeness vs brute force, and
partitioning invariance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_trend_predictor_spark.plans.registry import REGISTRY


def test_max_drawdown_is_nonnegative_and_bounded(spark, sf_dir):
    rows = REGISTRY["max_drawdown_per_symbol"].fn(spark, sf_dir).collect()
    assert rows, "expected one row per symbol"
    for r in rows:
        # a running peak can never be below the current value
        assert r.max_drawdown >= 0.0
        assert r.global_max >= r.global_min
        assert r.n_ticks > 0


def test_weighted_median_matches_bruteforce(spark, sf_dir):
    import duckdb

    got = {
        r.l_returnflag: r.weighted_median_price
        for r in REGISTRY["weighted_median_price"].fn(spark, sf_dir).collect()
    }
    # brute force: smallest price whose cumulative quantity reaches half
    li = duckdb.sql(
        f"SELECT l_returnflag, l_extendedprice, l_quantity "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    by_flag: dict[str, list[tuple[float, float]]] = {}
    for flag, price, qty in li:
        by_flag.setdefault(flag, []).append((price, qty))
    for flag, pairs in by_flag.items():
        pairs.sort()
        total = sum(q for _, q in pairs)
        cum = 0.0
        for price, qty in pairs:
            cum += qty
            if cum * 2 >= total:
                assert got[flag] == price, flag
                break


def test_bigram_condprobs_sum_to_at_most_one(spark, sf_dir):
    df = REGISTRY["token_bigram_condprob"].fn(spark, sf_dir)
    # the >=3 support filter drops tail continuations, so per-prefix
    # probability mass must be <= 1 and each row's count <= its prefix
    agg = (
        df.groupBy("w1")
        .agg(
            F.sum("cond_prob").alias("mass"),
            F.count(F.lit(1)).alias("n_cont"),
            F.max(F.col("bigram_cnt") > F.col("prefix_cnt")).alias("bad"),
        )
        .collect()
    )
    assert agg
    for r in agg:
        # each cond_prob is rounded half-up at 1e-6, so a full prefix's
        # mass can exceed 1 by at most half an ulp per continuation
        assert r.mass <= 1.0 + 5e-7 * r.n_cont
        assert not r.bad


def test_phash_candidates_are_bruteforce_complete(spark, sf_dir):
    from stock_trend_predictor_spark.operators.multimodal import (
        attach_payload,
        perceptual_hash,
    )
    from stock_trend_predictor_spark.sources.tables import load_table

    got = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["dedup_multimodal_phash"].fn(spark, sf_dir).collect()
    }
    hashes = (
        perceptual_hash(attach_payload(load_table(spark, sf_dir, "documents")))
        .collect()
    )
    brute = {
        (a.doc_id, b.doc_id)
        for a in hashes
        for b in hashes
        if a.doc_id < b.doc_id and bin(a.phash ^ b.phash).count("1") <= 2
    }
    # pigeonhole: 2 flipped bits can break at most 2 of the 4 bands,
    # so banding must recover EVERY hamming<=2 pair — not a recall
    # trade-off like minhash, an exact guarantee
    assert got == brute
    assert brute, "fixture should contain at least one near-dup pair"


def test_countmin_never_underestimates_and_is_partition_proof(spark, sf_dir):
    fn = REGISTRY["sketch_countmin_tokens"].fn
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_est >= r.exact_cnt  # the CMS one-sided guarantee
        assert r.overestimate == r.cms_est - r.exact_cnt

    # same result under a different shuffle width (map-side combine law)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        narrow = {(r.token, r.cms_est) for r in fn(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert narrow == {(r.token, r.cms_est) for r in rows}


def test_forward_asof_matches_bruteforce(spark, sf_dir):
    import duckdb

    got = {
        r.event_id: (r.ts_next, r.value_next)
        for r in REGISTRY["attribution_forward_asof"].fn(spark, sf_dir).collect()
    }
    ev = duckdb.sql(
        f"SELECT event_id, user_id, ts, event_type, value "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    purchases: dict[int, list] = {}
    for eid, uid, ts, typ, val in ev:
        if typ == "purchase":
            purchases.setdefault(uid, []).append((ts, val))
    for lst in purchases.values():
        lst.sort()
    n_matched = 0
    for eid, uid, ts, typ, val in ev:
        if typ != "view":
            continue
        nxt = next(
            (
                (pts, pval)
                for pts, pval in purchases.get(uid, [])
                if pts >= ts and (pts - ts).total_seconds() <= 3600
            ),
            (None, None),
        )
        assert got[eid] == nxt, eid
        n_matched += nxt[0] is not None
    assert n_matched > 0, "fixture should attribute at least one view"


def test_event_sequences_partition_invariant(spark, sf_dir):
    fn = REGISTRY["user_event_sequences"].fn
    base = {tuple(r) for r in fn(spark, sf_dir).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        narrow = {tuple(r) for r in fn(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    # collect_list with an explicit sort_array total order is the only
    # reason this holds — the law the query exists to demonstrate
    assert narrow == base


def test_span_masks_respect_bounds(spark, sf_dir):
    rows = REGISTRY["span_corruption_masks"].fn(spark, sf_dir).collect()
    assert rows
    some_overlap = False
    for r in rows:
        assert r.n_spans == r.n_tokens // 20
        assert r.n_masked <= 3 * r.n_spans
        assert r.n_masked <= r.n_tokens
        if r.n_spans and r.n_masked < 3 * r.n_spans:
            some_overlap = True
        if r.n_spans == 0:
            assert r.n_masked == 0
    assert some_overlap, "hashed spans should overlap somewhere"


def test_oov_rate_zero_for_vocab_only_docs(spark, sf_dir):
    rows = REGISTRY["oov_rate_vs_vocab"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens


def test_concurrency_sweep_matches_single_partition_form(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from stock_trend_predictor_spark.sources.tables import load_table

    got = {
        (r.hour, r.peak_concurrency)
        for r in REGISTRY["concurrent_intervals_profile"]
        .fn(spark, sf_dir)
        .collect()
    }
    # naive single-window global sweep (the form that doesn't scale)
    views = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "view")
        .select("ts")
    )
    pts = views.select(F.col("ts").alias("t"), F.lit(1).alias("delta")).unionByName(
        views.select(
            (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    conc = F.sum("delta").over(Window.orderBy("t", "delta"))
    naive = {
        (r.hour, r.peak)
        for r in pts.select(F.date_trunc("hour", "t").alias("hour"), conc.alias("c"))
        .groupBy("hour")
        .agg(F.max("c").cast("bigint").alias("peak"))
        .collect()
    }
    assert got == naive


def test_pareto_prefix_is_minimal_and_sorted(spark, sf_dir):
    rows = sorted(
        REGISTRY["pareto_customer_revenue"].fn(spark, sf_dir).collect(),
        key=lambda r: r.rk,
    )
    assert rows
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    # revenue non-increasing down the ranking; last row crosses 80%
    for a, b in zip(rows, rows[1:]):
        assert a.revenue >= b.revenue
    assert rows[-1].cum_share >= 0.8
    if len(rows) > 1:
        assert rows[-2].cum_share < 0.8


def test_rolling_pair_correlation_is_bounded(spark, sf_dir):
    rows = REGISTRY["rolling_pair_correlation"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 2 <= r.n_win <= 24
        if r.corr24 is not None:
            assert -1.0 - 1e-6 <= r.corr24 <= 1.0 + 1e-6


def test_label_centroids_match_numpy(spark, sf_dir):
    import duckdb
    import numpy as np

    got = {
        (r.label_a, r.label_b): r.centroid_cos
        for r in REGISTRY["label_centroid_distances"].fn(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"SELECT label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    sums: dict[int, np.ndarray] = {}
    for label, emb in rows:
        v = np.asarray(emb, dtype=np.float64)
        sums[label] = sums.get(label, 0) + v
    labels = sorted(sums)
    assert len(got) == len(labels) * (len(labels) - 1) // 2
    for i, la in enumerate(labels):
        for lb in labels[i + 1 :]:
            a, b = sums[la], sums[lb]
            want = float(a @ b / np.sqrt((a @ a) * (b @ b)))
            assert abs(got[(la, lb)] - want) < 1e-4, (la, lb)


def test_runlength_reconstructs_event_count(spark, sf_dir):
    from stock_trend_predictor_spark.sources.tables import load_table

    runs = REGISTRY["runlength_encode_user_events"].fn(spark, sf_dir)
    total = runs.agg(F.sum("run_len")).collect()[0][0]
    n_events = load_table(spark, sf_dir, "events").count()
    # RLE is lossless on counts: run lengths sum back to the stream
    assert total == n_events
    bad = runs.where(
        (F.col("run_len") < 1) | (F.col("start_ts") > F.col("end_ts"))
    ).count()
    assert bad == 0


def test_seasonality_grid_is_bounded(spark, sf_dir):
    rows = REGISTRY["seasonality_profile"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 168
    for r in rows:
        assert 0 <= r.dow <= 6 and 0 <= r.hod <= 23
        assert r.min_value <= r.mean_value <= r.max_value


def test_interarrival_histogram_accounts_for_every_gap(spark, sf_dir):
    from stock_trend_predictor_spark.sources.tables import load_table

    hist = REGISTRY["interarrival_histogram"].fn(spark, sf_dir)
    per_type = {
        r.event_type: r.total
        for r in hist.groupBy("event_type")
        .agg(F.sum("n_gaps").alias("total"))
        .collect()
    }
    counts = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # every event except the first of its key produces exactly one gap
    for typ, n in counts.items():
        assert per_type.get(typ, 0) == n - 1
