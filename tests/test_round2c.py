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
