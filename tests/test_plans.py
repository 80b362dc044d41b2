"""Plan-shape regression tests: lock in the physical properties the
100 TB design depends on — filter pushdown to the parquet scan,
broadcast joins for dimensions, no shuffle where none is needed.
A refactor that silently loses one of these still passes value checks
at test SF but regresses at scale; these tests catch it."""

from __future__ import annotations

import pytest

from stock_trend_predictor_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return str(REGISTRY[name].fn(spark, SF_DIR)._jdf.queryExecution().executedPlan())


def test_q1_filter_reaches_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q5_dims_broadcast(spark):
    plan = _plan(spark, "q5_regional_revenue")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan  # all dims fit the threshold here


def test_q1_column_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # the lineitem scan must not read join keys it doesn't need
    assert "l_partkey" not in plan
    assert "l_suppkey" not in plan


def test_knn_corpus_not_shuffled(spark):
    plan = _plan(spark, "knn_bruteforce_cosine")
    # queries broadcast; corpus side stays narrow (single stage scan)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_global_topk_avoids_full_sort(spark):
    plan = _plan(spark, "global_topk")
    assert "TakeOrderedAndProject" in plan


def test_asof_join_no_cartesian(spark):
    """The as-of join must stay union+window — a range-join fallback
    (BroadcastNestedLoopJoin / CartesianProduct) explodes at scale."""
    plan = _plan(spark, "asof_join_purchase_view")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_dedup_exact_partial_aggregation(spark):
    plan = _plan(spark, "dedup_exact")
    # map-side combine before the exchange: two HashAggregate levels
    assert plan.count("HashAggregate") >= 2


def test_grouping_sets_expand_keeps_partial_agg(spark):
    """GROUPING SETS must execute as Expand + two-level aggregate —
    one shuffle carrying partials, not one pass per set."""
    plan = _plan(spark, "grouping_sets_status_priority")
    assert "Expand" in plan
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1


def test_vocab_topk_is_heap_not_sort(spark):
    plan = _plan(spark, "vocab_topk_tokens")
    assert "TakeOrderedAndProject" in plan
    # the token counts still combine map-side before the shuffle
    assert plan.count("HashAggregate") >= 2


def test_full_outer_is_smj_not_broadcast(spark):
    """Full outer preserves unmatched rows from BOTH sides, so neither
    side may broadcast; the correct shape is a sort-merge join."""
    plan = _plan(spark, "join_full_outer")
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    assert "BroadcastHashJoin" not in plan
    # the aggregate exchanges already hash on custkey, so the join
    # itself adds NO exchange: 2 total (one per aggregated input)
    assert plan.count("Exchange") == 2


def test_int8_quantize_is_narrow(spark):
    """Quantization is a pure per-row map — any Exchange means a
    shuffle crept into a narrow pipeline."""
    plan = _plan(spark, "embedding_int8_quantize")
    assert "Exchange" not in plan


def test_q6_all_filters_pushed(spark):
    """Q6's value is the selective scan: every predicate must reach
    the parquet reader, and the only exchange is the single-row
    final-aggregate combine."""
    plan = _plan(spark, "q6_selective_revenue")
    # the plan string elides long PushedFilters lists at ~100 chars, so
    # assert the visible prefix: all three filter columns reach the scan
    assert (
        "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), "
        "IsNotNull(l_quantity), GreaterThanOrEqual(l_shipda" in plan
    )
    assert plan.count("Exchange") == 1  # SinglePartition combine only


def test_q18_topk_is_heap(spark):
    plan = _plan(spark, "q18_big_spenders")
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT 100


def test_tfidf_small_sides_broadcast(spark):
    """df (vocabulary-sized) and N (scalar) must broadcast — shuffling
    the token stream against them would be a 100 TB-scale join of the
    corpus against a dictionary."""
    plan = _plan(spark, "tfidf_top_terms")
    assert "BroadcastHashJoin" in plan  # tf ⋈ df
    assert "BroadcastNestedLoopJoin" in plan  # ⨯ scalar N


def test_anomaly_stats_broadcast(spark):
    """The per-key median/MAD tables are one-row-per-key — both joins
    back to the event stream must be broadcasts."""
    plan = _plan(spark, "event_value_anomaly_mad")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_gapfill_no_cartesian(spark):
    """Grid gen must be sequence/explode per key + equi-join back —
    never a range/cross join of grid x events."""
    plan = _plan(spark, "gapfill_hourly_forward")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan  # the forward-fill pass


def test_chunk_dup_combines_map_side(spark):
    """Chunk-hash counting must partial-aggregate before its exchange
    (only 8-byte hashes shuffle, pre-combined)."""
    plan = _plan(spark, "chunk_dup_fraction")
    assert plan.count("HashAggregate") >= 2


def test_correlated_subquery_is_decorrelated(spark):
    """The correlated scalar subquery must compile to aggregate+join,
    never a per-row subquery (quadratic at scale)."""
    plan = _plan(spark, "orders_above_customer_avg")
    assert "HashAggregate" in plan  # the decorrelated per-customer avg
    assert "Join" in plan  # rejoined on o_custkey
    assert "Subquery" not in plan  # no per-row re-execution survives


def test_lateral_topk_is_decorrelated(spark):
    """The correlated LATERAL (ORDER BY + LIMIT per outer row) must
    compile to a set-oriented plan — a join against a ranked/limited
    build, never a per-outer-row subquery re-execution."""
    plan = _plan(spark, "lateral_topk_per_status")
    assert "Join" in plan
    assert "Subquery" not in plan


def test_variant_battery_single_parse(spark):
    """parse_json must be bound once (common subexpression), not
    re-parsed per extraction: the plan projects from one variant."""
    plan = _plan(spark, "variant_function_battery")
    # pushdown still reaches the scan under the variant projection
    assert "PushedFilters:" in plan


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """With broadcast off, a selective build side gets a runtime bloom
    filter injected on the probe side (Spark's row-level runtime
    filtering) — and the filtered join result is identical to the
    unfiltered-plan result."""
    from pyspark.sql import functions as F

    from stock_trend_predictor_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "P"
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower(), plan
        with_bloom = sorted(map(tuple, j.collect()))
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    without = sorted(map(tuple, j.collect()))
    assert with_bloom == without


def test_q10_aggregates_before_dimension_join(spark):
    """The per-customer rollup must happen at o_custkey grain before
    the customer table is joined (customer is not broadcast-sized at
    scale), and the top-20 must be a heap, not a global sort."""
    plan = _plan(spark, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan
    # the aggregate keys are o_custkey only — grouping by customer
    # attributes would prove the dimension was joined pre-rollup
    assert "HashAggregate(keys=[o_custkey" in plan, plan


def test_join_strategy_hints_are_honored(spark, sf_dir):
    """Strategy hints override Catalyst's default pick — the manual
    lever when runtime stats mislead (e.g. a filter Catalyst cannot
    estimate): SHUFFLE_HASH avoids the SMJ sort, MERGE forces it,
    BROADCAST pins the dim side. Results identical across all three."""
    from pyspark.sql import functions as F

    from stock_trend_predictor_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        results = []
        for hint, node in (
            ("shuffle_hash", "ShuffledHashJoin"),
            ("merge", "SortMergeJoin"),
            ("broadcast", "BroadcastHashJoin"),
        ):
            j = li.join(
                orders.hint(hint),
                li["l_orderkey"] == orders["o_orderkey"],
            ).groupBy("o_orderstatus").agg(
                F.count(F.lit(1)).alias("n")
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert node in plan, (hint, plan)
            results.append(sorted(map(tuple, j.collect())))
        assert results[0] == results[1] == results[2]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q7_supplier_broadcast_and_shipdate_pushdown(spark):
    plan = _plan(spark, "q7_nation_volume")
    # nation-filtered supplier side broadcasts into the fact scan
    assert "BroadcastHashJoin" in plan
    # shipdate range reaches the lineitem parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_triangle_count_no_cartesian(spark):
    plan = _plan(spark, "triangle_count_copurchase")
    # wedge + closing joins are hash/sort-merge equi-joins; the only
    # nested-loop join allowed is the final 1-row stats cross join
    assert plan.count("CartesianProduct") == 0


def test_dup_span_no_cartesian_and_hash_only_shuffle(spark):
    """The span pass must never plan a cartesian/BNLJ (it is linear by
    construction), and the gram exchange must carry the 60-bit hash —
    never gram text."""
    plan = _plan(spark, "dup_span_detection")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_perplexity_count_tables_broadcast(spark):
    """The left-context count table and the vocab scalar broadcast;
    the only shuffled join key is the (l, r) bigram."""
    plan = _plan(spark, "doc_bigram_perplexity")
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan


def test_indicator_windows_planned_once(spark):
    """The no-window-CSE rule: each indicator must plan exactly ONE
    Window operator batch per frame with its aggregates bound once —
    Bollinger needs 3 sliding aggregates (sum, sum, count), not 37."""
    plan = _plan(spark, "bollinger_bands_20")
    # the ticks lag + the 20-row stats frame = 2 Window operators
    assert plan.count("Window ") <= 2, plan.count("Window ")
    # 3 bound aggregates appear in the frame spec; a CSE regression
    # shows up as dozens of _we columns
    import re

    wes = set(re.findall(r"_we\d+", plan))
    assert len(wes) <= 6, sorted(wes)


def test_mann_kendall_single_exchange(spark):
    """All ten lag columns and the sign aggregate must ride ONE
    symbol exchange — extra exchanges mean the stack re-sorted."""
    plan = _plan(spark, "mann_kendall_banded")
    assert plan.count("Exchange") <= 2  # sort shuffle + final agg
    assert "CartesianProduct" not in plan
    assert plan.count("Window ") <= 1  # one lag batch


def test_theil_sen_shares_the_lag_plan(spark):
    """Same banding, same single-sort shape as Mann-Kendall."""
    plan = _plan(spark, "theil_sen_banded_slope")
    assert plan.count("Window ") <= 1
    assert "CartesianProduct" not in plan


def test_changepoint_no_rescan_per_candidate(spark):
    """Prefix sums + a totals join + one rank — never a nested loop
    over candidate splits."""
    plan = _plan(spark, "changepoint_binary_split")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window ") <= 3  # prefix sums batch + rank


def test_beta_market_table_broadcast(spark):
    """The per-hour market table must come back as a broadcast join,
    not a shuffled SMJ against the returns."""
    plan = _plan(spark, "beta_vs_market_hourly")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_keyness_windows_on_aggregated_counts(spark):
    """chi2/PMI marginals must window over the aggregated count table
    (post-HashAggregate), and the top-50 must be a heap cut."""
    for name in ("chi2_token_keyness", "token_pmi_collocations"):
        plan = _plan(spark, name)
        assert "TakeOrderedAndProject" in plan, name
        assert "CartesianProduct" not in plan, name


def test_novelty_preaggregates_before_gram_shuffle(spark):
    """The (doc, gram) distinct pre-aggregate must run before the
    gram-keyed exchange so within-doc repeats never shuffle, and no
    document text may enter an exchange."""
    plan = _plan(spark, "ngram_novelty_decay")
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 4


def test_dsir_broadcast_models_no_window(spark):
    """dsir_importance_weights: both bucket models and the log-ratio
    table are <=2048-row parameter tables and must BROADCAST back to
    the exploded corpus; the per-doc weight is a doc_id-keyed
    aggregation — any SortMergeJoin (corpus-vs-dictionary shuffle) or
    Window (there is no windowed step) is a scale regression."""
    plan = _plan(spark, "dsir_importance_weights")
    assert "BroadcastHashJoin" in plan  # exploded ⋈ log-ratio table
    assert "BroadcastNestedLoopJoin" in plan  # ⨯ scalar totals row
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_dsir_gumbel_topk_is_heap_not_sort(spark):
    """dsir_gumbel_topk_sample's selection must be a
    TakeOrderedAndProject (per-partition heaps + driver merge of K
    rows) — a full global Sort for a K-row result is the classic
    scale regression."""
    plan = _plan(spark, "dsir_gumbel_topk_sample")
    assert "TakeOrderedAndProject" in plan
