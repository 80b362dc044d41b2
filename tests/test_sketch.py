"""Approximate-aggregate error bounds (sketches have no value oracle;
their contract is the error envelope)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_trend_predictor_spark.plans import REGISTRY
from stock_trend_predictor_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_approx_quantiles_within_error_bound(spark):
    approx = {
        r["o_orderpriority"]: (r["p50"], r["p95"], r["p99"])
        for r in REGISTRY["sketch_quantiles"].fn(spark, SF_DIR).collect()
    }
    exact = {
        r["o_orderpriority"]: r["p"]
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr(
                "percentile(o_totalprice, array(0.5, 0.95, 0.99))"
            ).alias("p")
        )
        .collect()
    }
    for k, ex in exact.items():
        for a, e in zip(approx[k], ex):
            assert abs(a - e) / e <= 0.02, f"{k}: {a} vs {e}"


def test_hll_rollup_merge_consistent(spark):
    """Merged sketches (union of per-group sketches) must estimate the
    SAME population as a sketch built directly over the raw data — the
    mergeability law the 100 TB rollup depends on. <=2% of exact."""
    rows = REGISTRY["sketch_cardinality_rollup"].fn(spark, SF_DIR).collect()
    got = {
        (r["orderstatus"], r["orderpriority"]): r["approx_customers"]
        for r in rows
    }
    orders = load_table(spark, SF_DIR, "orders")
    exact_total = orders.select("o_custkey").distinct().count()
    merged_total = got[("ALL", "ALL")]
    assert abs(merged_total - exact_total) / exact_total <= 0.02
    # every per-status merged estimate within 2% of its exact count
    exact_status = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for status, exact in exact_status.items():
        est = got[(status, "ALL")]
        assert abs(est - exact) / exact <= 0.02, f"{status}: {est} vs {exact}"
    # row count: fine cells + one per status + grand total
    n_fine = orders.select("o_orderstatus", "o_orderpriority").distinct().count()
    assert len(rows) == n_fine + len(exact_status) + 1


def test_hll_within_error_bound(spark):
    approx = {
        r["o_orderpriority"]: r["approx_customers"]
        for r in REGISTRY["sketch_cardinality"].fn(spark, SF_DIR).collect()
    }
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, e in exact.items():
        rel_err = abs(approx[k] - e) / e
        assert rel_err <= 0.05, f"{k}: approx {approx[k]} vs exact {e}"


def test_cms_merge_law_arbitrary_split(spark):
    """CMS cells are a commutative monoid: partials from any split of
    the corpus merge into exactly the full-data sketch."""
    from stock_trend_predictor_spark.operators.summaries import (
        cms_cell_partials,
        cms_merge,
    )

    tok = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )
    counts = lambda df: df.groupBy("token").agg(  # noqa: E731
        F.count(F.lit(1)).alias("cnt")
    )
    full = cms_cell_partials(counts(tok))
    a = tok.where(F.col("doc_id") % 3 == 0)
    b = tok.where(F.col("doc_id") % 3 == 1)
    c = tok.where(F.col("doc_id") % 3 == 2)
    merged = cms_merge(*[cms_cell_partials(counts(p)) for p in (a, b, c)])
    as_rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert as_rows(merged) == as_rows(full)


def test_cms_sink_streaming_equals_batch(spark, tmp_path):
    """Stream-maintained CMS state (file stream -> foreachBatch merge)
    must give the same estimates as the one-shot batch sketch."""
    from stock_trend_predictor_spark.operators.summaries import (
        cms_cell_partials,
        cms_estimate,
        cms_sink,
    )

    tok = (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
    )
    src = tmp_path / "in"
    src.mkdir()
    state = str(tmp_path / "cms_state")
    tok.repartition(4).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = cms_sink(stream, state, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    from stock_trend_predictor_spark.operators.summaries import read_cms_state

    cells_stream = read_cms_state(spark, state)
    assert cells_stream.count() <= 4 * 1024  # state stays sketch-sized
    probes = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(20)
    )
    batch_cells = cms_cell_partials(
        tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    )
    est_stream = {
        (r.token, r.cms_est)
        for r in cms_estimate(cells_stream, probes).collect()
    }
    est_batch = {
        (r.token, r.cms_est)
        for r in cms_estimate(batch_cells, probes).collect()
    }
    assert est_stream == est_batch


def test_cms_state_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-applying an already-committed
    batch_id must be a no-op (no double counting), and the committed
    META must always resolve to a complete cells table."""
    from stock_trend_predictor_spark.operators.summaries import (
        read_cms_state,
        update_cms_state,
    )

    state = str(tmp_path / "cms_state")
    b0 = spark.createDataFrame([("a",), ("a",), ("b",)], "token string")
    b1 = spark.createDataFrame([("a",), ("c",)], "token string")

    update_cms_state(spark, b0, state, batch_id=0)
    once = sorted(tuple(r) for r in read_cms_state(spark, state).collect())
    update_cms_state(spark, b0, state, batch_id=0)  # replay: must skip
    replay = sorted(tuple(r) for r in read_cms_state(spark, state).collect())
    assert once == replay

    update_cms_state(spark, b1, state, batch_id=1)
    after = sorted(tuple(r) for r in read_cms_state(spark, state).collect())
    assert after != once
    update_cms_state(spark, b1, state, batch_id=1)  # replay of latest
    assert after == sorted(
        tuple(r) for r in read_cms_state(spark, state).collect()
    )


def test_hh_sink_stream_candidates_recover_exact_heavy_hitters(spark, tmp_path):
    """Streamed Misra-Gries state (file stream -> foreachBatch merge)
    must stay <= k rows AND remain a candidate superset: re-counting
    its tokens exactly reproduces the batch heavy-hitter set; stored
    lower bounds never exceed true counts."""
    from stock_trend_predictor_spark.operators.summaries import (
        heavy_hitters_exact,
        heavy_hitters_sink,
        read_hh_state,
    )

    tok = (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
    )
    src = tmp_path / "in"
    src.mkdir()
    state = str(tmp_path / "hh_state")
    tok.repartition(4).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = heavy_hitters_sink(stream, state, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    counters = read_hh_state(spark, state)
    assert counters is not None
    rows = counters.collect()
    assert 0 < len(rows) <= 64  # summary-sized forever

    true_counts = {
        r.token: r.cnt
        for r in tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for r in rows:
        assert r.lower_bound <= true_counts[r.token]

    # exact re-count restricted to streamed candidates == batch result
    n_total = sum(true_counts.values())
    import math

    thresh = math.ceil(0.02 * n_total)
    streamed = {
        t for t, c in true_counts.items()
        if t in {r.token for r in rows} and c >= thresh
    }
    batch = {
        r.tok for r in heavy_hitters_exact(
            tok.select(F.col("token").alias("tok")), threshold_frac=0.02
        ).collect()
    }
    assert streamed == batch


def test_hh_state_replay_idempotent_and_merge_matches_oneshot(spark, tmp_path):
    """Replayed batch ids are no-ops; merging batches sequentially
    yields the same counters as summarizing the concatenation in one
    update (the mergeable-summaries law on a small exact case)."""
    from stock_trend_predictor_spark.operators.summaries import (
        read_hh_state,
        update_hh_state,
    )

    b0 = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)], "token string"
    )
    b1 = spark.createDataFrame([("a",)] * 2 + [("d",)] * 4, "token string")

    s_seq = str(tmp_path / "seq")
    update_hh_state(spark, b0, s_seq, batch_id=0)
    update_hh_state(spark, b0, s_seq, batch_id=0)  # replay: must skip
    after_replay = sorted(
        tuple(r) for r in read_hh_state(spark, s_seq).collect()
    )
    update_hh_state(spark, b0, s_seq, batch_id=0)  # and again
    assert after_replay == sorted(
        tuple(r) for r in read_hh_state(spark, s_seq).collect()
    )
    update_hh_state(spark, b1, s_seq, batch_id=1)
    seq = sorted(tuple(r) for r in read_hh_state(spark, s_seq).collect())

    s_one = str(tmp_path / "one")
    update_hh_state(spark, b0.unionAll(b1), s_one, batch_id=0)
    one = sorted(tuple(r) for r in read_hh_state(spark, s_one).collect())
    # k=64 >> distinct tokens here, so no reduction fires and the
    # merge law is exact equality of counters
    assert seq == one


def test_hll_sink_streaming_equals_batch(spark, tmp_path):
    """Stream-maintained per-key HLL state must estimate the same
    distinct-user counts as a one-shot batch sketch, and the batch
    estimates must be within the ~2% HLL band of exact."""
    from stock_trend_predictor_spark.operators.summaries import (
        hll_estimates,
        hll_partials,
        hll_sink,
        read_hll_state,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "user_id"
    )
    src = tmp_path / "in"
    src.mkdir()
    state = str(tmp_path / "hll_state")
    ev.repartition(4).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = hll_sink(stream, state, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    sk = read_hll_state(spark, state)
    assert sk.count() == ev.select("event_type").distinct().count()
    est_stream = {
        (r.key, r.distinct_est) for r in hll_estimates(sk).collect()
    }
    est_batch = {
        (r.key, r.distinct_est)
        for r in hll_estimates(hll_partials(ev)).collect()
    }
    assert est_stream == est_batch
    exact = {
        r.event_type: r.n
        for r in ev.distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for key, est in est_batch:
        assert abs(est - exact[key]) <= max(2, 0.05 * exact[key])


def test_hll_state_replay_idempotent(spark, tmp_path):
    """Re-applying an already-committed batch_id is a no-op, and even
    FORCING a re-merge of the same data cannot change the estimates
    (HLL union is register-max, hence idempotent)."""
    from stock_trend_predictor_spark.operators.summaries import (
        hll_estimates,
        read_hll_state,
        update_hll_state,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "user_id"
    )
    state = str(tmp_path / "hll_state")
    update_hll_state(spark, ev, state, batch_id=0)
    first = sorted(hll_estimates(read_hll_state(spark, state)).collect())
    # replayed batch id: state-store gate skips it
    update_hll_state(spark, ev, state, batch_id=0)
    second = sorted(hll_estimates(read_hll_state(spark, state)).collect())
    assert first == second
    # new batch id, same data: union idempotence keeps estimates fixed
    update_hll_state(spark, ev, state, batch_id=1)
    third = sorted(hll_estimates(read_hll_state(spark, state)).collect())
    assert first == third
