"""Round-6 law tests: DSIR importance resampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_trend_predictor_spark.plans.registry import REGISTRY


def test_dsir_importance_weight_laws(spark, sf_dir):
    """dsir_importance_weights: (1) kept <=> log_weight > 0;
    (2) every document is scored exactly once with the full feature
    count (2*tokens - 1: unigrams + adjacent bigrams); (3) the
    discriminative law — the target slice (lang='en') must score a
    strictly higher mean weight than the rest, otherwise the
    importance model learned nothing."""
    out = REGISTRY["dsir_importance_weights"].fn(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # law 1: the keep rule is exactly the sign of the weight
    assert out.where(F.col("kept") != (F.col("log_weight") > 0)).count() == 0

    # law 2: one row per document, n_feats = 2*tokens - 1
    assert out.count() == docs.count()
    expected = docs.select(
        "doc_id",
        (2 * F.size(F.split("text", " ")) - 1).cast("bigint").alias("e"),
    )
    bad = out.join(expected, "doc_id").where(F.col("n_feats") != F.col("e"))
    assert bad.count() == 0, bad.collect()[:5]

    # law 3: the en slice outscores the rest on average
    means = dict(
        out.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg("log_weight").alias("m"))
        .collect()
    )
    assert means[True] > means[False], means


def test_dsir_gumbel_sample_laws(spark, sf_dir):
    """dsir_gumbel_topk_sample: exactly K rows; the sample is biased
    toward the target slice (its en-fraction exceeds the corpus's —
    the whole point of importance resampling); keys are consistent
    with the weight pass (gumbel_key - log_weight is a bounded Gumbel
    perturbation, here |g| < 20 for 28-bit uniforms)."""
    out = REGISTRY["dsir_gumbel_topk_sample"].fn(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 100
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    en_corpus = sum(1 for v in langs.values() if v == "en") / len(langs)
    en_sample = sum(1 for r in rows if langs[r.doc_id] == "en") / len(rows)
    assert en_sample > en_corpus, (en_sample, en_corpus)
    for r in rows:
        assert abs(r.gumbel_key - r.log_weight) < 20, r


def test_dsir_incremental_fold_laws(spark, sf_dir, tmp_path):
    """The maintained DSIR model: fold == one-shot bit-exactly (the
    decimal n x lr bridge), replay idempotence, and the model state
    stays parameter-sized (<= n_buckets rows per count table)."""
    from stock_trend_predictor_spark.functions.exact import stable_round
    from stock_trend_predictor_spark.operators.statestore import (
        read_state_table,
    )
    from stock_trend_predictor_spark.streaming.dsir_maintenance import (
        N_BUCKETS,
        read_dsir_weights,
        update_dsir_state,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    sdir = str(tmp_path / "state")
    for i in range(3):
        update_dsir_state(
            spark, docs.where(F.col("doc_id") % 3 == i), sdir, batch_id=i
        )

    folded = read_dsir_weights(spark, sdir).select(
        "doc_id", "n_feats", stable_round(F.col("__s"), 6).alias("w")
    )
    oneshot = REGISTRY["dsir_importance_weights"].fn(spark, sf_dir).select(
        "doc_id", "n_feats", F.col("log_weight").alias("w")
    )
    assert folded.exceptAll(oneshot).count() == 0
    assert oneshot.exceptAll(folded).count() == 0

    for t in ("raw_counts", "target_counts"):
        assert read_state_table(spark, sdir, t).count() <= N_BUCKETS

    before = sorted(map(tuple, folded.collect()))
    update_dsir_state(
        spark, docs.where(F.col("doc_id") % 3 == 1), sdir, batch_id=1
    )
    after = sorted(
        map(
            tuple,
            read_dsir_weights(spark, sdir)
            .select(
                "doc_id", "n_feats", stable_round(F.col("__s"), 6).alias("w")
            )
            .collect(),
        )
    )
    assert before == after


def test_dsir_fold_before_any_target_doc(spark, tmp_path):
    """The maintained model must score sanely BEFORE any target-slice
    document has arrived: tt = 0, every bucket's target term is the
    pure Laplace floor ln(1/B), and weights are finite (the crawl
    shape where the first batches are all raw)."""
    import math

    from stock_trend_predictor_spark.streaming.dsir_maintenance import (
        read_dsir_weights,
        update_dsir_state,
    )

    batch = spark.createDataFrame(
        [(1, "de", "a b c"), (2, "fr", "b c d")],
        "doc_id long, lang string, text string",
    )
    sdir = str(tmp_path / "state")
    update_dsir_state(spark, batch, sdir, batch_id=0)
    w = read_dsir_weights(spark, sdir)
    rows = {r.doc_id: r for r in w.collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r.n_feats == 5  # 3 unigrams + 2 bigrams
        assert math.isfinite(r["__s"])
        assert r["__s"] < 0  # nothing is target-like yet


def test_dsir_oneshot_matches_fold_on_zero_target_corpus(
    spark, tmp_path
):
    """r6-advice edge: the ONE-SHOT dsir_log_weights must pin the same
    finite negative weights as the fold when the corpus has ZERO
    target docs (tt coalesces to 0; without it every weight nulls
    out). Bit-equality fold == one-shot on this edge."""
    import math

    from pyspark.sql import functions as F

    from stock_trend_predictor_spark.operators.dsir import (
        dsir_log_weights,
    )
    from stock_trend_predictor_spark.streaming.dsir_maintenance import (
        N_BUCKETS,
        read_dsir_weights,
        update_dsir_state,
    )

    docs = spark.createDataFrame(
        [(1, "de", "a b c"), (2, "fr", "b c d"), (3, "de", "x y")],
        "doc_id long, lang string, text string",
    )
    one = dsir_log_weights(
        docs, F.col("lang") == "en", n_buckets=N_BUCKETS
    )
    one_rows = {r.doc_id: r for r in one.collect()}
    assert set(one_rows) == {1, 2, 3}
    for r in one_rows.values():
        assert r["__s"] is not None and math.isfinite(r["__s"])
        assert r["__s"] < 0

    sdir = str(tmp_path / "state")
    update_dsir_state(spark, docs, sdir, batch_id=0)
    fold_rows = {
        r.doc_id: r
        for r in read_dsir_weights(spark, sdir).collect()
    }
    for d in one_rows:
        assert fold_rows[d].n_feats == one_rows[d].n_feats
        assert fold_rows[d]["__s"] == one_rows[d]["__s"]  # bit-equal
