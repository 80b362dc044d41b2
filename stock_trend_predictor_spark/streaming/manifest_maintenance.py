"""The streaming curation CAPSTONE: one continuously maintained
per-document keep manifest composing the maintained folds — quality
gates at arrival, the near-dup fold, the SemDeDup fold, the decon
steady screen, and budget admission — into a single latest-wins
verdict row per document (r8 verdict #2). The streaming twin of the
``corpus_keep_decision`` composition pattern, built from the FOLD
family instead of one-shot sub-pipelines: arrivals are featurized
once, every signal is maintained incrementally, and the manifest read
never re-touches text.

COMPOSITION CONTRACT (what this module adds over the seven folds it
reuses): one base dir, one commit cadence. ``update_manifest_state``
drives all five constituents for the SAME batch id under
``base_dir``:

- ``base_dir``        — the manifest's own state: an append table
  ``quality`` holding each doc's arrival-time quality row (doc_id,
  n_tokens, diversity) — pure per-doc map, computed exactly once;
- ``base_dir/nd``     — the near-dup fold (neardup_maintenance):
  LSH bands + verified pairs + maintained cluster labels;
- ``base_dir/sem``    — the SemDeDup fold (semdedup_maintenance)
  over the batch's vectors under FROZEN centroids;
- ``base_dir/decon``  — the decon steady screen (decon_maintenance):
  the bench suite registers via :func:`update_manifest_bench`,
  corpus docs score on arrival, retro-bumps on late benches;
- ``base_dir/budget`` — hard-frontier token-budget admission
  (streaming/budget.py).

Crash/replay discipline ACROSS folds: there is no cross-dir
transaction — each sub-fold commits its own dir with the shared
batch id. The manifest's own ``quality`` commit runs LAST, so its
``last_batch_id`` is the composition's low-water mark: a crash
mid-composite leaves some sub-folds ahead of the manifest, and the
at-least-once re-delivery re-runs the batch — already-committed
sub-folds skip on their replay guards, the missing ones (and the
quality commit) complete. Readers see a consistent composition at
every manifest commit boundary.

PURITY (why the registry query carries a full shared oracle): every
constituent is a pure function of the arrival set — quality rows are
per-doc maps; near-dup pairs/labels and SemDeDup components are
arrival-order-invariant (their fold laws); the decon score depends
only on (docs, bench) sets; budget admission is the doc_id-order
prefix rule, invariant under ORDER-PRESERVING batching (the one
order-sensitive constituent — the composition inherits budget.py's
precondition that arrival order is doc_id order). A deterministic
CASE over pure signals is pure, so the composed verdict equals the
one-shot CASE over the constituent one-shots, and the registry
query's oracle NESTS the constituent oracles verbatim as scoped
sub-CTEs — the corpus_keep_decision nesting pattern
(plans/span_queries.py), lifted to the fold family.

Verdict precedence (first matching gate wins, the
corpus_keep_decision CASE discipline):

1. ``drop_short``          n_tokens < 20
2. ``drop_low_diversity``  distinct-token fraction < 0.3
3. ``drop_near_dup``       not its verified-pair component's min id
4. ``drop_semantic_dup``   SemDeDup keep = false for its vector
   (docs without a vector pass this gate)
5. ``drop_contaminated``   shares >= 1 shingle with the bench suite
6. ``drop_over_budget``    outside its source's admitted prefix
7. ``keep``

Scale shape: the manifest read is five latest-wins reads joined on
doc_id — each constituent read is already touched-bucket-pruned /
parameter-sized by its own fold's laws, the joins shuffle 8-byte ids
+ booleans, and text/vectors never move. Laws in
tests/test_round9.py: stream == batch (== the composed one-shot) on
two order-preserving splits, prefix parity after every batch, replay
idempotence (including a partial-crash replay: one sub-fold ahead),
and checkpoint-release accounting.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.operators.checkpoints import (
    release_local_checkpoints,
)
from stock_trend_predictor_spark.operators.statestore import (
    commit_state,
    read_meta,
    read_state_table,
)
from stock_trend_predictor_spark.streaming.neardup_maintenance import (
    PRUNE_MIN_BYTES,
)

#: verdict thresholds — corpus_keep_decision's quality gates.
MIN_TOKENS = 20
MIN_DIVERSITY = 0.3

#: on-disk layout version of the manifest's own quality table.
MANIFEST_FORMAT = 1


def _sub(base_dir: str, name: str) -> str:
    return os.path.join(base_dir, name)


def _check_manifest_format(meta: dict | None) -> None:
    if meta is None:
        return
    app = meta.get("app", {})
    fmt = app.get("manifest_format")
    if fmt is not None and int(fmt) != MANIFEST_FORMAT:
        raise RuntimeError(
            f"manifest state dir is fold format v{fmt}; this build "
            f"reads v{MANIFEST_FORMAT} — re-fold into a fresh dir"
        )
    if fmt is None and "quality" in meta.get("segments", {}):
        raise RuntimeError(
            "manifest state dir has unstamped segments (written by a "
            "different fold or a pre-release layout) — re-fold into "
            "a fresh dir"
        )


def quality_row(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, diversity) — the arrival-time quality
    signals, corpus_keep_decision's exact expressions (raw doubles;
    rounding happens only at the manifest read's output)."""
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("diversity"),
    )


def update_manifest_bench(
    spark: SparkSession,
    bench_docs: DataFrame,
    base_dir: str,
    batch_id: int,
) -> None:
    """Register (or extend) the decontamination bench suite — a
    delta-gram append plus the retro-rescore of every stored doc
    (decon_maintenance.update_decon_bench). Shares the composition's
    single batch-id sequence: callers interleave bench and corpus
    batches under strictly increasing ids."""
    from stock_trend_predictor_spark.streaming.decon_maintenance import (
        update_decon_bench,
    )

    update_decon_bench(
        spark, bench_docs, _sub(base_dir, "decon"), batch_id
    )


def update_manifest_state(
    spark: SparkSession,
    docs_batch: DataFrame,
    vecs_batch: DataFrame,
    base_dir: str,
    centroids: list[list[float]],
    batch_id: int,
    budget: int,
    decon_filter: Column | None = None,
    prune_min_bytes: int = PRUNE_MIN_BYTES,
) -> None:
    """Fold one arrival batch — documents carrying (doc_id, text,
    source) plus their vectors (vec_id, v) — through every
    constituent fold under ONE batch id, then commit the manifest's
    own quality delta as the composition's low-water mark (module
    docstring). ``decon_filter`` restricts which docs the decon
    screen treats as corpus (the registry convention excludes the
    bench suite's own ids — they are the benchmark, not candidates);
    the other constituents always see the whole batch.

    PRECONDITIONS (inherited from the constituents): each doc/vec
    arrives exactly once, and arrival order is doc_id order across
    batches (the budget constituent's hard-frontier law)."""
    from stock_trend_predictor_spark.operators import dedup as D
    from stock_trend_predictor_spark.streaming.budget import (
        update_budget_state,
    )
    from stock_trend_predictor_spark.streaming.decon_maintenance import (
        update_decon_docs,
    )
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        update_neardup_state,
    )
    from stock_trend_predictor_spark.streaming.semdedup_maintenance import (
        update_semdedup_state,
    )

    meta = read_meta(base_dir)
    _check_manifest_format(meta)
    if (
        meta is not None
        and meta.get("last_batch_id") is not None
        and batch_id <= meta["last_batch_id"]
    ):
        return  # the whole composition already folded this batch
    # featurize the batch once — four constituents consume it
    docs = docs_batch.select("doc_id", "text", "source").localCheckpoint(
        eager=True
    )
    update_neardup_state(
        spark,
        D.with_shingle_hashes(docs).select("doc_id", "hs"),
        _sub(base_dir, "nd"),
        batch_id=batch_id,
        prune_min_bytes=prune_min_bytes,
    )
    update_semdedup_state(
        spark,
        vecs_batch.select("vec_id", "v"),
        _sub(base_dir, "sem"),
        centroids,
        batch_id=batch_id,
        prune_min_bytes=prune_min_bytes,
    )
    decon_docs = docs if decon_filter is None else docs.where(decon_filter)
    update_decon_docs(
        spark,
        decon_docs.select("doc_id", "text"),
        _sub(base_dir, "decon"),
        batch_id=batch_id,
    )
    update_budget_state(
        spark,
        docs,
        _sub(base_dir, "budget"),
        budget=int(budget),
        batch_id=batch_id,
    )
    # the manifest's own commit runs LAST — the composition's
    # low-water mark for the replay discipline
    commit_state(
        base_dir,
        {},
        batch_id=batch_id,
        files_per_table=8,
        appends={"quality": quality_row(docs)},
        app_meta={"manifest_format": MANIFEST_FORMAT},
    )
    release_local_checkpoints(docs)


def read_curation_manifest(
    spark: SparkSession, base_dir: str
) -> DataFrame | None:
    """The current per-document verdict — one row per folded doc:
    (doc_id, n_tokens, diversity, nd_cluster, sem_keep, contaminated,
    admitted, decision), with the precedence CASE from the module
    docstring. None before the first manifest commit. Every signal is
    the constituent fold's own latest-wins read."""
    from stock_trend_predictor_spark.functions.exact import stable_round
    from stock_trend_predictor_spark.streaming.budget import (
        read_admitted_docs,
    )
    from stock_trend_predictor_spark.streaming.decon_maintenance import (
        read_decon_scores,
    )
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        read_neardup_clusters,
    )
    from stock_trend_predictor_spark.streaming.semdedup_maintenance import (
        read_semdedup_keep,
    )

    _check_manifest_format(read_meta(base_dir))
    q = read_state_table(spark, base_dir, "quality")
    if q is None:
        return None
    nd = read_neardup_clusters(spark, _sub(base_dir, "nd"))
    sem = read_semdedup_keep(spark, _sub(base_dir, "sem"))
    dec = read_decon_scores(spark, _sub(base_dir, "decon"))
    bud = read_admitted_docs(spark, _sub(base_dir, "budget"))
    j = q.join(nd, "doc_id")
    if sem is not None:
        j = j.join(
            sem.select(
                F.col("vec_id").alias("doc_id"),
                F.col("keep").alias("_sem_keep"),
            ),
            "doc_id",
            "left",
        )
    else:
        j = j.withColumn("_sem_keep", F.lit(None).cast("boolean"))
    if dec is not None:
        j = j.join(
            dec.where(F.col("n_contaminated") > 0)
            .select("doc_id")
            .distinct()
            .withColumn("_dec_hit", F.lit(True)),
            "doc_id",
            "left",
        )
    else:
        j = j.withColumn("_dec_hit", F.lit(None).cast("boolean"))
    adm = (
        bud.select("doc_id").withColumn("_adm", F.lit(True))
        if bud is not None
        else None
    )
    if adm is not None:
        j = j.join(adm, "doc_id", "left")
    else:
        j = j.withColumn("_adm", F.lit(None).cast("boolean"))
    sem_keep = F.coalesce("_sem_keep", F.lit(True))
    contaminated = F.coalesce("_dec_hit", F.lit(False))
    admitted = F.coalesce("_adm", F.lit(False))
    decision = (
        F.when(F.col("n_tokens") < MIN_TOKENS, F.lit("drop_short"))
        .when(
            F.col("diversity") < MIN_DIVERSITY,
            F.lit("drop_low_diversity"),
        )
        .when(F.col("doc_id") != F.col("cluster"), F.lit("drop_near_dup"))
        .when(~sem_keep, F.lit("drop_semantic_dup"))
        .when(contaminated, F.lit("drop_contaminated"))
        .when(~admitted, F.lit("drop_over_budget"))
        .otherwise(F.lit("keep"))
    )
    return j.select(
        "doc_id",
        "n_tokens",
        stable_round("diversity", 6).alias("diversity"),
        F.col("cluster").alias("nd_cluster"),
        sem_keep.alias("sem_keep"),
        contaminated.alias("contaminated"),
        admitted.alias("admitted"),
        decision.alias("decision"),
    )


def manifest_maintenance_sink(
    doc_stream: DataFrame,
    base_dir: str,
    checkpoint: str,
    centroids: list[list[float]],
    budget: int,
    vec_lookup: DataFrame,
    decon_filter: Column | None = None,
):
    """Continuous manifest maintenance over a document stream.
    ``vec_lookup`` is the static (vec_id, v) side joined per batch
    (a real pipeline would carry embeddings inline on the stream;
    the join keeps the sink test-drivable from one parquet stream)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        ids = batch.select(F.col("doc_id").alias("vec_id"))
        vecs = vec_lookup.join(ids, "vec_id")
        update_manifest_state(
            batch.sparkSession,
            batch,
            vecs,
            base_dir,
            centroids,
            batch_id=batch_id,
            budget=budget,
            decon_filter=decon_filter,
        )

    return (
        doc_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
