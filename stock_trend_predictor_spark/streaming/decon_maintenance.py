"""Continuously maintained benchmark decontamination — the streaming
twin of ``decontaminate_ngram_overlap`` for the two arrival shapes a
real curation pipeline faces:

1. DOCUMENTS arrive continuously and must be screened against the
   current benchmark suite without re-reading history;
2. NEW BENCHMARKS arrive later ("we just added an eval suite") and
   every PAST document must be re-screened — retroactively — without
   re-reading or re-shingling any text.

State under the statestore protocol (operators/statestore.py), all
tables APPEND segments:

- ``doc_grams``   (doc_id, hs)  — each document's word-3-gram shingle
  hash array (operators/dedup.py's featurization), written once on
  arrival; text is never touched again (the same
  pay-featurization-once design as the DSIR fold's doc_buckets);
- ``bench_grams`` (h, rev)      — the DISTINCT shingle hashes of every
  benchmark suite folded so far (eval suites are tiny vs the corpus:
  the accumulated set stays broadcastable). Each suite appends only
  its DELTA (grams not already stored — disjointness is what makes
  incremental score maintenance exact below); ``rev`` = the folding
  batch, so ``max(rev)`` is the bench-set VERSION a score can be
  checked against;
- ``scores``      (doc_id, n_shingles, n_contaminated, rev) —
  LATEST-WINS REVISIONS of each document's contamination counts (the
  labels pattern): a doc batch appends one row per arriving doc
  (scored against the bench set AS OF arrival — including explicit
  zero-hit rows, so every stored doc always has a current score); a
  bench batch retro-appends one row per EXISTING doc whose count
  changed, computed as stored + hits(delta grams) — exact because
  per-doc ``hs`` is distinct and the delta is disjoint from the
  stored set, so hits(union) = hits(stored) + hits(delta).

Two reads:

- ``read_contamination`` — the FULL RECOMPUTE: explode every stored
  profile against the current broadcast bench set (the one-shot
  query's plan minus shingling). Because the report is a pure
  function of (all docs folded, all bench grams folded), the fold
  shares ``decontaminate_ngram_overlap``'s full DuckDB oracle
  verbatim (the registry queries fold the same split) — the
  oracle-sharing pattern of ``dsir_incremental_weights``.
- ``read_decon_scores`` — the STEADY-STATE screen (r7 verdict #7):
  one latest-wins scan of the parameter-light ``scores`` table, ZERO
  profile explodes — per-read IO tracks the corpus's score rows
  (~32 B/doc), not its shingle profiles, and the expensive retro
  pass runs once per bench change at WRITE time, not once per read.
  read_decon_scores == read_contamination after every commit is the
  law (tests/test_round8.py), so it inherits the same oracle.

Batch-id spaces: documents and benchmarks are ONE logical stream of
state updates (a single writer owns the dir), so both folds share the
store's monotonic batch-id replay guard. Preconditions mirror the
other folds: each doc_id and each benchmark doc arrives exactly once
(re-crawls dedupe upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import stable_round
from stock_trend_predictor_spark.operators.statestore import (
    commit_state,
    read_meta,
    read_state_table,
)

#: on-disk layout version (stamped in META's app dict). v2 (r8) adds
#: the maintained ``scores`` table + delta-only ``bench_grams`` rows
#: with a ``rev`` column; a v1 dir (r7 — full bench rows, no scores)
#: would silently under-report through read_decon_scores, so the fold
#: refuses it explicitly (the neardup fold's format discipline).
DECON_FORMAT = 2


def _check_decon_format(meta: dict | None) -> None:
    if meta is None:
        return
    app = meta.get("app", {})
    fmt = app.get("decon_format")
    if fmt is not None and int(fmt) != DECON_FORMAT:
        raise RuntimeError(
            f"decon state dir is fold format v{fmt}; this build reads "
            f"v{DECON_FORMAT} — re-fold (or run the matching build)"
        )
    has_segments = any(
        t in meta.get("segments", {})
        for t in ("doc_grams", "bench_grams")
    )
    if has_segments and fmt is None:
        raise RuntimeError(
            "decon state dir uses the pre-v2 layout (no maintained "
            "scores table; bench_grams rows lack 'rev'): "
            "read_decon_scores would under-report and a bench fold "
            "would double-count overlapping grams. Re-fold into a "
            "fresh state dir."
        )


def _replayed(state_dir: str, batch_id: int) -> bool:
    meta = read_meta(state_dir)
    _check_decon_format(meta)
    return (
        meta is not None
        and meta.get("last_batch_id") is not None
        and batch_id <= meta["last_batch_id"]
    )


def _hits_against(profiles: DataFrame, grams: DataFrame) -> DataFrame:
    """(doc_id, n_shingles, n_contaminated) — per-doc hit counts of
    profile hash arrays against a BROADCAST gram set, ZERO-HIT docs
    included (explode_outer + marker count: every profile row yields
    exactly one output row, the invariant the scores table relies
    on), in one pass over the profiles."""
    return (
        profiles.select(
            "doc_id",
            F.size("hs").alias("n_shingles"),
            F.explode_outer("hs").alias("h"),
        )
        .join(
            F.broadcast(
                grams.select("h").distinct().withColumn("_m", F.lit(1))
            ),
            "h",
            "left",
        )
        .groupBy("doc_id", "n_shingles")
        .agg(F.count("_m").cast("bigint").alias("n_contaminated"))
    )


def update_decon_docs(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    batch_id: int,
) -> None:
    """Fold one arrival batch of corpus documents (doc_id, text):
    shingle once, append the hash profiles, and score the batch
    against the bench set AS OF arrival (broadcast; zero-hit rows
    kept so every stored doc always has a current score) — the
    steady-state path that keeps read_decon_scores a pure scan.
    Idempotent on batch_id."""
    from stock_trend_predictor_spark.operators.dedup import (
        with_shingle_hashes,
    )

    if _replayed(state_dir, batch_id):
        return
    grams = (
        with_shingle_hashes(batch)
        .select("doc_id", "hs")
        .localCheckpoint(eager=True)  # feeds profile write + scoring
    )
    bench = read_state_table(spark, state_dir, "bench_grams")
    if bench is None:
        bench = spark.createDataFrame([], "h bigint")
    scores = _hits_against(grams, bench).select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        F.lit(int(batch_id)).alias("rev"),
    )
    commit_state(
        state_dir,
        {},
        batch_id=batch_id,
        files_per_table=8,
        appends={"doc_grams": grams, "scores": scores},
        app_meta={"decon_format": DECON_FORMAT},
    )
    # the commit materialized both deltas — free the shingle
    # checkpoint so a continuous sink's storage stays batch-bounded
    from stock_trend_predictor_spark.operators.checkpoints import (
        release_local_checkpoints,
    )

    release_local_checkpoints(grams)


def update_decon_bench(
    spark: SparkSession,
    bench_docs: DataFrame,
    state_dir: str,
    batch_id: int,
) -> None:
    """Fold one arriving BENCHMARK suite (doc_id, text): its distinct
    shingle hashes append as a DELTA (grams already stored are
    dropped — disjointness keeps increments exact), and every PAST
    document retro-rescores against that delta from its stored
    profile — zero text re-reads, and only docs whose count actually
    changed append a score revision (the once-per-bench-change
    retro pass that keeps every subsequent READ a scan). Idempotent
    on batch_id."""
    from stock_trend_predictor_spark.operators.dedup import (
        with_shingle_hashes,
    )

    if _replayed(state_dir, batch_id):
        return
    suite = (
        with_shingle_hashes(bench_docs)
        .select(F.explode("hs").alias("h"))
        .distinct()
    )
    prev_bench = read_state_table(spark, state_dir, "bench_grams")
    if prev_bench is not None:
        suite = suite.join(
            F.broadcast(prev_bench.select("h")), "h", "left_anti"
        )
    # delta feeds the segment write AND the retro join
    delta = suite.localCheckpoint(eager=True)
    rev = F.lit(int(batch_id)).alias("rev")
    appends = {"bench_grams": delta.select("h", rev)}
    prof = read_state_table(spark, state_dir, "doc_grams")
    if prof is not None and not delta.isEmpty():
        inc = _hits_against(prof, delta).where(
            F.col("n_contaminated") > 0
        )
        stored = _latest_scores(spark, state_dir)
        if stored is None:  # unreachable in v2 (docs always score on
            # arrival) but increments must never drop silently
            appends["scores"] = inc.select(
                "doc_id", "n_shingles", "n_contaminated", rev
            )
        else:
            bumped = inc.select(
                "doc_id",
                "n_shingles",
                F.col("n_contaminated").alias("_inc"),
            ).join(
                stored.select(
                    "doc_id",
                    F.col("n_contaminated").alias("_base"),
                ),
                "doc_id",
                "left",
            )
            appends["scores"] = bumped.select(
                "doc_id",
                "n_shingles",
                (
                    F.coalesce("_base", F.lit(0).cast("bigint"))
                    + F.col("_inc")
                ).cast("bigint").alias("n_contaminated"),
                rev,
            )
    commit_state(
        state_dir,
        {},
        batch_id=batch_id,
        files_per_table=8,
        appends=appends,
        app_meta={"decon_format": DECON_FORMAT},
    )
    from stock_trend_predictor_spark.operators.checkpoints import (
        release_local_checkpoints,
    )

    release_local_checkpoints(delta)


def _latest_scores(
    spark: SparkSession, state_dir: str
) -> DataFrame | None:
    revs = read_state_table(spark, state_dir, "scores")
    if revs is None:
        return None
    return revs.groupBy("doc_id").agg(
        F.max_by(
            F.struct("n_shingles", "n_contaminated"), "rev"
        ).alias("_s")
    ).select(
        "doc_id",
        F.col("_s.n_shingles").alias("n_shingles"),
        F.col("_s.n_contaminated").alias("n_contaminated"),
    )


def read_decon_scores(
    spark: SparkSession, state_dir: str
) -> DataFrame | None:
    """The STEADY-STATE contamination screen: one latest-wins scan of
    the maintained ``scores`` table — no profile explode, no text —
    with read_contamination's exact output contract (docs sharing
    >= 1 shingle with the current bench set). Equal to the full
    recompute after every commit (law-tested), so it inherits the
    decontaminate_ngram_overlap oracle. None before any doc commit."""
    _check_decon_format(read_meta(state_dir))
    latest = _latest_scores(spark, state_dir)
    if latest is None:
        return None
    return latest.where(F.col("n_contaminated") > 0).select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        stable_round(
            F.col("n_contaminated").cast("double") / F.col("n_shingles"),
            6,
        ).alias("contamination"),
    )


def read_contamination(
    spark: SparkSession, state_dir: str
) -> DataFrame | None:
    """(doc_id, n_shingles, n_contaminated, contamination) for every
    stored document sharing >= 1 shingle with the CURRENT benchmark
    set — the one-shot report's exact contract, computed from stored
    profiles only (no text). None before any doc commit; an empty
    bench set yields an empty report (nothing can be contaminated).

    Scale shape: the bench set is distinct-gram-bounded (suites are
    tiny) and BROADCASTS; the profile segments stream through one
    explode + hash join + doc-keyed aggregate — map-side combinable,
    text never read. A duplicate gram appended by two different
    suites is collapsed at read (distinct) so double-folding distinct
    suites never double-counts a hash."""
    prof = read_state_table(spark, state_dir, "doc_grams")
    bench = read_state_table(spark, state_dir, "bench_grams")
    if prof is None:
        return None
    if bench is None:
        bench = prof.select(F.explode("hs").alias("h")).limit(0)
    hits = (
        prof.select(
            "doc_id",
            F.size("hs").alias("n_shingles"),
            F.explode("hs").alias("h"),
        )
        .join(F.broadcast(bench.select("h").distinct()), "h")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_contaminated"))
    )
    return hits.select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        stable_round(
            F.col("n_contaminated").cast("double") / F.col("n_shingles"),
            6,
        ).alias("contamination"),
    )
