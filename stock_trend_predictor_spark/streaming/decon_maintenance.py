"""Continuously maintained benchmark decontamination — the streaming
twin of ``decontaminate_ngram_overlap`` for the two arrival shapes a
real curation pipeline faces:

1. DOCUMENTS arrive continuously and must be screened against the
   current benchmark suite without re-reading history;
2. NEW BENCHMARKS arrive later ("we just added an eval suite") and
   every PAST document must be re-screened — retroactively — without
   re-reading or re-shingling any text.

State under the statestore protocol (operators/statestore.py), both
tables APPEND segments:

- ``doc_grams``   (doc_id, hs)  — each document's word-3-gram shingle
  hash array (operators/dedup.py's featurization), written once on
  arrival; text is never touched again (the same
  pay-featurization-once design as the DSIR fold's doc_buckets);
- ``bench_grams`` (h)           — the DISTINCT shingle hashes of every
  benchmark suite folded so far (eval suites are tiny vs the corpus:
  the accumulated set stays broadcastable).

``read_contamination`` then scores EVERY stored document against the
CURRENT benchmark set: explode the stored hash arrays, join the
broadcast bench set, aggregate per doc — the exact plan of the
one-shot query, minus the shingling. Because the report is a pure
function of (all docs folded, all bench grams folded), the fold
shares ``decontaminate_ngram_overlap``'s full DuckDB oracle verbatim
(the registry query folds the same split), exactly the oracle-sharing
pattern of ``dsir_incremental_weights``.

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


def _replayed(state_dir: str, batch_id: int) -> bool:
    meta = read_meta(state_dir)
    return (
        meta is not None
        and meta.get("last_batch_id") is not None
        and batch_id <= meta["last_batch_id"]
    )


def update_decon_docs(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    batch_id: int,
) -> None:
    """Fold one arrival batch of corpus documents (doc_id, text) —
    shingle once, append the hash profiles. Idempotent on batch_id."""
    from stock_trend_predictor_spark.operators.dedup import (
        with_shingle_hashes,
    )

    if _replayed(state_dir, batch_id):
        return
    grams = with_shingle_hashes(batch).select("doc_id", "hs")
    commit_state(
        state_dir,
        {},
        batch_id=batch_id,
        files_per_table=8,
        appends={"doc_grams": grams},
    )


def update_decon_bench(
    spark: SparkSession,
    bench_docs: DataFrame,
    state_dir: str,
    batch_id: int,
) -> None:
    """Fold one arriving BENCHMARK suite (doc_id, text): its distinct
    shingle hashes join the maintained bench set. Past corpus docs
    need no touch — the next read re-screens them retroactively."""
    from stock_trend_predictor_spark.operators.dedup import (
        with_shingle_hashes,
    )

    if _replayed(state_dir, batch_id):
        return
    grams = (
        with_shingle_hashes(bench_docs)
        .select(F.explode("hs").alias("h"))
        .distinct()
    )
    commit_state(
        state_dir,
        {},
        batch_id=batch_id,
        files_per_table=8,
        appends={"bench_grams": grams},
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
