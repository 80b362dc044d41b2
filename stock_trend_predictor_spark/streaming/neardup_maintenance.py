"""Continuous MinHash-LSH near-dup maintenance on the idempotent
state store — the streaming twin of ``neardup_keep_decision``'s pair
stage, for the daily-crawl shape where yesterday's corpus must not be
re-scanned to dedup today's arrivals.

State = three APPEND tables under the segment + atomic-META protocol
(operators/statestore.py ``appends=``; same commit discipline as the
budget / IVF folds, but delta segments instead of snapshots) plus one
snapshot:

- ``bands``     (doc_id, band_id, bkey)  — the accumulated LSH band
  index: N_BANDS rows per document ever folded;
- ``shingles``  (doc_id, hs)             — shingle-hash arrays for
  exact-Jaccard verification of candidates;
- ``pairs``     (found_in_batch, doc_a, doc_b, jaccard) — every
  verified near-dup pair, stamped with the batch that DISCOVERED it;
- ``labels``    (doc_id, cluster) — SNAPSHOT: the incrementally
  maintained connected-component label (min doc_id per component of
  the verified-pair graph; singletons label themselves). Per batch
  only the components touched by new pairs re-resolve.

Per batch: the NEW documents' bands probe the accumulated index (plus
the batch itself, so intra-batch duplicates surface immediately);
candidates verify at exact shingle Jaccard >= 0.5; verified pairs
append. A pair is discovered exactly once — when its later-arriving
member lands — so the fold's emission law is closed-form:
``found_in_batch = max(arrival_batch(doc_a), arrival_batch(doc_b))``,
which is what makes the registry query (`neardup_incremental_pairs`)
fully DuckDB-oracle-able despite being a genuine stateful fold.
Replayed batch ids are skipped before any write (at-least-once
foreachBatch delivery → exactly-once folds).

Both the PROBE plan and the STATE COMMIT are batch-sized: all three
tables are append-only by construction (a doc's band/shingle rows
never change after arrival; a pair is discovered exactly once), so
each commit writes only the batch's delta segments under the atomic
META pointer (``commit_state(appends=...)``) and per-commit IO never
grows with the corpus. The 30x protocol drove this design: the
original full-snapshot commit measured 120.7 s at 30x, parallel
snapshot files 91.1 s, append segments remove the rewrite entirely
(SCALE.md round-6 section 2).

Scale shape: the per-batch probe joins ONLY the new docs' bands
(N_BANDS small keys per doc) against the band index — at corpus scale
the index is written bucketed by (band_id, bkey) so the probe is
co-partitioned and history text is NEVER re-scanned. The probe here is
a plain equi-join (correct and skew-bounded while no band bucket is
mega-sized — true at every tested SF, including the dup-saturated 30x
corpus); if a production corpus develops mega-buckets, the stated
lever is the same triangle-cell routing lsh_candidate_pairs applies to
its self-join, adapted to the new-vs-index probe (split the bucket's
index side into cells, replicate the batch side per cell). Laws in
tests/test_neardup_stream.py:
stream == batch (union of emitted pairs equals the one-shot
dedup_minhash_lsh pair set), replay idempotence, and the
discovery-batch law above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import stable_round
from stock_trend_predictor_spark.operators import dedup as D
from stock_trend_predictor_spark.operators.statestore import (
    commit_state,
    read_meta,
    read_state_table,
)


def doc_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band_id, bkey) — the LSH band index rows for documents
    carrying a shingle-hash array ``hs`` (operators/dedup.py
    signature + band-key machinery; one exploded struct array, no
    per-band shuffle)."""
    s = docs.withColumn("sig", D.minhash_signature("hs"))
    bands = F.array(
        *[
            F.struct(
                F.lit(m).alias("band_id"), D.band_key(m).alias("bkey")
            )
            for m in range(D.N_BANDS)
        ]
    )
    return s.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band_id").alias("band_id"), F.col("b.bkey").alias("bkey")
    )


def _merge_labels(
    spark: SparkSession,
    state_dir: str,
    new: DataFrame,
    new_pairs: DataFrame,
) -> DataFrame:
    """labels(doc_id, cluster) after folding this batch — cluster =
    min doc_id of the doc's connected component over ALL verified
    pairs so far, maintained WITHOUT re-running CC on the full graph.

    Because every existing label is already the min-id of its
    component, contracting each component to its representative
    preserves the merged partition: map the new pairs' endpoints to
    their current reps, run min-label CC over that REP graph (at most
    2 rows per new pair — never corpus-sized, whatever the component
    sizes), and relabel members through one broadcast join. The new
    component min equals min over merged reps equals min over all
    member ids — inductively identical to the one-shot CC
    (law-tested in tests/test_neardup_stream.py)."""
    from stock_trend_predictor_spark.operators.components import (
        connected_components,
    )

    prev_labels = read_state_table(spark, state_dir, "labels")
    fresh = new.select("doc_id", F.col("doc_id").alias("cluster"))
    base = (
        fresh if prev_labels is None else prev_labels.unionByName(fresh)
    )
    np_ = new_pairs.select("doc_a", "doc_b")
    lab_a = base.select(
        F.col("doc_id").alias("doc_a"), F.col("cluster").alias("rep_a")
    )
    lab_b = base.select(
        F.col("doc_id").alias("doc_b"), F.col("cluster").alias("rep_b")
    )
    rep_edges = (
        np_.join(lab_a, "doc_a")
        .join(lab_b, "doc_b")
        .where(F.col("rep_a") != F.col("rep_b"))
        .select(
            F.col("rep_a").alias("src"), F.col("rep_b").alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if rep_edges.isEmpty():  # no cross-component pair: labels as-is
        return base.select("doc_id", "cluster")
    merged = connected_components(rep_edges, "src", "dst").select(
        F.col("node").alias("cluster"),
        F.col("component").alias("new_cluster"),
    )
    return base.join(F.broadcast(merged), "cluster", "left").select(
        "doc_id",
        F.coalesce("new_cluster", "cluster").alias("cluster"),
    )


def update_neardup_state(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    batch_id: int,
    maintain_clusters: bool = True,
) -> None:
    """Fold one arrival batch of (doc_id, hs) into the maintained
    near-dup state (idempotent: replayed batch ids are skipped before
    any write — and, since this fold eagerly materializes
    intermediates, before any COMPUTE too). ``maintain_clusters=False``
    skips the labels snapshot for pairs-only consumers; a state dir
    must be used consistently with one setting."""
    meta = read_meta(state_dir)
    if (
        meta is not None
        and meta.get("last_batch_id") is not None
        and batch_id <= meta["last_batch_id"]
    ):
        return  # replay: commit_state would skip anyway; skip the work
    new = batch.select("doc_id", "hs").localCheckpoint(eager=True)
    new_bands = doc_bands(new)
    prev_bands = read_state_table(spark, state_dir, "bands")
    prev_sh = read_state_table(spark, state_dir, "shingles")
    all_bands = (
        new_bands
        if prev_bands is None
        else prev_bands.unionByName(new_bands)
    )
    all_sh = new if prev_sh is None else prev_sh.unionByName(new)
    # candidates: a NEW doc shares a band with ANY doc folded so far
    # (state or this batch). Pairs with both members old cannot
    # appear — so nothing is ever re-discovered.
    cand = (
        new_bands.alias("n")
        .join(
            all_bands.alias("o"),
            (F.col("n.band_id") == F.col("o.band_id"))
            & (F.col("n.bkey") == F.col("o.bkey"))
            & (F.col("n.doc_id") != F.col("o.doc_id")),
        )
        .select(
            F.least(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_a"),
            F.greatest(F.col("n.doc_id"), F.col("o.doc_id")).alias(
                "doc_b"
            ),
        )
        .distinct()
    )
    a = all_sh.select(
        F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a")
    )
    b = all_sh.select(
        F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")
    )
    jac = D.jaccard_of_hash_arrays("hs_a", "hs_b")
    new_pairs = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .where(jac >= 0.5)
        .select(
            F.lit(int(batch_id)).alias("found_in_batch"),
            "doc_a",
            "doc_b",
            stable_round(jac, 6).alias("jaccard"),
        )
    )
    # new_pairs feeds BOTH the pairs segment and the cluster merge —
    # eager-checkpoint once so the probe+verify join never reruns
    new_pairs = new_pairs.localCheckpoint(eager=True)

    tables: dict[str, DataFrame] = {}
    if maintain_clusters:
        tables["labels"] = _merge_labels(
            spark, state_dir, new, new_pairs
        )

    # bands/shingles/pairs are append-only by construction (a doc's
    # band and shingle rows never change after arrival; a pair is
    # discovered exactly once), so each commit writes only THIS
    # batch's delta segments — per-commit IO is batch-sized, not
    # corpus-sized (the full-snapshot rewrite measured ~25% of the
    # 30x wall even with parallel writes; appends remove it).
    # labels MUTATE on merge, so they stay a snapshot — at 16 bytes a
    # row the rewrite is ~50x lighter than the shingle store it
    # replaced; the at-scale lever is label-revision segments + a
    # latest-wins read, not needed before mega-corpus batch counts.
    # files_per_table caps write parallelism (coalesce never raises
    # the partition count, so tiny batches still land as single
    # files).
    commit_state(
        state_dir,
        tables,
        batch_id=batch_id,
        files_per_table=8,
        appends={"bands": new_bands, "shingles": new, "pairs": new_pairs},
    )


def read_neardup_pairs(
    spark: SparkSession, state_dir: str
) -> DataFrame | None:
    """Every verified pair discovered so far with its discovery
    batch, or None pre-commit."""
    return read_state_table(spark, state_dir, "pairs")


def read_neardup_clusters(
    spark: SparkSession, state_dir: str
) -> DataFrame | None:
    """(doc_id, cluster) for every document folded so far — cluster =
    min doc_id of its verified-pair connected component (singletons
    label themselves), maintained incrementally. None pre-commit."""
    return read_state_table(spark, state_dir, "labels")


def neardup_maintenance_sink(
    doc_stream: DataFrame, state_dir: str, checkpoint: str
):
    """Continuous near-dup discovery over a document stream (docs
    must carry doc_id + text; shingling happens per batch)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        update_neardup_state(
            batch.sparkSession,
            D.with_shingle_hashes(batch).select("doc_id", "hs"),
            state_dir,
            batch_id=batch_id,
        )

    return (
        doc_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
