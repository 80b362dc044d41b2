"""Continuous MinHash-LSH near-dup maintenance on the idempotent
state store — the streaming twin of ``neardup_keep_decision``'s pair
stage, for the daily-crawl shape where yesterday's corpus must not be
re-scanned to dedup today's arrivals.

State = five APPEND tables under the segment + atomic-META protocol
(operators/statestore.py ``appends=``; same commit discipline as the
budget / IVF folds, but delta segments instead of snapshots):

- ``bands``     (doc_id, band_id, bkey, bucket) — the accumulated LSH
  band index, HASH-BUCKETED: every row carries
  ``bucket = pmod(xxhash64(band_id, bkey), P)``; per-batch deltas
  land as plain files (LSM hot writes) and compaction rewrites the
  history directory-partitioned on ``bucket`` for pruned reads;
- ``shingles``  (doc_id, hs, bucket)            — shingle-hash arrays
  for exact-Jaccard verification, bucketed on
  ``pmod(xxhash64(doc_id), P)`` for by-doc point lookups (same
  delta-then-compact layout);
- ``pairs``     (found_in_batch, doc_a, doc_b, jaccard) — every
  verified near-dup pair, stamped with the batch that DISCOVERED it;
- ``labels``    (doc_id, cluster, rev, dbucket) — APPEND-ONLY
  REVISIONS of the incrementally maintained connected-component
  label (min doc_id per component of the verified-pair graph;
  singletons label themselves). Each batch appends one revision row
  per TOUCHED doc only (fresh arrivals + members of components the
  new pairs merge); the committed assignment is the latest-wins read
  (max-rev row per doc, ``rev`` = batch id, unique per doc per batch
  by construction). ``dbucket = pmod(xxhash64(doc_id), P)`` is
  shared by all of a doc's revisions, so BY-DOC pruned reads (the
  merge's endpoint rep lookups) are exact;
- ``labels_byc`` (doc_id, cluster, rev, cbucket) — the SAME revision
  rows under a second single-level layout,
  ``cbucket = pmod(xxhash64(cluster), P)``, serving the merge's
  BY-CLUSTER losing-member scans (exact by the dead-rep invariant
  in _merge_label_delta). Two bucketed copies instead of one nested
  (dbucket, cbucket) layout ON PURPOSE: nesting squares the
  directory count (P² dirs ≈ one row per dir once P scales with the
  corpus — pathological to write and compact), while the
  secondary-index copy keeps each layout at P dirs with
  batch-bounded rows per bucket, for ~32 B/row duplicated write.
  Compact both periodically via statestore.compact_append_table.

P (the bucket count) pins in META's ``app`` dict (statestore
``app_meta=``; an uncoordinated mid-fold P change would silently
mis-prune old segments, so the first commit's value wins — and
reading it is a JSON load, not a Spark job). The one sanctioned way
to change it is :func:`rebucket_neardup_state`: every bucket-derived
table rewrites under the new P and the pin updates in the SAME
atomic META swap, so probes never see new-P directories under an
old-P pin (pair-set identity across a re-bucket is law-tested).

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

Per-commit IO is batch-sized on BOTH sides now:

- WRITE: all four data tables are append-only (a doc's band/shingle
  rows never change after arrival; a pair is discovered exactly once;
  a label change is a new revision row) — each commit writes only the
  batch's delta segments under the atomic META pointer. The 30x
  protocol drove this: full-snapshot commits measured 120.7 s at 30x,
  parallel snapshot files 91.1 s, append segments remove the rewrite
  (SCALE.md round-6 section 2); round 7 extended the same discipline
  to ``labels`` (previously an O(corpus) per-batch snapshot rewrite).
- PROBE READ: ADAPTIVE. Below PRUNE_MIN_BYTES the accumulated store
  is a handful of parquet files and a full scan is cheaper than any
  pruning bookkeeping (measured ~1 s/batch of pure overhead against
  a 2.5 MB index at sf0.1). Past it, the band-index read prunes to
  the BATCH'S bucket set (``read_state_table(partition_filter=...)``:
  directory pruning on compacted bucketed segments at planning time,
  a row filter over the batch-sized hot deltas) and the shingle
  verify read prunes to the CANDIDATES' doc-bucket set. With P
  scaled to the corpus (same nlist ~ N/500 discipline as
  operators/ivf.py: P ~ corpus_bands / target_rows_per_bucket,
  grown via rebucket_neardup_state), a bucket directory holds a bounded row
  count, so probe READ IO ~ (batch's bucket count) x (bounded bucket
  size) + the few uncompacted deltas — batch-proportional, not
  O(corpus) (measured: tools/probe_bench.py, SCALE.md r7). Every row
  carries its bucket, so the threshold crossing and the
  delta/compacted mix are invisible to readers. The CLUSTER MERGE's
  label reads prune the same way since r8 (the r7 verdict's one
  residual read-side term): the endpoint rep lookup reads the new
  pairs' dbuckets, the losing-member scan reads the losing reps'
  cbuckets — per-batch labels read IO is touched-bucket-sized, with
  the exactness argument documented on _merge_label_delta.

Mega-bucket guard: a skewed band bucket (one bkey shared by a huge
index population) would make the plain probe equi-join build one huge
hash bucket. ``bucket_cap`` routes the probe through a deterministic
salted join — the new-vs-index adaptation of lsh_candidate_pairs'
triangle-cell split: per (band_id, bkey) with index population n > cap
the index side splits into ceil(n/cap) hash cells and the batch side
replicates per cell; the emitted pair set is IDENTICAL to the plain
join (law-tested against a synthetic mega-bucket in
tests/test_neardup_stream.py).

Laws in tests/test_neardup_stream.py: stream == batch (union of
emitted pairs equals the one-shot dedup_minhash_lsh pair set), replay
idempotence, the discovery-batch law above, latest-wins labels ==
one-shot connected components after every batch, capped-probe pair
identity, and compaction read-identity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import stable_round
from stock_trend_predictor_spark.operators import dedup as D
from stock_trend_predictor_spark.operators.statestore import (
    commit_state,
    read_meta,
    read_state_table,
)

#: default on-disk hash-bucket count for the band index and shingle
#: store. Scale with the corpus: P ~ total band rows / 100k keeps a
#: bucket directory at a bounded, partition-friendly size; grow a
#: fold that outgrew its P with :func:`rebucket_neardup_state`
#: (atomic segment rewrite + pin update). Pinned per-fold in META's
#: app dict.
N_BAND_BUCKETS = 64

#: probe reads switch from full-scan to bucket-pruned once a state
#: table outgrows this. Below it the whole store is a few parquet
#: files and pruning is pure overhead (two driver collects + one
#: isin filter per batch measured ~1 s/batch at sf0.1 against a
#: 2.5 MB index); above it the pruned read is the difference between
#: batch-sized and corpus-sized probe IO. The LAYOUT is always
#: bucketed — only the read strategy adapts.
PRUNE_MIN_BYTES = 32 * 2**20


def _state_bytes(state_dir: str, meta: dict | None, table: str) -> int:
    """On-disk bytes of an append table's committed segments (local
    metadata walk, no Spark job)."""
    import os

    if meta is None:
        return 0
    total = 0
    for seg in meta.get("segments", {}).get(table, []):
        for root, _, files in os.walk(os.path.join(state_dir, seg)):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


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


def _band_bucket(p: int) -> Column:
    return F.pmod(F.xxhash64(F.col("band_id"), F.col("bkey")), F.lit(p))


def _doc_bucket(p: int) -> Column:
    return F.pmod(F.xxhash64(F.col("doc_id")), F.lit(p))


def _cluster_bucket(p: int) -> Column:
    return F.pmod(F.xxhash64(F.col("cluster")), F.lit(p))


#: on-disk layout version of the neardup fold's state, stamped into
#: META's app dict on every commit. v3 (r8) = v2's append segments +
#: the labels table's dbucket/cbucket prune keys. Unstamped dirs are
#: older layouts (pre-r7 snapshots without ``bucket``/``rev``
#: columns; r7 append segments whose labels rows lack the prune
#: keys) — either would crash obscurely mid-batch (unionByName on a
#: missing column), so the fold refuses them explicitly instead
#: (r7 advice: detect, don't crash).
NEARDUP_FORMAT = 3


def _check_fold_format(meta: dict | None) -> None:
    """Fail loud on a state dir written by a different fold layout.
    Legacy fingerprints: an explicit non-current ``neardup_format``
    stamp; neardup tables committed as SNAPSHOTS (pre-r7); or append
    segments without a stamp (r7 — its labels rows lack the v3
    dbucket/cbucket prune keys)."""
    if meta is None:
        return
    app = meta.get("app", {})
    fmt = app.get("neardup_format")
    if fmt is not None and int(fmt) != NEARDUP_FORMAT:
        raise RuntimeError(
            f"neardup state dir is fold format v{fmt}; this build "
            f"reads v{NEARDUP_FORMAT} — re-fold the corpus (or keep "
            f"running the matching build)"
        )
    legacy_snapshots = {"bands", "shingles", "labels", "pairs"} & set(
        meta.get("tables", [])
    )
    has_segments = any(
        t in meta.get("segments", {})
        for t in ("bands", "shingles", "labels", "pairs")
    )
    if legacy_snapshots or (has_segments and fmt is None):
        raise RuntimeError(
            "neardup state dir uses a pre-v3 layout "
            f"(snapshot tables {sorted(legacy_snapshots)} / "
            "unstamped segments): its rows lack the columns this "
            "fold reads ('bucket' on bands/shingles, 'rev' + "
            "'dbucket'/'cbucket' on labels). Re-fold the corpus "
            "into a fresh state dir — there is no in-place "
            "migration for the unbucketed layouts."
        )


def _fold_bucket_count(meta: dict | None, requested: int) -> int:
    """The fold's pinned P: the first commit's value wins for the
    state dir's lifetime (old segments are bucketed under it; a
    different P would silently mis-prune them). Lives in META's
    ``app`` dict — zero Spark jobs to read."""
    if meta is None:
        return int(requested)
    return int(meta.get("app", {}).get("n_band_buckets", requested))


def _probe_candidates(
    new_bands: DataFrame, all_bands: DataFrame, bucket_cap: int | None
) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing a band key,
    one side always from ``new_bands``. ``bucket_cap`` caps the hash
    build side per (band_id, bkey): index populations above it split
    into deterministic cells (xxhash64(doc_id) % n_cells) and the
    batch side replicates per cell — pair-set identical to the plain
    equi-join, but no single join bucket exceeds ~cap rows."""
    if bucket_cap is None:
        joined = new_bands.alias("n").join(
            all_bands.alias("o"),
            (F.col("n.band_id") == F.col("o.band_id"))
            & (F.col("n.bkey") == F.col("o.bkey"))
            & (F.col("n.doc_id") != F.col("o.doc_id")),
        )
    else:
        cells = (
            all_bands.groupBy("band_id", "bkey")
            .agg(F.count(F.lit(1)).alias("_n"))
            .select(
                "band_id",
                "bkey",
                F.ceil(F.col("_n") / F.lit(int(bucket_cap)))
                .cast("int")
                .alias("_cells"),
            )
        )
        idx = all_bands.join(cells, ["band_id", "bkey"]).withColumn(
            "_cell",
            F.pmod(F.xxhash64("doc_id"), F.col("_cells")).cast("int"),
        )
        probe = (
            new_bands.join(cells, ["band_id", "bkey"])
            .withColumn(
                "_cell",
                F.explode(F.sequence(F.lit(0), F.col("_cells") - 1)),
            )
        )
        joined = probe.alias("n").join(
            idx.alias("o"),
            (F.col("n.band_id") == F.col("o.band_id"))
            & (F.col("n.bkey") == F.col("o.bkey"))
            & (F.col("n._cell") == F.col("o._cell"))
            & (F.col("n.doc_id") != F.col("o.doc_id")),
        )
    return joined.select(
        F.least(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_a"),
        F.greatest(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_b"),
    ).distinct()


def _labels_latest(
    spark: SparkSession,
    state_dir: str,
    partition_filter: dict[str, list] | None,
    table: str = "labels",
) -> DataFrame | None:
    """Latest-wins (doc_id, cluster) over the revision rows a
    ``partition_filter`` selects from ``table`` (the canonical
    ``labels`` copy or the ``labels_byc`` secondary index — same
    rows, different prune key), or None before the first commit.
    Callers own the filter's correctness argument (see
    _merge_label_delta)."""
    revs = read_state_table(
        spark, state_dir, table, partition_filter=partition_filter
    )
    if revs is None:
        return None
    return revs.groupBy("doc_id").agg(
        F.max_by("cluster", "rev").alias("cluster")
    )


def _merge_label_delta(
    spark: SparkSession,
    state_dir: str,
    new: DataFrame,
    new_pairs: DataFrame,
    batch_id: int,
    p: int,
    meta: dict | None,
    prune_min_bytes: int,
    track: list[DataFrame] | None = None,
) -> DataFrame:
    """The labels REVISION DELTA for this batch: one (doc_id, cluster,
    rev=batch_id) row per touched doc — fresh arrivals plus members
    of components the new pairs merge — such that the latest-wins
    read equals one-shot min-label connected components over ALL
    verified pairs so far.

    Because every committed label is already the min-id of its
    component, contracting each component to its representative
    preserves the merged partition: map the new pairs' endpoints to
    their current reps, run min-label CC over that REP graph (at most
    2 rows per new pair — never corpus-sized, whatever the component
    sizes), and revise exactly the docs whose rep lost (plus the
    fresh docs). The new component min equals min over merged reps
    equals min over all member ids — inductively identical to the
    one-shot CC (law-tested in tests/test_neardup_stream.py).

    Both state reads PRUNE once the labels table outgrows
    ``prune_min_bytes`` (the same adaptive rule as the band/shingle
    probes — below it the two driver collects cost more than the
    full scan they'd save):

    - the ENDPOINT rep lookup reads only the new pairs' doc buckets
      (``dbucket`` on the canonical ``labels`` copy): every revision
      of a doc shares its dbucket, so latest-wins over the pruned
      read is exact for those docs;
    - the LOSING-MEMBER scan reads only the losing reps' cluster
      buckets (``cbucket`` on the ``labels_byc`` secondary-index
      copy). That is exact because AN ABANDONED REP
      IS DEAD FOREVER: components only merge and labels are
      component-mins, so once any doc revises away from rep ``c``,
      the whole component did (c's component merged into a smaller
      min — and any future component containing doc ``c`` also
      contains that smaller id, so its min is below ``c``). Hence if
      a doc's max-rev row WITHIN the pruned subset carries cluster
      ``c`` while a newer revision lies outside the subset, ``c`` is
      dead and cannot be in the losing set — the join on
      ``cluster ∈ losing`` drops exactly the stale rows the pruning
      let through. (Law-tested: pruned fold == full-scan fold ==
      one-shot CC after every batch.)

    Per-batch labels READ IO is therefore touched-bucket-sized, not
    O(corpus) — the r7 verdict's one residual read-side term.

    Checkpoint hygiene (r8 ADVICE): the helper's own eager frames
    (rep edges, the CC result) are released before return; the
    ``merged`` frame the RETURNED delta still references lazily is
    appended to ``track`` for the caller to release once the delta is
    materialized — a continuous sink must not accumulate per-batch
    checkpoint blocks."""
    from stock_trend_predictor_spark.operators.checkpoints import (
        release_local_checkpoints,
    )
    from stock_trend_predictor_spark.operators.components import (
        connected_components,
    )

    rev = F.lit(int(batch_id)).alias("rev")
    fresh = new.select("doc_id", F.col("doc_id").alias("cluster"))
    prune = _state_bytes(state_dir, meta, "labels") >= prune_min_bytes
    if prune:
        ep_filter = {
            "dbucket": [
                r["b"]
                for r in new_pairs.select(
                    F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
                )
                .select(_doc_bucket(p).alias("b"))
                .distinct()
                .collect()
            ]
        }
    else:
        ep_filter = None
    prev_ep = _labels_latest(spark, state_dir, ep_filter)
    base = fresh if prev_ep is None else prev_ep.unionByName(fresh)
    np_ = new_pairs.select("doc_a", "doc_b")
    lab_a = base.select(
        F.col("doc_id").alias("doc_a"), F.col("cluster").alias("rep_a")
    )
    lab_b = base.select(
        F.col("doc_id").alias("doc_b"), F.col("cluster").alias("rep_b")
    )
    from pyspark.sql import Observation

    obs = Observation()
    rep_edges = (
        np_.join(lab_a, "doc_a")
        .join(lab_b, "doc_b")
        .where(F.col("rep_a") != F.col("rep_b"))
        .select(
            F.col("rep_a").alias("src"), F.col("rep_b").alias("dst")
        )
        .distinct()
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    # emptiness probe rides the checkpoint pass (df.observe) — no
    # separate isEmpty job per batch
    if not (obs.get["n"] or 0):  # no cross-component pair: fresh only
        release_local_checkpoints(rep_edges)
        return fresh.select("doc_id", "cluster", rev)
    # the rep graph is ≤ 2 rows per new pair by construction (never
    # corpus-sized), so each propagation round broadcasts it instead
    # of shuffling the label table through a sort-merge join
    cc = connected_components(
        rep_edges, "src", "dst", broadcast_edges=True
    )
    merged = cc.select(
        F.col("node").alias("cluster"),
        F.col("component").alias("new_cluster"),
    ).localCheckpoint(eager=True)
    # merged is pinned; the CC result's final round frame and the rep
    # edges are dead now
    release_local_checkpoints(cc, rep_edges)
    if track is not None:
        track.append(merged)
    # only LOSING reps force member revisions; winners keep their rows
    losing = merged.where(F.col("new_cluster") != F.col("cluster"))
    fresh_rows = fresh.join(F.broadcast(merged), "cluster", "left").select(
        "doc_id",
        F.coalesce("new_cluster", "cluster").alias("cluster"),
        rev,
    )
    if prev_ep is None:
        return fresh_rows
    if prune:
        mem_filter = {
            "cbucket": [
                r["b"]
                for r in losing.select(
                    _cluster_bucket(p).alias("b")
                )
                .distinct()
                .collect()
            ]
        }
    else:
        mem_filter = None
    prev_mem = _labels_latest(
        spark, state_dir, mem_filter, table="labels_byc"
    )
    touched = prev_mem.join(F.broadcast(losing), "cluster").select(
        "doc_id", F.col("new_cluster").alias("cluster"), rev
    )
    # a doc is fresh XOR previously labeled, so the union stays one
    # row per doc per rev — the uniqueness latest-wins relies on
    return fresh_rows.unionByName(touched)


def update_neardup_state(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    batch_id: int,
    maintain_clusters: bool = True,
    n_band_buckets: int = N_BAND_BUCKETS,
    bucket_cap: int | None = None,
    compact_every: int | None = None,
    prune_min_bytes: int = PRUNE_MIN_BYTES,
) -> None:
    """Fold one arrival batch of (doc_id, hs) into the maintained
    near-dup state (idempotent: replayed batch ids are skipped before
    any write — and, since this fold eagerly materializes
    intermediates, before any COMPUTE too). ``maintain_clusters=False``
    skips the labels table for pairs-only consumers; a state dir must
    be used consistently with one setting. ``n_band_buckets`` only
    takes effect on the fold's FIRST commit (the config snapshot pins
    it afterwards); ``bucket_cap`` is the mega-bucket probe guard
    (module docstring) — OPT-IN for corpora with skew-prone band
    buckets, because the capped path reads the pruned index twice
    (population counts + the cell join); the default plain equi-join
    is right while no bucket is mega-sized. ``compact_every=N``
    runs statestore.compact_append_table over every append table
    after each Nth batch (an amortized O(corpus) OPTIMIZE that keeps
    a thousand-batch fold's segment count — and so its read planning
    cost — bounded); None leaves compaction to the operator.

    PRECONDITION — each doc_id arrives in exactly ONE batch. A doc
    re-arriving later (re-crawl) would append duplicate band/shingle
    rows and emit duplicate verified-pair rows, and the closed-form
    discovery-batch law (module docstring) assumes a unique
    arrival_batch per doc. Upstream dedupes re-crawls (doc_id /
    content-digest exact dedup before the sink); an inline anti-join
    against the accumulated shingle store would cost an O(corpus)
    state read per batch, defeating the append-only IO discipline."""
    meta = read_meta(state_dir)
    _check_fold_format(meta)
    if (
        meta is not None
        and meta.get("last_batch_id") is not None
        and batch_id <= meta["last_batch_id"]
    ):
        return  # replay: commit_state would skip anyway; skip the work
    from stock_trend_predictor_spark.operators.checkpoints import (
        job_phase,
    )

    p = _fold_bucket_count(meta, n_band_buckets)
    cps: list[DataFrame] = []  # eager frames to release post-commit
    with job_phase(spark, f"ndfold{batch_id}:batch"):
        new = batch.select("doc_id", "hs").localCheckpoint(eager=True)
    cps.append(new)
    # eager: the minhash band derivation feeds THREE consumers (the
    # bucket-set collect, the probe join, the segment write) — left
    # lazy each re-runs the 64-permutation signature fold over the
    # batch (measured 3x the r6 fold wall at sf0.1)
    with job_phase(spark, f"ndfold{batch_id}:bands"):
        new_bands = (
            doc_bands(new)
            .withColumn("bucket", _band_bucket(p))
            .localCheckpoint(eager=True)
        )
    cps.append(new_bands)
    new_sh = new.withColumn("bucket", _doc_bucket(p))
    # ADAPTIVE pruned probe read: once the band index outgrows
    # PRUNE_MIN_BYTES, read only the bucket directories this batch's
    # band keys hash into (<= p values, driver-side set is tiny);
    # below it a full scan is cheaper than the collect + filter.
    if _state_bytes(state_dir, meta, "bands") >= prune_min_bytes:
        batch_buckets = [
            r["bucket"]
            for r in new_bands.select("bucket").distinct().collect()
        ]
        band_filter = {"bucket": batch_buckets}
    else:
        band_filter = None
    prev_bands = read_state_table(
        spark, state_dir, "bands", partition_filter=band_filter
    )
    all_bands = (
        new_bands
        if prev_bands is None
        else prev_bands.unionByName(new_bands)
    )
    # candidates: a NEW doc shares a band with ANY doc folded so far
    # (state or this batch). Pairs with both members old cannot
    # appear — so nothing is ever re-discovered. Eager: the verify
    # join and the doc-bucket pruning below both consume it.
    with job_phase(spark, f"ndfold{batch_id}:cand"):
        cand = _probe_candidates(
            new_bands.drop("bucket"), all_bands.drop("bucket"), bucket_cap
        ).localCheckpoint(eager=True)
    cps.append(cand)
    # ADAPTIVE pruned verify read: only the candidates' doc buckets
    # once the shingle store is big enough for pruning to pay
    if _state_bytes(state_dir, meta, "shingles") >= prune_min_bytes:
        cand_docs = cand.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
        )
        sh_filter = {
            "bucket": [
                r["b"]
                for r in cand_docs.select(_doc_bucket(p).alias("b"))
                .distinct()
                .collect()
            ]
        }
    else:
        sh_filter = None
    prev_sh = read_state_table(
        spark, state_dir, "shingles", partition_filter=sh_filter
    )
    all_sh = (
        new_sh if prev_sh is None else prev_sh.unionByName(new_sh)
    ).drop("bucket")
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
    with job_phase(spark, f"ndfold{batch_id}:verify"):
        new_pairs = new_pairs.localCheckpoint(eager=True)
    cps.append(new_pairs)

    appends: dict[str, DataFrame] = {
        "bands": new_bands,
        "shingles": new_sh,
        "pairs": new_pairs,
    }
    if maintain_clusters:
        # the same revision rows land under TWO single-level bucket
        # layouts (module docstring): labels/dbucket for exact by-doc
        # lookups, labels_byc/cbucket for the losing-member scans —
        # eager once so the merge never recomputes
        with job_phase(spark, f"ndfold{batch_id}:merge"):
            delta = _merge_label_delta(
                spark,
                state_dir,
                new,
                new_pairs,
                batch_id,
                p,
                meta,
                prune_min_bytes,
                track=cps,
            ).localCheckpoint(eager=True)
        cps.append(delta)
        appends["labels"] = delta.withColumn("dbucket", _doc_bucket(p))
        appends["labels_byc"] = delta.withColumn(
            "cbucket", _cluster_bucket(p)
        )

    # ALL data tables are append-only by construction (module
    # docstring: bands/shingles/pairs never change after discovery;
    # labels are latest-wins revisions) — each commit writes only
    # THIS batch's delta segments, so per-commit write IO is
    # batch-sized, not corpus-sized. bands/shingles segments are
    # directory-partitioned on their hash bucket for the pruned
    # probe reads above. files_per_table caps write parallelism for
    # the unpartitioned tables (coalesce never raises the partition
    # count, so tiny batches still land as single files).
    # per-batch deltas land UNPARTITIONED (LSM-style hot writes: a
    # 64-dir partitioned write of a batch-sized delta measured ~2x
    # the plain write for nothing); compaction below rewrites the
    # accumulated bands/shingles into the BUCKETED layout partition
    # pruning needs — the statestore reads stay correct across the
    # mix (bucket is a data column in deltas, a directory in the
    # compacted segment).
    commit_state(
        state_dir,
        {},
        batch_id=batch_id,
        files_per_table=8,
        appends=appends,
        app_meta={
            "n_band_buckets": int(p),
            "neardup_format": NEARDUP_FORMAT,
        },
    )
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:
        from stock_trend_predictor_spark.operators.statestore import (
            compact_append_table,
        )

        rp_by_table = {
            "bands": ["bucket"],
            "shingles": ["bucket"],
            "labels": ["dbucket"],
            "labels_byc": ["cbucket"],
        }
        for t in appends:
            compact_append_table(
                spark, state_dir, t, repartition_by=rp_by_table.get(t)
            )
    # commit materialized every consumer — free this batch's eager
    # blocks so a continuous sink's storage stays batch-bounded
    # instead of growing one checkpoint set per fold (r8 ADVICE)
    from stock_trend_predictor_spark.operators.checkpoints import (
        release_local_checkpoints,
    )

    release_local_checkpoints(*cps)


def rebucket_neardup_state(
    spark: SparkSession, state_dir: str, new_p: int
) -> bool:
    """Grow (or shrink) the fold's on-disk bucket count to ``new_p``
    — the maintenance move for a fold whose corpus outgrew the P its
    first commit pinned. Every bucket-derived table rewrites together
    (bands under ``pmod(xxhash64(band_id, bkey), new_p)``, shingles
    and the labels copy under ``pmod(xxhash64(doc_id), new_p)``, the
    labels_byc index under ``pmod(xxhash64(cluster), new_p)``) and the
    ``n_band_buckets`` pin updates in the SAME atomic META swap
    (statestore.rebucket_append_table), so a pruned probe can never
    plan against a mixed layout: pre-swap reads see old-P segments
    under the old pin, post-swap reads see new-P segments under the
    new pin, and a crash in between leaves the old state intact.
    Post-re-bucket probes find the IDENTICAL pair set (law-tested in
    tests/test_neardup_stream.py). Returns False before the first
    commit. Run it between batches — the fold is single-writer, and
    the next update_neardup_state reads the new pin from META."""
    from stock_trend_predictor_spark.operators.statestore import (
        rebucket_append_table,
    )

    meta = read_meta(state_dir)
    _check_fold_format(meta)
    new_p = int(new_p)
    if new_p < 1:
        raise ValueError(f"bucket count must be >= 1, got {new_p}")
    return rebucket_append_table(
        spark,
        state_dir,
        recompute={
            "bands": lambda df: df.withColumn(
                "bucket", _band_bucket(new_p)
            ),
            "shingles": lambda df: df.withColumn(
                "bucket", _doc_bucket(new_p)
            ),
            "labels": lambda df: df.withColumn(
                "dbucket", _doc_bucket(new_p)
            ),
            "labels_byc": lambda df: df.withColumn(
                "cbucket", _cluster_bucket(new_p)
            ),
        },
        partition_by={
            "bands": ["bucket"],
            "shingles": ["bucket"],
            "labels": ["dbucket"],
            "labels_byc": ["cbucket"],
        },
        app_updates={"n_band_buckets": new_p},
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
    label themselves), maintained incrementally as latest-wins
    revision rows (max-rev per doc; rev unique per doc per batch).
    None pre-commit."""
    revs = read_state_table(spark, state_dir, "labels")
    if revs is None:
        return None
    return revs.groupBy("doc_id").agg(
        F.max_by("cluster", "rev").alias("cluster")
    )


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
