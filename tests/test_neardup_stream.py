"""Laws for streaming/neardup_maintenance.py — the continuously
maintained MinHash-LSH near-dup fold.

The invariants (module docstring there):

1. stream == batch: the union of pairs emitted across all folds
   equals the one-shot ``dedup_minhash_lsh`` pair set (same banding,
   same >= 0.5 exact-Jaccard verification), regardless of how the
   corpus is batched.
2. discovery-batch law: a pair is discovered exactly once, in the
   batch where its LATER-arriving member lands —
   ``found_in_batch = max(arrival_batch(doc_a), arrival_batch(doc_b))``.
3. replay idempotence: re-delivering an already-folded batch id is a
   no-op (at-least-once foreachBatch → exactly-once folds).
4. the real writeStream sink (availableNow file stream) agrees with
   the direct fold.
"""

from __future__ import annotations

import glob
import os
import time as _time

from pyspark.sql import functions as F

from stock_trend_predictor_spark.operators import dedup as D
from stock_trend_predictor_spark.plans.registry import REGISTRY
from stock_trend_predictor_spark.streaming.neardup_maintenance import (
    neardup_maintenance_sink,
    read_neardup_pairs,
    update_neardup_state,
)


def _fold_mod3(spark, sf_dir, state_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    for i in range(3):
        batch = D.with_shingle_hashes(
            docs.where(F.col("doc_id") % 3 == i)
        ).select("doc_id", "hs")
        update_neardup_state(spark, batch, state_dir, batch_id=i)


def test_neardup_fold_laws(spark, sf_dir, tmp_path):
    sdir = str(tmp_path / "state")
    _fold_mod3(spark, sf_dir, sdir)
    pairs = read_neardup_pairs(spark, sdir)

    # law 1: stream == batch — same pair set (and jaccard values) as
    # the one-shot LSH pass
    oneshot = REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir)
    got = pairs.select("doc_a", "doc_b", "jaccard")
    assert got.exceptAll(oneshot).count() == 0
    assert oneshot.exceptAll(got).count() == 0
    assert oneshot.count() > 0, "vacuous corpus: no near-dup pairs"

    # law 2: discovered exactly once, when the later member lands
    assert pairs.count() == pairs.select("doc_a", "doc_b").distinct().count()
    bad = pairs.where(
        F.col("found_in_batch")
        != F.greatest(F.col("doc_a") % 3, F.col("doc_b") % 3)
    )
    assert bad.count() == 0, bad.collect()
    # the batching is non-trivial: some pair really is cross-batch
    cross = pairs.where(F.col("doc_a") % 3 != F.col("doc_b") % 3)
    assert cross.count() > 0, "mod-3 split produced no cross-batch pair"

    # law 3: replay idempotence
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    before = sorted(map(tuple, pairs.collect()))
    replay = D.with_shingle_hashes(
        docs.where(F.col("doc_id") % 3 == 1)
    ).select("doc_id", "hs")
    update_neardup_state(spark, replay, sdir, batch_id=1)
    after = sorted(map(tuple, read_neardup_pairs(spark, sdir).collect()))
    assert before == after


def test_statestore_append_segments(spark, tmp_path):
    """The append-table protocol (commit_state appends=): committed
    reads are the exact union of committed segments; a replayed batch
    id writes nothing; an orphan segment (crash after segment write,
    before the META swap) stays invisible; snapshot and append tables
    coexist in one commit."""
    from stock_trend_predictor_spark.operators.statestore import (
        commit_state,
        read_state_table,
    )

    sdir = str(tmp_path / "st")
    b0 = spark.createDataFrame([(1,), (2,)], "x long")
    b1 = spark.createDataFrame([(3,)], "x long")

    def rows():
        return sorted(
            r.x for r in read_state_table(spark, sdir, "t").collect()
        )

    assert commit_state(sdir, {}, batch_id=0, appends={"t": b0})
    assert rows() == [1, 2]
    # replay: no write at all, even with different content offered
    assert not commit_state(sdir, {}, batch_id=0, appends={"t": b1})
    assert rows() == [1, 2]
    assert commit_state(sdir, {}, batch_id=1, appends={"t": b1})
    assert rows() == [1, 2, 3]

    # crash window: a segment on disk that no META references
    orphan = os.path.join(sdir, "seg-t", "b-0000000099")
    spark.createDataFrame([(999,)], "x long").write.parquet(orphan)
    assert rows() == [1, 2, 3]

    # snapshot + append in one commit; appends are multiset unions
    snap = spark.createDataFrame([(7,)], "y long")
    assert commit_state(sdir, {"s": snap}, batch_id=2, appends={"t": b0})
    assert [r.y for r in read_state_table(spark, sdir, "s").collect()] == [7]
    assert rows() == [1, 1, 2, 2, 3]
    assert read_state_table(spark, sdir, "missing") is None


def test_neardup_sink_end_to_end(spark, sf_dir, tmp_path):
    """A real availableNow file stream through neardup_maintenance_sink
    emits the same pair set as the one-shot pass (law 4)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    src = tmp_path / "in"
    src.mkdir()
    now = _time.time()
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{i}.parquet"))
        (f,) = glob.glob(str(src / f"b{i}.parquet" / "*.parquet"))
        dst = src / f"batch_{i}.parquet"
        os.rename(f, dst)
        os.utime(dst, (now - 60 + i, now - 60 + i))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sdir = str(tmp_path / "state")
    q = neardup_maintenance_sink(
        stream, sdir, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = read_neardup_pairs(spark, sdir).select(
        "doc_a", "doc_b", "jaccard"
    )
    oneshot = REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir)
    assert got.exceptAll(oneshot).count() == 0
    assert oneshot.exceptAll(got).count() == 0


def test_neardup_incremental_clusters_law(spark, sf_dir, tmp_path):
    """The maintained labels equal the ONE-SHOT connected components
    over all verified pairs (singletons label themselves) — the
    induction the incremental merge claims; plus: replay leaves
    labels untouched, and at least one maintained cluster spans
    arrival batches (so the cross-batch merge path really ran)."""
    from stock_trend_predictor_spark.operators.components import (
        connected_components,
    )
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        read_neardup_clusters,
        read_neardup_pairs,
    )

    sdir = str(tmp_path / "state")
    _fold_mod3(spark, sf_dir, sdir)
    labels = read_neardup_clusters(spark, sdir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert labels.count() == docs.count()

    pairs = read_neardup_pairs(spark, sdir)
    comps = connected_components(
        pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ),
        "src",
        "dst",
    )
    oneshot = (
        docs.select("doc_id")
        .join(
            comps.select(F.col("node").alias("doc_id"), "component"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id", F.coalesce("component", "doc_id").alias("cluster")
        )
    )
    assert labels.exceptAll(oneshot).count() == 0
    assert oneshot.exceptAll(labels).count() == 0

    # a real cross-batch cluster exists (merge path exercised)
    spanning = (
        labels.where(F.col("doc_id") != F.col("cluster"))
        .where(F.col("doc_id") % 3 != F.col("cluster") % 3)
        .count()
    )
    assert spanning > 0

    # replay of the last batch: labels bit-unchanged
    from stock_trend_predictor_spark.operators import dedup as D2
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        update_neardup_state,
    )

    before = sorted(map(tuple, labels.collect()))
    replay = D2.with_shingle_hashes(
        docs.select("doc_id", "text").where(F.col("doc_id") % 3 == 2)
    ).select("doc_id", "hs")
    update_neardup_state(spark, replay, sdir, batch_id=2)
    after = sorted(
        map(tuple, read_neardup_clusters(spark, sdir).collect())
    )
    assert before == after
