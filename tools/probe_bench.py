"""Probe-IO evidence for the bucketed near-dup fold (r6 verdict #1;
label-merge extension r7 verdict #3).

Protocol: build the fold's state from a 1x corpus (sf0.1 documents,
P=64) and from the 30x dup-saturated corpus (tools/scaleup.py output,
P scaled 30x to 1920 — same nlist ~ N/500-style discipline: constant
~625 band rows per bucket at both scales), COMPACT every bucketed
table (the fold's steady state under periodic compaction), then fold
the SAME small probe batch (16 re-keyed docs) into each and report:

- probe fold WALL (min of 3 reps, each into a fresh copy of the
  state dir so the fold is never a replay skip);
- band-index READ: files + bytes under the probe batch's bucket
  directories of the compacted segment (what partition pruning
  admits) vs the whole index;
- LABEL-MERGE READ (r8): bytes the cluster merge's two pruned label
  reads admit (endpoint lookup -> labels/dbucket dirs; losing-member
  scan -> labels_byc/cbucket dirs, filters captured from the live
  fold) vs the whole label store.

The claim under test: with the bucket count scaled to the corpus,
probe AND merge READ IO are bounded by (batch's bucket count) x
(constant bucket size) — i.e. they stop tracking corpus size.
Results land in SCALE.md.

Usage: python tools/probe_bench.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SMALL = "/root/testdata/sf0.1"
BIG = os.environ.get("SCALEUP_DST", "/tmp/scaleup30")
PROBE_DOCS = 16
ID_SHIFT = 10**12


def _dir_stats(p: str) -> tuple[int, int]:
    files = bytes_ = 0
    for root, _, names in os.walk(p):
        for n in names:
            if n.endswith(".parquet"):
                files += 1
                bytes_ += os.path.getsize(os.path.join(root, n))
    return files, bytes_


def main() -> None:
    from pyspark.sql import functions as F

    from stock_trend_predictor_spark import get_spark
    from stock_trend_predictor_spark.operators.dedup import (
        with_shingle_hashes,
    )
    from stock_trend_predictor_spark.operators.statestore import (
        compact_append_table,
        read_meta,
    )
    from stock_trend_predictor_spark.sources.tables import load_table
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        doc_bands,
        _band_bucket,
        update_neardup_state,
    )

    spark = get_spark(
        app_name="probe-bench",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("| corpus | docs | P | build (s) | probe fold (s) "
          "| probe pairs-only (s) "
          "| bands files read/total | bands MB read/total "
          "| labels MB read/total |")
    print("|---|---|---|---|---|---|---|---|---|")
    for label, src, p in (("1x", SMALL, 64), ("30x", BIG, 1920)):
        docs = load_table(spark, src, "documents").select(
            "doc_id", "text"
        )
        corpus = with_shingle_hashes(docs).select("doc_id", "hs")
        n_docs = corpus.count()
        sdir = f"/tmp/probe-state-{label}"
        shutil.rmtree(sdir, ignore_errors=True)
        t0 = time.perf_counter()
        update_neardup_state(
            spark, corpus, sdir, batch_id=0, n_band_buckets=p
        )
        for t, rp in (
            ("bands", ["bucket"]),
            ("shingles", ["bucket"]),
            ("labels", ["dbucket"]),
            ("labels_byc", ["cbucket"]),
        ):
            compact_append_table(spark, sdir, t, repartition_by=rp)
        build_s = time.perf_counter() - t0

        probe = (
            with_shingle_hashes(
                docs.orderBy("doc_id").limit(PROBE_DOCS)
            )
            .select(
                (F.col("doc_id") + F.lit(ID_SHIFT)).alias("doc_id"),
                "hs",
            )
            .localCheckpoint(eager=True)
        )
        walls = []
        walls_po = []  # pairs-only: probe+verify without the labels
        # merge (r7 isolated the then-O(corpus) label scan this way;
        # since r8 the merge reads prune too — the labels column
        # below is the direct evidence)
        label_filters: dict[str, dict] = {}
        import stock_trend_predictor_spark.streaming.neardup_maintenance as nm

        real_read = nm.read_state_table

        def spy(spark_, sd, name, partition_filter=None):
            if name in ("labels", "labels_byc"):
                label_filters[name] = partition_filter
            return real_read(
                spark_, sd, name, partition_filter=partition_filter
            )

        for rep in range(3):
            for acc, mc in ((walls, True), (walls_po, False)):
                copy = f"{sdir}-rep{rep}-{mc}"
                shutil.rmtree(copy, ignore_errors=True)
                shutil.copytree(sdir, copy)
                nm.read_state_table = spy if mc else real_read
                t0 = time.perf_counter()
                try:
                    update_neardup_state(
                        spark, probe, copy, batch_id=1,
                        maintain_clusters=mc, prune_min_bytes=0,
                    )
                finally:
                    nm.read_state_table = real_read
                acc.append(time.perf_counter() - t0)
                shutil.rmtree(copy, ignore_errors=True)

        # what pruning admits: the probe's band-bucket directories of
        # the COMPACTED segment vs the whole committed index
        pbuckets = {
            r.bucket
            for r in doc_bands(probe)
            .withColumn("bucket", _band_bucket(p))
            .select("bucket")
            .distinct()
            .collect()
        }
        meta = read_meta(sdir)
        seg0 = os.path.join(sdir, meta["segments"]["bands"][0])
        tot_f, tot_b = _dir_stats(seg0)
        read_f = read_b = 0
        for b in pbuckets:
            f, by = _dir_stats(os.path.join(seg0, f"bucket={b}"))
            read_f += f
            read_b += by
        # what the cluster merge's pruned label reads admit (both
        # copies) vs the whole label store — filters captured live
        lab_read = lab_tot = 0
        for table, col in (
            ("labels", "dbucket"),
            ("labels_byc", "cbucket"),
        ):
            seg = os.path.join(sdir, meta["segments"][table][0])
            lab_tot += _dir_stats(seg)[1]
            for v in (label_filters.get(table) or {}).get(col, []):
                lab_read += _dir_stats(
                    os.path.join(seg, f"{col}={v}")
                )[1]
        print(
            f"| {label} | {n_docs} | {p} | {build_s:.1f} "
            f"| {min(walls):.2f} "
            f"| {min(walls_po):.2f} "
            f"| {read_f}/{tot_f} "
            f"| {read_b / 1e6:.2f}/{tot_b / 1e6:.2f} "
            f"| {lab_read / 1e6:.2f}/{lab_tot / 1e6:.2f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
