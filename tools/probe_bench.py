"""Probe-IO evidence for the bucketed fold family's PRUNED reads
(r6 verdict #1; label-merge extension r7 verdict #3; semdedup /
kNN-graph / BM25 read columns r8 verdict #1 — the engaged-regime
bytes evidence the steady-state table alone could not show).

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

Since r9 the same protocol covers the rest of the family's pruned
reads (r8 verdict #1): ``semdedup`` (members/labels/labels_byc),
``knngraph`` (members/toplists), and ``bm25`` (the QUERY read's
postings + docstats pruning) — each builds 1x and 30x state at
P = 64 / 1920, compacts, forces the pruned regime
(prune_min_bytes=0), captures the live partition filters, and
reports admitted vs total bytes per table.

Usage: python tools/probe_bench.py [neardup|semdedup|knngraph|bm25 ...]
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


def _admitted(sdir: str, meta: dict, table: str, col: str, values) -> tuple[int, int]:
    """(admitted bytes, total bytes) of a compacted table under a
    captured partition filter's value set."""
    seg = os.path.join(sdir, meta["segments"][table][0])
    tot = _dir_stats(seg)[1]
    adm = 0
    for v in values or []:
        adm += _dir_stats(os.path.join(seg, f"{col}={v}"))[1]
    return adm, tot


def probe_neardup(spark) -> None:
    from pyspark.sql import functions as F

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


def _vectors(spark, src):
    from pyspark.sql import functions as F

    from stock_trend_predictor_spark.operators.similarity import (
        as_double,
        l2norm,
    )
    from stock_trend_predictor_spark.sources.tables import (
        load_table,
        materialize_once,
    )

    return materialize_once(
        load_table(spark, src, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", as_double("embedding").alias("v"))
        .withColumn("nrm", l2norm(F.col("v")))
    )


def _cents(spark, e):
    from stock_trend_predictor_spark.operators.ivf import kmeans_centroids

    n = e.count()
    k = max(8, n // 500)
    sample_mod = max(1, int(n // (k * 64))) if k > 64 else 1
    return kmeans_centroids(
        e, k=k, iters=3, vec_col="v", sample_mod=sample_mod
    )


def probe_vec_fold(spark, fold: str) -> None:
    """semdedup / knngraph: fold a +16 vector batch into compacted 1x
    vs 30x state with pruning FORCED, capture the live partition
    filters, and report admitted vs total bytes per pruned table."""
    from pyspark.sql import functions as F

    from stock_trend_predictor_spark.operators.statestore import (
        compact_append_table,
        read_meta,
    )

    if fold == "semdedup":
        import stock_trend_predictor_spark.streaming.semdedup_maintenance as m

        upd = m.update_semdedup_state
        tables = (
            ("members", "bucket"),
            ("labels", "dbucket"),
            ("labels_byc", "cbucket"),
        )
    else:
        import stock_trend_predictor_spark.streaming.knngraph_maintenance as m

        upd = m.update_knngraph_state
        tables = (("members", "bucket"), ("toplists", "qbucket"))

    cols = " | ".join(f"{t} MB read/total" for t, _ in tables)
    print(f"| corpus | vecs | P | build (s) | +16 fold (s) | {cols} |")
    print("|---|---|---|---|---|" + "---|" * len(tables))
    for label, src, p in (("1x", SMALL, 64), ("30x", BIG, 1920)):
        e = _vectors(spark, src)
        n_vecs = e.count()
        cents = _cents(spark, e)
        sdir = f"/tmp/probe-{fold}-{label}"
        shutil.rmtree(sdir, ignore_errors=True)
        t0 = time.perf_counter()
        for i in range(3):
            upd(
                spark,
                e.where(F.col("vec_id") % 3 == i).select("vec_id", "v"),
                sdir,
                cents,
                batch_id=i,
                n_buckets=p,
            )
        for t, c in tables:
            compact_append_table(spark, sdir, t, repartition_by=[c])
        build_s = time.perf_counter() - t0

        probe = (
            e.orderBy("vec_id")
            .limit(PROBE_DOCS)
            .select(
                (F.col("vec_id") + F.lit(ID_SHIFT)).alias("vec_id"), "v"
            )
            .localCheckpoint(eager=True)
        )
        # the semdedup fold's label-merge reads resolve read_state_table
        # in the NEAR-DUP module (the shared _merge_label_delta) — spy
        # on both namespaces so every pruned filter is captured
        import stock_trend_predictor_spark.streaming.neardup_maintenance as nm

        filters: dict[str, dict] = {}
        real = m.read_state_table
        real_nm = nm.read_state_table

        def spy(spark_, sd, name, partition_filter=None):
            filters.setdefault(name, partition_filter)
            return real(spark_, sd, name, partition_filter=partition_filter)

        walls = []
        for rep in range(3):
            copy = f"{sdir}-rep{rep}"
            shutil.rmtree(copy, ignore_errors=True)
            shutil.copytree(sdir, copy)
            filters.clear()
            m.read_state_table = spy
            nm.read_state_table = spy
            t0 = time.perf_counter()
            try:
                upd(
                    spark, probe, copy, cents, batch_id=3,
                    prune_min_bytes=0,
                )
            finally:
                m.read_state_table = real
                nm.read_state_table = real_nm
            walls.append(time.perf_counter() - t0)
            shutil.rmtree(copy, ignore_errors=True)

        meta = read_meta(sdir)
        parts = []
        for t, c in tables:
            adm, tot = _admitted(
                sdir, meta, t, c, (filters.get(t) or {}).get(c)
            )
            parts.append(f"{adm / 1e6:.2f}/{tot / 1e6:.2f}")
        print(
            f"| {label} | {n_vecs} | {p} | {build_s:.1f} "
            f"| {min(walls):.2f} | " + " | ".join(parts) + " |",
            flush=True,
        )


def probe_bm25(spark) -> None:
    """BM25 QUERY-read pruning: postings admit only the query terms'
    tbuckets, docstats only the candidates' dbuckets (r8 verdict #3)
    — admitted vs total bytes at 1x vs 30x, pruning forced. Three
    query shapes per corpus: the registry's COMMON terms (candidates
    ~ the corpus, so the docstats read is candidate-bounded ==
    corpus-bounded — inherent, you must score every candidate); the
    rarest tokens with df >= top_k, which since r10 are
    GENERATOR-NATIVE Zipf-tail levels (fold text carries
    zipf_tail_token(doc_id), df(zt_j) ~ N * 2**-(j+1), so a natural
    term with df just above top_k exists at every corpus size — the
    raw synthetic vocabulary alone has a ~3%-of-corpus df floor that
    made this row degenerate before); and a RARE marker token carried
    by one small folded batch (df = 50 >= top_k, candidates << P —
    kept as the arrival-hot-path shape). At 30x the selective row's
    candidates (~top_k..2*top_k docs) touch a handful of the 1920
    dbuckets — BOTH reads collapse without a marker."""
    from pyspark.sql import functions as F

    from stock_trend_predictor_spark.operators.statestore import (
        compact_append_table,
        read_meta,
    )
    from stock_trend_predictor_spark.functions.text import (
        zipf_tail_token,
    )
    from stock_trend_predictor_spark.plans.summary_queries import (
        BM25_TERMS,
    )
    from stock_trend_predictor_spark.sources.tables import load_table
    import stock_trend_predictor_spark.streaming.retrieval_maintenance as m

    print("| corpus | docs | P | query | read (s) "
          "| postings MB read/total | docstats MB read/total |")
    print("|---|---|---|---|---|---|---|")
    for label, src, p in (("1x", SMALL, 64), ("30x", BIG, 1920)):
        # fold text = raw text + the generator-native Zipf tail token
        # (df(zt_j) ~ N * 2**-(j+1)): the deepest populated levels sit
        # near df = top_k at EVERY corpus size, so the 'selective' row
        # below picks a NATURAL rare term and the two-sided pruned
        # read demonstrates without a specially-folded marker batch
        # (r9 verdict item 6; tools/scaleup.py carries the same
        # derivation as the documents table's zipf_token column)
        docs = load_table(spark, src, "documents").select(
            "doc_id",
            F.concat_ws(
                " ", F.col("text"), zipf_tail_token("doc_id")
            ).alias("text"),
        )
        n_docs = docs.count()
        sdir = f"/tmp/probe-bm25-{label}"
        shutil.rmtree(sdir, ignore_errors=True)
        for i in range(3):
            m.update_retrieval_state(
                spark,
                docs.where(F.col("doc_id") % 3 == i),
                sdir,
                batch_id=i,
                n_buckets=p,
            )
        # one more small fold carrying a marker token in 50 docs: a
        # genuinely RARE term (df = 50) the synthetic vocabulary
        # cannot supply (its df floor is ~3% of the corpus)
        marker = (
            docs.orderBy("doc_id")
            .limit(50)
            .select(
                (F.col("doc_id") + F.lit(7 * 10**13)).alias("doc_id"),
                F.concat(F.lit("zqmarker "), F.col("text")).alias(
                    "text"
                ),
            )
        )
        m.update_retrieval_state(
            spark, marker, sdir, batch_id=3, n_buckets=p
        )
        for t, c in (("postings", ["tbucket"]), ("docstats", ["dbucket"])):
            compact_append_table(spark, sdir, t, repartition_by=c)
        # a deterministic SELECTIVE query: the two RAREST tokens with
        # df >= top_k=20 (>= top_k keeps the candidate-dbucket prune
        # exact; rarest makes the candidate set as small as the
        # exactness condition allows at any corpus scale)
        sel = tuple(
            r["token"]
            for r in docs.select(
                "doc_id", F.explode(F.split("text", " ")).alias("token")
            )
            .groupBy("token")
            .agg(F.countDistinct("doc_id").alias("df"))
            .where(F.col("df") >= 20)
            .orderBy("df", "token")
            .limit(2)
            .collect()
        )
        for qlabel, terms in (
            ("common", BM25_TERMS),
            ("selective", sel),
            ("rare", ("zqmarker",)),
        ):
            if not terms:
                continue
            filters: dict[str, dict] = {}
            real = m.read_state_table

            def spy(spark_, sd, name, partition_filter=None):
                filters.setdefault(name, partition_filter)
                return real(
                    spark_, sd, name, partition_filter=partition_filter
                )

            walls = []
            for _ in range(3):
                filters.clear()
                m.read_state_table = spy
                t0 = time.perf_counter()
                try:
                    m.read_bm25_search(
                        spark, sdir, terms, prune_min_bytes=0
                    ).collect()
                finally:
                    m.read_state_table = real
                walls.append(time.perf_counter() - t0)

            meta = read_meta(sdir)
            parts = []
            for t, c in (("postings", "tbucket"), ("docstats", "dbucket")):
                adm, tot = _admitted(
                    sdir, meta, t, c, (filters.get(t) or {}).get(c)
                )
                parts.append(f"{adm / 1e6:.2f}/{tot / 1e6:.2f}")
            print(
                f"| {label} | {n_docs} | {p} | {qlabel} "
                f"| {min(walls):.2f} | " + " | ".join(parts) + " |",
                flush=True,
            )


def main() -> None:
    from stock_trend_predictor_spark import get_spark

    which = sys.argv[1:] or ["neardup", "semdedup", "knngraph", "bm25"]
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
    for w in which:
        print(f"\n## {w}", flush=True)
        if w == "neardup":
            probe_neardup(spark)
        elif w in ("semdedup", "knngraph"):
            probe_vec_fold(spark, w)
        elif w == "bm25":
            probe_bm25(spark)
        else:
            raise SystemExit(f"unknown probe target {w!r}")
    spark.stop()


if __name__ == "__main__":
    main()
