"""Round-9 laws: the maintained multimodal phash fold, the pruned
BM25 docstats read, and checkpoint-release accounting for every fold
in the family (r8 ADVICE: continuous sinks must hold batch-bounded
executor storage, not one localCheckpoint block set per batch)."""

import os

from pyspark.sql import functions as F


def _dir_bytes(p):
    total = 0
    for root, _, files in os.walk(p):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _persistent_ids(spark) -> set:
    """Ids of the currently persisted RDDs. The release laws assert
    on SET DIFFERENCE (no NEW ids survive the fold), not on counts:
    frames created by fixtures can be unpersisted asynchronously
    mid-test (Python GC of their proxies -> JVM weak-ref collection
    -> ContextCleaner), so a count can legitimately SHRINK under a
    long fold — which is not a leak and must not fail the law."""
    it = (
        spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
    )
    ids = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


def _phash_docs(spark, sf_dir):
    """(doc_id, phash) for the whole documents table — the fold's
    input view, hashed once through the real Arrow kernel."""
    from stock_trend_predictor_spark.operators.multimodal import (
        attach_payload,
        perceptual_hash,
    )
    from stock_trend_predictor_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return perceptual_hash(attach_payload(docs)).select(
        "doc_id", "phash"
    )


def _fold_phash(spark, docs, sdir, splits, **kw):
    from stock_trend_predictor_spark.streaming.phash_maintenance import (
        update_phash_state,
    )

    for i, cond in enumerate(splits):
        update_phash_state(
            spark, docs.where(cond), sdir, batch_id=i, **kw
        )


def _pairs(spark, sdir):
    from stock_trend_predictor_spark.streaming.phash_maintenance import (
        read_phash_pairs,
    )

    return sorted(
        map(
            tuple,
            read_phash_pairs(spark, sdir)
            .select("doc_a", "doc_b", "hamming")
            .collect(),
        )
    )


# ---------------------------------------------------------------- #
# maintained multimodal phash fold                                  #
# ---------------------------------------------------------------- #


def test_phash_stream_equals_batch_and_order_invariance(
    spark, sf_dir, tmp_path
):
    """Union of emitted pairs == the one-shot dedup_multimodal_phash
    pair set — on the registry's mod-3 split AND a front/back split
    with pruning forced (stream == batch + arrival-order
    invariance + the pruned reads are exact)."""
    from stock_trend_predictor_spark.plans.registry import REGISTRY

    ref = sorted(
        map(
            tuple,
            REGISTRY["dedup_multimodal_phash"].fn(spark, sf_dir).collect(),
        )
    )
    assert len(ref) > 0
    got = sorted(
        map(
            tuple,
            REGISTRY["phash_incremental_pairs"].fn(spark, sf_dir).collect(),
        )
    )
    assert got == ref

    docs = _phash_docs(spark, sf_dir)
    sdir = str(tmp_path / "ph-fb")
    _fold_phash(
        spark,
        docs,
        sdir,
        (F.col("doc_id") >= 250, F.col("doc_id") < 250),
        prune_min_bytes=0,
    )
    assert _pairs(spark, sdir) == ref


def test_phash_discovery_batch_law(spark, sf_dir, tmp_path):
    """A pair is discovered exactly once, when its later-arriving
    member lands: found_in_batch == max(doc_a % 3, doc_b % 3) under
    the mod-3 arrival split — the near-dup fold's closed-form
    emission law carried to the multimodal tier."""
    from stock_trend_predictor_spark.streaming.phash_maintenance import (
        read_phash_pairs,
    )

    docs = _phash_docs(spark, sf_dir)
    sdir = str(tmp_path / "ph-law")
    _fold_phash(
        spark, docs, sdir, [F.col("doc_id") % 3 == i for i in range(3)]
    )
    rows = read_phash_pairs(spark, sdir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["found_in_batch"] == max(
            r["doc_a"] % 3, r["doc_b"] % 3
        ), r


def test_phash_replay_idempotence(spark, sf_dir, tmp_path):
    from stock_trend_predictor_spark.streaming.phash_maintenance import (
        update_phash_state,
    )

    docs = _phash_docs(spark, sf_dir)
    sdir = str(tmp_path / "ph-replay")
    _fold_phash(
        spark, docs, sdir, [F.col("doc_id") % 2 == i for i in range(2)]
    )
    before = _pairs(spark, sdir)
    update_phash_state(
        spark, docs.where(F.col("doc_id") % 2 == 1), sdir, batch_id=1
    )
    assert _pairs(spark, sdir) == before


def test_phash_capped_probe_identity(spark, sf_dir, tmp_path):
    """bucket_cap far below every band population forces the salted
    probe plan on every bucket — the emitted pair set is identical
    to the plain equi-join's."""
    docs = _phash_docs(spark, sf_dir)
    plain, capped = str(tmp_path / "ph-a"), str(tmp_path / "ph-b")
    splits = [F.col("doc_id") % 3 == i for i in range(3)]
    _fold_phash(spark, docs, plain, splits)
    _fold_phash(spark, docs, capped, splits, bucket_cap=2)
    assert _pairs(spark, plain) == _pairs(spark, capped)


def test_phash_pruned_reads_touch_buckets_only(
    spark, sf_dir, tmp_path, monkeypatch
):
    """With pruning forced, the probe read admits only the BATCH's
    band buckets and the verify read only the CANDIDATES' doc
    buckets — per-batch read IO tracks the batch, not the corpus."""
    from stock_trend_predictor_spark.streaming import (
        phash_maintenance as pm,
    )

    docs = _phash_docs(spark, sf_dir)
    sdir = str(tmp_path / "ph-prune")
    pm.update_phash_state(
        spark, docs.where(F.col("doc_id") < 400), sdir, batch_id=0
    )
    filters = {}
    real = pm.read_state_table

    def spy(spark_, sd, name, partition_filter=None):
        filters[name] = partition_filter
        return real(spark_, sd, name, partition_filter=partition_filter)

    monkeypatch.setattr(pm, "read_state_table", spy)
    pm.update_phash_state(
        spark,
        docs.where(F.col("doc_id") >= 400),
        sdir,
        batch_id=1,
        prune_min_bytes=0,
    )
    assert filters["pbands"] is not None
    assert set(filters["pbands"]) == {"bucket"}
    assert filters["phashes"] is not None
    assert set(filters["phashes"]) == {"bucket"}


def test_phash_write_io_batch_bounded(spark, sf_dir, tmp_path):
    """Per-commit WRITE bytes stay batch-bounded for equal batches
    while the index grows 6x — every table appends, nothing
    rewrites."""
    from stock_trend_predictor_spark.operators.statestore import (
        read_meta,
    )
    from stock_trend_predictor_spark.streaming.phash_maintenance import (
        update_phash_state,
    )

    docs = _phash_docs(spark, sf_dir)
    sdir = str(tmp_path / "ph-io")
    per_commit = []
    for b in range(6):
        before = read_meta(sdir)
        update_phash_state(
            spark, docs.where(F.col("doc_id") % 6 == b), sdir, batch_id=b
        )
        after = read_meta(sdir)
        bseg = before.get("segments", {}) if before else {}
        written = 0
        for t, segs in after["segments"].items():
            for s in segs:
                if s not in bseg.get(t, []):
                    written += _dir_bytes(os.path.join(sdir, s))
        per_commit.append(written)
    assert max(per_commit[1:]) < 2.0 * per_commit[0], per_commit


def test_phash_rebucket_identity_and_format_guard(
    spark, sf_dir, tmp_path
):
    import json

    import pytest as _pytest

    from stock_trend_predictor_spark.streaming.phash_maintenance import (
        rebucket_phash_state,
        update_phash_state,
    )

    docs = _phash_docs(spark, sf_dir)
    sdir = str(tmp_path / "ph-rb")
    _fold_phash(
        spark, docs, sdir, [F.col("doc_id") % 2 == i for i in range(2)]
    )
    before = _pairs(spark, sdir)
    assert rebucket_phash_state(spark, sdir, 17)
    from stock_trend_predictor_spark.operators.statestore import (
        read_meta,
    )

    assert read_meta(sdir)["app"]["n_phash_buckets"] == 17
    assert _pairs(spark, sdir) == before
    # a fold keeps working against the re-pinned layout
    update_phash_state(
        spark, docs.where(F.col("doc_id") % 2 == 0).limit(0), sdir,
        batch_id=2, prune_min_bytes=0,
    )
    assert _pairs(spark, sdir) == before

    # format guard: an alien stamp is refused, an unstamped segment
    # layout is refused
    meta_path = os.path.join(sdir, "META.json")
    meta = json.loads(open(meta_path).read())
    meta["app"]["phash_format"] = 99
    open(meta_path, "w").write(json.dumps(meta))
    with _pytest.raises(RuntimeError, match="fold format v99"):
        update_phash_state(spark, docs.limit(0), sdir, batch_id=3)
    del meta["app"]["phash_format"]
    open(meta_path, "w").write(json.dumps(meta))
    with _pytest.raises(RuntimeError, match="unstamped"):
        update_phash_state(spark, docs.limit(0), sdir, batch_id=3)


def test_phash_compaction_read_identity(spark, sf_dir, tmp_path):
    """compact_every rewrites the accumulated segments bucketed;
    reads (plain and pruned) are row-identical across the rewrite."""
    docs = _phash_docs(spark, sf_dir)
    plain, compacted = str(tmp_path / "ph-p"), str(tmp_path / "ph-c")
    splits = [F.col("doc_id") % 3 == i for i in range(3)]
    _fold_phash(spark, docs, plain, splits)
    _fold_phash(spark, docs, compacted, splits, compact_every=1)
    assert _pairs(spark, plain) == _pairs(spark, compacted)
    # and a post-compaction pruned fold still discovers nothing new
    from stock_trend_predictor_spark.streaming.phash_maintenance import (
        update_phash_state,
    )

    update_phash_state(
        spark, docs.limit(0), compacted, batch_id=3, prune_min_bytes=0
    )
    assert _pairs(spark, plain) == _pairs(spark, compacted)


def test_phash_sink_end_to_end(spark, sf_dir, tmp_path):
    """A real availableNow document stream through
    phash_maintenance_sink reproduces the one-shot pair set."""
    import glob as _glob
    import time as _time

    from stock_trend_predictor_spark.plans.registry import REGISTRY
    from stock_trend_predictor_spark.sources.tables import load_table
    from stock_trend_predictor_spark.streaming.phash_maintenance import (
        phash_maintenance_sink,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    src = tmp_path / "in"
    src.mkdir()
    now = _time.time()
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{i}.parquet"))
        (f,) = _glob.glob(str(src / f"b{i}.parquet" / "*.parquet"))
        dst = src / f"batch_{i}.parquet"
        os.rename(f, dst)
        os.utime(dst, (now - 60 + i, now - 60 + i))
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sdir = str(tmp_path / "state")
    q = phash_maintenance_sink(
        stream, sdir, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(240)
    ref = sorted(
        map(
            tuple,
            REGISTRY["dedup_multimodal_phash"].fn(spark, sf_dir).collect(),
        )
    )
    assert _pairs(spark, sdir) == ref and len(ref) > 0


# ---------------------------------------------------------------- #
# BM25: pruned docstats read (r8 verdict #3)                        #
# ---------------------------------------------------------------- #


def test_bm25_docstats_pruned_read_exact_and_captured(
    spark, sf_dir, tmp_path, monkeypatch
):
    """With pruning forced and >= top_k matching docs, the docstats
    read admits only the CANDIDATES' dbuckets and the result equals
    the full-scan read; with fewer matches than top_k the read falls
    back to the full scan (zero-match docs fill the tail) and stays
    exact."""
    from stock_trend_predictor_spark.plans.summary_queries import (
        BM25_TERMS,
    )
    from stock_trend_predictor_spark.streaming import (
        retrieval_maintenance as rm,
    )

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
    )
    sdir = str(tmp_path / "bm25-ds")
    rm.update_retrieval_state(spark, docs, sdir, batch_id=0)
    full = sorted(
        map(
            tuple,
            rm.read_bm25_search(
                spark, sdir, BM25_TERMS, prune_min_bytes=10**15
            ).collect(),
        )
    )
    filters = {}
    real = rm.read_state_table

    def spy(spark_, sd, name, partition_filter=None):
        filters[name] = partition_filter
        return real(spark_, sd, name, partition_filter=partition_filter)

    monkeypatch.setattr(rm, "read_state_table", spy)
    pruned = sorted(
        map(
            tuple,
            rm.read_bm25_search(
                spark, sdir, BM25_TERMS, prune_min_bytes=0
            ).collect(),
        )
    )
    assert pruned == full and len(full) > 0
    assert filters["docstats"] is not None
    assert set(filters["docstats"]) == {"dbucket"}

    # the few-match fallback: a term matching < top_k docs reads
    # docstats unpruned (the zero-score tail is corpus-wide) and the
    # result still equals the full-scan read
    few = docs.withColumn(
        "text",
        F.when(F.col("doc_id") < 3, F.concat(F.lit("rareterm "), "text"))
        .otherwise(F.col("text")),
    )
    sdir2 = str(tmp_path / "bm25-few")
    rm.update_retrieval_state(spark, few, sdir2, batch_id=0)
    monkeypatch.setattr(rm, "read_state_table", real)
    full2 = sorted(
        map(
            tuple,
            rm.read_bm25_search(
                spark, sdir2, ("rareterm",), prune_min_bytes=10**15
            ).collect(),
        )
    )
    monkeypatch.setattr(rm, "read_state_table", spy)
    filters.clear()
    pruned2 = sorted(
        map(
            tuple,
            rm.read_bm25_search(
                spark, sdir2, ("rareterm",), prune_min_bytes=0
            ).collect(),
        )
    )
    assert pruned2 == full2
    assert filters["docstats"] is None  # fallback engaged


# ---------------------------------------------------------------- #
# checkpoint-release accounting (r8 ADVICE)                         #
# ---------------------------------------------------------------- #


def test_release_local_checkpoints_frees_blocks(spark):
    from stock_trend_predictor_spark.operators.checkpoints import (
        release_local_checkpoints,
    )

    base = _n_persistent(spark)
    cp = spark.range(100).selectExpr("id", "id * 2 AS y").localCheckpoint(
        eager=True
    )
    assert _n_persistent(spark) == base + 1
    # OWNERSHIP RULE (r9): a DERIVED frame is a no-op — its plan
    # leaves are the INPUT's RDDs, which the releasing code does not
    # own (the first leaf-walking cut let a constituent fold free its
    # caller's live input blocks)
    release_local_checkpoints(cp.select("id"))
    assert _n_persistent(spark) == base + 1
    # the handle itself releases
    release_local_checkpoints(cp)
    assert _n_persistent(spark) == base
    # no-ops: None and a plain scan
    release_local_checkpoints(None, spark.range(5))
    assert _n_persistent(spark) == base


def test_connected_components_releases_round_frames(spark):
    from stock_trend_predictor_spark.operators.checkpoints import (
        release_local_checkpoints,
    )
    from stock_trend_predictor_spark.operators.components import (
        connected_components,
    )

    base = _n_persistent(spark)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "src long, dst long"
    )
    cc = connected_components(edges)
    rows = {(r["node"], r["component"]) for r in cc.collect()}
    assert (3, 1) in rows and (22, 20) in rows
    # only the FINAL round frame may remain; releasing the returned
    # df reaches it
    assert _n_persistent(spark) == base + 1
    release_local_checkpoints(cc)
    assert _n_persistent(spark) == base


def test_fold_updates_release_checkpoint_blocks(
    spark, sf_dir, tmp_path
):
    """Every maintained fold's update path returns the session to its
    pre-call persistent-RDD count — the observable that a continuous
    sink holds batch-bounded executor storage (r8 ADVICE: six 30x
    builds OOM'd a 16 GiB JVM before the release discipline)."""
    from stock_trend_predictor_spark.sources.tables import load_table
    from stock_trend_predictor_spark.streaming.decon_maintenance import (
        update_decon_docs,
    )
    from stock_trend_predictor_spark.streaming.dsir_maintenance import (
        update_dsir_state,
    )
    from stock_trend_predictor_spark.streaming.knngraph_maintenance import (
        update_knngraph_state,
    )
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        update_neardup_state,
    )
    from stock_trend_predictor_spark.streaming.phash_maintenance import (
        update_phash_state,
    )
    from stock_trend_predictor_spark.streaming.retrieval_maintenance import (
        update_retrieval_state,
    )
    from stock_trend_predictor_spark.streaming.semdedup_maintenance import (
        update_semdedup_state,
    )
    from stock_trend_predictor_spark.operators import dedup as D
    from stock_trend_predictor_spark.operators.similarity import as_double

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    sh = D.with_shingle_hashes(docs).select("doc_id", "hs")
    ph = _phash_docs(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    cents = [
        [float(x) for x in r["v"]]
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]

    def runs(tag):
        return {
            "neardup": lambda b, d: update_neardup_state(
                spark, sh.where(b), d, batch_id=tag
            ),
            "phash": lambda b, d: update_phash_state(
                spark, ph.where(b), d, batch_id=tag
            ),
            "bm25": lambda b, d: update_retrieval_state(
                spark, docs.where(b), d, batch_id=tag
            ),
            "knngraph": lambda b, d: update_knngraph_state(
                spark, emb.where(b), d, cents, batch_id=tag
            ),
            "semdedup": lambda b, d: update_semdedup_state(
                spark, emb.where(b), d, cents, batch_id=tag
            ),
            "dsir": lambda b, d: update_dsir_state(
                spark, docs.where(b), d, batch_id=tag
            ),
            "decon": lambda b, d: update_decon_docs(
                spark, docs.where(b).select("doc_id", "text"), d,
                batch_id=tag,
            ),
        }

    key = {"knngraph": "vec_id", "semdedup": "vec_id"}
    base_ids = _persistent_ids(spark)
    for name, fn0 in runs(0).items():
        d = str(tmp_path / f"rel-{name}")
        col = F.col(key.get(name, "doc_id"))
        fn0(col % 2 == 0, d)
        runs(1)[name](col % 2 == 1, d)
        leaked = _persistent_ids(spark) - base_ids
        assert not leaked, (
            f"{name} fold leaked checkpoint blocks: RDD ids {leaked}"
        )


# ---------------------------------------------------------------- #
# curation manifest capstone (fold composition)                     #
# ---------------------------------------------------------------- #


def _manifest_fixture(spark, sf_dir):
    """(docs, vecs, cents, budget, tertiles) — the registry query's
    exact parameters, shared by every composition law."""
    from stock_trend_predictor_spark.operators.ivf import (
        kmeans_centroids,
    )
    from stock_trend_predictor_spark.operators.similarity import (
        as_double,
        l2norm,
    )
    from stock_trend_predictor_spark.sources.tables import (
        load_table,
        materialize_once,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    e = materialize_once(
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double("embedding").alias("v"))
        .withColumn("nrm", l2norm(F.col("v")))
    )
    n = e.count()
    k = max(8, n // 500)
    cents = kmeans_centroids(e, k=k, iters=3, vec_col="v")
    lo, hi, budget = docs.agg(
        F.expr("percentile(doc_id, 0.33)"),
        F.expr("percentile(doc_id, 0.67)"),
        F.expr(
            "CAST(SUM(size(split(text, ' '))) AS BIGINT)"
            " DIV (COUNT(DISTINCT source) * 2)"
        ),
    ).first()
    return docs, e, cents, int(budget), (float(lo), float(hi))


def _fold_manifest(spark, docs, vecs, cents, budget, base, bounds):
    """Fold the corpus through the composition as len(bounds)+1
    contiguous doc_id-range batches (bench suite first, batch 0)."""
    from stock_trend_predictor_spark.streaming.manifest_maintenance import (
        update_manifest_bench,
        update_manifest_state,
    )

    update_manifest_bench(
        spark, docs.where(F.col("doc_id") < 5), base, batch_id=0
    )
    edges = [float("-inf"), *bounds, float("inf")]
    for i in range(len(edges) - 1):
        cond = lambda c: (c > F.lit(edges[i])) & (c <= F.lit(edges[i + 1]))
        update_manifest_state(
            spark,
            docs.where(cond(F.col("doc_id"))),
            vecs.where(cond(F.col("vec_id"))).select("vec_id", "v"),
            base,
            cents,
            batch_id=i + 1,
            budget=budget,
            decon_filter=F.col("doc_id") >= 5,
        )


def _manifest_rows(spark, base):
    from stock_trend_predictor_spark.streaming.manifest_maintenance import (
        read_curation_manifest,
    )

    return sorted(
        map(tuple, read_curation_manifest(spark, base).collect())
    )


def test_manifest_stream_equals_batch_and_split_invariance(
    spark, sf_dir, tmp_path
):
    """The composed verdict is identical across order-preserving
    batchings: the registry's tertile split, a halves split, and a
    single-batch fold — and the verdict CASE actually exercises
    multiple gates (the budget binds by construction)."""
    from stock_trend_predictor_spark.plans.registry import REGISTRY

    ref = sorted(
        map(
            tuple,
            REGISTRY["curation_manifest_incremental"]
            .fn(spark, sf_dir)
            .collect(),
        )
    )
    assert len(ref) == 500
    decisions = {r[-1] for r in ref}
    assert "keep" in decisions and "drop_over_budget" in decisions
    assert "drop_near_dup" in decisions

    docs, vecs, cents, budget, (lo, hi) = _manifest_fixture(
        spark, sf_dir
    )
    halves = str(tmp_path / "m-halves")
    _fold_manifest(spark, docs, vecs, cents, budget, halves, (lo,))
    assert _manifest_rows(spark, halves) == ref

    single = str(tmp_path / "m-single")
    _fold_manifest(spark, docs, vecs, cents, budget, single, ())
    assert _manifest_rows(spark, single) == ref


def test_manifest_prefix_parity_every_batch(spark, sf_dir, tmp_path):
    """After EVERY corpus batch, the incrementally folded manifest
    equals a fresh single-batch fold over the arrivals so far — the
    composition never needs the future."""
    docs, vecs, cents, budget, (lo, hi) = _manifest_fixture(
        spark, sf_dir
    )
    inc = str(tmp_path / "m-inc")
    from stock_trend_predictor_spark.streaming.manifest_maintenance import (
        update_manifest_bench,
        update_manifest_state,
    )

    update_manifest_bench(
        spark, docs.where(F.col("doc_id") < 5), inc, batch_id=0
    )
    edges = [float("-inf"), lo, hi, float("inf")]
    for i in range(3):
        cond = lambda c: (c > F.lit(edges[i])) & (c <= F.lit(edges[i + 1]))
        update_manifest_state(
            spark,
            docs.where(cond(F.col("doc_id"))),
            vecs.where(cond(F.col("vec_id"))).select("vec_id", "v"),
            inc,
            cents,
            batch_id=i + 1,
            budget=budget,
            decon_filter=F.col("doc_id") >= 5,
        )
        fresh = str(tmp_path / f"m-fresh-{i}")
        pre = F.col("doc_id") <= F.lit(edges[i + 1])
        vpre = F.col("vec_id") <= F.lit(edges[i + 1])
        update_manifest_bench(
            spark, docs.where(F.col("doc_id") < 5), fresh, batch_id=0
        )
        update_manifest_state(
            spark,
            docs.where(pre),
            vecs.where(vpre).select("vec_id", "v"),
            fresh,
            cents,
            batch_id=1,
            budget=budget,
            decon_filter=F.col("doc_id") >= 5,
        )
        assert _manifest_rows(spark, inc) == _manifest_rows(
            spark, fresh
        ), f"prefix parity broke after batch {i + 1}"


def test_manifest_replay_and_partial_crash(spark, sf_dir, tmp_path):
    """Replaying a folded batch is a no-op, and a PARTIAL-CRASH
    replay — one sub-fold committed ahead of the manifest — converges
    to the clean composition (the manifest-last low-water-mark
    discipline)."""
    from stock_trend_predictor_spark.operators import dedup as D
    from stock_trend_predictor_spark.streaming.manifest_maintenance import (
        update_manifest_state,
    )
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        update_neardup_state,
    )

    docs, vecs, cents, budget, (lo, hi) = _manifest_fixture(
        spark, sf_dir
    )
    clean = str(tmp_path / "m-clean")
    _fold_manifest(spark, docs, vecs, cents, budget, clean, (lo, hi))
    ref = _manifest_rows(spark, clean)

    crash = str(tmp_path / "m-crash")
    from stock_trend_predictor_spark.streaming.manifest_maintenance import (
        update_manifest_bench,
    )

    update_manifest_bench(
        spark, docs.where(F.col("doc_id") < 5), crash, batch_id=0
    )
    b1d = docs.where(F.col("doc_id") <= F.lit(lo))
    b1v = vecs.where(F.col("vec_id") <= F.lit(lo)).select("vec_id", "v")
    update_manifest_state(
        spark, b1d, b1v, crash, cents, batch_id=1, budget=budget,
        decon_filter=F.col("doc_id") >= 5,
    )
    # CRASH SIMULATION: batch 2's near-dup sub-commit lands, then the
    # process dies before the other folds / the manifest commit
    b2d = docs.where(
        (F.col("doc_id") > F.lit(lo)) & (F.col("doc_id") <= F.lit(hi))
    )
    b2v = vecs.where(
        (F.col("vec_id") > F.lit(lo)) & (F.col("vec_id") <= F.lit(hi))
    ).select("vec_id", "v")
    update_neardup_state(
        spark,
        D.with_shingle_hashes(b2d).select("doc_id", "hs"),
        os.path.join(crash, "nd"),
        batch_id=2,
    )
    # at-least-once re-delivery of batch 2: nd skips on its replay
    # guard, every other constituent + the manifest complete
    update_manifest_state(
        spark, b2d, b2v, crash, cents, batch_id=2, budget=budget,
        decon_filter=F.col("doc_id") >= 5,
    )
    b3d = docs.where(F.col("doc_id") > F.lit(hi))
    b3v = vecs.where(F.col("vec_id") > F.lit(hi)).select("vec_id", "v")
    update_manifest_state(
        spark, b3d, b3v, crash, cents, batch_id=3, budget=budget,
        decon_filter=F.col("doc_id") >= 5,
    )
    # plain replay of the final batch is a no-op too
    update_manifest_state(
        spark, b3d, b3v, crash, cents, batch_id=3, budget=budget,
        decon_filter=F.col("doc_id") >= 5,
    )
    assert _manifest_rows(spark, crash) == ref


def test_manifest_releases_checkpoint_blocks(spark, sf_dir, tmp_path):
    """The composed update leaves NO new persistent RDDs behind
    (every constituent + the composition's own eager frame release).
    Asserted as a set difference, not a count — fixture-owned frames
    can be GC-unpersisted mid-fold (see _persistent_ids)."""
    docs, vecs, cents, budget, (lo, hi) = _manifest_fixture(
        spark, sf_dir
    )
    base = str(tmp_path / "m-rel")
    before_ids = _persistent_ids(spark)
    _fold_manifest(spark, docs, vecs, cents, budget, base, (lo, hi))
    leaked = _persistent_ids(spark) - before_ids
    assert not leaked, f"manifest fold leaked RDD ids {leaked}"
