"""Round-7 laws: bucketed/pruned state-store segments, label-revision
latest-wins reads, per-commit write-IO batch-boundedness, mega-bucket
probe identity, and append-segment compaction."""

import os

from pyspark.sql import functions as F


def _dir_bytes(p):
    total = 0
    for root, _, files in os.walk(p):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def test_statestore_partitioned_appends_prune(spark, tmp_path):
    """append_partition_by writes hash-bucket directories; a
    partition_filter read prunes to those directories AT PLANNING
    TIME (PartitionFilters in the scan), unions all committed
    segments, and an empty value set reads nothing."""
    from stock_trend_predictor_spark.operators.statestore import (
        commit_state,
        read_state_table,
    )

    sdir = str(tmp_path / "st")
    b0 = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 0)], "x long, bucket int"
    )
    b1 = spark.createDataFrame([(4, 1), (5, 2)], "x long, bucket int")
    assert commit_state(
        sdir, {}, batch_id=0, appends={"t": b0},
        append_partition_by={"t": ["bucket"]},
    )
    assert commit_state(
        sdir, {}, batch_id=1, appends={"t": b1},
        append_partition_by={"t": ["bucket"]},
    )
    # bucket dirs exist on disk
    seg0 = os.path.join(sdir, "seg-t", "b-0000000000")
    assert os.path.isdir(os.path.join(seg0, "bucket=0"))
    assert os.path.isdir(os.path.join(seg0, "bucket=1"))

    full = read_state_table(spark, sdir, "t")
    assert sorted(r.x for r in full.collect()) == [1, 2, 3, 4, 5]

    pruned = read_state_table(
        spark, sdir, "t", partition_filter={"bucket": [1]}
    )
    assert sorted(r.x for r in pruned.collect()) == [2, 4]
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert (
        "bucket"
        in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    )

    empty = read_state_table(
        spark, sdir, "t", partition_filter={"bucket": []}
    )
    assert empty.count() == 0

    # MIXED layouts (the LSM write path): a plain hot delta joins the
    # bucketed history; partition_filter stays correct across the mix
    # (row filter on the delta, dir pruning on the bucketed segments)
    b2 = spark.createDataFrame([(6, 1), (7, 0)], "x long, bucket int")
    assert commit_state(sdir, {}, batch_id=2, appends={"t": b2})
    mixed = read_state_table(
        spark, sdir, "t", partition_filter={"bucket": [1]}
    )
    assert sorted(r.x for r in mixed.collect()) == [2, 4, 6]
    assert sorted(
        r.x for r in read_state_table(spark, sdir, "t").collect()
    ) == [1, 2, 3, 4, 5, 6, 7]


def test_statestore_compaction_identity_and_crash(spark, tmp_path):
    """compact_append_table: reads identical before/after (row
    multiset + bucket layout preserved), META swaps to ONE segment,
    superseded segment dirs are GC'd, and a crash BETWEEN the
    compacted write and the META swap is invisible."""
    from stock_trend_predictor_spark.operators.statestore import (
        commit_state,
        compact_append_table,
        read_meta,
        read_state_table,
    )

    sdir = str(tmp_path / "st")
    for i in range(4):
        b = spark.createDataFrame(
            [(10 * i + j, j % 3) for j in range(5)], "x long, bucket int"
        )
        commit_state(
            sdir, {}, batch_id=i, appends={"t": b},
            append_partition_by={"t": ["bucket"]},
        )
    before = sorted(
        map(tuple, read_state_table(spark, sdir, "t").collect())
    )
    assert len(read_meta(sdir)["segments"]["t"]) == 4

    # crash sim: a fully-written compact dir that META never saw
    orphan = os.path.join(sdir, "seg-t", "c-0000000099")
    spark.createDataFrame([(999, 0)], "x long, bucket int").write.partitionBy(
        "bucket"
    ).parquet(orphan)
    assert (
        sorted(map(tuple, read_state_table(spark, sdir, "t").collect()))
        == before
    )

    assert compact_append_table(spark, sdir, "t")
    meta = read_meta(sdir)
    assert len(meta["segments"]["t"]) == 1
    assert meta["partitioned"]["t"] == ["bucket"]
    after = sorted(
        map(tuple, read_state_table(spark, sdir, "t").collect())
    )
    assert after == before
    # superseded batch segments GC'd; compacted dir partitioned
    live = os.listdir(os.path.join(sdir, "seg-t"))
    assert not any(n.startswith("b-") for n in live)
    cseg = os.path.join(sdir, meta["segments"]["t"][0])
    assert os.path.isdir(os.path.join(cseg, "bucket=0"))
    # pruned reads still work post-compaction
    pr = read_state_table(
        spark, sdir, "t", partition_filter={"bucket": [2]}
    )
    assert sorted(r.x for r in pr.collect()) == sorted(
        x for x, b in before if b == 2
    )
    # nothing to do on a single-segment table...
    assert not compact_append_table(spark, sdir, "t")
    # ...unless a re-layout is requested (the plain-delta -> bucketed
    # conversion probe_bench and the periodic fold compaction use)
    assert compact_append_table(
        spark, sdir, "t", repartition_by=["bucket"]
    )
    assert (
        sorted(map(tuple, read_state_table(spark, sdir, "t").collect()))
        == before
    )


def test_probe_candidates_megabucket_identity(spark):
    """The capped (salted-cell) probe emits EXACTLY the plain
    equi-join's candidate pair set on a synthetic mega-bucket: one
    band key shared by 400 index docs + 3 batch docs, alongside
    normal buckets (verdict r6 item 4 — the new-vs-index adaptation
    of the triangle-cell lever, law-proven)."""
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        _probe_candidates,
    )

    idx_rows = [(i, 0, "MEGA") for i in range(400)] + [
        (500 + i, 1, f"k{i % 7}") for i in range(40)
    ]
    new_rows = [(1000, 0, "MEGA"), (1001, 0, "MEGA"), (3, 0, "MEGA")] + [
        (1002, 1, "k3"),
        (1003, 2, "lonely"),
    ]
    schema = "doc_id long, band_id int, bkey string"
    idx = spark.createDataFrame(idx_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    all_bands = idx.unionByName(new)
    plain = sorted(
        map(tuple, _probe_candidates(new, all_bands, None).collect())
    )
    capped = sorted(
        map(tuple, _probe_candidates(new, all_bands, 50).collect())
    )
    assert capped == plain
    assert len(plain) > 400  # the mega-bucket genuinely fanned out
    # and the cell split genuinely engaged: ceil(403/50) = 9 cells
    cells = (
        all_bands.groupBy("band_id", "bkey")
        .count()
        .where(F.col("count") > 50)
        .count()
    )
    assert cells == 1


def _mk_batch(b, docs_per_batch=30, dup_every=3):
    """Synthetic (doc_id, hs) batch: every dup_every-th doc shares its
    shingle array with the SAME slot of every earlier batch, so each
    batch discovers cross-batch pairs and merges components."""
    rows = []
    for j in range(docs_per_batch):
        doc_id = b * docs_per_batch + j
        if j % dup_every == 0:
            hs = [1000 + j * 17 + t for t in range(24)]  # shared text
        else:
            hs = [doc_id * 100_000 + t * 7 for t in range(24)]
        rows.append((doc_id, hs))
    return rows


def test_neardup_commit_write_io_batch_bounded(spark, tmp_path):
    """Verdict r6 item 3 — the trap-the-class law: per-commit WRITE
    bytes for the near-dup fold must be batch-bounded for equal-sized
    batches, NOT grow with the accumulated corpus. (The r6 labels
    snapshot rewrite fails this; the r7 revision segments pass.)
    Written bytes per commit = newly referenced segment dirs + the
    fresh snapshot version dir."""
    from stock_trend_predictor_spark.operators.statestore import (
        read_meta,
    )
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        update_neardup_state,
    )

    sdir = str(tmp_path / "nd")
    per_commit = []
    for b in range(6):
        batch = spark.createDataFrame(
            _mk_batch(b), "doc_id long, hs array<bigint>"
        )
        before = read_meta(sdir)
        update_neardup_state(spark, batch, sdir, batch_id=b)
        after = read_meta(sdir)
        bseg = before.get("segments", {}) if before else {}
        written = _dir_bytes(os.path.join(sdir, after["dir"]))
        for t, segs in after["segments"].items():
            for s in segs:
                if s not in bseg.get(t, []):
                    written += _dir_bytes(os.path.join(sdir, s))
        per_commit.append(written)
    # corpus grew 6x across the fold; per-commit write IO must not:
    # every later commit stays within 2x of the FIRST (identical
    # batch sizes; parquet overhead dominates variation)
    assert max(per_commit[1:]) < 2.0 * per_commit[0], per_commit


def test_neardup_latest_wins_labels_law(spark, tmp_path):
    """AFTER EVERY BATCH the latest-wins revision read equals one-shot
    min-label connected components over all pairs discovered so far
    (the r6 snapshot semantics, now derived from append-only revision
    rows) — and a label compaction preserves it."""
    from stock_trend_predictor_spark.operators.statestore import (
        compact_append_table,
    )
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        read_neardup_clusters,
        read_neardup_pairs,
        update_neardup_state,
    )

    sdir = str(tmp_path / "nd")
    folded = set()
    for b in range(4):
        batch_rows = _mk_batch(b)
        folded |= {d for d, _ in batch_rows}
        update_neardup_state(
            spark,
            spark.createDataFrame(
                batch_rows, "doc_id long, hs array<bigint>"
            ),
            sdir,
            batch_id=b,
        )
        # expected: union-find over every pair discovered so far
        parent = {d: d for d in folded}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in read_neardup_pairs(spark, sdir).collect():
            ra, rb = find(r.doc_a), find(r.doc_b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        expected = {d: find(d) for d in folded}
        got = {
            r.doc_id: r.cluster
            for r in read_neardup_clusters(spark, sdir).collect()
        }
        assert got == expected, f"divergence after batch {b}"
    # OPTIMIZE the revision log; the read must not change
    assert compact_append_table(spark, sdir, "labels")
    got = {
        r.doc_id: r.cluster
        for r in read_neardup_clusters(spark, sdir).collect()
    }
    assert got == expected


def test_two_level_multiprobe_degenerate_identity(spark, sf_dir):
    """n_groups=1 scans every member centroid, so the two-level
    multiprobe must emit EXACTLY the flat multiprobe's (vec_id, cid)
    set — same tie rule (dist, then cid), same nprobe slice."""
    from stock_trend_predictor_spark.operators.ivf import (
        assign_clusters_multiprobe,
        assign_clusters_two_level_multiprobe,
        kmeans_centroids,
    )
    from stock_trend_predictor_spark.operators.similarity import (
        as_double,
    )
    from stock_trend_predictor_spark.sources.tables import load_table

    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double("embedding").alias("v"))
        .limit(200)
        .localCheckpoint(eager=True)
    )
    cents = kmeans_centroids(e, k=12, iters=2)
    flat = sorted(
        (r.vec_id, r.cid)
        for r in assign_clusters_multiprobe(e, cents, nprobe=3).collect()
    )
    two = sorted(
        (r.vec_id, r.cid)
        for r in assign_clusters_two_level_multiprobe(
            e, cents, nprobe=3, n_groups=1
        ).collect()
    )
    assert two == flat
    # and the probed (approximate) form still covers every vector
    # with exactly nprobe cells
    approx = assign_clusters_two_level_multiprobe(
        e, cents, nprobe=3, n_groups=4, gprobe=2
    )
    per_vec = approx.groupBy("vec_id").count().collect()
    assert len(per_vec) == e.count()
    # at most nprobe cells; fewer only when the probed groups hold
    # fewer than nprobe member centroids (legit blocking behavior)
    assert all(1 <= r["count"] <= 3 for r in per_vec)


def test_semdedup_keeper_laws_under_two_level_blocking(
    spark, sf_dir, monkeypatch
):
    """Force the two-level blocking path (threshold 1) and assert the
    keeper laws stay structural: exactly one keeper per cluster and
    it is the min member, every cluster id equals its min member,
    singletons kept, drop count == sum(cluster_size - 1)."""
    from stock_trend_predictor_spark.plans.registry import REGISTRY

    monkeypatch.setenv("SEMDEDUP_TWO_LEVEL_MIN_K", "1")
    out = REGISTRY["semdedup_keep_decision"].fn(spark, sf_dir).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, []).append(r)
    drops = 0
    for cl, rows in by_cluster.items():
        assert cl == min(x.vec_id for x in rows)
        keepers = [x for x in rows if x.keep]
        assert len(keepers) == 1 and keepers[0].vec_id == cl
        assert all(x.cluster_size == len(rows) for x in rows)
        drops += len(rows) - 1
    assert drops == sum(
        len(rows) - 1 for rows in by_cluster.values()
    )
    assert all(
        len(rows) == 1 and rows[0].keep
        for cl, rows in by_cluster.items()
        if len(rows) == 1
    )


def test_neardup_fold_with_periodic_compaction(spark, tmp_path):
    """compact_every folds: a fold that OPTIMIZEs its append tables
    every 2nd batch emits exactly the pairs and labels of the
    uncompacted fold (compaction is invisible to the protocol)."""
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        read_neardup_clusters,
        read_neardup_pairs,
        update_neardup_state,
    )

    dirs = {"plain": None, "compacted": 2}
    out = {}
    for label, ce in dirs.items():
        sdir = str(tmp_path / label)
        for b in range(4):
            update_neardup_state(
                spark,
                spark.createDataFrame(
                    _mk_batch(b), "doc_id long, hs array<bigint>"
                ),
                sdir,
                batch_id=b,
                compact_every=ce,
            )
        out[label] = (
            sorted(
                map(tuple, read_neardup_pairs(spark, sdir).collect())
            ),
            sorted(
                map(
                    tuple,
                    read_neardup_clusters(spark, sdir).collect(),
                )
            ),
        )
    assert out["plain"] == out["compacted"]


def test_source_temperature_mix_laws(spark, sf_dir):
    """alpha=0.5 flattening: every below-average-size source is
    UPSAMPLED (p_temp > p_raw) and every above-average source
    downsampled; probabilities sum to ~1; allocations never exceed
    the total token budget."""
    from stock_trend_predictor_spark.plans.registry import REGISTRY

    rows = REGISTRY["source_temperature_mix"].fn(spark, sf_dir).collect()
    tot = sum(r.tokens for r in rows)
    mean = tot / len(rows)
    for r in rows:
        if r.tokens < mean * 0.8:
            assert r.p_temp > r.p_raw, (r.source, r.p_temp, r.p_raw)
        if r.tokens > mean * 1.25:
            assert r.p_temp < r.p_raw, (r.source, r.p_temp, r.p_raw)
    assert abs(sum(r.p_temp for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.p_raw for r in rows) - 1.0) < 1e-4
    assert sum(r.alloc_tokens for r in rows) <= tot


def test_dsir_retarget_laws(spark, tmp_path):
    """(1) retargeting to the SAME slice the fold maintained returns
    bit-identical weights to read_dsir_weights (shared scorer); (2) a
    retarget with ZERO flagged docs pins the finite pure-Laplace
    weights (the pre-target edge, by construction)."""
    import math

    from pyspark.sql import functions as F

    from stock_trend_predictor_spark.streaming.dsir_maintenance import (
        read_dsir_weights,
        retarget_dsir_weights,
        update_dsir_state,
    )

    docs = spark.createDataFrame(
        [
            (1, "en", "a b c d"),
            (2, "de", "b c d e"),
            (3, "en", "x y z"),
            (4, "fr", "a b x"),
        ],
        "doc_id long, lang string, text string",
    )
    sdir = str(tmp_path / "state")
    update_dsir_state(spark, docs, sdir, batch_id=0)  # en target

    stored = {
        r.doc_id: r for r in read_dsir_weights(spark, sdir).collect()
    }
    same = {
        r.doc_id: r
        for r in retarget_dsir_weights(
            spark,
            sdir,
            docs.select(
                "doc_id", (F.col("lang") == "en").alias("__is_target")
            ),
        ).collect()
    }
    assert set(same) == set(stored)
    for d in stored:
        assert same[d]["__s"] == stored[d]["__s"]  # bit-equal
        assert same[d].n_feats == stored[d].n_feats

    zero = retarget_dsir_weights(
        spark,
        sdir,
        docs.select("doc_id", F.lit(False).alias("__is_target")),
    ).collect()
    assert len(zero) == 4
    for r in zero:
        assert r["__s"] is not None and math.isfinite(r["__s"])
        assert r["__s"] < 0


def test_knn_graph_ivf_recall_floor(spark, sf_dir):
    """The cell-blocked kNN graph's recall@5 against the exact
    brute-force graph (the blocking dial's quality). Measured 0.958
    at sf0.001 / 0.950 at sf0.01; floor pinned at 0.85 — a blocking
    regression (bad quantizer, broken multiprobe) trips this long
    before the oracle (which replays the blocking) would notice."""
    from pyspark.sql import Window

    from stock_trend_predictor_spark.operators.similarity import (
        as_double,
        dot,
        l2norm,
    )
    from stock_trend_predictor_spark.plans.registry import REGISTRY
    from stock_trend_predictor_spark.sources.tables import load_table

    got = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["knn_graph_ivf"].fn(spark, sf_dir).collect()
    }
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double("embedding").alias("v"))
        .withColumn("nrm", l2norm(F.col("v")))
    )
    a, b = e.alias("a"), e.alias("b")
    sim = dot(F.col("a.v"), F.col("b.v")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            sim.alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .collect()
    }
    assert len(got & exact) / len(exact) >= 0.85


def test_neardup_fold_empty_batch(spark, tmp_path):
    """An EMPTY micro-batch (routine under availableNow triggers) must
    fold cleanly: no pairs, no label changes, batch id advances (so a
    replay of it is skipped), and the next real batch behaves as if
    the empty one never happened."""
    from stock_trend_predictor_spark.operators.statestore import (
        read_meta,
    )
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        read_neardup_clusters,
        read_neardup_pairs,
        update_neardup_state,
    )

    sdir = str(tmp_path / "nd")
    update_neardup_state(
        spark,
        spark.createDataFrame(_mk_batch(0), "doc_id long, hs array<bigint>"),
        sdir,
        batch_id=0,
    )
    before_pairs = sorted(
        map(tuple, read_neardup_pairs(spark, sdir).collect())
    )
    before_labels = sorted(
        map(tuple, read_neardup_clusters(spark, sdir).collect())
    )
    empty = spark.createDataFrame([], "doc_id long, hs array<bigint>")
    # force the pruned-read path too: the empty bucket set must read
    # nothing rather than error
    update_neardup_state(
        spark, empty, sdir, batch_id=1, prune_min_bytes=0
    )
    assert read_meta(sdir)["last_batch_id"] == 1
    assert (
        sorted(map(tuple, read_neardup_pairs(spark, sdir).collect()))
        == before_pairs
    )
    assert (
        sorted(map(tuple, read_neardup_clusters(spark, sdir).collect()))
        == before_labels
    )
    # the next real batch still discovers its cross-batch dups
    update_neardup_state(
        spark,
        spark.createDataFrame(_mk_batch(1), "doc_id long, hs array<bigint>"),
        sdir,
        batch_id=2,
    )
    after = read_neardup_pairs(spark, sdir)
    assert after.where(F.col("found_in_batch") == 2).count() > 0


def test_decon_fold_laws(spark, tmp_path):
    """(1) docs folded with NO bench yet -> empty report; (2) a bench
    suite folded AFTER the docs retro-screens them from stored
    profiles; (3) folding a SECOND suite only grows the report
    (monotone in the bench set) and matches a one-shot over the
    union; (4) replayed batch ids are no-ops."""
    from stock_trend_predictor_spark.streaming.decon_maintenance import (
        read_contamination,
        update_decon_bench,
        update_decon_docs,
    )

    docs = spark.createDataFrame(
        [
            (10, "a b c d e f"),
            (11, "c d e x y z"),
            (12, "p q r s t u"),
        ],
        "doc_id long, text string",
    )
    suite_a = spark.createDataFrame(
        [(0, "a b c d")], "doc_id long, text string"
    )  # grams: 'a b c', 'b c d' -> hits doc 10
    suite_b = spark.createDataFrame(
        [(1, "x y z w")], "doc_id long, text string"
    )  # hits doc 11
    sdir = str(tmp_path / "decon")
    update_decon_docs(spark, docs, sdir, batch_id=0)
    assert read_contamination(spark, sdir).count() == 0  # no bench yet

    update_decon_bench(spark, suite_a, sdir, batch_id=1)
    rep_a = {
        r.doc_id: r.n_contaminated
        for r in read_contamination(spark, sdir).collect()
    }
    assert 10 in rep_a and 12 not in rep_a

    update_decon_bench(spark, suite_b, sdir, batch_id=2)
    rep_ab = {
        r.doc_id: r.n_contaminated
        for r in read_contamination(spark, sdir).collect()
    }
    assert 11 in rep_ab  # retro-screened against the NEW suite
    for d, n in rep_a.items():
        assert rep_ab[d] >= n  # monotone in the bench set

    # replay: same batch id, different content -> no state change
    update_decon_bench(
        spark,
        spark.createDataFrame([(2, "p q r s")], "doc_id long, text string"),
        sdir,
        batch_id=2,
    )
    rep_replay = {
        r.doc_id: r.n_contaminated
        for r in read_contamination(spark, sdir).collect()
    }
    assert rep_replay == rep_ab
