"""Round-8 laws: mega-cell-capped kNN candidates, pruned label-merge
reads, real re-bucketing, snapshot carry-forward, app_meta conflict
detection, and fold-format guards."""

import os

from pyspark.sql import functions as F


def _dir_bytes(p):
    total = 0
    for root, _, files in os.walk(p):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


# ---------------------------------------------------------------- #
# statestore: snapshot carry-forward + app_meta pin conflict        #
# ---------------------------------------------------------------- #


def test_commit_state_snapshot_carry_forward(spark, tmp_path):
    """An appends-only commit (tables={}) on a dir whose META lists
    snapshot tables must keep them readable (r7 verdict advice: it
    used to GC every prior v-* dir while writing no new one)."""
    from stock_trend_predictor_spark.operators.statestore import (
        commit_state,
        read_meta,
        read_state_table,
    )

    sdir = str(tmp_path / "st")
    snap = spark.createDataFrame([(7,)], "y long")
    assert commit_state(sdir, {"t": snap}, batch_id=0)
    assert commit_state(
        sdir,
        {},
        batch_id=1,
        appends={"a": spark.createDataFrame([(1,)], "x long")},
    )
    # the snapshot survives the appends-only commit
    assert [
        r.y for r in read_state_table(spark, sdir, "t").collect()
    ] == [7]
    # ... and further appends-only commits
    assert commit_state(
        sdir,
        {},
        batch_id=2,
        appends={"a": spark.createDataFrame([(2,)], "x long")},
    )
    assert [
        r.y for r in read_state_table(spark, sdir, "t").collect()
    ] == [7]
    assert sorted(
        r.x for r in read_state_table(spark, sdir, "a").collect()
    ) == [1, 2]
    # a LATER snapshot rewrite supersedes and the old dir is GC'd
    snap2 = spark.createDataFrame([(8,)], "y long")
    assert commit_state(sdir, {"t": snap2}, batch_id=3)
    assert [
        r.y for r in read_state_table(spark, sdir, "t").collect()
    ] == [8]
    meta = read_meta(sdir)
    vdirs = [d for d in os.listdir(sdir) if d.startswith("v-")]
    assert vdirs == [meta["table_dirs"]["t"]]


def test_commit_state_carry_forward_two_tables(spark, tmp_path):
    """Two snapshot tables last written by DIFFERENT versions both
    stay readable — per-table dirs, per-table GC exemption."""
    from stock_trend_predictor_spark.operators.statestore import (
        commit_state,
        read_state_table,
    )

    sdir = str(tmp_path / "st")
    assert commit_state(
        sdir, {"t1": spark.createDataFrame([(1,)], "x long")}, batch_id=0
    )
    assert commit_state(
        sdir, {"t2": spark.createDataFrame([(2,)], "x long")}, batch_id=1
    )
    assert commit_state(
        sdir,
        {},
        batch_id=2,
        appends={"a": spark.createDataFrame([(9,)], "x long")},
    )
    assert [
        r.x for r in read_state_table(spark, sdir, "t1").collect()
    ] == [1]
    assert [
        r.x for r in read_state_table(spark, sdir, "t2").collect()
    ] == [2]


def test_app_meta_conflict_raises(spark, tmp_path):
    """A commit re-requesting a pinned app_meta key with a DIFFERENT
    value fails loud (r7 advice: setdefault silently kept the old
    value); the same value is accepted."""
    import pytest

    from stock_trend_predictor_spark.operators.statestore import (
        commit_state,
    )

    sdir = str(tmp_path / "st")
    df = spark.createDataFrame([(1,)], "x long")
    assert commit_state(
        sdir, {}, batch_id=0, appends={"t": df}, app_meta={"p": 8}
    )
    # same value: fine
    assert commit_state(
        sdir, {}, batch_id=1, appends={"t": df}, app_meta={"p": 8}
    )
    with pytest.raises(ValueError, match="pinned"):
        commit_state(
            sdir, {}, batch_id=2, appends={"t": df}, app_meta={"p": 16}
        )


# ---------------------------------------------------------------- #
# neardup fold: format guard, re-bucketing, pruned label merge      #
# ---------------------------------------------------------------- #


def _mk_batch(b, docs_per_batch=30, dup_every=3):
    """Synthetic (doc_id, hs) batch — every dup_every-th doc shares
    its shingles with the same slot of every earlier batch (the
    test_round7 fixture shape: cross-batch pairs + component merges
    every batch)."""
    rows = []
    for j in range(docs_per_batch):
        doc_id = b * docs_per_batch + j
        if j % dup_every == 0:
            hs = [1000 + j * 17 + t for t in range(24)]
        else:
            hs = [doc_id * 100_000 + t * 7 for t in range(24)]
        rows.append((doc_id, hs))
    return rows


def _expected_clusters(spark, sdir, folded):
    """Union-find over every pair discovered so far."""
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        read_neardup_pairs,
    )

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
    return {d: find(d) for d in folded}


def test_fold_format_guard(spark, tmp_path):
    """A state dir written in a legacy layout is refused explicitly
    (r7 advice: pre-v3 folds crashed obscurely mid-batch instead)."""
    import pytest

    from stock_trend_predictor_spark.operators.statestore import (
        commit_state,
    )
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        rebucket_neardup_state,
        update_neardup_state,
    )

    batch = spark.createDataFrame(
        _mk_batch(0), "doc_id long, hs array<bigint>"
    )

    # pre-r7 fingerprint: neardup tables committed as SNAPSHOTS
    legacy1 = str(tmp_path / "legacy1")
    commit_state(
        legacy1,
        {
            "labels": spark.createDataFrame(
                [(1, 1)], "doc_id long, cluster long"
            )
        },
        batch_id=0,
    )
    with pytest.raises(RuntimeError, match="pre-v3"):
        update_neardup_state(spark, batch, legacy1, batch_id=1)

    # r7 fingerprint: append segments without a format stamp
    legacy2 = str(tmp_path / "legacy2")
    commit_state(
        legacy2,
        {},
        batch_id=0,
        appends={
            "bands": spark.createDataFrame(
                [(1, 0, "k", 3)],
                "doc_id long, band_id int, bkey string, bucket bigint",
            )
        },
        app_meta={"n_band_buckets": 64},
    )
    with pytest.raises(RuntimeError, match="pre-v3"):
        update_neardup_state(spark, batch, legacy2, batch_id=1)

    # an explicit older stamp names the version mismatch
    legacy3 = str(tmp_path / "legacy3")
    commit_state(
        legacy3,
        {},
        batch_id=0,
        appends={
            "pairs": spark.createDataFrame(
                [(0, 1, 2, 0.5)],
                "found_in_batch long, doc_a long, doc_b long,"
                " jaccard double",
            )
        },
        app_meta={"n_band_buckets": 64, "neardup_format": 2},
    )
    with pytest.raises(RuntimeError, match="fold format v2"):
        update_neardup_state(spark, batch, legacy3, batch_id=1)
    with pytest.raises(RuntimeError, match="fold format v2"):
        rebucket_neardup_state(spark, legacy3, 128)


def test_rebucket_identity_and_pin_swap(spark, tmp_path):
    """rebucket_neardup_state under a NEW P: the pin and every
    bucket-derived segment change in one atomic swap, the fold keeps
    running under the new P with PRUNED probes, and the final
    pairs/labels are identical to a never-re-bucketed fold (the r7
    verdict #4 done-criterion: post-re-bucket probes find the
    identical pair set)."""
    from stock_trend_predictor_spark.operators.statestore import (
        read_meta,
    )
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        read_neardup_clusters,
        read_neardup_pairs,
        rebucket_neardup_state,
        update_neardup_state,
    )

    ref_dir = str(tmp_path / "ref")
    reb_dir = str(tmp_path / "reb")
    batches = [
        spark.createDataFrame(_mk_batch(b), "doc_id long, hs array<bigint>")
        for b in range(4)
    ]
    # reference: P=8 throughout, always-pruned reads
    for b, batch in enumerate(batches):
        update_neardup_state(
            spark, batch, ref_dir, batch_id=b,
            n_band_buckets=8, prune_min_bytes=0,
        )
    # re-bucketed: P=8 for two batches, grow to 32 mid-fold
    for b, batch in enumerate(batches[:2]):
        update_neardup_state(
            spark, batch, reb_dir, batch_id=b,
            n_band_buckets=8, prune_min_bytes=0,
        )
    assert rebucket_neardup_state(spark, reb_dir, 32)
    meta = read_meta(reb_dir)
    assert meta["app"]["n_band_buckets"] == 32
    # every bucket-derived table now lives in ONE re-bucketed segment
    for t in ("bands", "shingles", "labels"):
        segs = meta["segments"][t]
        assert len(segs) == 1 and "/r-" in segs[0].replace(os.sep, "/")
    # bands segment is directory-partitioned under the new P
    seg = os.path.join(reb_dir, meta["segments"]["bands"][0])
    buckets = {
        int(d.split("=")[1])
        for d in os.listdir(seg)
        if d.startswith("bucket=")
    }
    assert buckets and max(buckets) >= 8  # new P really in effect
    for b, batch in enumerate(batches[2:], start=2):
        update_neardup_state(
            spark, batch, reb_dir, batch_id=b, prune_min_bytes=0
        )
    ref_pairs = sorted(map(tuple, read_neardup_pairs(spark, ref_dir).collect()))
    reb_pairs = sorted(map(tuple, read_neardup_pairs(spark, reb_dir).collect()))
    assert ref_pairs == reb_pairs and len(ref_pairs) > 0
    ref_lab = sorted(map(tuple, read_neardup_clusters(spark, ref_dir).collect()))
    reb_lab = sorted(map(tuple, read_neardup_clusters(spark, reb_dir).collect()))
    assert ref_lab == reb_lab


def test_label_merge_pruned_law(spark, tmp_path):
    """With pruning FORCED from the first byte (prune_min_bytes=0),
    the maintained labels still equal one-shot min-label connected
    components after EVERY batch — the dead-rep invariant that makes
    the cbucket-pruned losing-member scan exact, plus the
    dbucket-pruned endpoint lookup. Compaction into the two-level
    (dbucket, cbucket) layout preserves the read."""
    from stock_trend_predictor_spark.operators.statestore import (
        compact_append_table,
        read_meta,
    )
    from stock_trend_predictor_spark.streaming.neardup_maintenance import (
        read_neardup_clusters,
        update_neardup_state,
    )

    sdir = str(tmp_path / "nd")
    folded = set()
    for b in range(4):
        rows = _mk_batch(b)
        folded |= {d for d, _ in rows}
        update_neardup_state(
            spark,
            spark.createDataFrame(rows, "doc_id long, hs array<bigint>"),
            sdir,
            batch_id=b,
            n_band_buckets=8,
            prune_min_bytes=0,
        )
        got = {
            r.doc_id: r.cluster
            for r in read_neardup_clusters(spark, sdir).collect()
        }
        assert got == _expected_clusters(spark, sdir, folded), (
            f"divergence after batch {b}"
        )
    # OPTIMIZE labels into the nested two-level layout; read unchanged
    assert compact_append_table(
        spark, sdir, "labels", repartition_by=["dbucket", "cbucket"]
    )
    seg = os.path.join(
        sdir, read_meta(sdir)["segments"]["labels"][0]
    )
    dlevels = [d for d in os.listdir(seg) if d.startswith("dbucket=")]
    assert dlevels
    assert any(
        c.startswith("cbucket=")
        for c in os.listdir(os.path.join(seg, dlevels[0]))
    )
    got = {
        r.doc_id: r.cluster
        for r in read_neardup_clusters(spark, sdir).collect()
    }
    assert got == _expected_clusters(spark, sdir, folded)
    # ... and the fold continues correctly over the compacted layout
    rows = _mk_batch(4)
    folded |= {d for d, _ in rows}
    update_neardup_state(
        spark,
        spark.createDataFrame(rows, "doc_id long, hs array<bigint>"),
        sdir,
        batch_id=4,
        prune_min_bytes=0,
    )
    got = {
        r.doc_id: r.cluster
        for r in read_neardup_clusters(spark, sdir).collect()
    }
    assert got == _expected_clusters(spark, sdir, folded)


def test_label_merge_read_io_touched_buckets(spark, tmp_path, monkeypatch):
    """The MERGE-side read-IO law (r7 verdict #3 done-criterion): on a
    compacted, bucketed labels table, _merge_label_delta's two state
    reads carry partition filters whose admitted directory bytes are
    a strict subset of the table — touched-bucket reads, not
    O(corpus)."""
    from stock_trend_predictor_spark.operators.statestore import (
        compact_append_table,
        read_meta,
    )
    from stock_trend_predictor_spark.streaming import (
        neardup_maintenance as nm,
    )

    sdir = str(tmp_path / "nd")
    p = 16
    for b in range(4):
        nm.update_neardup_state(
            spark,
            spark.createDataFrame(
                _mk_batch(b, docs_per_batch=40),
                "doc_id long, hs array<bigint>",
            ),
            sdir,
            batch_id=b,
            n_band_buckets=p,
            prune_min_bytes=0,
        )
    for t in ("bands", "shingles"):
        compact_append_table(spark, sdir, t, repartition_by=["bucket"])
    compact_append_table(
        spark, sdir, "labels", repartition_by=["dbucket", "cbucket"]
    )

    label_filters = []
    real = nm.read_state_table

    def spy(spark_, sd, name, partition_filter=None):
        if name == "labels":
            label_filters.append(partition_filter)
        return real(spark_, sd, name, partition_filter=partition_filter)

    monkeypatch.setattr(nm, "read_state_table", spy)
    nm.update_neardup_state(
        spark,
        spark.createDataFrame(
            _mk_batch(4, docs_per_batch=40),
            "doc_id long, hs array<bigint>",
        ),
        sdir,
        batch_id=4,
        prune_min_bytes=0,
    )
    # both labels reads (endpoint lookup + losing-member scan) pruned
    assert len(label_filters) == 2, label_filters
    assert all(f is not None for f in label_filters), label_filters
    keys = {k for f in label_filters for k in f}
    assert keys == {"dbucket", "cbucket"}, label_filters
    # admitted bytes are a strict subset of the compacted table
    meta = read_meta(sdir)
    compacted = next(
        s for s in meta["segments"]["labels"] if "/c-" in s.replace(os.sep, "/")
    )
    seg = os.path.join(sdir, compacted)
    total = _dir_bytes(seg)
    for f in label_filters:
        (col, vals), = f.items()
        if col == "dbucket":
            admitted = sum(
                _dir_bytes(os.path.join(seg, f"dbucket={v}")) for v in vals
            )
        else:
            admitted = sum(
                _dir_bytes(os.path.join(seg, d, f"cbucket={v}"))
                for d in os.listdir(seg)
                if d.startswith("dbucket=")
                for v in vals
            )
        assert 0 < admitted < total, (f, admitted, total)


# ---------------------------------------------------------------- #
# knn graph: mega-cell cap identity                                 #
# ---------------------------------------------------------------- #


def test_cell_knn_pairs_cap_identity(spark):
    """cell_knn_pairs emits the IDENTICAL scored ordered-pair set at
    any cap — on a synthetic corpus with one mega cell (one cid
    holding most vectors, the viral-duplicate shape) alongside
    ordinary cells — and the split genuinely engages."""
    from stock_trend_predictor_spark.operators.ivf import cell_knn_pairs
    from stock_trend_predictor_spark.operators.similarity import l2norm

    rows = []
    # mega cell 0: 120 vectors; ordinary cells 1..4: 12 each
    for i in range(120):
        rows.append((i, [float(i % 7 + 1), float(i % 11 + 1)], 0))
    for c in range(1, 5):
        for i in range(12):
            vid = 1000 * c + i
            rows.append((vid, [float(c), float(i + 1)], c))
    df = (
        spark.createDataFrame(
            rows, "vec_id long, v array<double>, cid int"
        )
        .withColumn("nrm", l2norm(F.col("v")))
    )
    plain = sorted(
        map(tuple, cell_knn_pairs(df, cell_cap=10**9).collect())
    )
    capped = sorted(map(tuple, cell_knn_pairs(df, cell_cap=40).collect()))
    assert capped == plain
    # the mega cell really fanned out: 120*119 ordered pairs + the
    # small cells' 4 * 12*11
    assert len(plain) == 120 * 119 + 4 * 12 * 11


def test_knn_graph_ivf_unchanged_by_cap(spark, sf_dir):
    """The registry query's full output is bit-identical under a cap
    tiny enough to split EVERY cell — the cap is plan-invisible to
    consumers (so the DuckDB oracle needs no regime gate for it)."""
    import os as _os

    from stock_trend_predictor_spark.plans.registry import REGISTRY

    base = sorted(
        map(tuple, REGISTRY["knn_graph_ivf"].fn(spark, sf_dir).collect())
    )
    _os.environ["KNN_GRAPH_CELL_CAP"] = "7"
    try:
        capped = sorted(
            map(
                tuple,
                REGISTRY["knn_graph_ivf"].fn(spark, sf_dir).collect(),
            )
        )
    finally:
        del _os.environ["KNN_GRAPH_CELL_CAP"]
    assert capped == base and len(base) > 0
