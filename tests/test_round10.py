"""Round-10 laws: the state store's enforced single-writer contract
(a concurrent commit must REFUSE, not silently lose a writer — r9
verdict #2), the manifest composition's maintenance surface (composed
rebucket behind a crash-fencing intent marker — r9 verdict #3), and
the budget order precondition as a raised error instead of a
docstring (r9 verdict: a monotone doc_id watermark in META's
``progress`` entry)."""

import json
import os
import subprocess
import threading
import time

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- #
# statestore: enforced single-writer contract                       #
# ---------------------------------------------------------------- #


def _rows(spark, sdir, name):
    from stock_trend_predictor_spark.operators.statestore import (
        read_state_table,
    )

    return sorted(map(tuple, read_state_table(spark, sdir, name).collect()))


def test_concurrent_commit_exactly_one_survives(
    spark, tmp_path, monkeypatch
):
    """Two writers on one state dir: the one that arrives while the
    lease is held RAISES before writing anything; exactly the other
    commit survives, and META references no segment from the loser.
    The winner is held mid-commit deterministically (its segment
    write blocks on a file flag), so the race is forced, not
    timing-dependent."""
    from stock_trend_predictor_spark.operators import statestore as S

    sdir = str(tmp_path / "race")
    flag = str(tmp_path / "go")
    df_a = spark.range(5).select(F.col("id").alias("k"))
    df_b = spark.range(100, 103).select(F.col("id").alias("k"))

    real_write = S._write_segment

    def held_write(df, path, pcols, fpt):
        deadline = time.time() + 60
        while not os.path.exists(flag):
            assert time.time() < deadline, "flag never raised"
            time.sleep(0.02)
        real_write(df, path, pcols, fpt)

    monkeypatch.setattr(S, "_write_segment", held_write)
    errs: list = []

    def writer_a():
        try:
            S.commit_state(sdir, {}, batch_id=0, appends={"t": df_a})
        except Exception as exc:  # pragma: no cover - surfaced below
            errs.append(exc)

    a = threading.Thread(target=writer_a)
    a.start()
    deadline = time.time() + 60
    while not os.path.exists(os.path.join(sdir, "WRITER.lock")):
        assert time.time() < deadline, "writer A never took the lease"
        time.sleep(0.02)
    # writer B arrives mid-commit: refused before any write
    with pytest.raises(S.ConcurrentWriterError):
        S.commit_state(sdir, {}, batch_id=1, appends={"t": df_b})
    open(flag, "w").close()
    a.join(timeout=120)
    assert not a.is_alive() and errs == []
    meta = S.read_meta(sdir)
    assert meta["version"] == 0 and meta["last_batch_id"] == 0
    assert _rows(spark, sdir, "t") == [(i,) for i in range(5)]
    # no orphaned-but-reachable segment: META lists exactly one, and
    # the loser wrote no segment dir at all
    assert meta["segments"]["t"] == ["seg-t/b-0000000000"]
    assert sorted(os.listdir(os.path.join(sdir, "seg-t"))) == [
        "b-0000000000"
    ]
    # and the lease is released: a later commit succeeds
    assert S.commit_state(sdir, {}, batch_id=1, appends={"t": df_b})


def test_crashed_writer_lease_is_stolen(spark, tmp_path):
    """A lease left by a DEAD pid (crashed writer) must not wedge the
    dir: the next writer steals it and commits."""
    from stock_trend_predictor_spark.operators import statestore as S

    sdir = str(tmp_path / "crashed")
    os.makedirs(sdir)
    p = subprocess.Popen(["true"])
    p.wait()
    with open(os.path.join(sdir, "WRITER.lock"), "w") as fh:
        json.dump({"pid": p.pid}, fh)
    df = spark.range(3).select(F.col("id").alias("k"))
    assert S.commit_state(sdir, {"t": df}, batch_id=0)
    assert S.read_meta(sdir)["last_batch_id"] == 0
    assert not os.path.exists(os.path.join(sdir, "WRITER.lock"))


def test_live_lease_refuses_rebucket_and_compact(spark, tmp_path):
    """rebucket/compact swap META too — the same contract guards
    them. With a live lease held, both raise; after release, both
    work and reads are row-identical."""
    from stock_trend_predictor_spark.operators import statestore as S

    sdir = str(tmp_path / "guard")
    df = spark.range(20).select(
        F.col("id").alias("k"), F.pmod("id", F.lit(4)).alias("bucket")
    )
    S.commit_state(sdir, {}, batch_id=0, appends={"t": df})
    S.commit_state(sdir, {}, batch_id=1, appends={"t": df})
    ref = _rows(spark, sdir, "t")
    lock = S._acquire_writer_lease(sdir)
    try:
        with pytest.raises(S.ConcurrentWriterError):
            S.compact_append_table(spark, sdir, "t")
        with pytest.raises(S.ConcurrentWriterError):
            S.rebucket_append_table(
                spark,
                sdir,
                recompute={
                    "t": lambda d: d.withColumn(
                        "bucket", F.pmod("k", F.lit(8))
                    )
                },
                partition_by={"t": ["bucket"]},
                app_updates={"p": 8},
            )
    finally:
        S._release_writer_lease(lock)
    assert S.compact_append_table(spark, sdir, "t")
    assert _rows(spark, sdir, "t") == ref


def test_progress_meta_last_write_wins_and_survives(spark, tmp_path):
    """``progress`` is the non-pinned watermark channel: later
    commits overwrite it (unlike ``app``), and compaction preserves
    it."""
    from stock_trend_predictor_spark.operators import statestore as S

    sdir = str(tmp_path / "prog")
    df = spark.range(4).select(F.col("id").alias("k"))
    S.commit_state(
        sdir, {}, batch_id=0, appends={"t": df},
        progress_meta={"max_doc_id": 3},
    )
    S.commit_state(
        sdir, {}, batch_id=1, appends={"t": df},
        progress_meta={"max_doc_id": 9},
    )
    assert S.read_meta(sdir)["progress"] == {"max_doc_id": 9}
    S.compact_append_table(spark, sdir, "t")
    assert S.read_meta(sdir)["progress"] == {"max_doc_id": 9}


# ---------------------------------------------------------------- #
# zipf tail vocabulary (probe evidence generator)                   #
# ---------------------------------------------------------------- #


def test_zipf_tail_token_geometric_df_law(spark):
    """df(zt_j) ~ N * 2**-(j+1): the generator-native vocabulary tail
    probe_bench's BM25 selective row relies on — some level's df sits
    in [top_k, 4*top_k) at any corpus size, so a natural rare term
    always exists (the raw synthetic vocabulary's df floor is ~3% of
    the corpus)."""
    from stock_trend_predictor_spark.functions.text import (
        zipf_tail_token,
    )

    n = 1 << 15
    counts = {
        r.zt: r.c
        for r in spark.range(n)
        .select(zipf_tail_token(F.col("id")).alias("zt"))
        .groupBy("zt")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for j in range(8):
        expect = n * 2 ** -(j + 1)
        sd = expect**0.5
        assert abs(counts[f"zt{j}"] - expect) < 6 * sd + 1, (
            j,
            counts[f"zt{j}"],
            expect,
        )
    # a token with df in [20, 80) exists — the selective-query regime
    assert any(20 <= c < 80 for c in counts.values())
    # deterministic (pure function of the id): a re-derivation agrees
    again = {
        r.zt: r.c
        for r in spark.range(n)
        .select(zipf_tail_token(F.col("id")).alias("zt"))
        .groupBy("zt")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert again == counts


# ---------------------------------------------------------------- #
# manifest composition: order guard + composed rebucket             #
# ---------------------------------------------------------------- #


def _mini_manifest(spark, sf_dir, n=150):
    """A small composition fixture — enough corpus to exercise every
    constituent without the registry query's full kmeans build."""
    from stock_trend_predictor_spark.operators.similarity import (
        as_double,
    )
    from stock_trend_predictor_spark.sources.tables import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < n)
        .select("doc_id", "text", "source")
    )
    vecs = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < n)
        .select("vec_id", as_double("embedding").alias("v"))
    )
    cents = [r.v for r in vecs.orderBy("vec_id").limit(6).collect()]
    budget = docs.agg(
        F.expr(
            "CAST(SUM(size(split(text, ' '))) AS BIGINT)"
            " DIV (COUNT(DISTINCT source) * 2)"
        )
    ).first()[0]
    return docs, vecs, cents, int(budget)


def _fold_mini(spark, docs, vecs, cents, budget, base, edges, **kw):
    from stock_trend_predictor_spark.streaming.manifest_maintenance import (
        update_manifest_bench,
        update_manifest_state,
    )

    update_manifest_bench(
        spark, docs.where(F.col("doc_id") < 3), base, batch_id=0
    )
    bounds = [float("-inf"), *edges, float("inf")]
    for i in range(len(bounds) - 1):
        cond = lambda c: (c > F.lit(bounds[i])) & (c <= F.lit(bounds[i + 1]))
        update_manifest_state(
            spark,
            docs.where(cond(F.col("doc_id"))),
            vecs.where(cond(F.col("vec_id"))),
            base,
            cents,
            batch_id=i + 1,
            budget=budget,
            decon_filter=F.col("doc_id") >= 3,
            **kw,
        )


def _manifest_rows(spark, base):
    from stock_trend_predictor_spark.streaming.manifest_maintenance import (
        read_curation_manifest,
    )

    return sorted(
        map(tuple, read_curation_manifest(spark, base).collect())
    )


def test_manifest_refuses_out_of_order_batch(spark, sf_dir, tmp_path):
    """A batch whose min doc_id does not exceed the committed
    watermark raises BEFORE any constituent commit — zero partial
    state (the budget constituent's precondition, enforced)."""
    from stock_trend_predictor_spark.operators.statestore import (
        read_meta,
    )
    from stock_trend_predictor_spark.streaming.manifest_maintenance import (
        update_manifest_state,
    )

    docs, vecs, cents, budget = _mini_manifest(spark, sf_dir)
    base = str(tmp_path / "m-order")
    _fold_mini(spark, docs, vecs, cents, budget, base, (99.5,))
    ref = _manifest_rows(spark, base)
    nd_before = read_meta(os.path.join(base, "nd"))["version"]
    expected_max = docs.agg(F.max("doc_id")).first()[0]
    assert read_meta(base)["progress"]["max_doc_id"] == expected_max

    stale_docs = docs.where(F.col("doc_id") < 50)
    stale_vecs = vecs.where(F.col("vec_id") < 50)
    with pytest.raises(RuntimeError, match="out-of-order"):
        update_manifest_state(
            spark, stale_docs, stale_vecs, base, cents,
            batch_id=3, budget=budget,
        )
    # nothing moved: no constituent commit, manifest read unchanged
    assert read_meta(os.path.join(base, "nd"))["version"] == nd_before
    assert read_meta(base)["last_batch_id"] == 2
    assert _manifest_rows(spark, base) == ref


def test_manifest_composed_rebucket_identity(spark, sf_dir, tmp_path):
    """rebucket_manifest_state re-pins ONE P across the composition;
    the manifest read is row-identical, the intent marker is gone,
    and folding CONTINUES correctly under the new layout with
    pruned reads forced."""
    from stock_trend_predictor_spark.operators.statestore import (
        read_meta,
    )
    from stock_trend_predictor_spark.streaming.manifest_maintenance import (
        rebucket_manifest_state,
        update_manifest_state,
    )

    docs, vecs, cents, budget = _mini_manifest(spark, sf_dir)
    reb = str(tmp_path / "m-reb")
    _fold_mini(spark, docs, vecs, cents, budget, reb, (49.5, 99.5))
    ref = _manifest_rows(spark, reb)
    assert rebucket_manifest_state(spark, reb, 17)
    assert not os.path.exists(os.path.join(reb, "REBUCKET.json"))
    assert _manifest_rows(spark, reb) == ref
    assert read_meta(reb)["app"]["n_manifest_buckets"] == 17
    assert (
        read_meta(os.path.join(reb, "nd"))["app"]["n_band_buckets"] == 17
    )
    assert (
        read_meta(os.path.join(reb, "sem"))["app"]["n_sem_buckets"] == 17
    )

    # fold MORE corpus after the re-pin, pruned reads engaged —
    # equal to a fresh fold of the same arrivals under default P
    more_docs, more_vecs, _, _ = _mini_manifest(spark, sf_dir, n=220)
    update_manifest_state(
        spark,
        more_docs.where(F.col("doc_id") >= 150),
        more_vecs.where(F.col("vec_id") >= 150),
        reb,
        cents,
        batch_id=4,
        budget=budget,
        decon_filter=F.col("doc_id") >= 3,
        prune_min_bytes=0,
    )
    fresh = str(tmp_path / "m-fresh")
    _fold_mini(
        spark, more_docs, more_vecs, cents, budget, fresh,
        (49.5, 99.5, 149.5),
    )
    assert _manifest_rows(spark, reb) == _manifest_rows(spark, fresh)


def test_manifest_rebucket_crash_midway_refuses_then_converges(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A crash between constituent rewrites leaves the intent marker:
    every fold/read entry point refuses (mixed-P fence), and
    re-running the rebucket drives the composition to the identical
    post-rebucket state."""
    from stock_trend_predictor_spark.streaming import (
        semdedup_maintenance as SM,
    )
    from stock_trend_predictor_spark.streaming.manifest_maintenance import (
        read_curation_manifest,
        rebucket_manifest_state,
        update_manifest_bench,
        update_manifest_state,
    )

    docs, vecs, cents, budget = _mini_manifest(spark, sf_dir)
    base = str(tmp_path / "m-crash")
    _fold_mini(spark, docs, vecs, cents, budget, base, (99.5,))
    ref = _manifest_rows(spark, base)

    real = SM.rebucket_semdedup_state
    with monkeypatch.context() as m:
        m.setattr(
            SM,
            "rebucket_semdedup_state",
            lambda *a, **k: (_ for _ in ()).throw(
                RuntimeError("simulated crash mid-rebucket")
            ),
        )
        with pytest.raises(RuntimeError, match="simulated crash"):
            rebucket_manifest_state(spark, base, 17)
    # the fence: marker present -> every entry point refuses
    assert os.path.exists(os.path.join(base, "REBUCKET.json"))
    with pytest.raises(RuntimeError, match="rebucket"):
        read_curation_manifest(spark, base)
    with pytest.raises(RuntimeError, match="rebucket"):
        update_manifest_state(
            spark,
            docs.limit(0),
            vecs.limit(0),
            base,
            cents,
            batch_id=9,
            budget=budget,
        )
    with pytest.raises(RuntimeError, match="rebucket"):
        update_manifest_bench(spark, docs.limit(1), base, batch_id=9)
    # re-run to completion (idempotent-convergent), read is identical
    assert SM.rebucket_semdedup_state is real
    assert rebucket_manifest_state(spark, base, 17)
    assert not os.path.exists(os.path.join(base, "REBUCKET.json"))
    assert _manifest_rows(spark, base) == ref


# ---------------------------------------------------------------- #
# PCA oracle graduation (deterministic power method)                #
# ---------------------------------------------------------------- #


def test_pca_power_python_replication_and_margins(spark, sf_dir):
    """The graduated PCA's cross-engine claim, checked from the
    Python side: the registry query's rounded projections equal a
    pure-Python replication of the pinned op order bit-for-bit (the
    oracle replays the same order SQL-side), and the two discrete
    decisions (pivot, sign) clear the 1e-9 regime gate with orders of
    magnitude to spare."""
    import math

    from stock_trend_predictor_spark.operators.summaries import (
        deterministic_power_pca,
        exact_moment_sums,
    )
    from stock_trend_predictor_spark.plans import REGISTRY
    from stock_trend_predictor_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    sxy, si, n = exact_moment_sums(emb)
    res = deterministic_power_pca(sxy, si, n)
    assert min(res["pivot_margin"], res["sign_margin"]) > 1e-6

    rows = {
        r.vec_id: r
        for r in REGISTRY["embedding_pca_projection"]
        .fn(spark, sf_dir)
        .collect()
    }
    raw = emb.select("vec_id", "embedding").collect()
    assert len(rows) == len(raw)

    def sround(v):  # stable_round's exact float formula
        return math.floor(v * 1e6 + 0.5) / 1e6

    for r in raw:
        x = [float(v) for v in r.embedding]
        for k in (1, 2):
            acc = 0.0  # Spark F.aggregate's 0.0-init fold
            for i, u in enumerate(res[f"u{k}"]):
                acc = acc + x[i] * u
            assert sround(acc - res[f"off{k}"]) == rows[r.vec_id][
                f"pc{k}"
            ], r.vec_id
    one = next(iter(rows.values()))
    assert one.evr1 == sround(res["evr1"])
    assert one.evr2 == sround(res["evr2"])


# ---------------------------------------------------------------- #
# sweep-freshness checker: the protocol rule, mechanically enforced #
# ---------------------------------------------------------------- #


def test_check_sweep_fresh_flags_every_drift_shape(tmp_path):
    """tools/check_sweep_fresh.py is the mechanical form of the r10
    sweep-ordering protocol rule (COVERAGE.md): a shipped sweep log
    must list exactly the live registry's queries in exactly their
    oracled/rows-only modes with FAILURES: 0. Pin each drift shape
    the checker must catch — including the r9 staleness shape (log
    rows-only, registry oracled) that motivated the rule — and that
    a log agreeing with the LIVE registry passes. Parsing must also
    survive a tty progress bar gluing a result line after a \\r."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    from tools.check_sweep_fresh import check, parse_log

    qs, oracles = E.queries(), E.oracle_sql()

    def write_log(path, modes, failures="0"):
        lines = []
        for name, mode in modes.items():
            if mode == "oracled":
                lines.append(f"[OK] {name}: spark=1 oracle=1 ")
            elif mode == "FAIL":
                lines.append(f"[FAIL] {name}: value hash mismatch")
            else:
                lines.append(f"[rows-only] {name}: 1 rows")
        # glue the FIRST result line onto a progress-bar \r fragment —
        # the capture shape that hid the PCA [OK] line from a naive
        # line-based grep during this round's own verification
        body = "[Stage 8:> (0 + 1) / 1]\r" + "\n".join(lines)
        path.write_text(body + f"\nFAILURES: {failures}\n")
        return str(path)

    true_modes = {
        n: ("oracled" if n in oracles else "rows-only") for n in qs
    }

    # 1. a log that matches the live registry exactly → fresh
    p = write_log(tmp_path / "fresh.log", true_modes)
    assert check(p) == []
    modes, failures = parse_log(p)
    assert failures == 0 and len(modes) == len(qs)

    # 2. the r9 staleness shape: one oracled query swept rows-only
    some_oracled = sorted(oracles)[0]
    stale = dict(true_modes, **{some_oracled: "rows-only"})
    p = write_log(tmp_path / "stale.log", stale)
    assert any("re-sweep" in s and some_oracled in s for s in check(p))

    # 3. a query missing from the log entirely
    dropped = dict(true_modes)
    gone = sorted(qs)[0]
    del dropped[gone]
    p = write_log(tmp_path / "missing.log", dropped)
    assert any("absent from the log" in s and gone in s for s in check(p))

    # 4. a FAIL line, and a non-zero trailer
    failed = dict(true_modes, **{some_oracled: "FAIL"})
    p = write_log(tmp_path / "fail.log", failed, failures="1")
    probs = check(p)
    assert any("FAILED in the sweep" in s for s in probs)
    assert any("FAILURES: 1" in s for s in probs)

    # 5. a log naming a query the registry no longer has
    extra = dict(true_modes, phantom_query="oracled")
    p = write_log(tmp_path / "extra.log", extra)
    assert any("not in registry" in s for s in check(p))

    # 6. a truncated log (no trailer) is never fresh
    p = tmp_path / "trunc.log"
    p.write_text("[OK] q1_pricing_summary: spark=4 oracle=4 \n")
    assert any("truncated" in s for s in check(str(p)))
