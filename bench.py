"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs one representative query per operator family from the registry at
the bench scale factor (default sf0.1) on local[$SPARK_GRAFT_CPUS] and
prints ONE JSON line:

    {"metric": "headline_queries_total", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "queries_median": {...},
     "bench_runs": 5, "sf": 0.1, "drift_canary": {...}, "suspects": {...}}

Each query is forced to full execution with the `noop` sink (distributed
materialization of every output row — no driver collect, no disk write),
so the measured time is scan + shuffle + compute, exactly what scales to
a real cluster. Since round 5 each query runs N=5 times in-session:
"queries" keeps the best (series continuity with the best-of-2 rounds),
"queries_median" is the robust column the box's ±30% cross-session noise
cannot fake (r4 verdict #3).

Since round 8 the pinned-tree drift canary BRACKETS the timed loop
(pre + post ratios — one pre-run sample cannot see intra-run drift,
which faked the r7 frozen-16 regression), and any query reading over
2x its canary-normalized BENCH_SERIES.json value is flagged suspect
and re-run once before recording; the compact line carries
``drift: [pre, post]`` and the resampled count, the detail artifacts
carry the full per-suspect evidence.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

#: One headline query per operator family (SURVEY.md §2 / §7 phases).
HEADLINE = [
    "q1_pricing_summary",        # wide agg scan (TPC-H Q1 shape)
    "q3_shipping_priority",      # 3-way join + agg + top-k
    "q5_regional_revenue",       # 6-way join (broadcast dims)
    "window_rank_battery",       # ranking/analytic window functions
    "rolling_features",          # rows-window moving aggregates
    "resample_ohlc_bars",        # event-time bucket agg
    "vwap_per_supplier",         # weighted agg + join
    "dedup_exact",               # content-hash exact dedup
    "dedup_minhash_lsh",         # shingle→minhash→band→bucket join
    "knn_bruteforce_cosine",     # embedding top-k similarity
    "text_quality_stats",        # text scalar-function battery
    "lang_id_heuristic",         # per-language marker scoring
    "dedup_embedding_cosine",    # blocked exact-cosine near-dup
    "asof_join_purchase_view",   # as-of temporal alignment
    "multimodal_decode_metadata",  # Arrow mapInPandas decode path
    "pergroup_model_scoring",    # applyInPandas train + broadcast score
    # round-3 additions: the most expensive plans in the registry, so
    # regressions there get round-over-round visibility (the original
    # 16 stay frozen for series continuity).
    "pagerank_part_supplier",    # iterative graph: join-per-round
    "triangle_count_copurchase",  # graph pattern: 2-hop self-join
    "embedding_covariance",      # gram-matrix mapInPandas partials
    "heavy_hitters_tokens",      # Misra-Gries summary + re-count
    "bm25_doc_search",           # inverted-index scoring join
    "sketch_countmin_tokens",    # CMS cells + probe estimates
    "dup_span_detection",        # repeated-span dedup (gram window + islands)
    "corpus_keep_decision",      # composed curation verdict (spans + ppl)
    # round-3b additions (same rationale: heaviest of the new plans;
    # everything above stays frozen for series continuity).
    "trend_consensus_verdict",   # composed 4-indicator verdict
    "token_pmi_collocations",    # bigram pair table + marginal windows
    "ngram_novelty_decay",       # 3-gram min-attribution window
    "seasonal_decompose_hod",    # full-series trend window + hod join
    "mmr_diverse_topk",          # candidate topk + Arrow MMR selection
    # round-3c additions (heaviest of the continuation batches; all
    # prior entries stay frozen for series continuity).
    "jaccard_prefix_filter_pairs",  # exact PPJoin: prefix candidates + verify
    "rake_keyphrases",           # positional islands + phrase scoring
    "kcore_copurchase",          # iterative peel: agg + anti-joins per round
    "kendall_tau_hourly",        # hours^2 pair table concordance counts
    # round-4 additions (heaviest of the new plans; everything above
    # stays frozen for series continuity).
    "mann_whitney_u_pairwise",   # (pair, value) rank table + tie windows
    "ann_pq_adc_cosine",         # PQ build + ADC codes scan + exact refine
    "pretraining_block_manifest",  # composed keep->split->pack pipeline
    # round-5 additions (r4 verdict #6: the rest of the rank-test
    # family gets a timing series; everything above stays frozen).
    "kruskal_wallis_event_types",  # pooled distinct-value rank pass
    "wilcoxon_signed_rank_halves",  # paired halves + |d| rank table
    "friedman_hod_symbols",      # within-block rank table
    "effect_sizes_pairwise",     # Cliff's delta + Hodges-Lehmann
    "rank_tests_panel",          # shared-pass KW + pairwise MW panel
    # round-5b additions (the new manifest/mining/admission ops get a
    # timing series from birth; everything above stays frozen).
    "epoch_shuffle_manifest",    # partitioned prefix-scan global shuffle
    "token_budget_selection",    # rank+cumsum one-pass budget frontier
    "hard_negative_mining",      # anchors x corpus contrastive top-k
    "budget_admission_state",    # stateful streaming fold (3 commits)
    # round-5c additions (the chunk/retrieval tier and the SemDeDup
    # composition; everything above stays frozen).
    "chunk_reindex_delta",       # chunk-hash semi join re-embed planner
    "train_test_leakage_report",  # cross-split gram contamination
    "semdedup_keep_decision",    # IVF blocks + cosine graph + CC keep
    "chunk_bm25_search",         # passage BM25 + max-passage collapse
    # round-6 additions (everything above stays frozen).
    "neardup_keep_decision",     # LSH pairs -> verify -> CC -> keep-min
    "neardup_incremental_pairs",  # stateful LSH fold (3 state commits)
    "neardup_incremental_clusters",  # fold + touched-component CC merge
    "dsir_importance_weights",   # hashed-ngram importance model + score
    # round-7 additions (everything above stays frozen).
    "decontaminate_embedding_sim",  # broadcast eval x train argmax cosine
    "knn_graph_ivf",             # cell-blocked corpus kNN graph + top-5
    # round-8 additions (everything above stays frozen).
    "knn_graph_incremental",     # maintained kNN-graph fold (3 commits)
    "semdedup_incremental",      # maintained SemDeDup fold (3 commits)
    "gopher_repetition_flags",   # 9-arity gram windows + interval union
    "bm25_incremental",          # maintained retrieval index (additive fold)
    # round-9 additions (everything above stays frozen).
    "curation_manifest_incremental",  # composed 5-fold keep manifest
    "phash_incremental_pairs",   # maintained multimodal phash fold
    # round-10 addition, rolled into HEADLINE proper per the r11
    # verdict (#2); stays in ALWAYS_COMPACT so its compact-line series
    # (r10: 9.6, r11: 1.4) continues unbroken.
    "embedding_pca_projection",  # decimal-exact moments + power method
]

#: THIS round's additions — always carried in the COMPACT line
#: (their first-ever series values must not be lost). r12 is an
#: optimization round: no new queries.
ROUND_NEW: list[str] = []
HEADLINE += ROUND_NEW

#: Compact-line continuity keys (r11 verdict #2): queries whose
#: per-query value must ride EVERY round's compact line so the driver
#: always has them in both rounds' maps.
ALWAYS_COMPACT = ["embedding_pca_projection"]

#: the continuity set: the original 16 queries, frozen since round 2
#: — their sum is the cross-round box-comparable series the compact
#: line must always carry.
FROZEN16 = HEADLINE[:16]


def _drift_canary(sf_dir: str) -> dict | None:
    """Run the FIXED 3-query canary from the PINNED git tree
    (tools/bench_canary.py) in a subprocess and return
    measured/baseline — a pure box-speed ratio for normalizing this
    round's numbers against the recorded-baseline box state (r6
    verdict #8: the r6 verbatim-tree A/B isolated a 1.22x
    day-over-day drift on unchanged code; this makes that A/B
    permanent). Called BEFORE and AFTER the headline loop since r8 —
    one pre-run sample cannot see intra-run drift (the r7 frozen-16
    false regression). Never fails the bench: any problem returns an
    ``error`` dict instead.

    The cached pinned tree is extracted into a UNIQUE temp dir and
    os.rename()d into place, so an interrupted extraction (or a
    concurrent bench) can never leave a partial tree that later runs
    silently reuse (r7 advice); a cached dir missing the package
    marker is treated as corrupt and rebuilt."""
    import shutil
    import subprocess
    import tempfile

    try:
        baseline = json.loads(
            Path(_REPO, "CANARY_BASELINE.json").read_text()
        )
        commit = baseline["commit"]
        tree = Path(tempfile.gettempdir(), f"stp-canary-{commit[:12]}")
        if tree.exists() and not (
            tree / "stock_trend_predictor_spark"
        ).is_dir():
            shutil.rmtree(tree, ignore_errors=True)  # corrupt cache
        if not (tree / "stock_trend_predictor_spark").is_dir():
            tmp = tempfile.mkdtemp(
                dir=tempfile.gettempdir(), prefix="stp-canary-x-"
            )
            archive = subprocess.run(
                ["git", "-C", _REPO, "archive", commit],
                capture_output=True,
                check=True,
            )
            subprocess.run(
                ["tar", "-x", "-C", tmp],
                input=archive.stdout,
                check=True,
            )
            try:
                os.rename(tmp, tree)  # all-or-nothing publish
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)  # lost the race
        out = subprocess.run(
            [
                sys.executable,
                str(Path(_REPO, "tools", "bench_canary.py")),
                str(tree),
                sf_dir,
            ],
            capture_output=True,
            text=True,
            timeout=900,
            check=True,
        )
        line = [
            ln for ln in out.stdout.splitlines() if ln.startswith("{")
        ][-1]
        got = json.loads(line)
        return {
            "ratio": round(
                got["canary_total_sec"] / baseline["canary_total_sec"], 3
            ),
            "measured_sec": got["canary_total_sec"],
            "baseline_sec": baseline["canary_total_sec"],
            "commit": commit[:12],
        }
    except Exception as e:  # noqa: BLE001 - canary must never kill bench
        return {"error": f"{type(e).__name__}: {e}"[:200]}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(Path(sf_dir).name.removeprefix("sf") or "0.1")

    # canary BRACKET leg 1 (own subprocess/JVM): the PRE ratio
    # reflects the box state the headline numbers are about to be
    # measured in; a POST leg runs after the loop (r7 verdict #2:
    # BENCH_r07's official frozen-16 read 1.88x through an intra-run
    # drift window the single pre-run sample could not see)
    drift_pre = _drift_canary(sf_dir)

    # canary-normalized per-query reference values for the suspect
    # check (recorded at a known box state; see the file's "recorded"
    # note). Missing file or query -> no suspect flagging for it.
    try:
        series = json.loads(
            Path(_REPO, "BENCH_SERIES.json").read_text()
        ).get("queries", {})
    except Exception:  # noqa: BLE001 - advisory machinery only
        series = {}

    from stock_trend_predictor_spark import get_spark
    from stock_trend_predictor_spark.plans import REGISTRY

    spark = get_spark(
        app_name="stp-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            # keep \r progress-bar frames out of the driver's stdout
            # tail window (r5: they crowded the parseable JSON out)
            "spark.ui.showConsoleProgress": "false",
            # 49 queries x 5 runs + the recall section run in ONE
            # local-mode JVM: broadcasts + localCheckpoint blocks
            # accumulate across runs and the 1g default heap OOMed at
            # task serialization mid-bench (r6). Same setting the
            # scaleup harness already uses.
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed warmup: exercise JVM codegen, parquet reader, and the
    # Arrow/Python-worker pool on tiny data so per-query timings are
    # steady-state compute, not first-call initialization.
    warm = REGISTRY["flagship_movement_rate"]
    warm.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    # ... and the Arrow/Python worker pool (first pandas-UDF use pays
    # daemon startup otherwise).
    REGISTRY["pergroup_linreg_models"].fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()

    # N same-session runs per query (r4 verdict #3: the driver box has
    # ±30% cross-session noise; per-query MEDIANS over N >= 5 runs are
    # the number regressions can be judged on without litigating
    # variance). "queries" stays the best-of-N for series continuity
    # (best-of-2 through r4 — best-of-5 can only read slightly lower);
    # "queries_median" is the robust column.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

    def _sample(name: str) -> list[float]:
        q = REGISTRY[name]
        samples: list[float] = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        return samples

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in HEADLINE:
        samples = _sample(name)
        timings[name] = round(min(samples), 3)
        medians[name] = round(statistics.median(samples), 3)

    # SUSPECT pass (r7 verdict #2): a query whose best-of-N exceeds
    # 2x its canary-normalized series value most likely hit a drift
    # window mid-loop — re-run it ONCE before recording, keep the
    # better sample set, and report both so the artifact
    # self-diagnoses intra-run drift without a judge re-measure.
    # The 0.5 s floor keeps sub-second queries' scheduler jitter out.
    ratio_pre = (drift_pre or {}).get("ratio") or 1.0
    suspects: dict[str, dict] = {}
    for name, best in list(timings.items()):
        ref = series.get(name)
        if ref is None:
            continue
        if best > max(2.0 * ref * ratio_pre, 0.5):
            suspects[name] = {
                "first": best,
                "expected": round(ref * ratio_pre, 3),
            }
    for name, info in suspects.items():
        samples = _sample(name)
        info["rerun"] = round(min(samples), 3)
        if info["rerun"] < timings[name]:
            timings[name] = info["rerun"]
            medians[name] = min(
                medians[name], round(statistics.median(samples), 3)
            )

    # canary BRACKET leg 2: closes the timed window. pre != post is
    # the direct signature of the intra-run drift that faked the r7
    # frozen-16 regression.
    drift_post = _drift_canary(sf_dir)

    # ANN quality evidence (untimed): recall@10 of each approximate
    # index vs the exact brute-force top-10, on the same sf. Emitted in
    # the bench JSON and mirrored to RECALL.json so the number is
    # visible per round, not just floor-asserted in tests. The LSH
    # candidate (probe) fraction is reported alongside — recall without
    # its probe cost would be half the story.
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["knn_bruteforce_cosine"].fn(spark, sf_dir).collect()
    }
    recall: dict[str, float] = {}
    for ann in ("ann_lsh_cosine", "ann_ivf_cosine", "ann_pq_adc_cosine",
                "ann_ivfpq_cosine", "ann_ivf_maintained"):
        pairs = {
            (r["query_id"], r["neighbor_id"])
            for r in REGISTRY[ann].fn(spark, sf_dir).collect()
        }
        recall[ann] = round(len(exact & pairs) / len(exact), 3)

    # IVF semantic-dedup pair recall. Since round 6 the query also has
    # a full value-hash oracle (the deterministic quantizer), but the
    # recall number stays published: the oracle proves the ENGINE is
    # right, recall measures whether the BLOCKING finds the pairs.
    # Truth = exact all-pairs cosine >= 0.35 via a broadcast self-join
    # (corpus is the small embeddings table; at real scale the truth
    # set would be sampled).
    from pyspark.sql import functions as F

    from stock_trend_predictor_spark.functions.exact import stable_round
    from stock_trend_predictor_spark.operators.similarity import (
        as_double,
        dot,
        l2norm,
        with_lsh_buckets,
        with_lsh_probes,
    )
    from stock_trend_predictor_spark.sources.tables import load_table

    ivf_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in REGISTRY["dedup_embedding_ivf"].fn(spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double("embedding").alias("v"))
        .withColumn("nrm", l2norm(F.col("v")))
    )
    a, b = ev.alias("a"), ev.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    truth_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in a.join(
            F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id")
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            stable_round(cos, 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= 0.35)
        .collect()
    }
    recall["dedup_embedding_ivf_pairs"] = round(
        len(ivf_pairs & truth_pairs) / len(truth_pairs), 3
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    n_queries = 8
    # LSH probe fraction: corpus indexed at 1 bucket/table, queries
    # probe their full multi-probe (Hamming-radius) set per table.
    c = with_lsh_buckets(
        emb.select(F.col("vec_id").alias("neighbor_id"),
                   as_double("embedding").alias("cv")), "cv")
    q = with_lsh_probes(
        emb.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"),
            as_double("embedding").alias("qv")), "qv")
    n_cand = (
        c.join(F.broadcast(q.select("query_id", "tbl", "bucket")),
               ["tbl", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .count()
    )
    probe_fraction = round(n_cand / n_queries / n_corpus, 3)

    # IVF probe fraction (the declared ANN path): candidates = members
    # of each query's nprobe nearest clusters, same protocol.
    from stock_trend_predictor_spark.operators.ivf import (
        _sq_dist_to,
        assign_clusters,
        kmeans_centroids,
    )

    cvec = emb.select(F.col("vec_id").alias("neighbor_id"),
                      as_double("embedding").alias("cv"))
    cents = kmeans_centroids(cvec, k=16, iters=2,
                             id_col="neighbor_id", vec_col="cv")
    assigned = assign_clusters(cvec, cents, "cv")
    qd = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        as_double("embedding").alias("qv"),
    ).withColumn(
        "_d", F.array(*[_sq_dist_to(F.col("qv"), cc) for cc in cents])
    )
    qprobe = qd.select(
        "query_id",
        F.explode(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.zip_with(
                            F.col("_d"),
                            F.sequence(F.lit(0), F.lit(len(cents) - 1)),
                            lambda d, i: F.struct(d.alias("d"),
                                                  i.alias("i")),
                        )
                    ),
                    lambda s: s["i"],
                ),
                1, 2,
            )
        ).alias("cid"),
    )
    n_ivf_cand = (
        assigned.join(F.broadcast(qprobe), "cid")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .count()
    )
    ivf_probe_fraction = round(n_ivf_cand / n_queries / n_corpus, 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "bench_runs": runs,
        "sf": sf,
        "recall_at_10": recall,
        "lsh_probe_fraction": probe_fraction,
        "ivf_probe_fraction": ivf_probe_fraction,
        "drift_canary": {"pre": drift_pre, "post": drift_post},
        "suspects": suspects,
    }
    # Output framing (r5 verdict #6): the driver keeps only a ~2 KB
    # TAIL of stdout and parses a JSON line out of it — r5's single
    # giant line outgrew the window and the driver recorded
    # "parsed": null. Emit the FULL detail line first (and mirror it
    # to BENCH_DETAIL.json, which survives regardless), then a
    # COMPACT line LAST — small enough to always sit complete inside
    # the tail window whichever line the driver's parser picks.
    print(json.dumps(result))
    try:
        Path(_REPO, "BENCH_DETAIL.json").write_text(
            json.dumps(result, indent=2) + "\n"
        )
    except OSError:
        pass
    # 1-decimal per-query values: the box's ±30% variance makes finer
    # precision meaningless, and every byte here is tail-window
    # headroom (guard: tests/test_registry_hygiene.py pins the
    # worst-case rendering under 1800 B; unit/bench_runs moved to the
    # detail artifacts for the same reason when the r8 drift bracket
    # landed). Full-precision values live in the first line and
    # BENCH_DETAIL.json — both committed to the repo.
    def _cv(v: float):
        # whole seconds past 100: a 100+s sf0.1 headline value is
        # itself the signal, the tenths are noise — and the widest
        # sane per-query rendering drops from 5 B ("999.9") to 4
        # ("99.9"). Round FIRST, then branch: v in [99.95, 100)
        # rounds to 100.0 and must render as the int (r8 ADVICE —
        # the boundary rendering otherwise exceeds the 4-byte bound
        # the tail-window guard test models).
        r = round(v, 1)
        return r if r < 100 else int(round(v))

    # COMPACT line restructure (r8 verdict #5, r11 verdict #2): the
    # full per-query map at 59+ entries outgrew the driver's ~1.9 KB
    # tail window, and ROUND_NEW alone left the driver only 1
    # comparable query in an optimization round (PERF_r11 n_common=1).
    # The compact "queries" now carries, capped at 12 entries (the
    # tail-window guard test models exactly 12):
    #   (a) every ROUND_NEW entry (first-ever series values),
    #   (b) ALWAYS_COMPACT (cross-round continuity keys),
    #   (c) the SLOWEST remaining queries — their key set is stable
    #       round-over-round, which is what makes the prev∩now
    #       intersection large (movers alone have unstable keys:
    #       they are relative to a per-round-refreshed series),
    #   (d) the largest canary-normalized movers vs BENCH_SERIES.json
    #       (the per-query regression signal the r11 verdict asked
    #       for), filling the remaining slots.
    # The full map stays in the first (detail) line and
    # BENCH_DETAIL.json, both committed.
    import math

    compact_keys: list[str] = [
        k for k in (*ROUND_NEW, *ALWAYS_COMPACT) if k in timings
    ]
    for k in sorted(timings, key=timings.get, reverse=True):
        if len(compact_keys) >= 9:
            break
        if k not in compact_keys:
            compact_keys.append(k)

    def _mover_score(name: str) -> float:
        ref = series.get(name)
        if not ref or ref <= 0:
            return 0.0
        return abs(math.log(max(timings[name], 1e-3)
                            / max(ref * ratio_pre, 1e-3)))

    for k in sorted(timings, key=_mover_score, reverse=True):
        if len(compact_keys) >= 12:
            break
        if k not in compact_keys:
            compact_keys.append(k)

    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "queries": {k: _cv(timings[k]) for k in compact_keys},
        "n_queries": len(timings),
        "frozen16": round(sum(timings[q] for q in FROZEN16), 2),
        "sf": sf,
        # box-speed normalizers bracketing the timed window
        # (pre != post self-diagnoses intra-run drift); "resampled" =
        # how many suspect queries got the one re-run. 2dp: the
        # ratio's third decimal is under the canary's own sampling
        # noise. Suspect NAMES ride along (usually empty; capped so
        # a pathological round cannot blow the window — full
        # per-suspect evidence is in the detail artifacts).
        "drift": [
            r if r is None else round(r, 2)
            for r in (
                (drift_pre or {}).get("ratio"),
                (drift_post or {}).get("ratio"),
            )
        ],
        "resampled": len(suspects),
        "suspects": sorted(suspects)[:6],
    }
    # compact separators: no space after ':'/',' — ~2 B per query of
    # tail-window headroom, and any JSON parser reads it the same
    print(json.dumps(compact, separators=(",", ":")), flush=True)
    try:
        Path(_REPO, "RECALL.json").write_text(
            json.dumps(
                {
                    "sf": sf,
                    "k": 10,
                    "recall_at_10": recall,
                    "lsh_probe_fraction": probe_fraction,
                    "ivf_probe_fraction": ivf_probe_fraction,
                },
                indent=2,
            )
            + "\n"
        )
    except OSError:
        pass  # bench result is the primary artifact
    spark.stop()


if __name__ == "__main__":
    main()
