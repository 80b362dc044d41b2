"""Law tests for the structure-discovery batch (plans/structure_queries).

The oracle-parity suite already proves Spark == DuckDB bit-for-bit for
all six queries; here we pin the properties the oracles can't express:
plan shape (no cartesian products, the shuffle-free chunker, broadcast
in the skyline join-back), the PPJoin losslessness against a direct
all-pairs computation, skyline dominance by brute force, and the
integer-exact log2 bucketing law.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from stock_trend_predictor_spark.plans import REGISTRY
from stock_trend_predictor_spark.plans.structure_queries import (
    CHUNK_S,
    CHUNK_W,
    JACCARD_TAU,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_no_cartesian_in_structure_plans(spark, sf_dir):
    for name in (
        "jaccard_prefix_filter_pairs",
        "skyline_parts",
        "fd_violation_profile",
        "copurchase_degree_distribution",
        "winsorized_stats_per_type",
        "doc_chunk_overlap",
    ):
        plan = _plan(REGISTRY[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_doc_chunk_plan_is_shuffle_free(spark, sf_dir):
    """The chunker claims embarrassing parallelism: scan -> explode ->
    project, zero Exchange operators in the physical plan."""
    plan = _plan(REGISTRY["doc_chunk_overlap"].fn(spark, sf_dir))
    assert "Exchange" not in plan


def test_skyline_joinback_is_broadcast(spark, sf_dir):
    plan = _plan(REGISTRY["skyline_parts"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_ppjoin_lossless_vs_all_pairs(spark, sf_dir):
    """Prefix filtering must lose no pair: compare against the direct
    all-pairs Jaccard over the same sample, computed in Python."""
    docs = {
        r.doc_id: set(r.text.split(" "))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id % 5 = 0")
        .select("doc_id", "text")
        .collect()
    }
    ids = sorted(docs)
    truth = {}
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            inter = len(docs[da] & docs[db])
            jac = inter / (len(docs[da]) + len(docs[db]) - inter)
            if jac >= JACCARD_TAU:
                truth[(da, db)] = jac
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in REGISTRY["jaccard_prefix_filter_pairs"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(truth)
    for pair, jac in truth.items():
        assert abs(got[pair] - jac) < 1e-6, pair


def test_skyline_brute_force(spark, sf_dir):
    pts = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]

    def dominated(p):
        return any(
            q[1] <= p[1]
            and q[2] <= p[2]
            and (q[1] < p[1] or q[2] < p[2])
            for q in pts
        )

    truth = {p[0] for p in pts if not dominated(p)}
    got = {
        r.p_partkey
        for r in REGISTRY["skyline_parts"].fn(spark, sf_dir).collect()
    }
    assert got == truth and got


def test_fd_keyed_dependency_has_zero_violation(spark, sf_dir):
    rows = {
        r.fd: r
        for r in REGISTRY["fd_violation_profile"].fn(spark, sf_dir).collect()
    }
    keyed = rows["o_orderkey->o_orderstatus"]
    assert keyed.violation_rate == 0.0
    assert keyed.n_keys == keyed.n_rows
    for r in rows.values():
        assert 0.0 <= r.violation_rate < 1.0
        assert r.n_keys <= r.n_rows


def test_degree_buckets_are_bit_length(spark, sf_dir):
    rows = (
        REGISTRY["copurchase_degree_distribution"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert rows
    total = 0
    for r in rows:
        assert r.bucket == r.min_deg.bit_length()
        assert r.bucket == r.max_deg.bit_length()
        assert 2 ** (r.bucket - 1) <= r.min_deg <= r.max_deg < 2**r.bucket
        total += r.n_vertices
    assert total > 0


def test_winsorized_tighter_than_raw(spark, sf_dir):
    """Clamping can only shrink dispersion: winsorized std <= raw std
    per key, and the winsorized mean sits inside [p05, p95]."""
    raw = defaultdict(list)
    for r in (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .collect()
    ):
        raw[r.event_type].append(r.value)
    rows = (
        REGISTRY["winsorized_stats_per_type"].fn(spark, sf_dir).collect()
    )
    assert rows
    for r in rows:
        vals = raw[r.event_type]
        assert r.n == len(vals)
        mu = sum(vals) / len(vals)
        raw_std = math.sqrt(
            sum((v - mu) ** 2 for v in vals) / (len(vals) - 1)
        )
        assert r.win_std <= raw_std + 1e-6
        assert min(vals) - 1e-9 <= r.win_mean <= max(vals) + 1e-9


def test_chunk_geometry_and_fingerprints(spark, sf_dir):
    """Chunks tile every token: starts advance by the stride, lengths
    are min(W, n-start), and each md5 matches a Python recompute."""
    texts = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id % 2 = 1")
        .collect()
    }
    chunks = defaultdict(list)
    for r in REGISTRY["doc_chunk_overlap"].fn(spark, sf_dir).collect():
        chunks[r.doc_id].append(r)
    assert set(chunks) == set(texts)
    for doc_id, rs in chunks.items():
        toks = texts[doc_id]
        rs.sort(key=lambda r: r.chunk_idx)
        n = len(toks)
        expect_starts = list(range(0, n, CHUNK_S))
        assert [r.start_tok for r in rs] == expect_starts
        for r in rs:
            piece = toks[r.start_tok : r.start_tok + CHUNK_W]
            assert r.chunk_len == len(piece)
            assert (
                r.chunk_md5
                == hashlib.md5(" ".join(piece).encode()).hexdigest()
            )


def test_rake_phrases_are_stopword_free_runs(spark, sf_dir):
    """Every reported phrase contains no stopword (top-20 corpus
    tokens) and occurs verbatim in at least one document."""
    from collections import Counter

    from stock_trend_predictor_spark.plans import REGISTRY
    from stock_trend_predictor_spark.plans.keyphrase_queries import (
        RAKE_N_STOP,
    )

    docs = [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    cnt = Counter(t for d in docs for t in d.split(" "))
    stop = {
        t
        for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :RAKE_N_STOP
        ]
    }
    rows = REGISTRY["rake_keyphrases"].fn(spark, sf_dir).collect()
    assert rows
    corpus = [d.split(" ") for d in docs]
    for r in rows:
        toks = r.phrase.split(" ")
        assert len(toks) == r.plen
        assert not (set(toks) & stop), r.phrase
        assert r.score > 0
        found = any(
            toks == c[i : i + len(toks)]
            for c in corpus
            for i in range(len(c) - len(toks) + 1)
        )
        assert found, r.phrase


def test_greedy_bigram_cover_matches_python(spark, sf_dir):
    """The distributed greedy must equal a brute-force Python greedy
    (same tie-break), and marginal gains must be non-increasing —
    the submodularity signature."""
    from stock_trend_predictor_spark.plans import REGISTRY
    from stock_trend_predictor_spark.plans.selection_queries import COVER_K

    docs = {}
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        t = r.text.split(" ")
        docs[r.doc_id] = {
            f"{t[i]} {t[i + 1]}" for i in range(len(t) - 1)
        }
    covered, truth = set(), []
    for step in range(1, COVER_K + 1):
        best = min(
            ((-len(toks - covered), did) for did, toks in docs.items()),
        )
        gain, did = -best[0], best[1]
        if gain == 0:  # selection stops once nothing new is coverable
            break
        covered |= docs[did]
        truth.append((step, did, gain, len(covered)))
    rows = sorted(
        REGISTRY["greedy_bigram_cover"].fn(spark, sf_dir).collect(),
        key=lambda r: r.step,
    )
    got = [
        (r.step, r.doc_id, r.marginal_gain, r.covered_bigrams)
        for r in rows
    ]
    assert got == truth
    gains = [r.marginal_gain for r in rows]
    assert gains == sorted(gains, reverse=True)


def test_cohort_ltv_is_monotone_per_cohort(spark, sf_dir):
    from stock_trend_predictor_spark.plans import REGISTRY

    rows = REGISTRY["cohort_ltv_curve"].fn(spark, sf_dir).collect()
    assert rows
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r.cohort_week].append(r)
    for rs in by_cohort.values():
        rs.sort(key=lambda r: r.week_idx)
        prev = 0.0
        for r in rs:
            assert r.cum_revenue >= prev - 1e-9
            assert abs(r.ltv_per_user - r.cum_revenue / r.n_users) < 1e-4
            prev = r.cum_revenue


def test_session_histogram_accounts_for_all_events(spark, sf_dir):
    from stock_trend_predictor_spark.plans import REGISTRY

    rows = REGISTRY["session_length_histogram"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.bucket == r.min_events.bit_length()
        assert r.bucket == r.max_events.bit_length()
        assert r.min_events <= r.max_events


def test_multibyte_ratio_bounds(spark, sf_dir):
    from stock_trend_predictor_spark.plans import REGISTRY

    rows = REGISTRY["multibyte_ratio_by_lang"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.total_bytes >= r.total_chars
        assert 1.0 <= r.bytes_per_char <= 4.0


def test_price_elasticity_matches_python(spark, sf_dir):
    from stock_trend_predictor_spark.plans import REGISTRY

    parts = {
        r.p_partkey: r.p_brand
        for r in spark.read.parquet(f"{sf_dir}/part.parquet").collect()
    }
    obs = defaultdict(list)
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        if r.l_quantity > 0 and r.l_extendedprice > 0:
            obs[parts[r.l_partkey]].append(
                (
                    math.log(r.l_extendedprice / r.l_quantity),
                    math.log(r.l_quantity),
                )
            )
    rows = {
        r.p_brand: r
        for r in REGISTRY["price_elasticity_by_brand"]
        .fn(spark, sf_dir)
        .collect()
    }
    for brand, pts in obs.items():
        m = len(pts)
        sx = sum(round(x, 6) for x, _ in pts)
        sy = sum(round(y, 6) for _, y in pts)
        sxy = sum(round(x * y, 6) for x, y in pts)
        sxx = sum(round(x * x, 6) for x, _ in pts)
        b = (m * sxy - sx * sy) / (m * sxx - sx * sx)
        r = rows[brand]
        assert r.n_lines == m
        assert abs(r.elasticity - b) < 1e-4
