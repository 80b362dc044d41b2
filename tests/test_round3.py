"""Round-3 law tests: asof NULL-row fidelity, IVF recall bar,
replayed-sink idempotence companions.

The asof tests pin the ADVICE finding that per-column fills could mix
rows when the matched right row holds a NULL — the operator must
return the matched row's NULL (ASOF semantics), never a value patched
from a neighboring right row.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F  # noqa: F401

from stock_trend_predictor_spark.operators.windows import (
    asof_join,
    asof_join_forward,
)


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_backward_returns_matched_rows_null(spark):
    """Matched right row has v=NULL -> output v must be NULL, not the
    earlier right row's value."""
    left = spark.createDataFrame(
        [("A", _ts(10))], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", _ts(1), 100.0, "x"), ("A", _ts(5), None, "y")],
        "k string, ts timestamp, v double, tag string",
    )
    row = asof_join(
        left, right, by=["k"], ts="ts", right_cols=["v", "tag"]
    ).collect()[0]
    assert row.tag_asof == "y"  # matched the ts=5 row
    assert row.v_asof is None  # ...and took ITS null, not 100.0


def test_asof_forward_returns_matched_rows_null(spark):
    """Forward twin: matched (earliest future) right row has v=NULL ->
    output v must be NULL, not a later right row's value."""
    left = spark.createDataFrame(
        [("A", _ts(0))], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", _ts(3), None, "y"), ("A", _ts(7), 200.0, "z")],
        "k string, ts timestamp, v double, tag string",
    )
    row = asof_join_forward(
        left, right, by=["k"], ts="ts", right_cols=["v", "tag"]
    ).collect()[0]
    assert row.tag_next == "y"
    assert row.ts_next == _ts(3)
    assert row.v_next is None


def test_asof_forward_tolerance_still_nulls_past_horizon(spark):
    left = spark.createDataFrame(
        [("A", _ts(0)), ("B", _ts(0))], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", _ts(3), 1.0), ("B", _ts(30), 2.0)],
        "k string, ts timestamp, v double",
    )
    out = {
        r.k: (r.ts_next, r.v_next)
        for r in asof_join_forward(
            left, right, by=["k"], ts="ts", right_cols=["v"],
            tolerance_seconds=10,
        ).collect()
    }
    assert out["A"] == (_ts(3), 1.0)
    assert out["B"] == (None, None)  # match exists but beyond horizon


# ---------------------------------------------------------------------
# Round-3 query laws: span dedup, containment, indicators
# ---------------------------------------------------------------------


def test_dup_span_merges_overlaps_and_respects_min_width(spark):
    """Two docs sharing one long passage -> each gets ONE maximal span
    (overlapping 8-grams merged), span_tokens >= 8 always, and a doc
    with no repeated 8-gram yields no span."""
    from stock_trend_predictor_spark.operators.dedup import (  # noqa: F401
        with_shingle_hashes,
    )
    from stock_trend_predictor_spark.plans.span_queries import (
        K_SPAN,
        dup_gram_positions,
        merge_spans,
    )

    shared = " ".join(f"tok{i}" for i in range(20))  # 20-token passage
    docs = spark.createDataFrame(
        [
            (1, "aa bb " + shared + " cc dd"),
            (2, shared + " zz yy xx ww vv uu"),
            (3, " ".join(f"solo{i}" for i in range(30))),
        ],
        "doc_id int, text string",
    )
    spans = merge_spans(dup_gram_positions(docs)).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2}          # doc 3 has no duplicated gram
    assert all(len(v) == 1 for v in by_doc.values())  # merged, maximal
    for r in spans:
        assert r.span_tokens >= K_SPAN
        assert r.span_tokens == r.span_end - r.span_start + 1
    # doc 1: passage occupies token positions 2..21 -> span [2, 21]
    (s1,) = by_doc[1]
    assert (s1.span_start, s1.span_end) == (2, 21)
    # doc 2: passage at positions 0..19
    (s2,) = by_doc[2]
    assert (s2.span_start, s2.span_end) == (0, 19)


def test_dup_span_fraction_covers_all_docs_and_bounds(spark, sf_dir):
    """Every document appears exactly once; dup_fraction in [0, 1];
    zero-span docs report 0."""
    from stock_trend_predictor_spark.plans import REGISTRY

    rows = REGISTRY["dup_span_doc_fraction"].fn(spark, sf_dir).collect()
    assert len(rows) == spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for r in rows:
        assert 0.0 <= r.dup_fraction <= 1.0
        assert r.dup_tokens <= r.n_tokens
        if r.dup_tokens == 0:
            assert r.dup_fraction == 0.0


def test_containment_dominates_jaccard_on_shared_pairs(spark, sf_dir):
    """For every candidate pair both queries emit, containment >=
    jaccard (|A∩B|/min >= |A∩B|/|A∪B| always)."""
    from stock_trend_predictor_spark.plans import REGISTRY

    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in REGISTRY["minhash_containment_pairs"].fn(spark, sf_dir).collect()
    }
    shared = set(jac) & set(cont)
    assert shared  # the near-identical cluster passes both thresholds
    for p in shared:
        assert cont[p] >= jac[p] - 1e-9


def test_rsi_bounds_and_window_gate(spark, sf_dir):
    """RSI in [0, 100] wherever defined; NULL until a full 14-delta
    window exists (first 14 rows of every symbol: 1 lost to the delta
    + 13 building the frame)."""
    from stock_trend_predictor_spark.plans import REGISTRY

    df = REGISTRY["rsi_cutler_14"].fn(spark, sf_dir)
    rows = df.collect()
    defined = [r for r in rows if r.rsi14 is not None]
    assert defined
    assert all(0.0 <= r.rsi14 <= 100.0 for r in defined)
    # per symbol: exactly 13 leading NULL rows (delta rows before a
    # full window), none after
    from collections import defaultdict

    by_sym = defaultdict(list)
    for r in rows:
        by_sym[r.symbol].append(r)
    for sym, rs in by_sym.items():
        rs.sort(key=lambda r: (r.ts, r.tick_id))
        nulls = [i for i, r in enumerate(rs) if r.rsi14 is None]
        assert nulls == list(range(min(13, len(rs)))), sym


def test_bollinger_band_ordering_and_pct_b(spark, sf_dir):
    """upper >= sma >= lower wherever defined; pct_b == 0.5 exactly
    when close == sma is not required, but close inside the band
    implies 0 <= pct_b <= 1."""
    from stock_trend_predictor_spark.plans import REGISTRY

    rows = REGISTRY["bollinger_bands_20"].fn(spark, sf_dir).collect()
    defined = [r for r in rows if r.sma20 is not None]
    assert defined
    for r in defined:
        assert r.upper_band >= r.sma20 >= r.lower_band
        if r.pct_b is not None and r.lower_band <= r.close <= r.upper_band:
            assert -1e-9 <= r.pct_b <= 1.0 + 1e-9


def test_bpe_pairs_counts_match_bruteforce(spark, sf_dir):
    """Top-50 adjacent-pair counts == a python brute force over the
    same documents."""
    from collections import Counter

    from stock_trend_predictor_spark.plans import REGISTRY

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    c = Counter()
    for d in docs:
        t = d.text.split(" ")
        for i in range(len(t) - 1):
            c[(t[i], t[i + 1])] += 1
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [
        ((r.left_tok, r.right_tok), r.pair_count)
        for r in REGISTRY["bpe_pair_merge_candidates"].fn(spark, sf_dir).collect()
    ]
    assert got == expect


def test_stochastic_oscillator_bounds_and_gates(spark, sf_dir):
    """%K and %D in [0, 100] wherever defined; %D defined only where
    three consecutive %K values exist, and equals their mean."""
    from collections import defaultdict

    from stock_trend_predictor_spark.plans import REGISTRY

    rows = REGISTRY["stochastic_oscillator_14"].fn(spark, sf_dir).collect()
    by_sym = defaultdict(list)
    for r in rows:
        by_sym[r.symbol].append(r)
    assert any(r.pct_d is not None for r in rows)
    for sym, rs in by_sym.items():
        rs.sort(key=lambda r: (r.ts, r.tick_id))
        for i, r in enumerate(rs):
            if r.pct_k is not None:
                assert 0.0 <= r.pct_k <= 100.0
            if r.pct_d is not None:
                assert 0.0 <= r.pct_d <= 100.0
                ks = [rs[j].pct_k for j in (i - 2, i - 1, i)]
                assert all(k is not None for k in ks)
                assert abs(r.pct_d - sum(ks) / 3) < 1e-5


def test_bigram_perplexity_consistency(spark, sf_dir):
    """ppl == exp(avg_nll) (up to output rounding); n_bigrams ==
    n_tokens - 1 for every multi-token doc; avg_nll > 0 (probabilities
    strictly < 1 under smoothing)."""
    import math

    from stock_trend_predictor_spark.plans import REGISTRY

    rows = REGISTRY["doc_bigram_perplexity"].fn(spark, sf_dir).collect()
    assert rows
    n_tok = {
        r.doc_id: len(r.text.split(" "))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    multi = {d for d, n in n_tok.items() if n >= 2}
    assert {r.doc_id for r in rows} == multi
    for r in rows:
        assert r.n_bigrams == n_tok[r.doc_id] - 1
        assert r.avg_nll > 0
        assert abs(r.ppl - math.exp(r.avg_nll)) <= 1e-3 * r.ppl


def test_macd_crossover_flags_match_histogram_signs(spark, sf_dir):
    """Crossover labels must agree with the histogram sign transition
    of the ordered per-symbol series; macd == macd_signal + hist up to
    output rounding."""
    from collections import defaultdict

    from stock_trend_predictor_spark.plans import REGISTRY

    rows = REGISTRY["macd_crossover"].fn(spark, sf_dir).collect()
    by_sym = defaultdict(list)
    for r in rows:
        by_sym[r.symbol].append(r)
    n_flags = 0
    for sym, rs in by_sym.items():
        rs.sort(key=lambda r: (r.ts, r.tick_id))
        assert rs[0].crossover is None  # no previous histogram yet
        for prev, cur in zip(rs, rs[1:]):
            expect = None
            if cur.hist > 0 and prev.hist <= 0:
                expect = "bullish"
            elif cur.hist < 0 and prev.hist >= 0:
                expect = "bearish"
            assert cur.crossover == expect, (sym, prev, cur)
            n_flags += expect is not None
            assert abs(cur.macd - (cur.macd_signal + cur.hist)) <= 2e-6
    assert n_flags > 0


def test_corpus_keep_decision_priority_and_coverage(spark, sf_dir):
    """Every document gets exactly one verdict; verdicts respect the
    gate priority (a short doc is drop_short regardless of other
    signals); keep-docs satisfy every gate."""
    from stock_trend_predictor_spark.plans import REGISTRY

    rows = REGISTRY["corpus_keep_decision"].fn(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    decisions = {r.decision for r in rows}
    assert "keep" in decisions and len(decisions) >= 2
    for r in rows:
        if r.n_tokens < 20:
            assert r.decision == "drop_short"
        if r.decision == "keep":
            assert r.n_tokens >= 20
            assert r.diversity >= 0.3
            assert r.ppl is not None and r.ppl <= 32.0
            assert r.dup_fraction <= 0.05


def test_bpe_train_merges_match_python_reference(spark, sf_dir):
    """The distributed merge rules must equal a pure-Python greedy BPE
    reference (self-pairs excluded, count DESC / pair ASC tiebreak,
    left-to-right non-overlapping application) run on the same docs."""
    from collections import Counter

    from stock_trend_predictor_spark.plans import REGISTRY
    from stock_trend_predictor_spark.plans.text_queries import (
        BPE_TRAIN_ROUNDS,
    )

    seqs = [
        r.text.split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    expect = []
    for _ in range(BPE_TRAIN_ROUNDS):
        c = Counter()
        for t in seqs:
            for a, b in zip(t, t[1:]):
                if a != b:
                    c[(a, b)] += 1
        (l, r), cnt = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((l, r, cnt))
        merged = l + " " + r
        out = []
        for t in seqs:
            res, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == l and t[i + 1] == r:
                    res.append(merged)
                    i += 2
                else:
                    res.append(t[i])
                    i += 1
            out.append(res)
        seqs = out
    got = sorted(
        (r.rank, r.left_tok, r.right_tok, r.pair_count)
        for r in REGISTRY["bpe_train_merges"].fn(spark, sf_dir).collect()
    )
    assert got == [
        (k, l, r, c) for k, (l, r, c) in enumerate(expect)
    ]


def test_bpe_apply_vocab_compression_bounds(spark, sf_dir):
    """After-counts never exceed before-counts; every merged doc
    shrinks by exactly the number of rule applications (each merge
    removes one token), so compression is in (0, 1]."""
    from stock_trend_predictor_spark.plans import REGISTRY

    rows = REGISTRY["bpe_apply_vocab"].fn(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    assert any(r.n_tokens_after < r.n_tokens_before for r in rows)
    for r in rows:
        assert 0 < r.n_tokens_after <= r.n_tokens_before
        assert 0.0 < r.compression <= 1.0
