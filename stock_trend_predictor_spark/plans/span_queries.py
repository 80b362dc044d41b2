"""Exact repeated-span dedup over the documents table (round-3 surface).

The classic "deduplicating training data" substring pass (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better"): any
token span of length >= K that occurs more than once in the corpus is
duplicated text; overlapping/adjacent duplicated K-grams merge into
maximal spans per document. Where the reference's dedup story stops at
whole-rows (Mongo upserts keyed by timestamp,
ml_model/predict_from_vm4.py:52-57), an LLM-corpus pipeline needs the
sub-document version — these queries add it Spark-first.

Plan shape (all Catalyst expressions + windows, no Python):

1. gram expansion  — transform(sequence(...)) over the token array,
   exploded to (doc_id, pos, gram_hash) rows: linear, no self-join.
2. global dup test — one window count partitioned by the 60-bit gram
   hash: only 8-byte hashes shuffle, never gram text.
3. span merge      — gaps-and-islands per doc_id (lag + running sum),
   then groupBy island for maximal [start, end] spans.

At 100 TB the gram-hash shuffle dominates and is the same volume as
any shingle pipeline (docs x positions x 8-byte keys); everything else
is per-doc-partition window work. Skew note: a gram repeated millions
of times (boilerplate) lands one window partition with millions of
*rows of two small columns* — count-only, no collect_list, so the
partition streams; the island merge re-shuffles by doc_id which is
near-uniform.

MinHash containment (minhash_containment_pairs) complements Jaccard
LSH dedup: containment |A∩B| / min(|A|,|B|) catches doc-inside-doc
(a page embedded in a larger crawl record) that symmetric Jaccard
misses at ~0.5 thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.operators import dedup as D
from stock_trend_predictor_spark.sources.tables import load_table

#: Span gram width: spans of >= K_SPAN tokens repeated anywhere in the
#: corpus count as duplicated text (Lee et al. use 50 BPE tokens; the
#: synthetic docs average ~54 words, so 8 keeps the op meaningful).
K_SPAN = 8


def gram_positions(
    docs: DataFrame, text_col: str = "text", k: int = K_SPAN
) -> DataFrame:
    """(doc_id, pos, h) for every k-token gram of every doc. Gram
    identity is the md5-based 60-bit hash of the space-joined token
    slice — reproducible in DuckDB, and only the 8-byte hash crosses
    any exchange. Shared by the batch span-dedup pass and the
    streaming substring admission gate (streaming/admission.py)."""
    return (
        docs.withColumn("_toks", F.split(text_col, " "))
        .where(F.size("_toks") >= k)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(_toks) - {k}), i -> "
                    f"named_struct('pos', cast(i as bigint), "
                    f"'h', cast(conv(substr(md5(concat_ws(' ', "
                    f"slice(_toks, i + 1, {k}))), 1, 15), 16, 10) "
                    f"as bigint)))"
                )
            ).alias("g"),
        )
        .select("doc_id", "g.pos", "g.h")
    )


def dup_gram_positions(
    docs: DataFrame, text_col: str = "text", k: int = K_SPAN
) -> DataFrame:
    """(doc_id, pos) of every k-token gram that occurs >= 2 times
    corpus-wide."""
    grams = gram_positions(docs, text_col=text_col, k=k)
    dup = grams.withColumn(
        "_c", F.count(F.lit(1)).over(Window.partitionBy("h"))
    ).where(F.col("_c") >= 2)
    return dup.select("doc_id", "pos")


def merge_spans(dup_pos: DataFrame, k: int = K_SPAN) -> DataFrame:
    """Maximal duplicated spans per doc: overlapping or adjacent gram
    intervals [pos, pos+k-1] merge (gaps-and-islands: a new island
    starts when the position gap exceeds k)."""
    wd = Window.partitionBy("doc_id").orderBy("pos")
    isl = dup_pos.withColumn(
        "_brk",
        F.when(F.col("pos") - F.lag("pos").over(wd) > k, 1).otherwise(0),
    ).withColumn(
        "_isl",
        F.sum("_brk").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        isl.groupBy("doc_id", "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (k - 1)).alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


#: Shared oracle CTE chain ending in spans(doc_id, span_start,
#: span_end, span_tokens) — the DuckDB mirror of
#: dup_gram_positions |> merge_spans at k = K_SPAN.
_SPAN_ORACLE_CTE = f"""
toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
    SELECT doc_id,
           unnest([{{'pos': CAST(i AS BIGINT),
                     'h': CAST(('0x' || substr(md5(array_to_string(
                              t[i + 1 : i + {K_SPAN}], ' ')), 1, 15))
                           AS BIGINT)}}
                   FOR i IN range(len(t) - {K_SPAN - 1})]) AS g
    FROM toks WHERE len(t) >= {K_SPAN}
), pos_h AS (
    SELECT doc_id, g.pos AS pos, g.h AS h FROM grams
), dup AS (
    SELECT doc_id, pos FROM (
        SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS c FROM pos_h
    ) WHERE c >= 2
), gaps AS (
    SELECT doc_id, pos,
           CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                     > {K_SPAN} THEN 1 ELSE 0 END AS brk
    FROM dup
), isl AS (
    SELECT doc_id, pos,
           SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS isl
    FROM gaps
), spans AS (
    SELECT doc_id, MIN(pos) AS span_start,
           MAX(pos) + {K_SPAN - 1} AS span_end,
           MAX(pos) + {K_SPAN - 1} - MIN(pos) + 1 AS span_tokens
    FROM isl GROUP BY doc_id, isl
)
"""


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "dup_span_detection",
        oracle=f"""
WITH {_SPAN_ORACLE_CTE}
SELECT doc_id, span_start, span_end, span_tokens FROM spans
""",
        doc="Exact repeated-substring dedup (Lee et al. 2022): maximal "
        f"token spans whose every {K_SPAN}-gram occurs >= 2 times "
        "corpus-wide. Gram-hash window count (8-byte shuffle keys) + "
        "gaps-and-islands merge per doc — linear, no self-join, no "
        "Python.",
    )
    def dup_span_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return merge_spans(dup_gram_positions(docs))

    @register(
        "dup_span_doc_fraction",
        oracle=f"""
WITH {_SPAN_ORACLE_CTE},
per_doc AS (
    SELECT doc_id, SUM(span_tokens) AS dup_tokens FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       COALESCE(p.dup_tokens, 0) AS dup_tokens,
       {stable_round_sql(
           'CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)'
           " / len(string_split(d.text, ' '))", 6)} AS dup_fraction
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
""",
        doc="Per-document duplicated-token budget from the span pass: "
        "how much of each doc is corpus-duplicated text (the keep/trim"
        "/drop signal for substring-level dedup). Every doc appears, "
        "zero-filled via left join.",
    )
    def dup_span_doc_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        per_doc = (
            merge_spans(dup_gram_positions(docs))
            .groupBy("doc_id")
            .agg(F.sum("span_tokens").alias("dup_tokens"))
        )
        return (
            docs.select(
                "doc_id",
                F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
            )
            .join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                "n_tokens",
                F.coalesce("dup_tokens", F.lit(0).cast("bigint")).alias(
                    "dup_tokens"
                ),
                stable_round(
                    F.coalesce("dup_tokens", F.lit(0)).cast("double")
                    / F.col("n_tokens"),
                    6,
                ).alias("dup_fraction"),
            )
        )

    # ------------------------------------------------------------------
    # MinHash containment: doc-inside-doc near-dup on LSH candidates
    # ------------------------------------------------------------------
    sig_sql = D.minhash_signature_sql("hs")
    sig_list = ", ".join(sig_sql)
    band_keys_sql = ", ".join(
        "concat_ws('_', "
        + ", ".join(
            f"CAST(sig[{m * D.BAND_ROWS + r + 1}] AS VARCHAR)"
            for r in range(D.BAND_ROWS)
        )
        + f") AS bkey{m}"
        for m in range(D.N_BANDS)
    )
    band_union_sql = "\nUNION ALL\n".join(
        f"SELECT doc_id, {m} AS band_id, bkey{m} AS bkey FROM banded"
        for m in range(D.N_BANDS)
    )
    _CONT = (
        "CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)"
        " / least(len(a.hs), len(b.hs))"
    )

    @register(
        "minhash_containment_pairs",
        oracle=f"""
WITH shingled AS MATERIALIZED (
    SELECT doc_id, {D.shingle_hashes_sql('text')} AS hs FROM documents
), sigs AS (
    SELECT doc_id, hs, [{sig_list}] AS sig FROM shingled
), banded AS MATERIALIZED (
    SELECT doc_id, hs, sig, {band_keys_sql} FROM sigs
), bands AS (
    {band_union_sql}
), cand AS (
    SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
    FROM bands l JOIN bands r
      ON l.band_id = r.band_id AND l.bkey = r.bkey AND l.doc_id < r.doc_id
)
SELECT doc_a, doc_b, {stable_round_sql(_CONT, 6)} AS containment
FROM cand
JOIN shingled a ON a.doc_id = doc_a
JOIN shingled b ON b.doc_id = doc_b
WHERE {_CONT} >= 0.7
""",
        doc="Containment near-dup: |A∩B| / min(|A|,|B|) over shingle "
        "sets of LSH candidate pairs — catches a document embedded "
        "inside a larger one, which symmetric Jaccard under-scores. "
        "Same linear banded candidate generation as dedup_minhash_lsh "
        "(shared signature pass, 8-byte band-key shuffles).",
    )
    def minhash_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.sources.tables import (
            materialize_once,
        )

        docs = materialize_once(
            D.with_shingle_hashes(
                load_table(spark, sf_dir, "documents").repartition(
                    spark.sparkContext.defaultParallelism, "doc_id"
                )
            ).select("doc_id", "hs")
        )
        cand = D.lsh_candidate_pairs(docs)
        a = docs.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
        b = docs.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
        cont = F.size(F.array_intersect("hs_a", "hs_b")).cast(
            "double"
        ) / F.least(F.size("hs_a"), F.size("hs_b"))
        return (
            cand.join(a, "doc_a")
            .join(b, "doc_b")
            .where(cont >= 0.7)
            .select("doc_a", "doc_b", stable_round(cont, 6).alias("containment"))
        )


_register()


def _register_decision():
    from stock_trend_predictor_spark.plans.registry import REGISTRY, register

    # Compose the two heavy signal oracles as nested-WITH sub-CTEs —
    # each keeps its own scope, so inner names (toks/pairs/...) don't
    # collide; MATERIALIZED because both are referenced by the final
    # join and DuckDB inlines CTEs (see graph_queries note).
    _frac_oracle = REGISTRY["dup_span_doc_fraction"].oracle
    _ppl_oracle = REGISTRY["doc_bigram_perplexity"].oracle

    @register(
        "corpus_keep_decision",
        oracle=f"""
WITH frac AS MATERIALIZED (
{_frac_oracle}
), pplx AS MATERIALIZED (
{_ppl_oracle}
), base AS (
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS diversity,
           md5(text) AS h
    FROM documents
), keepers AS (
    SELECT h, min(doc_id) AS keeper FROM base GROUP BY h
)
SELECT b.doc_id, b.lang, CAST(b.n_tokens AS BIGINT) AS n_tokens,
       {stable_round_sql('b.diversity', 6)} AS diversity,
       f.dup_fraction,
       p.ppl,
       CASE WHEN b.n_tokens < 20 THEN 'drop_short'
            WHEN b.diversity < 0.3 THEN 'drop_low_diversity'
            WHEN b.doc_id != k.keeper THEN 'drop_exact_dup'
            WHEN coalesce(p.ppl, 0.0) > 32.0 THEN 'drop_perplexity'
            WHEN f.dup_fraction >= 0.5 THEN 'drop_dup_spans'
            WHEN f.dup_fraction > 0.05 THEN 'trim_spans'
            ELSE 'keep' END AS decision
FROM base b
JOIN keepers k USING (h)
JOIN frac f ON f.doc_id = b.doc_id
LEFT JOIN pplx p ON p.doc_id = b.doc_id
""",
        doc="The composed per-document curation verdict a training-data "
        "pipeline actually executes: quality gates (length, lexical "
        "diversity) -> exact-dup keeper election -> bigram-LM "
        "perplexity screen -> repeated-span budget, folded into one "
        "prioritized keep/trim/drop decision column. Reuses the "
        "registry's span and perplexity plans as sub-pipelines (their "
        "oracles nest as scoped sub-CTEs, MATERIALIZED against "
        "DuckDB's inlining); every doc appears exactly once, with "
        "NULL ppl only for sub-bigram docs already dropped as short. "
        "Shuffles: the md5 keeper election + the two signal joins, "
        "all keyed on doc_id/digest — text never moves.",
    )
    def corpus_keep_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
        frac = REGISTRY["dup_span_doc_fraction"].fn(spark, sf_dir).select(
            "doc_id", "dup_fraction"
        )
        ppl = REGISTRY["doc_bigram_perplexity"].fn(spark, sf_dir).select(
            "doc_id", "ppl"
        )
        docs = load_table(spark, sf_dir, "documents").withColumn(
            "_toks", F.split("text", " ")
        )
        base = docs.select(
            "doc_id",
            "lang",
            F.size("_toks").alias("n_tokens"),
            (
                F.size(F.array_distinct(F.col("_toks"))).cast("double")
                / F.size("_toks")
            ).alias("diversity"),
            F.md5("text").alias("h"),
        )
        keepers = base.groupBy("h").agg(F.min("doc_id").alias("keeper"))
        j = (
            base.join(keepers, "h")
            .join(frac, "doc_id")
            .join(ppl, "doc_id", "left")
        )
        decision = (
            F.when(F.col("n_tokens") < 20, F.lit("drop_short"))
            .when(F.col("diversity") < 0.3, F.lit("drop_low_diversity"))
            .when(F.col("doc_id") != F.col("keeper"), F.lit("drop_exact_dup"))
            .when(F.coalesce("ppl", F.lit(0.0)) > 32.0,
                  F.lit("drop_perplexity"))
            .when(F.col("dup_fraction") >= 0.5, F.lit("drop_dup_spans"))
            .when(F.col("dup_fraction") > 0.05, F.lit("trim_spans"))
            .otherwise(F.lit("keep"))
        )
        return j.select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            stable_round("diversity", 6).alias("diversity"),
            "dup_fraction",
            "ppl",
            decision.alias("decision"),
        )


_register_decision()


def _register_manifest():
    from stock_trend_predictor_spark.plans.registry import REGISTRY, register

    from stock_trend_predictor_spark.functions.text import (
        hash60,
        hash60_sql,
    )

    _ckd_oracle = REGISTRY["corpus_keep_decision"].oracle
    _split_sql = hash60_sql("CAST(d.doc_id AS VARCHAR)")

    @register(
        "pretraining_block_manifest",
        oracle=f"""
WITH ckd AS MATERIALIZED (
{_ckd_oracle}
), kept AS (
    SELECT d.doc_id, d.text,
           CASE WHEN {_split_sql} % 100 < 90 THEN 'train'
                WHEN {_split_sql} % 100 < 95 THEN 'val'
                ELSE 'test' END AS split,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
    FROM documents d
    JOIN ckd ON ckd.doc_id = d.doc_id
    WHERE ckd.decision NOT LIKE 'drop%'
), packed AS (
    SELECT split, n_tokens,
           CAST(floor((sum(n_tokens) OVER (
                    PARTITION BY split ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens) / 512.0) AS BIGINT) AS block_id
    FROM kept
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT block_id) AS BIGINT) AS n_blocks,
       {stable_round_sql(
           'CAST(sum(n_tokens) AS DOUBLE)'
           ' / (count(DISTINCT block_id) * 512.0)', 6)} AS block_fill
FROM packed GROUP BY split
""",
        doc="The end-to-end pretraining-data manifest — the capstone "
        "composition of the LLM-pipeline tier: corpus_keep_decision "
        "(quality gates + exact-dup election + perplexity screen + "
        "span budget) filters the corpus, the surviving docs get the "
        "deterministic md5-bucket train/val/test assignment "
        "(dataset_split_assignment's rule), and each split is packed "
        "into 512-token training blocks (sequence_packing's "
        "concat-then-chunk rule) — reported as one manifest row per "
        "split: docs, tokens, blocks, and mean block fill. Every "
        "stage reuses the registry plan it names, and the oracle "
        "nests corpus_keep_decision's full oracle as a MATERIALIZED "
        "sub-CTE, so the composed result is value-hash-checked end "
        "to end. Shuffles: the sub-pipeline's own (doc_id/digest "
        "keyed) + the per-(split, doc_id-bucket) prefix-scan cumsum "
        "(operators/rank.py — a split-partitioned window would put "
        "~90% of the corpus in one task) + one final aggregate; "
        "text never moves past tokenization.",
    )
    def pretraining_block_manifest(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from stock_trend_predictor_spark.operators.rank import (
            prefix_scan_rank,
            quantile_bucket,
        )

        ckd = REGISTRY["corpus_keep_decision"].fn(spark, sf_dir)
        kept_ids = ckd.where(
            ~F.col("decision").startswith("drop")
        ).select("doc_id")
        docs = load_table(spark, sf_dir, "documents").join(
            kept_ids, "doc_id", "left_semi"
        )
        bucket = hash60(F.col("doc_id").cast("string")) % 100
        # materialized once: prefix_scan_rank consumes its input TWICE
        # (bucket counts + the offsets join) — left lazy, the whole
        # corpus_keep_decision sub-pipeline above re-runs per
        # consumer. Local sf0.1 A/B is a wash (~4.4 vs ~4.6 s median
        # warm — the sub-pipeline shares scans well), but at scale a
        # guaranteed-single execution of a multi-join curation pass
        # is the only safe shape.
        from stock_trend_predictor_spark.sources.tables import (
            materialize_once,
        )

        kept = materialize_once(
            docs.select(
                "doc_id",
                F.when(bucket < 90, "train")
                .when(bucket < 95, "val")
                .otherwise("test")
                .alias("split"),
                F.size(F.split("text", " "))
                .cast("bigint")
                .alias("n_tokens"),
            )
        )
        # per-split cumsum via the two-level prefix scan — a window
        # partitioned only by split (3 values) would prefix-sum ~90%
        # of the corpus (the train split) in ONE task (r5 verdict #1).
        # Bucket cuts come from the RAW doc_id column (a pruned
        # single-column scan), not the filtered pipeline output, so
        # the expensive keep-decision never runs twice; alignment
        # holds for any subset of an order-aligned bucketing.
        cuts = quantile_bucket(
            load_table(spark, sf_dir, "documents").select("doc_id"),
            "doc_id",
        )
        packed = prefix_scan_rank(
            kept,
            cuts,
            ["doc_id"],
            rank_name="__rn",
            sum_col="n_tokens",
            cumsum_name="__cum",
            partition_cols=["split"],
        ).withColumn(
            "block_id",
            F.floor(
                (F.col("__cum") - F.col("n_tokens")) / F.lit(512.0)
            ).cast("bigint"),
        )
        return packed.groupBy("split").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.countDistinct("block_id").cast("bigint").alias("n_blocks"),
            stable_round(
                F.sum("n_tokens").cast("double")
                / (F.countDistinct("block_id") * F.lit(512.0)),
                6,
            ).alias("block_fill"),
        )


_register_manifest()



#: chunk window / stride (8-token overlap). Sized to the corpus: the
#: documents run 10-99 tokens, so a 128-token window would degenerate
#: to one partial chunk per doc; 32/24 yields 1-5 real windows each.
W_CHUNK, S_CHUNK = 32, 24


def chunk_manifest(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_id, tok_start, tok_end, n_chunk_tok, is_partial,
    chunk_hash) — the W_CHUNK-token windows on the S_CHUNK grid of
    every document, DROPPING trailing windows fully contained in
    their predecessor (a grid start s > 1 adds coverage only while
    s <= n - W + S; emitting the contained ones would pollute the
    index with sub-chunks that can never be the best retrieval hit).
    Guarantees law-tested in tests/test_rank.py: windows tile [1, n]
    exactly, neighbors overlap by exactly W - S, chunk ids are dense
    from 0, and at most the LAST window is partial. Narrow per-row
    compute; shared by the chunking query and the re-index delta."""
    toks = docs.select(
        "doc_id",
        F.split("text", " ").alias("t"),
        F.size(F.split("text", " ")).cast("bigint").alias("n"),
    )
    starts = toks.select(
        "doc_id",
        "t",
        "n",
        F.explode(F.expr(f"sequence(1L, n, {S_CHUNK}L)")).alias(
            "tok_start"
        ),
    ).where(
        (F.col("tok_start") == 1)
        | (F.col("tok_start") <= F.col("n") - W_CHUNK + S_CHUNK)
    )
    tok_end = F.least(
        F.col("tok_start") + F.lit(W_CHUNK - 1), F.col("n")
    )
    n_chunk = tok_end - F.col("tok_start") + 1
    return starts.select(
        "doc_id",
        F.expr(f"CAST((tok_start - 1) DIV {S_CHUNK} AS INT)").alias(
            "chunk_id"
        ),
        "tok_start",
        tok_end.alias("tok_end"),
        n_chunk.alias("n_chunk_tok"),
        (n_chunk < W_CHUNK).alias("is_partial"),
        F.md5(
            F.concat_ws(
                " ",
                F.expr(
                    "slice(t, CAST(tok_start AS INT), "
                    f"CAST(least(tok_start + {W_CHUNK - 1}, n) "
                    "- tok_start + 1 AS INT))"
                ),
            )
        ).alias("chunk_hash"),
    )


#: DuckDB mirror of chunk_manifest over table/CTE ``{src}`` (columns
#: doc_id, text) — ends as a SELECT, embed as a CTE body.
def _chunks_sql(src: str) -> str:
    return f"""
    SELECT doc_id,
           CAST((tok_start - 1) // {S_CHUNK} AS INT) AS chunk_id,
           tok_start,
           least(tok_start + {W_CHUNK - 1}, n) AS tok_end,
           least(tok_start + {W_CHUNK - 1}, n) - tok_start + 1
               AS n_chunk_tok,
           (least(tok_start + {W_CHUNK - 1}, n) - tok_start + 1
            < {W_CHUNK}) AS is_partial,
           md5(array_to_string(
               t[tok_start : least(tok_start + {W_CHUNK - 1}, n)], ' '
           )) AS chunk_hash
    FROM (
        SELECT doc_id, t, n,
               CAST(unnest(range(1, n + 1, {S_CHUNK})) AS BIGINT)
                   AS tok_start
        FROM (
            SELECT doc_id, string_split(text, ' ') AS t,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n
            FROM {src}
        )
    )
    WHERE tok_start = 1 OR tok_start <= n - {W_CHUNK} + {S_CHUNK}"""


def _register_r5():
    from stock_trend_predictor_spark.functions.text import hash60, hash60_sql
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "context_window_chunking",
        oracle=f"""
WITH chunks AS ({_chunks_sql('documents')})
SELECT * FROM chunks
""",
        doc=f"Overlapping context-window chunk manifest (RAG/retrieval "
        f"indexing): every document is cut into {W_CHUNK}-token windows "
        f"on a stride-{S_CHUNK} grid ({W_CHUNK - S_CHUNK}-token "
        "overlap, so no boundary-straddling passage is lost to "
        "retrieval), each chunk carrying its token range and an "
        "md5 content fingerprint for chunk-level dedup and "
        "incremental re-embedding (only chunks whose hash changed "
        "need re-encoding). A trailing partial window is kept and "
        "flagged; trailing windows fully CONTAINED in their "
        "predecessor are dropped (sub-chunks can never be the best "
        "retrieval hit — grid laws in tests/test_rank.py). Pure "
        "narrow per-row compute — the explode is n/stride per doc, "
        "text never shuffles, and the chunk_id grid is integer "
        "arithmetic identical on both engines.",
    )
    def context_window_chunking(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return chunk_manifest(docs)

    @register(
        "chunk_reindex_delta",
        oracle=f"""
WITH revised AS (
    SELECT doc_id,
           text || ' ' || array_to_string(
               string_split(text, ' ')[1 :
                   least(40, len(string_split(text, ' ')))], ' ')
               AS text
    FROM documents
), old_chunks AS ({_chunks_sql('documents')}),
new_chunks AS ({_chunks_sql('revised')}),
old_idx AS (
    SELECT DISTINCT chunk_hash FROM old_chunks
), per_doc AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count_if(chunk_hash NOT IN
                         (SELECT chunk_hash FROM old_idx)) AS BIGINT)
               AS n_embed
    FROM new_chunks GROUP BY 1
)
SELECT doc_id, n_chunks, n_embed,
       n_chunks - n_embed AS n_reused,
       {stable_round_sql(
           'CAST(n_chunks - n_embed AS DOUBLE) / n_chunks', 6)}
           AS reuse_frac
FROM per_doc
""",
        doc="Incremental re-embedding planner over the chunk index "
        "under APPEND-style document revisions (each doc grows by its "
        "own first 40 tokens — a deterministic stand-in for log/wiki "
        "growth that both engines derive identically): the new "
        "snapshot's chunks split into reusable (content hash already "
        "in the old index — the encoder is skipped) vs must-embed. "
        "Because the stride grid is anchored at token 1, appends "
        "preserve every full interior chunk — real nonzero reuse — "
        "while the trailing window genuinely re-embeds; a PREFIX "
        "edit would shift the whole grid and force full re-embedding "
        "(the documented fixed-grid limitation that content-defined "
        "chunking addresses). Chunk-level analog of "
        "dedup_incremental_batch: one shuffle of 16-byte hashes "
        "(semi join against the distinct old index); chunk text "
        "never moves. At 100 TB the old index is a bucketed table "
        "on chunk_hash and the probe is bucket-local.",
    )
    def chunk_reindex_delta(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        toks = F.split("text", " ")
        revised = docs.select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" "),
                F.concat_ws(
                    " ",
                    F.slice(
                        toks, 1, F.least(F.lit(40), F.size(toks))
                    ),
                ),
            ).alias("text"),
        )
        old_idx = (
            chunk_manifest(docs).select("chunk_hash").distinct()
        )
        newc = chunk_manifest(revised)
        hits = (
            newc.join(old_idx, "chunk_hash", "left_semi")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_reused"))
        )
        per_doc = newc.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks")
        )
        reused = F.coalesce("n_reused", F.lit(0))
        return per_doc.join(hits, "doc_id", "left").select(
            "doc_id",
            "n_chunks",
            (F.col("n_chunks") - reused).alias("n_embed"),
            reused.alias("n_reused"),
            stable_round(
                reused.cast("double") / F.col("n_chunks"), 6
            ).alias("reuse_frac"),
        )

    @register(
        "train_test_leakage_report",
        oracle=f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
    SELECT doc_id,
           unnest([{{'pos': CAST(i AS BIGINT),
                     'h': CAST(('0x' || substr(md5(array_to_string(
                              t[i + 1 : i + {K_SPAN}], ' ')), 1, 15))
                           AS BIGINT)}}
                   FOR i IN range(len(t) - {K_SPAN - 1})]) AS g
    FROM toks WHERE len(t) >= {K_SPAN}
), lab AS (
    SELECT doc_id, g.pos AS pos, g.h AS h,
           {hash60_sql('CAST(doc_id AS VARCHAR)')} % 100 AS bucket
    FROM grams
), train_h AS (
    SELECT DISTINCT h FROM lab WHERE bucket < 90
), ev AS (
    SELECT * FROM lab WHERE bucket >= 90
), tot AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS total_grams FROM ev
    GROUP BY 1
), cont AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS leaked_grams FROM ev
    WHERE h IN (SELECT h FROM train_h) GROUP BY 1
)
SELECT t.doc_id,
       CASE WHEN {hash60_sql('CAST(t.doc_id AS VARCHAR)')} % 100 < 95
            THEN 'val' ELSE 'test' END AS split,
       t.total_grams,
       COALESCE(c.leaked_grams, 0) AS leaked_grams,
       {stable_round_sql(
           'CAST(COALESCE(c.leaked_grams, 0) AS DOUBLE) / t.total_grams',
           6)} AS leak_frac,
       (COALESCE(c.leaked_grams, 0) >= 0.2 * t.total_grams) AS leaked
FROM tot t LEFT JOIN cont c ON c.doc_id = t.doc_id
""",
        doc="Train→eval contamination report over the SAME split rule "
        "the pipeline ships (dataset_split_assignment's md5 90/5/5) "
        f"and the SAME {K_SPAN}-gram fingerprints the span-dedup tier "
        "uses: for every val/test document, the fraction of its gram "
        "positions whose hash occurs in ANY train document — the "
        "eval-integrity audit (GPT-3 appendix-C style) that "
        "decontaminate_ngram_overlap runs against an EXTERNAL "
        "benchmark, turned inward on the split itself. leaked = "
        ">= 20% of positions contaminated (integer-free comparison: "
        "leaked_grams >= 0.2*total on both engines). One shuffle on "
        "the 8-byte gram hash (semi join against the distinct train "
        "gram set); documents shorter than the gram width carry no "
        "fingerprints and are excluded, as in the span tier.",
    )
    def train_test_leakage_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        g = gram_positions(docs).withColumn(
            "bucket", hash60(F.col("doc_id").cast("string")) % 100
        )
        train_h = (
            g.where(F.col("bucket") < 90).select("h").distinct()
        )
        ev = g.where(F.col("bucket") >= 90)
        tot = ev.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("total_grams")
        )
        cont = (
            ev.join(train_h, "h", "left_semi")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("leaked_grams"))
        )
        leaked_g = F.coalesce("leaked_grams", F.lit(0))
        return (
            tot.join(cont, "doc_id", "left")
            .select(
                "doc_id",
                F.when(
                    hash60(F.col("doc_id").cast("string")) % 100 < 95,
                    "val",
                )
                .otherwise("test")
                .alias("split"),
                "total_grams",
                leaked_g.alias("leaked_grams"),
                stable_round(
                    leaked_g.cast("double") / F.col("total_grams"), 6
                ).alias("leak_frac"),
                (
                    leaked_g >= F.lit(0.2) * F.col("total_grams")
                ).alias("leaked"),
            )
        )


_register_r5()


def _register_r5_retrieval():
    from stock_trend_predictor_spark.plans.registry import register

    # same fixed query-term set as bm25_doc_search, same constants
    # (k1=1.2, b=0.75, non-negative idf) — the comparison of document-
    # vs passage-granularity retrieval is only meaningful if the
    # scoring function is identical
    from stock_trend_predictor_spark.plans.summary_queries import (
        BM25_TERMS,
    )

    def _term_sql(t: str) -> str:
        return (
            f"ln((n_chunks - df_{t} + 0.5) / (df_{t} + 0.5) + 1.0)"
            f" * (tf_{t} * 2.2)"
            f" / (tf_{t} + 1.2 * (0.25 + 0.75 * dl / avgdl))"
        )

    _tf_sql = ",\n               ".join(
        f"len(list_filter(ct, x -> x = '{t}')) AS tf_{t}"
        for t in BM25_TERMS
    )
    _df_sql = ",\n           ".join(
        f"count(*) FILTER (WHERE tf_{t} > 0) AS df_{t}"
        for t in BM25_TERMS
    )
    _score_sql = " + ".join(_term_sql(t) for t in BM25_TERMS)

    @register(
        "chunk_bm25_search",
        oracle=f"""
WITH starts AS (
    SELECT doc_id, t, n,
           CAST(unnest(range(1, n + 1, {S_CHUNK})) AS BIGINT)
               AS tok_start
    FROM (
        SELECT doc_id, string_split(text, ' ') AS t,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        FROM documents
    )
), cw AS (
    SELECT doc_id,
           CAST((tok_start - 1) // {S_CHUNK} AS INT) AS chunk_id,
           least(tok_start + {W_CHUNK - 1}, n) - tok_start + 1 AS dl,
           t[tok_start : least(tok_start + {W_CHUNK - 1}, n)] AS ct
    FROM starts
    WHERE tok_start = 1 OR tok_start <= n - {W_CHUNK} + {S_CHUNK}
), tf AS (
    SELECT doc_id, chunk_id, dl,
               {_tf_sql}
    FROM cw
), s AS (
    SELECT count(*) AS n_chunks, avg(dl) AS avgdl, {_df_sql}
    FROM tf
), scored AS (
    SELECT doc_id, chunk_id,
           {stable_round_sql(_score_sql, 6)} AS bm25
    FROM tf CROSS JOIN s
), best AS (
    SELECT doc_id, chunk_id, bm25,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY bm25 DESC, chunk_id) AS rn
    FROM scored
)
SELECT doc_id, chunk_id, bm25
FROM best WHERE rn = 1
ORDER BY bm25 DESC, doc_id
LIMIT 20
""",
        doc="Passage-granularity BM25 retrieval over the chunk "
        "manifest — the RAG retrieval shape: every chunk is scored "
        "with the SAME term set and constants as bm25_doc_search "
        "(k1=1.2, b=0.75, non-negative idf; df and avgdl at CHUNK "
        "granularity), each document collapses to its best chunk "
        "(max-passage, the window is per-doc and chunk-count-bounded) "
        "and the top-20 passages come off the PRE-ROUNDED score with "
        "doc_id tiebreak so the cut is engine-exact. Per-chunk term "
        "frequencies are array_filter over the window slice — no "
        "explode, no (chunk x term) shuffle; corpus stats collapse to "
        "one broadcast row. Completes the chunk tier: chunk -> "
        "dedup/reindex (chunk_reindex_delta) -> retrieve (this).",
    )
    def chunk_bm25_search(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from stock_trend_predictor_spark.sources.tables import (
            materialize_once,
        )

        docs = load_table(spark, sf_dir, "documents")
        toks = docs.select(
            "doc_id",
            F.split("text", " ").alias("t"),
            F.size(F.split("text", " ")).cast("bigint").alias("n"),
        )
        cw = (
            toks.select(
                "doc_id",
                "t",
                "n",
                F.explode(
                    F.expr(f"sequence(1L, n, {S_CHUNK}L)")
                ).alias("tok_start"),
            )
            .where(
                (F.col("tok_start") == 1)
                | (
                    F.col("tok_start")
                    <= F.col("n") - W_CHUNK + S_CHUNK
                )
            )
            .select(
                "doc_id",
                F.expr(
                    f"CAST((tok_start - 1) DIV {S_CHUNK} AS INT)"
                ).alias("chunk_id"),
                (
                    F.least(
                        F.col("tok_start") + F.lit(W_CHUNK - 1),
                        F.col("n"),
                    )
                    - F.col("tok_start")
                    + 1
                ).alias("dl"),
                F.expr(
                    "slice(t, CAST(tok_start AS INT), "
                    f"CAST(least(tok_start + {W_CHUNK - 1}, n) "
                    "- tok_start + 1 AS INT))"
                ).alias("ct"),
            )
        )

        def _eq(term: str):
            return lambda x: x == F.lit(term)

        # tf pass feeds both the stats agg and the scoring side
        tf = materialize_once(
            cw.select(
                "doc_id",
                "chunk_id",
                "dl",
                *[
                    F.size(F.filter(F.col("ct"), _eq(t))).alias(
                        f"tf_{t}"
                    )
                    for t in BM25_TERMS
                ],
            )
        )
        stats = tf.agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.avg("dl").alias("avgdl"),
            *[
                F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(
                    f"df_{t}"
                )
                for t in BM25_TERMS
            ],
        )
        score = None
        for t in BM25_TERMS:
            tfc = F.col(f"tf_{t}")
            df = F.col(f"df_{t}")
            idf = F.log(
                (F.col("n_chunks") - df + F.lit(0.5))
                / (df + F.lit(0.5))
                + F.lit(1.0)
            )
            norm = tfc + F.lit(1.2) * (
                F.lit(0.25)
                + F.lit(0.75) * F.col("dl") / F.col("avgdl")
            )
            term = idf * (tfc * F.lit(2.2)) / norm
            score = term if score is None else score + term
        scored = tf.crossJoin(F.broadcast(stats)).select(
            "doc_id",
            "chunk_id",
            stable_round(score, 6).alias("bm25"),
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.col("bm25").desc(), F.col("chunk_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("doc_id", "chunk_id", "bm25")
            .orderBy(F.col("bm25").desc(), "doc_id")
            .limit(20)
        )


_register_r5_retrieval()
