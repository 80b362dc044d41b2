"""Text-analysis queries over the documents table: quality scoring,
language-ID heuristic, token counting, fingerprint stats
(north-star extensions; SURVEY §7 phase 5).

All pure Catalyst expressions — split/filter/aggregate higher-order
functions, no Python UDFs — so the same plan vectorizes over a 100 TB
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import stable_round, stable_round_sql
from stock_trend_predictor_spark.functions.text import (
    BPE_PATTERN,
    LANG_MARKERS,
    hash28,
    hash60,
    hash60_sql,
    marker_score,
    marker_score_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "text_quality_stats",
        oracle=f"""
SELECT doc_id, lang, n_chars,
       length(text) AS measured_chars,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       {stable_round_sql(
           "CAST(length(replace(text, ' ', '')) AS DOUBLE)"
           " / len(string_split(text, ' '))", 6)} AS avg_token_len,
       {stable_round_sql(
           "CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)"
           " / len(string_split(text, ' '))", 6)} AS lexical_diversity,
       {stable_round_sql(marker_score_sql('text', LANG_MARKERS['en']), 6)}
         AS stopword_ratio
FROM documents
""",
        doc="Per-document quality scoring: token counts, average token "
        "length, lexical diversity (type/token ratio), stopword ratio "
        "— the standard LLM-corpus quality filters, all as codegen'd "
        "expressions.",
    )
    def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Tokenize once into a bound column; every derived stat
        # references it (inlining the split would re-tokenize per stat).
        docs = load_table(spark, sf_dir, "documents").withColumn(
            "_toks", F.split(F.col("text"), " ")
        )
        toks = F.col("_toks")
        return docs.select(
            "doc_id",
            "lang",
            "n_chars",
            F.length("text").alias("measured_chars"),
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
            stable_round(
                F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                .cast("double") / F.size(toks),
                6,
            ).alias("avg_token_len"),
            stable_round(
                F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
            ).alias("lexical_diversity"),
            stable_round(marker_score("_toks", LANG_MARKERS["en"]), 6).alias(
                "stopword_ratio"
            ),
        )

    lang_score_sql = {
        lang: marker_score_sql("text", markers)
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    # Deterministic argmax with fixed priority order (ties → first).
    best_sql = "GREATEST(" + ", ".join(f"s_{l}" for l in langs) + ")"
    case_sql = "CASE " + " ".join(
        f"WHEN s_{l} = {best_sql} THEN '{l}'" for l in langs
    ) + " END"

    @register(
        "lang_id_heuristic",
        oracle=f"""
WITH scored AS (
    SELECT doc_id, lang AS labeled_lang,
           {', '.join(f'{expr} AS s_{l}' for l, expr in lang_score_sql.items())}
    FROM documents
)
SELECT doc_id, labeled_lang,
       {case_sql} AS predicted_lang,
       {stable_round_sql(best_sql, 6)} AS best_score,
       CAST({case_sql} = labeled_lang AS INT) AS agrees
FROM scored
""",
        doc="Language-ID heuristic: per-language marker-token scores, "
        "deterministic argmax (fixed priority on ties) — the n-gram "
        "language filter of a corpus pipeline. (The synthetic corpus "
        "is English-vocab for every label, so 'agrees' measures label "
        "noise, not model quality — the mechanism is what's tested.)",
    )
    def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").withColumn(
            "_toks", F.split(F.col("text"), " ")
        )
        scored = docs.select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            *[
                marker_score("_toks", LANG_MARKERS[l]).alias(f"s_{l}")
                for l in langs
            ],
        )
        best = F.greatest(*[F.col(f"s_{l}") for l in langs])
        predicted = F.coalesce(
            *[F.when(F.col(f"s_{l}") == best, F.lit(l)) for l in langs]
        )
        return scored.select(
            "doc_id",
            "labeled_lang",
            predicted.alias("predicted_lang"),
            stable_round(best, 6).alias("best_score"),
            (predicted == F.col("labeled_lang")).cast("int").alias("agrees"),
        )

    @register(
        "token_count_bpe",
        oracle=f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens,
       len(string_split(text, ' ')) AS n_ws_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_char_est_tokens
FROM documents
""",
        doc="Token counting three ways: BPE-ish regex segmentation "
        "(letter runs / digit runs / punctuation), whitespace split, "
        "and the chars/4 estimator — the cost accounting of an LLM "
        "data pipeline.",
    )
    def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return docs.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0))).alias(
                "n_bpe_tokens"
            ),
            F.size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
            F.ceil(F.length("text") / 4.0).cast("bigint").alias("n_char_est_tokens"),
        )

    @register(
        "corpus_clean_pipeline",
        oracle=f"""
WITH quality AS (
    SELECT doc_id, lang, text,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS diversity
    FROM documents
), kept AS (
    SELECT q.* FROM quality q
    WHERE n_tokens >= 20 AND diversity >= 0.3
), keepers AS (
    SELECT md5(text) AS h, min(doc_id) AS keeper FROM kept GROUP BY md5(text)
), deduped AS (
    SELECT k.* FROM kept k JOIN keepers ON k.doc_id = keepers.keeper
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       {stable_round_sql(
           'CAST(SUM(CAST(diversity AS DECIMAL(27,6))) AS DOUBLE)'
           ' / COUNT(diversity)', 6)} AS avg_diversity
FROM deduped GROUP BY lang
""",
        doc="End-to-end corpus cleaning — the composed form of the "
        "LLM-pipeline operators: quality filter (token count + "
        "lexical diversity thresholds) -> exact dedup keeping the "
        "lowest doc_id per content hash -> per-language token "
        "accounting. One narrow pass for scoring, one digest shuffle "
        "for dedup, one rollup; text never shuffles (only digests and "
        "doc_ids move).",
    )
    def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").withColumn(
            "_toks", F.split(F.col("text"), " ")
        )
        quality = docs.select(
            "doc_id",
            "lang",
            "text",
            F.size("_toks").alias("n_tokens"),
            (
                F.size(F.array_distinct(F.col("_toks"))).cast("double")
                / F.size("_toks")
            ).alias("diversity"),
        )
        kept = quality.where(
            (F.col("n_tokens") >= 20) & (F.col("diversity") >= 0.3)
        )
        keepers = (
            kept.groupBy(F.md5("text").alias("h"))
            .agg(F.min("doc_id").alias("keeper"))
            .select("keeper")
        )
        deduped = kept.join(
            keepers, kept.doc_id == keepers.keeper, "inner"
        ).drop("keeper")
        from stock_trend_predictor_spark.functions.exact import exact_avg

        return deduped.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            stable_round(exact_avg("diversity"), 6).alias("avg_diversity"),
        )

    @register(
        "corpus_source_profile",
        oracle=f"""
SELECT source, lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       {stable_round_sql('CAST(sum(n_chars) AS DOUBLE) / count(*)', 6)}
         AS avg_chars
FROM documents
GROUP BY source, lang
""",
        doc="Corpus profiling rollup per (source, lang) — integer "
        "sums, fully order-independent.",
    )
    def corpus_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return docs.groupBy("source", "lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            stable_round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_chars"),
        )

    @register(
        "vocab_topk_tokens",
        oracle="""
SELECT token, COUNT(*) AS n_occurrences
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 50
""",
        doc="Corpus vocabulary: top-50 tokens by global frequency — the "
        "vocab-building pass of a tokenizer-training pipeline. explode "
        "shuffles (token) with map-side partial counts (bytes ~ "
        "#distinct tokens, not #tokens); the top-k is "
        "TakeOrderedAndProject (per-partition heap + driver merge of "
        "50-row heaps, never a global sort). Ties broken by token for "
        "determinism.",
    )
    def vocab_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return (
            docs.select(F.explode(F.split("text", " ")).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .orderBy(F.col("n_occurrences").desc(), "token")
            .limit(50)
        )

    @register(
        "corpus_lang_rebalance",
        oracle=f"""
WITH counts AS (
    SELECT lang, COUNT(*) AS n_before FROM documents GROUP BY lang
), sampled AS (
    SELECT d.lang
    FROM documents d JOIN counts c ON d.lang = c.lang
    WHERE {hash60_sql("'rebal:' || CAST(doc_id AS VARCHAR)")} % 1000
          < CAST(floor(least(1.0, 300.0 / c.n_before) * 1000) AS BIGINT)
)
SELECT c.lang AS lang, c.n_before AS n_before,
       CAST(floor(least(1.0, 300.0 / c.n_before) * 1000) AS BIGINT)
         AS keep_per_mille,
       COUNT(s.lang) AS n_kept
FROM counts c LEFT JOIN sampled s ON s.lang = c.lang
GROUP BY c.lang, c.n_before
""",
        doc="Language rebalancing by deterministic hash-threshold "
        "sampling: per-language keep-fraction = min(1, target/count), "
        "applied as hash(doc_id) per-mille < threshold — the same doc "
        "is kept or dropped on every run and engine (rand() sampling "
        "is partition-layout-dependent). The per-language count table "
        "BROADCASTS (one row per language); the corpus pass stays "
        "narrow. Approximate cap (hash uniformity), which is the "
        "correct 100 TB tradeoff — an exact cap needs a per-language "
        "total order (row_number), a low-cardinality-key window.",
    )
    def corpus_lang_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
        # explicit floor: Spark's double->bigint cast truncates while
        # DuckDB's rounds — floor is the one shared semantics
        threshold = F.floor(
            F.least(F.lit(1.0), F.lit(300.0) / F.col("n_before")) * 1000
        ).cast("bigint")
        bucket = (
            hash60(F.concat(F.lit("rebal:"), F.col("doc_id").cast("string")))
            % 1000
        )
        sampled = (
            docs.join(F.broadcast(counts), "lang")
            .withColumn("keep_per_mille", threshold)
            .where(bucket < F.col("keep_per_mille"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_kept"))
        )
        return (
            counts.withColumn("keep_per_mille", threshold)
            .join(sampled, "lang", "left")
            .select(
                "lang",
                "n_before",
                "keep_per_mille",
                F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            )
        )

    @register(
        "doc_token_repetition",
        oracle=f"""
WITH tc AS (
    SELECT doc_id, token, COUNT(*) AS n
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents)
    GROUP BY doc_id, token
)
SELECT doc_id,
       CAST(max(n) AS BIGINT) AS top_token_count,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       {stable_round_sql('CAST(max(n) AS DOUBLE) / sum(n)', 6)}
         AS top_token_ratio
FROM tc GROUP BY doc_id
""",
        doc="Per-document token repetition (Gopher-style quality rule: "
        "fraction of the document that is its single most frequent "
        "token). explode -> (doc_id, token) counts -> per-doc max/sum: "
        "two shuffles, both map-side combinable — shuffle 1 moves "
        "~#distinct (doc_id, token) partials (not #tokens), shuffle 2 "
        "one row per (doc_id, token). Deliberately NOT pre-partitioned "
        "by doc_id to save the second exchange: that would shuffle raw "
        "exploded tokens without combining, which is strictly more "
        "bytes on repetitive corpora. The all-expression alternative "
        "(count each distinct token via filter()) is O(distinct x "
        "tokens) per row — the explode form is the scalable idiom.",
    )
    def doc_token_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        tc = (
            docs.select(
                "doc_id", F.explode(F.split("text", " ")).alias("token")
            )
            .groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return tc.groupBy("doc_id").agg(
            F.max("n").alias("top_token_count"),
            F.sum("n").cast("bigint").alias("n_tokens"),
            stable_round(
                F.max("n").cast("double") / F.sum("n"), 6
            ).alias("top_token_ratio"),
        )

    @register(
        "sequence_packing",
        oracle="""
WITH toks AS (
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
), packed AS (
    SELECT doc_id, source, n_tokens,
           CAST(floor((sum(n_tokens) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens) / 512.0) AS BIGINT) AS block_id
    FROM toks
)
SELECT source, block_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS block_tokens
FROM packed
GROUP BY 1, 2
""",
        doc="Training-sequence packing: assign each document to a "
        "512-token training block, deterministically — block_id = "
        "floor(preceding-cumulative-tokens / 512) within (source, "
        "doc_id order), so the packing is a pure function of the data "
        "(re-partitioning cannot change it, unlike greedy bin-packing "
        "which depends on task order). A doc straddling a boundary "
        "belongs to the block its first token falls in, so blocks can "
        "overfill by at most one doc — the standard concat-then-chunk "
        "LLM pretraining layout. The per-source cumsum runs as the "
        "two-level prefix scan (operators/rank.py) over (source, "
        "doc_id-bucket) cells — a source-partitioned window would "
        "sort 1/#sources of the corpus in ONE task (r5 verdict #2).",
    )
    def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.operators.rank import (
            prefix_scan_rank,
            quantile_bucket,
        )

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        )
        packed = prefix_scan_rank(
            docs,
            quantile_bucket(docs.select("doc_id"), "doc_id"),
            ["doc_id"],
            rank_name="__rn",
            sum_col="n_tokens",
            cumsum_name="__cum",
            partition_cols=["source"],
        ).withColumn(
            "block_id",
            F.floor(
                (F.col("__cum") - F.col("n_tokens")) / 512.0
            ).cast("bigint"),
        )
        return packed.groupBy("source", "block_id").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("block_tokens"),
        )

    # deterministic uniform in (0,1] from the doc id — the md5-derived
    # randomness that makes a "random" sample reproducible and
    # oracle-checkable (same trick as dataset_split_assignment)
    _U = 1_152_921_504_606_846_976  # 2^60

    @register(
        "weighted_doc_sample",
        oracle=f"""
WITH keyed AS (
    SELECT doc_id, lang, n_chars,
           {stable_round_sql(
               "-ln((CAST(('0x' || substr(md5('samp:' || "
               "CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1.0)"
               f" / {_U + 1}.0) / n_chars", 6)} AS priority
    FROM documents
)
SELECT lang, sample_rank, doc_id, n_chars, priority FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY lang ORDER BY priority, doc_id) AS BIGINT)
      AS sample_rank
    FROM keyed
) WHERE sample_rank <= 5
""",
        doc="Weighted sampling without replacement (Efraimidis-"
        "Spirakis A-Res), distributed and DETERMINISTIC: each doc "
        "draws its uniform from an md5 hash of its id, priority = "
        "-ln(u)/weight (weight = n_chars), and the per-language top-5 "
        "by ascending priority IS a weighted sample — heavier docs "
        "win proportionally more often. Fully parallel (priority is a "
        "per-row expression, selection a per-key top-k), reproducible "
        "under any repartitioning — rand()-based sampling is neither. "
        "The top-5 runs as the bucket-pruned prefix scan "
        "(operators/rank.py, top_k=5): only the priority bucket(s) "
        "holding each language's first 5 rows are ever sorted — a "
        "lang-partitioned window would sort 1/#langs of the corpus "
        "in ONE task (r5 verdict #4). The mixture-sampling primitive "
        "for corpus blending.",
    )
    def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.operators.rank import (
            prefix_scan_rank,
            quantile_bucket,
        )

        u = (
            hash60(F.concat(F.lit("samp:"), F.col("doc_id").cast("string")))
            + F.lit(1).cast("double")
        ) / F.lit(float(_U + 1))
        keyed = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "lang",
            "n_chars",
            stable_round(-F.log(u) / F.col("n_chars"), 6).alias("priority"),
        )
        return (
            prefix_scan_rank(
                keyed,
                quantile_bucket(keyed, "priority"),
                ["priority", "doc_id"],
                rank_name="sample_rank",
                partition_cols=["lang"],
                top_k=5,
            )
            .select("lang", "sample_rank", "doc_id", "n_chars", "priority")
        )

    cond_prob_sql = stable_round_sql(
        "CAST(bigram_cnt AS DOUBLE) / CAST(prefix_cnt AS DOUBLE)", 6
    )

    pkn_sql = stable_round_sql(
        "greatest(CAST(bigram_cnt AS DOUBLE) - 0.75, 0.0)"
        " / CAST(prefix_cnt AS DOUBLE)"
        " + 0.75 / CAST(prefix_cnt AS DOUBLE)"
        " * CAST(n_followers AS DOUBLE)"
        " * (CAST(n_preceders AS DOUBLE) / CAST(n_pairs AS DOUBLE))", 6
    )

    @register(
        "token_bigram_kneser_ney",
        oracle="""
WITH bg AS (
    SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
                  i -> {'w1': string_split(text, ' ')[i],
                        'w2': string_split(text, ' ')[i + 1]}),
                  recursive := true)
    FROM documents
    WHERE len(string_split(text, ' ')) >= 2
), c AS (
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS bigram_cnt FROM bg GROUP BY w1, w2
), np AS (
    SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM c
), p AS (
    SELECT w1, w2, bigram_cnt,
           CAST(sum(bigram_cnt) OVER (PARTITION BY w1) AS BIGINT) AS prefix_cnt,
           CAST(count(*) OVER (PARTITION BY w1) AS BIGINT) AS n_followers,
           CAST(count(*) OVER (PARTITION BY w2) AS BIGINT) AS n_preceders
    FROM c
)
SELECT w1, w2, bigram_cnt, prefix_cnt, n_followers, n_preceders,
       {pkn_sql} AS p_kn
FROM p CROSS JOIN np
WHERE bigram_cnt >= 3
""".replace("{pkn_sql}", pkn_sql),
        doc="Kneser-Ney smoothed bigram probabilities (absolute "
        "discount D = 0.75) — the LM-smoothing step up from "
        "doc_bigram_perplexity's add-0.5: P_KN(w2|w1) = "
        "max(c12 - D, 0)/c1 + D/c1 * N1+(w1.) * P_cont(w2), with the "
        "continuation probability P_cont(w2) = N1+(.w2) / N1+(..) "
        "counting DISTINCT contexts, not raw frequency — the "
        "correction that stops 'Francisco' (frequent, one context) "
        "from outranking genuinely-productive words. Every statistic "
        "is a window or 1-row aggregate over the ALREADY-AGGREGATED "
        "vocabulary-sized bigram table (the corpus is tokenized "
        "once); the pair total broadcasts as a 1-row frame, keeping "
        "plan construction lazy. Integer counts make every input "
        "exact; the discount tree is mirrored literally on both "
        "engines. Support filter >= 3 applied AFTER the stats so the "
        "discounted mass is computed against the full table.",
    )
    def token_bigram_kneser_ney(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from pyspark.sql.window import Window

        docs = load_table(spark, sf_dir, "documents")
        pairs = (
            docs.select(F.split("text", " ").alias("ts"))
            .where(F.size("ts") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "if(size(ts) < 0, null, "
                        "transform(sequence(1, size(ts) - 1), "
                        "i -> struct(try_element_at(ts, i) AS w1, "
                        "try_element_at(ts, i + 1) AS w2)))"
                    )
                ).alias("bg")
            )
            .select("bg.w1", "bg.w2")
        )
        counts = pairs.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).cast("bigint").alias("bigram_cnt")
        )
        np_ = counts.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs")
        )
        w1w = Window.partitionBy("w1")
        w2w = Window.partitionBy("w2")
        stats = (
            counts.withColumn(
                "prefix_cnt",
                F.sum("bigram_cnt").over(w1w).cast("bigint"),
            )
            .withColumn(
                "n_followers", F.count(F.lit(1)).over(w1w).cast("bigint")
            )
            .withColumn(
                "n_preceders", F.count(F.lit(1)).over(w2w).cast("bigint")
            )
            .crossJoin(F.broadcast(np_))
        )
        p_kn = (
            F.greatest(
                F.col("bigram_cnt").cast("double") - F.lit(0.75),
                F.lit(0.0),
            )
            / F.col("prefix_cnt").cast("double")
            + F.lit(0.75)
            / F.col("prefix_cnt").cast("double")
            * F.col("n_followers").cast("double")
            * (
                F.col("n_preceders").cast("double")
                / F.col("n_pairs").cast("double")
            )
        )
        return stats.where(F.col("bigram_cnt") >= 3).select(
            "w1",
            "w2",
            "bigram_cnt",
            "prefix_cnt",
            "n_followers",
            "n_preceders",
            stable_round(p_kn, 6).alias("p_kn"),
        )

    @register(
        "token_bigram_condprob",
        oracle="""
WITH bg AS (
    SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
                  i -> {'w1': string_split(text, ' ')[i],
                        'w2': string_split(text, ' ')[i + 1]}),
                  recursive := true)
    FROM documents
    WHERE len(string_split(text, ' ')) >= 2
), c AS (
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS bigram_cnt FROM bg GROUP BY w1, w2
), p AS (
    SELECT w1, w2, bigram_cnt,
           CAST(sum(bigram_cnt) OVER (PARTITION BY w1) AS BIGINT) AS prefix_cnt
    FROM c
)
SELECT w1, w2, bigram_cnt, prefix_cnt,
       {cond_prob_sql} AS cond_prob
FROM p
WHERE bigram_cnt >= 3
""".replace("{cond_prob_sql}", cond_prob_sql),
        doc="Token-bigram language-model counts with conditional "
        "probability P(w2|w1) — the n-gram LM statistics a pretraining "
        "corpus pipeline derives (KenLM-style count tables). Bigrams "
        "are built WITHOUT an explode-then-self-join: transform over a "
        "1..n-1 index sequence pairs adjacent tokens inside the array "
        "(try_element_at, ANSI-safe), so the only row expansion is the "
        "single explode of already-paired structs. prefix_cnt comes "
        "from a window over the *aggregated* bigram table — vocabulary-"
        "sized, not corpus-sized. The >=3 support filter is applied "
        "after the window so conditional probabilities are computed "
        "against the full prefix mass. Integer/integer division of "
        "identical BIGINTs is the same IEEE double in both engines.",
    )
    def token_bigram_condprob(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        pairs = (
            # tokenize ONCE (bound column + double-reference guard so
            # CollapseProject cannot inline split() into the lambda —
            # same fix as minhash_signature / ngram_novelty_decay)
            docs.select(F.split("text", " ").alias("ts"))
            .where(F.size("ts") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "if(size(ts) < 0, null, "
                        "transform(sequence(1, size(ts) - 1), "
                        "i -> struct(try_element_at(ts, i) AS w1, "
                        "try_element_at(ts, i + 1) AS w2)))"
                    )
                ).alias("bg")
            )
            .select("bg.w1", "bg.w2")
        )
        from pyspark.sql.window import Window

        counts = pairs.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).cast("bigint").alias("bigram_cnt")
        )
        w_prefix = Window.partitionBy("w1")
        return (
            counts.withColumn(
                "prefix_cnt",
                F.sum("bigram_cnt").over(w_prefix).cast("bigint"),
            )
            .where(F.col("bigram_cnt") >= 3)
            .select(
                "w1",
                "w2",
                "bigram_cnt",
                "prefix_cnt",
                stable_round(
                    F.col("bigram_cnt").cast("double")
                    / F.col("prefix_cnt").cast("double"),
                    6,
                ).alias("cond_prob"),
            )
        )

    mask_rate_sql = stable_round_sql(
        "CAST(n_masked AS DOUBLE) / CAST(n_tokens AS DOUBLE)", 6
    )

    @register(
        "span_corruption_masks",
        oracle="""
WITH sized AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
), spans AS (
    SELECT doc_id, n_tokens,
           n_tokens // 20 AS n_spans,
           list_transform(range(1, CAST(n_tokens // 20 AS INTEGER) + 1),
               j -> CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                             || '#' || CAST(j AS VARCHAR)),
                                         1, 7)) AS BIGINT)
                    % (n_tokens - 2) + 1) AS starts
    FROM sized
), masked AS (
    SELECT doc_id, n_tokens, CAST(n_spans AS BIGINT) AS n_spans,
           CAST(len(list_distinct(flatten(
               list_transform(starts, s -> range(s, s + 3))))) AS BIGINT)
             AS n_masked
    FROM spans
)
SELECT doc_id, n_tokens, n_spans, n_masked,
       {mask_rate_sql} AS mask_rate
FROM masked
""".replace("{mask_rate_sql}", mask_rate_sql),
        doc="T5-style span-corruption mask planning, fully "
        "deterministic: one 3-token mask span per 20 tokens, span "
        "starts drawn from the cross-engine md5 hash of (doc_id, "
        "span_index) — reproducible across runs/engines, unlike "
        "rand(). Spans are generated, flattened, and deduplicated "
        "INSIDE the token array via higher-order functions (transform/"
        "flatten/array_distinct) — zero row expansion, pure codegen, "
        "no Python. n_masked < 3*n_spans exactly when hashed spans "
        "overlap; the oracle replays the identical arithmetic. This "
        "is the mask-schedule a denoising-pretraining data pipeline "
        "materializes per document at corpus scale.",
    )
    def span_corruption_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        n = F.size(F.split("text", " ")).cast("bigint")
        n_spans = F.expr("CAST(size(split(text, ' ')) div 20 AS BIGINT)")
        starts = F.when(
            n_spans >= 1,
            F.transform(
                F.sequence(F.lit(1).cast("bigint"), n_spans),
                lambda j: hash28(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("#"),
                        j.cast("string"),
                    )
                )
                % (n - 2)
                + 1,
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        positions = F.array_distinct(
            F.flatten(
                F.transform(starts, lambda s: F.sequence(s, s + F.lit(2)))
            )
        )
        return docs.select(
            "doc_id",
            n.alias("n_tokens"),
            n_spans.alias("n_spans"),
            F.size(positions).cast("bigint").alias("n_masked"),
            stable_round(
                F.size(positions).cast("double") / n.cast("double"), 6
            ).alias("mask_rate"),
        )

    oov_rate_sql = stable_round_sql(
        "CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)"
        " / CAST(count(*) AS DOUBLE)",
        6,
    )

    @register(
        "oov_rate_vs_vocab",
        oracle="""
WITH tok AS (
    SELECT doc_id, t AS token
    FROM documents, unnest(string_split(text, ' ')) AS u(t)
), vocab AS (
    SELECT token
    FROM (SELECT token, count(*) AS c FROM tok GROUP BY token)
    ORDER BY c DESC, token
    LIMIT 500
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       {oov_rate_sql} AS oov_rate
FROM tok
LEFT JOIN vocab v USING (token)
GROUP BY doc_id
""".replace("{oov_rate_sql}", oov_rate_sql),
        doc="Per-document out-of-vocabulary rate against a top-500 "
        "token vocabulary — the tokenizer-coverage audit a corpus "
        "pipeline runs before committing to a vocab. The vocab is "
        "derived once (deterministic (count, token) order at the "
        "cutoff) and BROADCAST to the token stream — a tokenizer "
        "vocabulary is KB-sized however big the corpus, so the join "
        "adds no shuffle; the only wide stage is the per-doc "
        "aggregation, keyed by doc_id which is already the scan "
        "order. sum(in-vocab IS NULL) is map-side combinable.",
    )
    def oov_rate_vs_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        tok = docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        vocab = (
            tok.groupBy("token")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), "token")
            .limit(500)
            .select("token", F.lit(1).alias("in_vocab"))
        )
        joined = tok.join(F.broadcast(vocab), "token", "left")
        return joined.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            stable_round(
                F.sum(
                    F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("oov_rate"),
        )

    @register(
        "bpe_pair_merge_candidates",
        oracle="""
WITH toks AS (
    SELECT string_split(text, ' ') AS t FROM documents
), pairs AS (
    SELECT unnest([{'l': t[i], 'r': t[i + 1]} FOR i IN range(1, len(t))]) AS p
    FROM toks WHERE len(t) >= 2
)
SELECT p.l AS left_tok, p.r AS right_tok, count(*) AS pair_count
FROM pairs
GROUP BY left_tok, right_tok
ORDER BY pair_count DESC, left_tok, right_tok
LIMIT 50
""",
        doc="BPE merge-step statistics: corpus-wide adjacent-pair "
        "frequencies, top-50 by count — the exact computation one "
        "round of byte-pair-encoding tokenizer training performs. "
        "Pair expansion is a transform over the bound token array (no "
        "re-tokenization per pair), the count is map-side combinable, "
        "and the top-50 is TakeOrderedAndProject with a total "
        "(count DESC, pair) order so the cutoff is deterministic.",
    )
    def bpe_pair_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").withColumn(
            "_toks", F.split("text", " ")
        )
        pairs = docs.where(F.size("_toks") >= 2).select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_toks) - 1), i -> "
                    "named_struct('l', element_at(_toks, i), "
                    "'r', element_at(_toks, i + 1)))"
                )
            ).alias("p")
        )
        return (
            pairs.groupBy(
                F.col("p.l").alias("left_tok"), F.col("p.r").alias("right_tok")
            )
            .agg(F.count(F.lit(1)).alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "left_tok", "right_tok")
            .limit(50)
        )


_register()


#: BPE training iterations for bpe_train_merges.
BPE_TRAIN_ROUNDS = 6


def _bpe_rewrite_spark(ml, mr):
    """Greedy left-to-right application of one merge rule (ml, mr) to
    the bound token array column `_toks` — pure HOF expression.

    Restricting rules to ml != mr (done at selection) makes matches
    non-overlapping BY CONSTRUCTION (the right half of a match can't
    start another), so the rewrite is positional, no sequential fold:
    a position is dropped when consumed as a right half, replaced by
    the merged token when it starts a match, kept otherwise.
    """
    return (
        f"filter(transform(sequence(1, size(_toks)), i -> "
        f"CASE WHEN i > 1 AND element_at(_toks, i - 1) = {ml}"
        f"          AND element_at(_toks, i) = {mr} THEN NULL "
        f"     WHEN element_at(_toks, i) = {ml}"
        f"          AND try_element_at(_toks, i + 1) = {mr}"
        f"       THEN concat({ml}, ' ', {mr}) "
        f"     ELSE element_at(_toks, i) END), x -> x IS NOT NULL)"
    )


def _register_bpe_train():
    from pyspark.sql import Window  # noqa: F401

    from stock_trend_predictor_spark.plans.registry import register
    from stock_trend_predictor_spark.sources.tables import materialize_once

    def _pairs_cte(t: str) -> str:
        return (
            f"SELECT p.l AS l, p.r AS r, count(*) AS c FROM ("
            f"SELECT unnest([{{'l': t[i], 'r': t[i + 1]}}"
            f" FOR i IN range(1, len(t))]) AS p"
            f" FROM {t} WHERE len(t) >= 2) GROUP BY 1, 2"
        )

    def _rewrite_cte(t: str, m: str) -> str:
        return (
            f"SELECT doc_id,"
            f" [CASE WHEN t[i] = {m}.l AND t[i + 1] = {m}.r"
            f"         THEN t[i] || ' ' || t[i + 1]"
            f"       ELSE t[i] END"
            f"  FOR i IN range(1, len(t) + 1)"
            f"  IF NOT (i > 1 AND t[i - 1] = {m}.l AND t[i] = {m}.r)] AS t"
            f" FROM {t} CROSS JOIN {m}"
        )

    def _chain_sql(rewrite_last: bool) -> list[str]:
        parts = [
            "WITH t0 AS MATERIALIZED (\n"
            "    SELECT doc_id, string_split(text, ' ') AS t FROM documents\n)"
        ]
        for k in range(BPE_TRAIN_ROUNDS):
            parts.append(
                f", p{k} AS ({_pairs_cte(f't{k}')})"
                f", m{k} AS MATERIALIZED ("
                f"SELECT l, r, c FROM p{k} WHERE l != r"
                f" ORDER BY c DESC, l, r LIMIT 1)"
            )
            if k < BPE_TRAIN_ROUNDS - 1 or rewrite_last:
                parts.append(
                    f", t{k + 1} AS MATERIALIZED "
                    f"({_rewrite_cte(f't{k}', f'm{k}')})"
                )
        return parts

    _parts = _chain_sql(rewrite_last=False)
    _parts.append(
        "\nSELECT * FROM ("
        + "\nUNION ALL\n".join(
            f"SELECT {k} AS rank, l AS left_tok, r AS right_tok,"
            f" CAST(c AS BIGINT) AS pair_count FROM m{k}"
            for k in range(BPE_TRAIN_ROUNDS)
        )
        + ")"
    )

    @register(
        "bpe_train_merges",
        oracle="".join(_parts),
        doc=f"Distributed BPE tokenizer training, {BPE_TRAIN_ROUNDS} "
        "merge rounds: count adjacent pairs corpus-wide, adopt the "
        "most frequent (count DESC, pair ASC tiebreak; self-pairs "
        "excluded so greedy application is overlap-free and "
        "positional), rewrite every document's token array with the "
        "new symbol, repeat. Per round: ONE combinable pair-count "
        "shuffle + a broadcast 1-row rule + a narrow HOF rewrite; "
        "lineage truncated per round like the PageRank loop. The "
        "oracle replays the identical rounds as chained MATERIALIZED "
        "CTEs; a Python reference implementation must agree exactly "
        "(tests/test_round3.py).",
    )
    def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
        rules, _ = _bpe_train_frames(spark, sf_dir, rewrite_last=False)
        out = rules[0]
        for r in rules[1:]:
            out = out.unionByName(r)
        return out

    def _bpe_train_frames(
        spark: SparkSession, sf_dir: str, rewrite_last: bool
    ):
        """Run the merge-adoption loop; return (per-round rule frames,
        final token-array frame)."""
        cur = materialize_once(
            load_table(spark, sf_dir, "documents").select(
                "doc_id", F.split("text", " ").alias("_toks")
            )
        )
        rules = []
        for k in range(BPE_TRAIN_ROUNDS):
            pairs = (
                cur.where(F.size("_toks") >= 2)
                .select(
                    F.explode(
                        F.expr(
                            "transform(sequence(1, size(_toks) - 1), i -> "
                            "named_struct('l', element_at(_toks, i), "
                            "'r', element_at(_toks, i + 1)))"
                        )
                    ).alias("p")
                )
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.count(F.lit(1)).alias("c"))
            )
            top = (
                pairs.where(F.col("l") != F.col("r"))
                .orderBy(F.col("c").desc(), "l", "r")
                .limit(1)
            )
            rules.append(
                top.select(
                    F.lit(k).alias("rank"),
                    F.col("l").alias("left_tok"),
                    F.col("r").alias("right_tok"),
                    F.col("c").cast("bigint").alias("pair_count"),
                )
            )
            if k < BPE_TRAIN_ROUNDS - 1 or rewrite_last:
                cur = materialize_once(
                    cur.crossJoin(
                        F.broadcast(
                            top.select(
                                F.col("l").alias("_ml"),
                                F.col("r").alias("_mr"),
                            )
                        )
                    ).select(
                        "doc_id",
                        F.expr(_bpe_rewrite_spark("_ml", "_mr")).alias(
                            "_toks"
                        ),
                    )
                )
        return rules, cur

    _apply_parts = _chain_sql(rewrite_last=True)
    _apply_parts.append(f"""
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens_before,
       CAST(len(tf.t) AS BIGINT) AS n_tokens_after,
       {stable_round_sql(
           "CAST(len(tf.t) AS DOUBLE) / len(string_split(d.text, ' '))", 6)}
         AS compression
FROM documents d JOIN t{BPE_TRAIN_ROUNDS} tf ON tf.doc_id = d.doc_id
""")

    @register(
        "bpe_apply_vocab",
        oracle="".join(_apply_parts),
        doc="Tokenizer application — the measurement half of BPE "
        "training: every document re-segmented with all "
        f"{BPE_TRAIN_ROUNDS} learned merges, reporting before/after "
        "token counts and the per-doc compression ratio (the metric "
        "that decides whether a vocab is worth shipping). Same "
        "checkpointed rewrite loop as bpe_train_merges with the final "
        "rule applied too; the join back to documents is doc_id-keyed. "
        "Oracle replays the identical chain.",
    )
    def bpe_apply_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
        _, final = _bpe_train_frames(spark, sf_dir, rewrite_last=True)
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.size(F.split("text", " ")).cast("bigint").alias(
                "n_tokens_before"
            ),
        )
        after = final.select(
            "doc_id", F.size("_toks").cast("bigint").alias("n_tokens_after")
        )
        return docs.join(after, "doc_id").select(
            "doc_id",
            "n_tokens_before",
            "n_tokens_after",
            stable_round(
                F.col("n_tokens_after").cast("double")
                / F.col("n_tokens_before"),
                6,
            ).alias("compression"),
        )


_register_bpe_train()


def _register_confusion():
    """lang-ID confusion matrix — appended round 3c."""
    from stock_trend_predictor_spark.plans.registry import register

    lang_score_sql = {
        lang: marker_score_sql("text", markers)
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best_sql = "GREATEST(" + ", ".join(f"s_{l}" for l in langs) + ")"
    case_sql = "CASE " + " ".join(
        f"WHEN s_{l} = {best_sql} THEN '{l}'" for l in langs
    ) + " END"

    @register(
        "lang_id_confusion_matrix",
        oracle=f"""
WITH scored AS (
    SELECT lang AS labeled_lang,
           {', '.join(f'{expr} AS s_{l}' for l, expr in lang_score_sql.items())}
    FROM documents
), pred AS (
    SELECT labeled_lang, {case_sql} AS predicted_lang FROM scored
), cells AS (
    SELECT labeled_lang, predicted_lang,
           CAST(count(*) AS BIGINT) AS n
    FROM pred GROUP BY 1, 2
)
SELECT labeled_lang, predicted_lang, n,
       {stable_round_sql(
           'CAST(n AS DOUBLE)'
           ' / SUM(n) OVER (PARTITION BY labeled_lang)', 6)}
           AS row_share
FROM cells
""",
        doc="Confusion matrix of the marker-token language-ID "
        "heuristic against the corpus labels: cell counts plus the "
        "per-true-language recall shares (row-normalized). The "
        "per-doc argmax is the same deterministic fixed-priority "
        "tie-break as lang_id_heuristic; the matrix collapses the "
        "per-doc verdicts into #langs^2 rows — the artifact a "
        "filtering-threshold review actually reads. Shares window "
        "over the bounded cell table.",
    )
    def lang_id_confusion_matrix(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from pyspark.sql import Window

        docs = load_table(spark, sf_dir, "documents").withColumn(
            "_toks", F.split(F.col("text"), " ")
        )
        scored = docs.select(
            F.col("lang").alias("labeled_lang"),
            *[
                marker_score("_toks", LANG_MARKERS[l]).alias(f"s_{l}")
                for l in langs
            ],
        )
        best = F.greatest(*[F.col(f"s_{l}") for l in langs])
        predicted = F.coalesce(
            *[F.when(F.col(f"s_{l}") == best, F.lit(l)) for l in langs]
        )
        cells = scored.select(
            "labeled_lang", predicted.alias("predicted_lang")
        ).groupBy("labeled_lang", "predicted_lang").agg(
            F.count(F.lit(1)).alias("n")
        )
        return cells.select(
            "labeled_lang",
            "predicted_lang",
            "n",
            stable_round(
                F.col("n").cast("double")
                / F.sum("n").over(Window.partitionBy("labeled_lang")),
                6,
            ).alias("row_share"),
        )


_register_confusion()


def _register_gopher():
    from pyspark.sql import Window

    from stock_trend_predictor_spark.plans.registry import register

    # Rae et al. 2021 (Gopher, arXiv:2112.11446) Table A1 repetition
    # thresholds: max fraction of characters in the most frequent
    # n-gram (n=2..4) / in duplicated n-grams (n=5..10).
    thresh = {
        2: 0.20, 3: 0.18, 4: 0.16,
        5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10,
    }

    def _colname(n: int) -> str:
        return f"top{n}_frac" if n <= 4 else f"dup{n}_frac"

    frac_cols_sql = ",\n       ".join(
        stable_round_sql(
            f"COALESCE(MAX(CASE WHEN f.n = {n} THEN f.chars END), 0)"
            f" / length(d.text)",
            6,
        )
        + f" AS {_colname(n)}"
        for n in range(2, 11)
    )
    keep_sql = " AND ".join(
        f"{_colname(n)} <= {th}" for n, th in thresh.items()
    )

    @register(
        "gopher_repetition_flags",
        oracle=f"""
WITH base AS (
    SELECT doc_id, string_split(text, ' ') AS p FROM documents
), occ AS (
    SELECT b.doc_id, ns.n,
           array_to_string(b.p[i.i : i.i + ns.n - 1], ' ') AS gram,
           CASE WHEN i.i = 1 THEN 0
                ELSE length(array_to_string(b.p[1 : i.i - 1], ' ')) + 1
           END AS s
    FROM base b,
         LATERAL (SELECT unnest(range(1, len(b.p) + 1)) AS i) i,
         (SELECT unnest(range(2, 11)) AS n) ns
    WHERE i.i <= len(b.p) - ns.n + 1
), occ_c AS (
    SELECT *, length(gram) AS glen,
           count(*) OVER (PARTITION BY doc_id, n, gram) AS cnt
    FROM occ
), top AS (
    SELECT doc_id, n, CAST(cnt * glen AS DOUBLE) AS chars
    FROM (SELECT DISTINCT doc_id, n, gram, glen, cnt FROM occ_c WHERE n <= 4)
    QUALIFY row_number() OVER (PARTITION BY doc_id, n
                               ORDER BY cnt DESC, glen DESC, gram) = 1
), ivl AS (
    SELECT doc_id, n, s, s + glen AS e FROM occ_c
    WHERE n >= 5 AND cnt >= 2
), brk AS (
    SELECT doc_id, n, s, e,
           CASE WHEN s > COALESCE(max(e) OVER (
                    PARTITION BY doc_id, n ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                THEN 1 ELSE 0 END AS b
    FROM ivl
), grp AS (
    SELECT doc_id, n, s, e,
           sum(b) OVER (PARTITION BY doc_id, n ORDER BY s
                        ROWS UNBOUNDED PRECEDING) AS gid
    FROM brk
), cov AS (
    SELECT doc_id, n, CAST(sum(c) AS DOUBLE) AS chars
    FROM (SELECT doc_id, n, gid, max(e) - min(s) AS c
          FROM grp GROUP BY 1, 2, 3)
    GROUP BY 1, 2
), fr AS (
    SELECT * FROM top UNION ALL SELECT * FROM cov
), raw AS (
    SELECT d.doc_id,
       {frac_cols_sql}
    FROM documents d LEFT JOIN fr f ON f.doc_id = d.doc_id
    GROUP BY d.doc_id, d.text
)
SELECT *, ({keep_sql}) AS gopher_keep FROM raw
""",
        doc="The Gopher repetition-filter battery (Rae et al. 2021, "
        "arXiv:2112.11446, Table A1) — the published pretraining "
        "quality rules doc_token_repetition's single-token ratio "
        "can't express: per document, the fraction of characters "
        "inside the MOST FREQUENT n-gram for n=2..4 (occurrences x "
        "gram length / doc chars; ties broken by count desc, gram "
        "length desc, gram asc — deterministic where the paper is "
        "silent) and the fraction of characters COVERED by any "
        "duplicated n-gram for n=5..10 (occurrence spans of grams "
        "with count >= 2, unioned per doc via the interval-merge "
        "window so overlapping occurrences never double-count — the "
        "interval_union_coverage move), plus gopher_keep = all nine "
        "fractions under the paper's thresholds (0.20/0.18/0.16; "
        "0.15..0.10). Scale shape: ONE posexplode + one doc-keyed "
        "window pass derives token char offsets (cumulative sum) and "
        "all nine gram arities (lead columns — no per-n re-shuffle); "
        "occurrence counts are a (doc, n, gram)-keyed window on "
        "high-cardinality keys; the interval merge partitions by "
        "(doc, n). Everything is codegen'd expressions — no Python "
        "in the hot path; the line-based Gopher rules (duplicate "
        "line/paragraph fractions) are omitted because the corpus "
        "has no line structure (single-line synthetic docs).",
    )
    def gopher_repetition_flags(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.length("text").cast("double").alias("tc"),
            F.split("text", " ").alias("_toks"),
        )
        toks = docs.select(
            "doc_id", "tc", F.posexplode("_toks").alias("pos", "tok")
        )
        w = Window.partitionBy("doc_id").orderBy("pos")
        wprev = w.rowsBetween(Window.unboundedPreceding, -1)
        lead_cols = [
            F.lead("tok", j).over(w).alias(f"t{j}") for j in range(1, 10)
        ]
        t = toks.select(
            "doc_id",
            "tc",
            "tok",
            F.coalesce(
                F.sum(F.length("tok") + 1).over(wprev), F.lit(0)
            ).alias("s"),
            *lead_cols,
        )
        # all nine arities from the one window pass: gram n is valid
        # while lead(tok, n-1) exists (lead nulls are suffix-
        # contiguous, so concat_ws never sees an interior null)
        grams = F.array(
            *[
                F.when(
                    F.col(f"t{n - 1}").isNotNull(),
                    F.struct(
                        F.lit(n).alias("n"),
                        F.concat_ws(
                            " ", "tok", *[f"t{j}" for j in range(1, n)]
                        ).alias("gram"),
                    ),
                )
                for n in range(2, 11)
            ]
        )
        occ = (
            t.select("doc_id", "tc", "s", F.explode(grams).alias("g"))
            .where(F.col("g").isNotNull())
            .select(
                "doc_id",
                "tc",
                "s",
                F.col("g.n").alias("n"),
                F.col("g.gram").alias("gram"),
            )
        )
        occ = occ.withColumn("glen", F.length("gram")).withColumn(
            "cnt",
            F.count(F.lit(1)).over(
                Window.partitionBy("doc_id", "n", "gram")
            ),
        )
        # most-frequent gram per (doc, n<=4): char mass = cnt x len
        wr = Window.partitionBy("doc_id", "n").orderBy(
            F.col("cnt").desc(), F.col("glen").desc(), F.col("gram")
        )
        top = (
            occ.where(F.col("n") <= 4)
            .select("doc_id", "n", "gram", "glen", "cnt")
            .distinct()
            .withColumn("rn", F.row_number().over(wr))
            .where(F.col("rn") == 1)
            .select(
                "doc_id",
                "n",
                (F.col("cnt") * F.col("glen")).cast("double").alias(
                    "chars"
                ),
            )
        )
        # duplicated-gram char coverage per (doc, n>=5): interval
        # union of occurrence spans (merge via running max of ends)
        ivl = occ.where((F.col("n") >= 5) & (F.col("cnt") >= 2)).select(
            "doc_id", "n", "s", (F.col("s") + F.col("glen")).alias("e")
        )
        wo = Window.partitionBy("doc_id", "n").orderBy("s")
        woprev = wo.rowsBetween(Window.unboundedPreceding, -1)
        cov = (
            ivl.withColumn(
                "b",
                (
                    F.col("s")
                    > F.coalesce(F.max("e").over(woprev), F.lit(-1))
                ).cast("int"),
            )
            .withColumn(
                "gid",
                F.sum("b").over(
                    wo.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
            .groupBy("doc_id", "n", "gid")
            .agg((F.max("e") - F.min("s")).alias("c"))
            .groupBy("doc_id", "n")
            .agg(F.sum("c").cast("double").alias("chars"))
        )
        fr = top.unionByName(cov)
        aggs = [
            stable_round(
                F.coalesce(
                    F.max(F.when(F.col("n") == n, F.col("chars"))),
                    F.lit(0.0),
                )
                / F.col("tc"),
                6,
            ).alias(_colname(n))
            for n in range(2, 11)
        ]
        out = (
            docs.select("doc_id", "tc")
            .join(fr, "doc_id", "left")
            .groupBy("doc_id", "tc")
            .agg(*aggs)
            .drop("tc")
        )
        keep = None
        for n, th in thresh.items():
            c = F.col(_colname(n)) <= th
            keep = c if keep is None else (keep & c)
        return out.withColumn("gopher_keep", keep)


_register_gopher()
