"""Corpus privacy / quality tier: PII redaction, token-distribution
entropy, and deterministic stratified sampling.

The standard pre-training data-prep steps between raw crawl and
training shards: strip contact strings (emails / phone numbers),
score documents by unigram entropy (boilerplate and keyword-stuffed
docs have low entropy; natural text sits near the top of the range),
and draw a reproducible per-stratum sample for human eval. All pure
Catalyst expressions — regex and entropy run JVM-side in whole-stage
codegen; nothing touches the driver.

The synthetic corpus contains no real PII, so the redaction query
first APPENDS a deterministic contact trailer derived from
(doc_id, source) — clearly fixture augmentation, but the operator
under test (count + replace-all + content-hash proof) is the real
production shape. The content hash (md5-based hash60 of the redacted
text) proves byte-identical redaction output across engines, not just
matching counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.functions.text import (
    hash28,
    hash28_sql,
    hash60,
    hash60_sql,
    tokens,
)
from stock_trend_predictor_spark.sources.tables import load_table

EMAIL_PAT = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_PAT = "\\+1-555-[0-9]{4}"

#: entropy terms are summed in this decimal type: |p ln p| <= e^-1 and
#: there are <= n_tokens terms, so (27,18) is exact to the last stored
#: digit and the sum is order-independent.
ENTROPY_DECIMAL = "decimal(27,18)"

SAMPLE_PER_STRATUM = 3

#: hashing-trick feature space width
FEATURE_HASH_DIM = 64


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    # ------------------------------------------------------------------
    @register(
        "user_event_mix_entropy",
        oracle=f"""
WITH cells AS (
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
), m AS (
    SELECT user_id, event_type, c,
           CAST(SUM(c) OVER (PARTITION BY user_id) AS BIGINT) AS n
    FROM cells
)
SELECT user_id,
       CAST(any_value(n) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_types,
       {stable_round_sql(
           '-CAST(SUM(CAST((CAST(c AS DOUBLE) / n)'
           ' * ln(CAST(c AS DOUBLE) / n) AS DECIMAL(27,18)))'
           ' AS DOUBLE)', 6)} AS mix_entropy
FROM m GROUP BY 1
""",
        doc="Shannon entropy of each user's event-type mix: near-zero "
        "entropy = a single-action account (bots, scrapers, stuck "
        "clients), near-uniform = organic browsing — the behavioral "
        "twin of doc_token_entropy's text screen, and the per-USER "
        "quality gate an event pipeline runs before trusting "
        "engagement aggregates. The (user, type) contingency is one "
        "combinable aggregate; the marginal comes from a window over "
        "that 5-row-per-user cell table; p*ln(p) terms sum at "
        "decimal(27,18) (|p ln p| <= e^-1, same bound as the token "
        "entropy query).",
    )
    def user_event_mix_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        cells = ev.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("c")
        )
        m = cells.withColumn(
            "n", F.sum("c").over(Window.partitionBy("user_id"))
        )
        p = F.col("c").cast("double") / F.col("n")
        return m.groupBy("user_id").agg(
            F.any_value("n").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            stable_round(
                -F.sum((p * F.log(p)).cast(ENTROPY_DECIMAL)).cast("double"),
                6,
            ).alias("mix_entropy"),
        )

    # ------------------------------------------------------------------
    @register(
        "pii_redaction_stats",
        oracle=f"""
WITH enriched AS (
    SELECT doc_id,
           text || ' reach me at user' || CAST(doc_id AS VARCHAR)
                || '@mail-' || source || '.com or +1-555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS etext
    FROM documents
), redacted AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(etext, '{EMAIL_PAT}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(etext, '{PHONE_PAT}')) AS BIGINT)
               AS n_phones,
           regexp_replace(regexp_replace(etext, '{EMAIL_PAT}', '[EMAIL]', 'g'),
                          '{PHONE_PAT}', '[PHONE]', 'g') AS rtext
    FROM enriched
)
SELECT doc_id, n_emails, n_phones,
       CAST(length(rtext) AS BIGINT) AS redacted_len,
       {hash60_sql('rtext')} AS redacted_hash
FROM redacted
""",
        doc="PII redaction over the corpus: count email / phone "
        "matches, replace-all with typed placeholder tokens, and "
        "prove the redacted text byte-identical across engines via an "
        "md5-prefix content hash. One narrow projection pass — regex "
        "runs in codegen per document, no shuffle at all; at 100 TB "
        "this is the map-only scrub stage in front of every training "
        "shard write. (Corpus has no real PII, so a deterministic "
        "contact trailer is appended first — fixture augmentation; "
        "the redaction operator itself is production-shaped.)",
    )
    def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        etext = F.concat(
            F.col("text"),
            F.lit(" reach me at user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail-"),
            F.col("source"),
            F.lit(".com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        )
        enriched = docs.select("doc_id", etext.alias("etext"))
        rtext = F.regexp_replace(
            F.regexp_replace("etext", EMAIL_PAT, "[EMAIL]"),
            PHONE_PAT,
            "[PHONE]",
        )
        return enriched.select(
            "doc_id",
            F.regexp_count("etext", F.lit(EMAIL_PAT))
            .cast("bigint")
            .alias("n_emails"),
            F.regexp_count("etext", F.lit(PHONE_PAT))
            .cast("bigint")
            .alias("n_phones"),
            F.length(rtext).cast("bigint").alias("redacted_len"),
            hash60(rtext).alias("redacted_hash"),
        )

    # ------------------------------------------------------------------
    @register(
        "doc_token_entropy",
        oracle=f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
), counts AS (
    SELECT doc_id, token, count(*) AS c
    FROM tok GROUP BY 1, 2
), sized AS (
    SELECT doc_id, c,
           sum(c) OVER (PARTITION BY doc_id) AS n
    FROM counts
), terms AS (
    SELECT doc_id,
           CAST(max(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(CAST(
               (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               AS DECIMAL(27,18))) AS DOUBLE) AS neg_h
    FROM sized GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
       {stable_round_sql('-neg_h', 6)} AS entropy,
       {stable_round_sql('exp(-neg_h)', 4)} AS perplexity
FROM terms
""",
        doc="Unigram Shannon entropy + perplexity per document — the "
        "cheap statistical quality score (low entropy = repetitive / "
        "keyword-stuffed; near-uniform = natural). The p*ln(p) terms "
        "are each one fixed IEEE expression, then summed in "
        "decimal(27,18) so the total is order-independent across "
        "partitionings and engines. Plan: explode -> combinable "
        "count on (doc_id, token) -> per-doc window total -> "
        "combinable decimal sum; both shuffles hash on doc_id-rooted "
        "keys so AQE coalesces them at any scale.",
    )
    def doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        counts = (
            docs.select("doc_id", F.explode(tokens("text")).alias("token"))
            .groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        sized = counts.select(
            "doc_id",
            "c",
            F.sum("c").over(Window.partitionBy("doc_id")).alias("n"),
        )
        p = F.col("c").cast("double") / F.col("n").cast("double")
        terms = sized.groupBy("doc_id").agg(
            F.max("n").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.sum((p * F.log(p)).cast(ENTROPY_DECIMAL))
            .cast("double")
            .alias("neg_h"),
        )
        return terms.select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            stable_round(-F.col("neg_h"), 6).alias("entropy"),
            stable_round(F.exp(-F.col("neg_h")), 4).alias("perplexity"),
        )

    # ------------------------------------------------------------------
    @register(
        "doc_bigram_perplexity",
        oracle=f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), pairs AS (
    SELECT doc_id,
           unnest([{{'l': t[i], 'r': t[i + 1]}} FOR i IN range(1, len(t))]) AS p
    FROM toks WHERE len(t) >= 2
), pr AS MATERIALIZED (
    SELECT doc_id, p.l AS l, p.r AS r FROM pairs
), big AS MATERIALIZED (
    SELECT l, r, count(*) AS c2 FROM pr GROUP BY 1, 2
), uni AS MATERIALIZED (
    SELECT l, count(*) AS c1 FROM pr GROUP BY 1
), v AS (
    SELECT count(DISTINCT tok) AS vocab
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
), scored AS (
    SELECT pr.doc_id,
           -ln((big.c2 + 0.5) / (uni.c1 + 0.5 * v.vocab)) AS nll
    FROM pr JOIN big USING (l, r) JOIN uni USING (l) CROSS JOIN v
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       {stable_round_sql(
           'CAST(SUM(CAST(nll AS DECIMAL(27,18))) AS DOUBLE) / count(*)',
           6)} AS avg_nll,
       {stable_round_sql(
           'exp(CAST(SUM(CAST(nll AS DECIMAL(27,18))) AS DOUBLE)'
           ' / count(*))', 4)} AS ppl
FROM scored GROUP BY doc_id
""",
        doc="Per-document perplexity under the corpus's own add-0.5-"
        "smoothed bigram LM — the CCNet-style statistical quality "
        "filter (high ppl = text unlike the corpus: noise, boilerplate "
        "soup, wrong language). Each -ln P(r|l) is one fixed IEEE "
        "expression on integer counts; per-doc totals sum in "
        "decimal(27,18) so the score is partition-order independent. "
        "Plan: ONE materialized pair table feeds the bigram counts, "
        "the left-context counts, and the scoring join (3 consumers — "
        "recompute would triple the explode); the count tables join "
        "back by (l, r)/(l) hash keys, the vocab size is a broadcast "
        "scalar, and the final agg is map-side combinable on doc_id.",
    )
    def doc_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.sources.tables import (
            materialize_once,
        )

        docs = load_table(spark, sf_dir, "documents").withColumn(
            "_toks", F.split("text", " ")
        )
        pairs = materialize_once(
            docs.where(F.size("_toks") >= 2)
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(_toks) - 1), i -> "
                        "named_struct('l', element_at(_toks, i), "
                        "'r', element_at(_toks, i + 1)))"
                    )
                ).alias("p"),
            )
            .select("doc_id", "p.l", "p.r")
        )
        big = pairs.groupBy("l", "r").agg(F.count(F.lit(1)).alias("c2"))
        uni = pairs.groupBy("l").agg(F.count(F.lit(1)).alias("c1"))
        v = docs.select(F.explode("_toks").alias("tok")).agg(
            F.countDistinct("tok").alias("vocab")
        )
        nll = -F.log(
            (F.col("c2") + F.lit(0.5))
            / (F.col("c1") + F.lit(0.5) * F.col("vocab"))
        )
        scored = (
            pairs.join(big, ["l", "r"])
            .join(F.broadcast(uni), "l")
            .crossJoin(F.broadcast(v))
            .select("doc_id", nll.alias("nll"))
        )
        agg = scored.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(F.col("nll").cast(ENTROPY_DECIMAL))
            .cast("double")
            .alias("sum_nll"),
        )
        avg = F.col("sum_nll") / F.col("n_bigrams")
        return agg.select(
            "doc_id",
            "n_bigrams",
            stable_round(avg, 6).alias("avg_nll"),
            stable_round(F.exp(avg), 4).alias("ppl"),
        )

    # ------------------------------------------------------------------
    @register(
        "stratified_sample_per_stratum",
        oracle=f"""
WITH ranked AS (
    SELECT doc_id, lang, source,
           row_number() OVER (
               PARTITION BY lang, source
               ORDER BY {hash60_sql('CAST(doc_id AS VARCHAR)')}, doc_id)
               AS rn,
           count(*) OVER (PARTITION BY lang, source) AS n_stratum
    FROM documents
)
SELECT doc_id, lang, source, CAST(rn AS BIGINT) AS rn,
       CAST(n_stratum AS BIGINT) AS n_stratum
FROM ranked WHERE rn <= {SAMPLE_PER_STRATUM}
""",
        doc="Deterministic stratified sample: exactly "
        f"{SAMPLE_PER_STRATUM} docs per (lang, source) stratum, "
        "chosen by md5-hash order (reproducible across runs, engines "
        "and partitionings — unlike TABLESAMPLE / rand(), which are "
        "partition-order dependent). Runs as the bucket-pruned "
        "prefix scan (operators/rank.py, top_k) over 256 "
        "hash-prefix buckets per stratum — no per-stratum corpus "
        "sort ever lands in one task. The eval-set draw every "
        "dataset release needs.",
    )
    def stratified_sample_per_stratum(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from stock_trend_predictor_spark.operators.rank import (
            prefix_scan_rank,
        )

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source"
        )
        h = hash60(F.col("doc_id").cast("string"))
        # top 8 bits of the uniform 60-bit hash: 256 buckets, exactly
        # order-aligned with the hash sort key — no percentile pass.
        # The (lang, source)-partitioned window this replaces put a
        # whole stratum (~corpus/#strata) into one task; the prefix
        # scan sorts only each stratum's first bucket(s) (top_k
        # prune), and n_stratum comes from a strata-sized aggregate
        # instead of a second corpus-wide count window.
        ranked = prefix_scan_rank(
            docs,
            F.shiftright(h, 52).cast("int"),
            [h, "doc_id"],
            rank_name="rn",
            partition_cols=["lang", "source"],
            top_k=SAMPLE_PER_STRATUM,
        )
        sizes = docs.groupBy("lang", "source").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_stratum")
        )
        return ranked.join(F.broadcast(sizes), ["lang", "source"]).select(
            "doc_id", "lang", "source", "rn", "n_stratum"
        )

    # ------------------------------------------------------------------
    @register(
        "feature_hash_vectorize",
        oracle=f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
), bucketed AS (
    SELECT doc_id,
           {hash28_sql('token')} % {FEATURE_HASH_DIM} AS bucket,
           count(*) AS c
    FROM tok GROUP BY 1, 2
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_buckets_used,
       {stable_round_sql('sqrt(CAST(sum(c * c) AS DOUBLE))', 6)} AS l2_norm,
       string_agg(CAST(bucket AS VARCHAR) || ':' || CAST(c AS VARCHAR),
                  ' ' ORDER BY bucket) AS vec
FROM bucketed GROUP BY doc_id
""",
        doc="Hashing-trick vectorizer (FeatureHasher): token -> "
        f"md5-derived bucket in a fixed {64}-dim space, per-doc "
        "sparse counts serialized as a canonical 'bucket:count' "
        "string plus the L2 norm — the fixed-width feature map that "
        "needs NO vocabulary broadcast or fit pass, which is the "
        "point at 100 TB (a vocab dictionary is cluster-wide state; "
        "a hash is free and stateless). Two combinable aggregations "
        "on doc-rooted keys; the hash matches DuckDB's md5 exactly "
        "so the whole sparse vector value-hashes.",
    )
    def feature_hash_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        bucketed = (
            docs.select("doc_id", F.explode(tokens("text")).alias("token"))
            .groupBy(
                "doc_id",
                (hash28("token") % FEATURE_HASH_DIM).alias("bucket"),
            )
            .agg(F.count(F.lit(1)).alias("c"))
        )
        vec = F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("bucket", "c"))
                ),
                lambda s: F.concat_ws(
                    ":",
                    s["bucket"].cast("string"),
                    s["c"].cast("string"),
                ),
            ),
            " ",
        )
        return bucketed.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets_used"),
            stable_round(
                F.sqrt(F.sum(F.col("c") * F.col("c")).cast("double")), 6
            ).alias("l2_norm"),
            vec.alias("vec"),
        )


_register()
