"""Corpus-comparison statistics: chi-square token keyness, Benford
first-digit conformance, and Zipf rank-frequency fits.

A training-data curation pipeline needs more than per-document quality
scores (quality_queries) — it needs CORPUS-level distribution checks:
which tokens are over-represented in one slice vs the rest (keyness —
the standard contaminated-subcorpus detector), whether a numeric
column's digit distribution looks organic (Benford — a classic
synthetic/fabricated-data screen), and whether the token frequency
curve follows the Zipf power law natural language obeys (a corpus
whose fitted exponent is far from ~1 is boilerplate or template spam).

All three are exact-count aggregations: the only doubles are final
test statistics derived from bigint counts by a fixed tree of IEEE
ops, identical cross-engine, then stable_round()ed. No Python
anywhere; the token explode is the same whitespace split every
text-tier query shares, so at 100 TB these ride the same
map-side-combinable (token -> count) shuffle as tfidf/vocab.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table

#: chi-square validity floor: drop tokens with fewer total occurrences.
KEYNESS_MIN_COUNT = 5
#: number of keyness terms reported.
KEYNESS_TOP_K = 50
#: Zipf fit uses the top-N tokens per language by frequency.
ZIPF_TOP_N = 200
#: PMI support floor and report size.
PMI_MIN_COUNT = 5
PMI_TOP_K = 50
#: fixed phrase for the positional search demo (both tokens are in the
#: synthetic corpus vocabulary).
PHRASE_W1 = "table"
PHRASE_W2 = "scan"


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    # ------------------------------------------------------------------
    _chi2 = (
        "(ta + tb) * (a * d - b * c) * (a * d - b * c)"
        " / ((a + b) * (c + d) * ta * tb)"
    )

    @register(
        "chi2_token_keyness",
        oracle=f"""
WITH toks AS (
    SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
           unnest(string_split(text, ' ')) AS token
    FROM documents
), counts AS (
    SELECT token,
           CAST(SUM(is_en) AS BIGINT) AS en_count,
           CAST(SUM(1 - is_en) AS BIGINT) AS rest_count
    FROM toks GROUP BY 1
), totals AS (
    SELECT CAST(SUM(en_count) AS BIGINT) AS total_en,
           CAST(SUM(rest_count) AS BIGINT) AS total_rest
    FROM counts
), scored AS (
    SELECT token, en_count, rest_count,
           CAST(en_count AS DOUBLE) AS a,
           CAST(rest_count AS DOUBLE) AS b,
           CAST(total_en - en_count AS DOUBLE) AS c,
           CAST(total_rest - rest_count AS DOUBLE) AS d,
           CAST(total_en AS DOUBLE) AS ta,
           CAST(total_rest AS DOUBLE) AS tb
    FROM counts, totals
    WHERE en_count + rest_count >= {KEYNESS_MIN_COUNT}
)
SELECT token, en_count, rest_count,
       {stable_round_sql(_chi2, 6)} AS chi2
FROM scored
ORDER BY {_chi2} DESC, token
LIMIT {KEYNESS_TOP_K}
""",
        doc="Chi-square keyness: the 2x2 contingency test of each "
        "token's frequency in the English slice vs the rest of the "
        "corpus, top-50 most distinctive terms. The classic detector "
        "for a contaminated or off-distribution subcorpus before "
        "training. Exact bigint counts feed a fixed double expression "
        "(written with identical op order in both engines, so the "
        "statistic is bit-deterministic); ordering is on the "
        "unrounded statistic with the token string as total-order "
        "tiebreak. One (token -> count) combinable shuffle + a "
        "2-row totals broadcast; top-k is TakeOrderedAndProject.",
    )
    def chi2_token_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        toks = docs.select(
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
            F.explode(F.split("text", " ")).alias("token"),
        )
        counts = toks.groupBy("token").agg(
            F.sum("is_en").alias("en_count"),
            F.sum(F.lit(1) - F.col("is_en")).alias("rest_count"),
        )
        totals = counts.agg(
            F.sum("en_count").alias("total_en"),
            F.sum("rest_count").alias("total_rest"),
        )
        scored = (
            counts.where(
                F.col("en_count") + F.col("rest_count") >= KEYNESS_MIN_COUNT
            )
            .join(F.broadcast(totals))
            .withColumns(
                {
                    "a": F.col("en_count").cast("double"),
                    "b": F.col("rest_count").cast("double"),
                    "c": (F.col("total_en") - F.col("en_count")).cast("double"),
                    "d": (F.col("total_rest") - F.col("rest_count")).cast(
                        "double"
                    ),
                    "ta": F.col("total_en").cast("double"),
                    "tb": F.col("total_rest").cast("double"),
                }
            )
        )
        a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
        ta, tb = F.col("ta"), F.col("tb")
        chi2 = (
            (ta + tb)
            * (a * d - b * c)
            * (a * d - b * c)
            / ((a + b) * (c + d) * ta * tb)
        )
        return (
            scored.withColumn("_chi2", chi2)
            .orderBy(F.desc("_chi2"), "token")
            .limit(KEYNESS_TOP_K)
            .select(
                "token",
                "en_count",
                "rest_count",
                stable_round("_chi2", 6).alias("chi2"),
            )
        )

    # ------------------------------------------------------------------
    @register(
        "benford_first_digit",
        oracle=f"""
WITH digits AS (
    SELECT CAST(substr(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                            AS VARCHAR), 1, 1) AS BIGINT) AS digit
    FROM lineitem WHERE l_extendedprice > 0
), obs AS (
    SELECT digit, CAST(count(*) AS BIGINT) AS n_obs,
           CAST(SUM(count(*)) OVER () AS BIGINT) AS n_total
    FROM digits GROUP BY 1
)
SELECT digit, n_obs,
       {stable_round_sql('CAST(n_obs AS DOUBLE) / n_total', 6)} AS obs_frac,
       {stable_round_sql('ln(1.0 + 1.0 / digit) / ln(10.0)', 6)}
           AS benford_frac,
       {stable_round_sql(
           '(n_obs - n_total * (ln(1.0 + 1.0 / digit) / ln(10.0)))'
           ' * (n_obs - n_total * (ln(1.0 + 1.0 / digit) / ln(10.0)))'
           ' / (n_total * (ln(1.0 + 1.0 / digit) / ln(10.0)))', 6)}
           AS chi2_term
FROM obs
""",
        doc="Benford's-law first-digit screen on lineitem prices: "
        "observed vs expected log10(1 + 1/d) digit fractions with "
        "per-digit chi-square contributions — the standard organic-"
        "vs-fabricated numeric-data check a curation pipeline runs "
        "on ingested tabular sources. The first digit is extracted "
        "through a decimal(18,2) cast then string head, NOT "
        "floor(x/10^floor(log10 x)): decimal-to-string formatting is "
        "plain and identical cross-engine, while log10 at exact "
        "powers of ten is allowed to land a ULP low and would "
        "misclassify 1000.00 as digit 9. One 9-group combinable "
        "aggregate; nothing else shuffles.",
    )
    def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").where(
            F.col("l_extendedprice") > 0
        )
        digit = F.substring(
            F.col("l_extendedprice").cast("decimal(18,2)").cast("string"), 1, 1
        ).cast("bigint")
        obs = (
            li.select(digit.alias("digit"))
            .groupBy("digit")
            .agg(F.count(F.lit(1)).alias("n_obs"))
            .withColumn(
                "n_total", F.sum("n_obs").over(Window.partitionBy())
            )
        )
        p = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
        exp_n = F.col("n_total") * p
        dev = F.col("n_obs") - exp_n
        return obs.select(
            "digit",
            "n_obs",
            stable_round(F.col("n_obs").cast("double") / F.col("n_total"), 6)
            .alias("obs_frac"),
            stable_round(p, 6).alias("benford_frac"),
            stable_round(dev * dev / exp_n, 6).alias("chi2_term"),
        )

    # ------------------------------------------------------------------
    @register(
        "zipf_fit_per_lang",
        oracle=f"""
WITH toks AS (
    SELECT lang, unnest(string_split(text, ' ')) AS token
    FROM documents
), counts AS (
    SELECT lang, token, CAST(count(*) AS BIGINT) AS freq
    FROM toks GROUP BY 1, 2
), ranked AS (
    SELECT lang, freq,
           row_number() OVER (PARTITION BY lang
                              ORDER BY freq DESC, token) AS rank
    FROM counts
), pts AS (
    SELECT lang, ln(CAST(rank AS DOUBLE)) AS x,
           ln(CAST(freq AS DOUBLE)) AS y
    FROM ranked WHERE rank <= {ZIPF_TOP_N}
), sums AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(x AS DECIMAL(27,18))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(y AS DECIMAL(27,18))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(x * x AS DECIMAL(27,18))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(x * y AS DECIMAL(27,18))) AS DOUBLE) AS sxy
    FROM pts GROUP BY 1
)
SELECT lang, n AS n_points,
       {stable_round_sql(
           '(n * sxy - sx * sy) / (n * sxx - sx * sx)', 6)} AS zipf_slope,
       {stable_round_sql(
           '(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n',
           6)} AS intercept
FROM sums
""",
        doc="Zipf rank-frequency fit per language: OLS slope of "
        "ln(freq) vs ln(rank) over each language's top-200 tokens. "
        "Natural text fits slope ~ -1; a corpus slice whose fitted "
        "exponent is far off is template spam or boilerplate — a "
        "cheap whole-slice quality gate to run before training. "
        "Ranking uses (freq DESC, token) so the top-N cut is a total "
        "order; the regression comes from decimal-exact sufficient "
        "sums (ln values summed at (27,18)). The rank window only "
        "ever sees (lang, token, count) aggregates — per-lang "
        "vocabulary, not documents — and the slope aggregate is "
        "5 rows. Same scale shape as vocab_topk_tokens.",
    )
    def zipf_fit_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        counts = (
            docs.select(
                "lang", F.explode(F.split("text", " ")).alias("token")
            )
            .groupBy("lang", "token")
            .agg(F.count(F.lit(1)).alias("freq"))
        )
        rk = Window.partitionBy("lang").orderBy(F.desc("freq"), "token")
        pts = (
            counts.withColumn("rank", F.row_number().over(rk))
            .where(F.col("rank") <= ZIPF_TOP_N)
            .select(
                "lang",
                F.log(F.col("rank").cast("double")).alias("x"),
                F.log(F.col("freq").cast("double")).alias("y"),
            )
        )
        x, y = F.col("x"), F.col("y")
        dt = "decimal(27,18)"
        sums = pts.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x.cast(dt)).cast("double").alias("sx"),
            F.sum(y.cast(dt)).cast("double").alias("sy"),
            F.sum((x * x).cast(dt)).cast("double").alias("sxx"),
            F.sum((x * y).cast(dt)).cast("double").alias("sxy"),
        )
        n = F.col("n")
        sx, sy = F.col("sx"), F.col("sy")
        sxx, sxy = F.col("sxx"), F.col("sxy")
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        return sums.select(
            "lang",
            n.alias("n_points"),
            stable_round(slope, 6).alias("zipf_slope"),
            stable_round((sy - slope * sx) / n, 6).alias("intercept"),
        )

    # ------------------------------------------------------------------
    @register(
        "token_pmi_collocations",
        oracle=f"""
WITH bg AS (
    SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
                  i -> {{'w1': string_split(text, ' ')[i],
                        'w2': string_split(text, ' ')[i + 1]}}),
                  recursive := true)
    FROM documents
    WHERE len(string_split(text, ' ')) >= 2
), c AS (
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_cnt FROM bg GROUP BY 1, 2
), m AS (
    SELECT w1, w2, pair_cnt,
           CAST(sum(pair_cnt) OVER (PARTITION BY w1) AS BIGINT) AS w1_cnt,
           CAST(sum(pair_cnt) OVER (PARTITION BY w2) AS BIGINT) AS w2_cnt,
           CAST(sum(pair_cnt) OVER () AS BIGINT) AS total
    FROM c
), scored AS (
    SELECT w1, w2, pair_cnt, w1_cnt, w2_cnt,
           ln((CAST(pair_cnt AS DOUBLE) * total)
              / (CAST(w1_cnt AS DOUBLE) * w2_cnt))
               / (-ln(CAST(pair_cnt AS DOUBLE) / total)) AS npmi
    FROM m WHERE pair_cnt >= {PMI_MIN_COUNT}
)
SELECT w1, w2, pair_cnt, w1_cnt, w2_cnt,
       {stable_round_sql('npmi', 6)} AS npmi
FROM scored
ORDER BY npmi DESC, w1, w2
LIMIT {PMI_TOP_K}
""",
        doc="Normalized pointwise mutual information over adjacent "
        "token pairs: the standard collocation extractor ('new york'-"
        "style multiword units) a tokenizer/vocab pipeline runs before "
        "merging frequent pairs. npmi = pmi / -ln p(w1,w2) in [-1, 1]. "
        "Bigrams pair adjacent tokens INSIDE the array (transform over "
        "an index sequence, same as token_bigram_condprob — no "
        "explode-then-self-join); marginal counts come from windows "
        "over the AGGREGATED pair table, which is vocabulary^2-"
        "bounded, not corpus-sized. At 100 TB the marginals should "
        "come from two extra groupBys on the pair table (three "
        "combinable shuffles of count rows) rather than whole-table "
        "windows; at registry scale the window form keeps the plan "
        "to one pass. Both engines evaluate the identical double "
        "expression tree on identical bigint counts.",
    )
    def token_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
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
                ).alias("p")
            )
            .select("p.w1", "p.w2")
        )
        c = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_cnt"))
        # the grand total is a SCALAR: a global window here would move
        # the whole distinct-bigram table (vocabulary^2-bounded, not
        # parameter-sized) into one task just to annotate it — one
        # aggregate + broadcast instead (r5 lint: the unordered-window
        # invariant caught this site)
        tot = c.agg(F.sum("pair_cnt").alias("total"))
        m = (
            c.withColumns(
                {
                    "w1_cnt": F.sum("pair_cnt").over(
                        Window.partitionBy("w1")
                    ),
                    "w2_cnt": F.sum("pair_cnt").over(
                        Window.partitionBy("w2")
                    ),
                }
            )
            .crossJoin(F.broadcast(tot))
            .where(F.col("pair_cnt") >= PMI_MIN_COUNT)
        )
        pc = F.col("pair_cnt").cast("double")
        pmi = F.log(
            pc * F.col("total") / (F.col("w1_cnt").cast("double") * F.col("w2_cnt"))
        )
        npmi = pmi / (-F.log(pc / F.col("total")))
        return (
            m.withColumn("_npmi", npmi)
            .orderBy(F.desc("_npmi"), "w1", "w2")
            .limit(PMI_TOP_K)
            .select(
                "w1",
                "w2",
                "pair_cnt",
                "w1_cnt",
                "w2_cnt",
                stable_round("_npmi", 6).alias("npmi"),
            )
        )

    # ------------------------------------------------------------------
    @register(
        "ngram_novelty_decay",
        oracle="""
WITH grams AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                  i -> string_split(text, ' ')[i] || ' ' ||
                       string_split(text, ' ')[i + 1] || ' ' ||
                       string_split(text, ' ')[i + 2])) AS gram
    FROM documents
    WHERE len(string_split(text, ' ')) >= 3
), per_doc AS (
    SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS n_occ
    FROM grams GROUP BY 1, 2
), first_seen AS (
    SELECT doc_id, gram, n_occ,
           min(doc_id) OVER (PARTITION BY gram) AS first_doc
    FROM per_doc
)
SELECT doc_id,
       CAST(sum(n_occ) AS BIGINT) AS n_grams,
       CAST(count(*) AS BIGINT) AS n_distinct_grams,
       CAST(count(*) FILTER (WHERE first_doc = doc_id) AS BIGINT)
           AS n_novel,
       floor(CAST(count(*) FILTER (WHERE first_doc = doc_id) AS DOUBLE)
             / count(*) * 1000000.0 + 0.5) / 1000000.0 AS novelty
FROM first_seen GROUP BY 1
""",
        doc="Corpus diversity decay curve: for each document (in "
        "doc_id ingestion order), the fraction of its distinct "
        "3-grams never seen in any earlier document. A healthy "
        "training corpus decays slowly; a scrape full of templated "
        "pages collapses toward zero novelty — this is the curve "
        "data-mixture teams plot before committing a crawl snapshot. "
        "Novelty attribution is via min(doc_id) over the distinct "
        "(doc, gram) table — one combinable pre-aggregate collapses "
        "within-doc repeats BEFORE the gram-keyed shuffle, so the "
        "window input is distinct-gram-bounded. At 100 TB the "
        "min-per-gram would be a groupBy broadcast-joined back "
        "(gram keys are too hot for a single window partition only "
        "if one gram dominates; the distinct table is fine) — "
        "documented swap, same result.",
    )
    def ngram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        # Tokenize ONCE into a bound column; the if(size(ts)<0,...)
        # wrapper references ts twice so CollapseProject cannot inline
        # split() into the per-gram lambda (the minhash_signature
        # guard — without it the text re-splits 3x per gram).
        toks = docs.select("doc_id", F.split("text", " ").alias("ts")).where(
            F.size("ts") >= 3
        )
        grams = toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "if(size(ts) < 0, null, "
                    "transform(sequence(1, size(ts) - 2), "
                    "i -> concat_ws(' ', "
                    "try_element_at(ts, i), "
                    "try_element_at(ts, i + 1), "
                    "try_element_at(ts, i + 2))))"
                )
            ).alias("gram"),
        )
        per_doc = grams.groupBy("doc_id", "gram").agg(
            F.count(F.lit(1)).alias("n_occ")
        )
        first = per_doc.withColumn(
            "first_doc", F.min("doc_id").over(Window.partitionBy("gram"))
        )
        novel = F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
        return first.groupBy("doc_id").agg(
            F.sum("n_occ").alias("n_grams"),
            F.count(F.lit(1)).alias("n_distinct_grams"),
            novel.alias("n_novel"),
            stable_round(
                novel.cast("double") / F.count(F.lit(1)), 6
            ).alias("novelty"),
        )

    # ------------------------------------------------------------------
    @register(
        "phrase_search_positional",
        oracle=f"""
WITH hits AS (
    SELECT doc_id,
           list_filter(range(1, len(string_split(text, ' '))),
                       i -> string_split(text, ' ')[i] = '{PHRASE_W1}'
                            AND string_split(text, ' ')[i + 1]
                                = '{PHRASE_W2}') AS pos_list
    FROM documents
)
SELECT doc_id,
       CAST(len(pos_list) AS BIGINT) AS n_matches,
       CAST(pos_list[1] AS BIGINT) AS first_pos
FROM hits WHERE len(pos_list) > 0
""",
        doc=f"Positional phrase search for the exact phrase "
        f"'{PHRASE_W1} {PHRASE_W2}': the Spark side runs the REAL "
        "inverted-index shape — posexplode to (doc_id, pos, token) "
        "postings, filter each term's posting list, equi-join on "
        "(doc_id, pos + 1 = pos) — the positional-AND every search "
        "engine executes; only (doc_id, pos) pairs for the two terms "
        "ever shuffle, never text. The DuckDB oracle computes the "
        "same matches as a per-document array expression, so the "
        "equality also proves the index path == the scan path. At "
        "100 TB the postings would be the materialized "
        "inverted_index_postings table bucketed by token; this query "
        "is its consumption pattern.",
    )
    def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        toks = docs.select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "token"),
        )
        p1 = toks.where(F.col("token") == PHRASE_W1).select(
            "doc_id", F.col("pos").alias("pos1")
        )
        p2 = toks.where(F.col("token") == PHRASE_W2).select(
            "doc_id", F.col("pos").alias("pos2")
        )
        hits = p1.join(
            p2,
            (p1["doc_id"] == p2["doc_id"])
            & (p2["pos2"] == p1["pos1"] + F.lit(1)),
        ).select(p1["doc_id"], "pos1")
        return hits.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_matches"),
            # 1-based to match the oracle's list indexing
            (F.min("pos1") + F.lit(1)).cast("bigint").alias("first_pos"),
        )

    # ------------------------------------------------------------------
    @register(
        "lang_vocab_overlap",
        oracle=f"""
WITH counts AS (
    SELECT lang, t AS token, CAST(count(*) AS BIGINT) AS freq
    FROM documents, unnest(string_split(text, ' ')) AS u(t)
    GROUP BY 1, 2
), top AS (
    SELECT lang, token FROM (
        SELECT lang, token,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY freq DESC, token) AS rk
        FROM counts
    ) WHERE rk <= {ZIPF_TOP_N}
), sizes AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS sz FROM top GROUP BY 1
)
SELECT s1.lang AS lang_a, s2.lang AS lang_b,
       CAST(count(t1.token) AS BIGINT) AS n_shared,
       {stable_round_sql(
           'CAST(count(t1.token) AS DOUBLE)'
           ' / (any_value(s1.sz) + any_value(s2.sz) - count(t1.token))',
           6)} AS jaccard
FROM sizes s1
JOIN sizes s2 ON s2.lang > s1.lang
LEFT JOIN (
    SELECT a.lang AS la, b.lang AS lb, a.token
    FROM top a JOIN top b ON b.token = a.token AND b.lang > a.lang
) t1 ON t1.la = s1.lang AND t1.lb = s2.lang
GROUP BY 1, 2
""",
        doc=f"Vocabulary overlap between language slices: Jaccard of "
        f"each language pair's top-{ZIPF_TOP_N} token sets. High "
        "overlap between supposedly-different languages = the "
        "language labels are wrong or the corpus is template spam — "
        "a cheap cross-slice audit before trusting lang-conditioned "
        "sampling (corpus_lang_rebalance). The top-N cut is the same "
        "(freq DESC, token) total order as zipf_fit_per_lang; the "
        "pair join runs on lang-pair x N rows — vocabulary-bounded. "
        "Jaccard uses the exact set sizes (a slice with under N "
        "distinct tokens contributes its true size).",
    )
    def lang_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        counts = (
            docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
            .groupBy("lang", "token")
            .agg(F.count(F.lit(1)).alias("freq"))
        )
        rk = Window.partitionBy("lang").orderBy(F.desc("freq"), "token")
        top = (
            counts.withColumn("rk", F.row_number().over(rk))
            .where(F.col("rk") <= ZIPF_TOP_N)
            .select("lang", "token")
        )
        sizes = top.groupBy("lang").agg(F.count(F.lit(1)).alias("sz"))
        pairs = (
            sizes.select(
                F.col("lang").alias("lang_a"), F.col("sz").alias("sz_a")
            )
            .join(
                sizes.select(
                    F.col("lang").alias("lang_b"), F.col("sz").alias("sz_b")
                )
            )
            .where(F.col("lang_b") > F.col("lang_a"))
        )
        shared = (
            top.alias("a")
            .join(
                top.alias("b"),
                (F.col("b.token") == F.col("a.token"))
                & (F.col("b.lang") > F.col("a.lang")),
            )
            .select(
                F.col("a.lang").alias("lang_a"),
                F.col("b.lang").alias("lang_b"),
                F.col("a.token").alias("token"),
            )
        )
        n_sh = F.count("token")
        return (
            pairs.join(shared, ["lang_a", "lang_b"], "left")
            .groupBy("lang_a", "lang_b")
            .agg(
                n_sh.alias("n_shared"),
                stable_round(
                    n_sh.cast("double")
                    / (
                        F.any_value("sz_a") + F.any_value("sz_b") - n_sh
                    ),
                    6,
                ).alias("jaccard"),
            )
        )

    # ------------------------------------------------------------------
    @register(
        "token_burstiness",
        oracle=f"""
WITH per_doc AS (
    SELECT doc_id, t AS token, CAST(count(*) AS BIGINT) AS n_occ
    FROM documents, unnest(string_split(text, ' ')) AS u(t)
    GROUP BY 1, 2
), stats AS (
    SELECT token,
           CAST(SUM(n_occ) AS BIGINT) AS cf,
           CAST(count(*) AS BIGINT) AS df
    FROM per_doc GROUP BY 1
)
SELECT token, cf, df,
       {stable_round_sql('CAST(cf AS DOUBLE) / df', 6)} AS burstiness
FROM stats WHERE cf >= 20
ORDER BY CAST(cf AS DOUBLE) / df DESC, token
LIMIT 50
""",
        doc="Token burstiness (Church/Gale): collection frequency "
        "over document frequency — the mean occurrences per "
        "CONTAINING document. Bursty tokens (high cf/df) concentrate "
        "in few documents: the signature of boilerplate, templates, "
        "and topic-specific jargon, and the reason pure-frequency "
        "vocab cuts mislead. One (doc, token) pre-aggregate collapses "
        "within-doc repeats before the token shuffle (distinct-"
        "bounded, same shape as ngram_novelty_decay); the top-50 cut "
        "orders on the unrounded ratio with the token tiebreak.",
    )
    def token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        per_doc = (
            docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
            .groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("n_occ"))
        )
        stats = per_doc.groupBy("token").agg(
            F.sum("n_occ").alias("cf"),
            F.count(F.lit(1)).alias("df"),
        )
        ratio = F.col("cf").cast("double") / F.col("df")
        return (
            stats.where(F.col("cf") >= 20)
            .orderBy(ratio.desc(), "token")
            .limit(50)
            .select(
                "token",
                "cf",
                "df",
                stable_round(ratio, 6).alias("burstiness"),
            )
        )

    # ------------------------------------------------------------------
    @register(
        "template_prefix_groups",
        oracle="""
WITH pref AS (
    SELECT doc_id,
           md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS h,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents
    WHERE len(string_split(text, ' ')) >= 8
)
SELECT h AS prefix_hash,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS first_doc,
       CAST(min(n_tokens) AS BIGINT) AS min_tokens,
       CAST(max(n_tokens) AS BIGINT) AS max_tokens
FROM pref GROUP BY 1 HAVING count(*) >= 2
""",
        doc="Template detection by shared 8-token prefix: web scrapes "
        "and generated corpora carry families of documents that open "
        "identically (navigation chrome, boilerplate headers) but "
        "diverge later — exact dedup misses them, near-dup dedup "
        "pays full signatures for them. This is the cheap first "
        "screen: md5 of the first 8 tokens, groups of >= 2. Only "
        "16-byte digests shuffle; the doc scan is one narrow pass. "
        "A curation pipeline routes flagged groups into the span/"
        "minhash passes rather than treating them as independent.",
    )
    def template_prefix_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").withColumn(
            "_toks", F.split("text", " ")
        )
        pref = docs.where(F.size("_toks") >= 8).select(
            "doc_id",
            F.md5(F.array_join(F.slice("_toks", 1, 8), " ")).alias("h"),
            F.size("_toks").alias("n_tokens"),
        )
        return (
            pref.groupBy(F.col("h").alias("prefix_hash"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.min("doc_id").alias("first_doc"),
                F.min("n_tokens").cast("bigint").alias("min_tokens"),
                F.max("n_tokens").cast("bigint").alias("max_tokens"),
            )
            .where(F.col("n_docs") >= 2)
        )

    # ------------------------------------------------------------------
    @register(
        "doc_length_percentiles",
        oracle=f"""
WITH lens AS (
    SELECT lang, CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens
    FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       {stable_round_sql(
           'CAST(SUM(CAST(n_tokens AS DECIMAL(27,6))) AS DOUBLE)'
           ' / count(*)', 6)} AS mean_tokens,
       {stable_round_sql('quantile_cont(n_tokens, 0.1)', 6)} AS p10,
       {stable_round_sql('quantile_cont(n_tokens, 0.5)', 6)} AS p50,
       {stable_round_sql('quantile_cont(n_tokens, 0.9)', 6)} AS p90
FROM lens GROUP BY 1
""",
        doc="Document-length distribution per language slice: exact "
        "interpolated p10/p50/p90 of whitespace token counts plus "
        "the decimal-exact mean — the length-audit every mixture "
        "decision consults (truncation budgets, packing efficiency, "
        "short-doc filters are all set off this table). Interpolated "
        "percentile parity (Spark percentile == DuckDB quantile_cont) "
        "is the same contract feature_decile_binning and the banded "
        "Theil-Sen already hold hash-green.",
    )
    def doc_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        lens = docs.select(
            "lang",
            F.size(F.split("text", " ")).cast("double").alias("n_tokens"),
        )
        return lens.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            stable_round(
                F.sum(F.col("n_tokens").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_tokens"),
            stable_round(F.percentile("n_tokens", F.lit(0.1)), 6).alias("p10"),
            stable_round(F.percentile("n_tokens", F.lit(0.5)), 6).alias("p50"),
            stable_round(F.percentile("n_tokens", F.lit(0.9)), 6).alias("p90"),
        )

    # ------------------------------------------------------------------
    @register(
        "vocab_drift_halves",
        oracle=f"""
WITH cut AS (
    SELECT quantile_cont(CAST(doc_id AS DOUBLE), 0.5) AS mid FROM documents
), halves AS (
    SELECT CASE WHEN d.doc_id <= c.mid THEN 'first' ELSE 'second' END
               AS half,
           t AS token
    FROM documents d CROSS JOIN cut c,
         unnest(string_split(d.text, ' ')) AS u(t)
), counts AS (
    SELECT half, token, CAST(count(*) AS BIGINT) AS freq
    FROM halves GROUP BY 1, 2
), top AS (
    SELECT half, token FROM (
        SELECT half, token,
               row_number() OVER (PARTITION BY half
                                  ORDER BY freq DESC, token) AS rk
        FROM counts
    ) WHERE rk <= {ZIPF_TOP_N}
), sizes AS (
    SELECT half, CAST(count(*) AS BIGINT) AS sz FROM top GROUP BY 1
)
SELECT CAST(any_value(s1.sz) AS BIGINT) AS n_top_first,
       CAST(any_value(s2.sz) AS BIGINT) AS n_top_second,
       CAST(count(sh.token) AS BIGINT) AS n_shared,
       {stable_round_sql(
           'CAST(count(sh.token) AS DOUBLE)'
           ' / (any_value(s1.sz) + any_value(s2.sz) - count(sh.token))',
           6)} AS jaccard
FROM (SELECT sz FROM sizes WHERE half = 'first') s1
CROSS JOIN (SELECT sz FROM sizes WHERE half = 'second') s2
LEFT JOIN (
    SELECT a.token
    FROM top a JOIN top b
      ON b.token = a.token AND a.half = 'first' AND b.half = 'second'
) sh ON TRUE
""",
        doc=f"Corpus drift between ingestion halves: Jaccard of the "
        f"top-{ZIPF_TOP_N} token sets of the first vs second half of "
        "the corpus (split at the doc_id median). A crawl whose "
        "vocabulary shifts sharply between halves changed source "
        "mix mid-snapshot — the temporal twin of lang_vocab_overlap "
        "and the trigger for re-running the mixture queries on the "
        "halves separately. Same vocabulary-bounded top-N machinery; "
        "the median cut is one broadcast scalar.",
    )
    def vocab_drift_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        cut = docs.agg(
            F.percentile(F.col("doc_id").cast("double"), F.lit(0.5)).alias(
                "mid"
            )
        )
        halves = docs.crossJoin(F.broadcast(cut)).select(
            F.when(F.col("doc_id") <= F.col("mid"), "first")
            .otherwise("second")
            .alias("half"),
            F.explode(F.split("text", " ")).alias("token"),
        )
        counts = halves.groupBy("half", "token").agg(
            F.count(F.lit(1)).alias("freq")
        )
        rk = Window.partitionBy("half").orderBy(F.desc("freq"), "token")
        top = (
            counts.withColumn("rk", F.row_number().over(rk))
            .where(F.col("rk") <= ZIPF_TOP_N)
            .select("half", "token")
        )
        sizes = top.groupBy("half").agg(F.count(F.lit(1)).alias("sz"))
        s1 = sizes.where(F.col("half") == "first").select(
            F.col("sz").alias("sz_first")
        )
        s2 = sizes.where(F.col("half") == "second").select(
            F.col("sz").alias("sz_second")
        )
        shared = (
            top.alias("a")
            .join(
                top.alias("b"),
                (F.col("b.token") == F.col("a.token"))
                & (F.col("a.half") == "first")
                & (F.col("b.half") == "second"),
            )
            .select(F.col("a.token").alias("token"))
        )
        n_sh = F.count("token")
        return (
            s1.crossJoin(s2)
            .join(shared, F.lit(True), "left")
            .groupBy()
            .agg(
                F.any_value("sz_first").cast("bigint").alias("n_top_first"),
                F.any_value("sz_second").cast("bigint").alias("n_top_second"),
                n_sh.alias("n_shared"),
                stable_round(
                    n_sh.cast("double")
                    / (
                        F.any_value("sz_first")
                        + F.any_value("sz_second")
                        - n_sh
                    ),
                    6,
                ).alias("jaccard"),
            )
        )


_register()


def _register_r5():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "token_kl_drift",
        oracle=f"""
WITH tok AS (
    SELECT source, unnest(string_split(text, ' ')) AS token
    FROM documents
), st AS (
    SELECT source, token, CAST(count(*) AS BIGINT) AS c
    FROM tok GROUP BY 1, 2
), ct AS (
    SELECT token, CAST(SUM(c) AS BIGINT) AS c_t FROM st GROUP BY 1
), consts AS (
    SELECT CAST(count(*) AS BIGINT) AS v,
           CAST(SUM(c_t) AS BIGINT) AS n FROM ct
), srcs AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM st GROUP BY 1
), ndocs AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
), grid AS (
    SELECT s.source, s.n_s, v.token, v.c_t, k.v, k.n,
           COALESCE(st.c, 0) AS c
    FROM srcs s
    CROSS JOIN ct v
    CROSS JOIN consts k
    LEFT JOIN st ON st.source = s.source AND st.token = v.token
), terms AS (
    SELECT source, n_s, token,
           (CAST(c + 1 AS DOUBLE) / CAST(n_s + v AS DOUBLE))
           * ln((CAST(c + 1 AS DOUBLE) / CAST(n_s + v AS DOUBLE))
                / (CAST(c_t + 1 AS DOUBLE) / CAST(n + v AS DOUBLE)))
               AS term
    FROM grid
), ranked AS (
    SELECT source, n_s, token, term,
           row_number() OVER (PARTITION BY source
                              ORDER BY term DESC, token) AS rn
    FROM terms
), agg AS (
    SELECT source, any_value(n_s) AS n_tokens,
           CAST(SUM(CAST(term AS DECIMAL(38,18))) AS DOUBLE) AS kl
    FROM terms GROUP BY 1
)
SELECT a.source, d.n_docs, a.n_tokens,
       {stable_round_sql('a.kl', 6)} AS kl_nats,
       r.token AS top_token,
       {stable_round_sql('r.term', 6)} AS top_token_kl
FROM agg a
JOIN ndocs d ON d.source = a.source
JOIN ranked r ON r.source = a.source AND r.rn = 1
""",
        doc="Per-source unigram KL drift monitor — the corpus-slice "
        "distribution check an LLM-data pipeline runs when a new "
        "crawl/source lands: KL(P_source || P_corpus) with add-one "
        "smoothing over the shared vocabulary, plus the single most "
        "over-represented token per source (the usual smoking gun "
        "for template spam or a mis-tagged crawl). Every term is a "
        "fixed IEEE tree on exact bigint counts (bit-identical "
        "cross-engine) and the vocab-sized term sum accumulates in "
        "DECIMAL(38,18), so kl_nats is partition-order independent. "
        "Scale shape: one (source, token) combinable agg; the grid "
        "is vocabulary x #sources (vocab-bounded, never corpus-"
        "bounded); the only windows are per-source over that grid.",
    )
    def token_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        tok = docs.select(
            "source", F.explode(F.split("text", " ")).alias("token")
        )
        st = tok.groupBy("source", "token").agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        ct = st.groupBy("token").agg(
            F.sum("c").cast("bigint").alias("c_t")
        )
        consts = ct.agg(
            F.count(F.lit(1)).cast("bigint").alias("v"),
            F.sum("c_t").cast("bigint").alias("n"),
        )
        srcs = st.groupBy("source").agg(
            F.sum("c").cast("bigint").alias("n_s")
        )
        ndocs = docs.groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs")
        )
        grid = (
            F.broadcast(srcs)
            .crossJoin(ct)
            .crossJoin(F.broadcast(consts))
            .join(st, ["source", "token"], "left")
            .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        )
        ps = (F.col("c") + 1).cast("double") / (
            F.col("n_s") + F.col("v")
        ).cast("double")
        pc = (F.col("c_t") + 1).cast("double") / (
            F.col("n") + F.col("v")
        ).cast("double")
        terms = grid.select(
            "source", "n_s", "token", (ps * F.log(ps / pc)).alias("term")
        )
        ranked = terms.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("term").desc(), "token"
                )
            ),
        ).where(F.col("rn") == 1)
        agg = terms.groupBy("source").agg(
            F.any_value("n_s").alias("n_tokens"),
            F.sum(F.col("term").cast("decimal(38,18)"))
            .cast("double")
            .alias("kl"),
        )
        return (
            agg.join(F.broadcast(ndocs), "source")
            .join(
                F.broadcast(
                    ranked.select(
                        "source",
                        F.col("token").alias("top_token"),
                        F.col("term").alias("top_term"),
                    )
                ),
                "source",
            )
            .select(
                "source",
                "n_docs",
                "n_tokens",
                stable_round(F.col("kl"), 6).alias("kl_nats"),
                "top_token",
                stable_round(F.col("top_term"), 6).alias("top_token_kl"),
            )
        )


_register_r5()
