"""Token-level text classification and readability profiling.

Two corpus-pipeline operators the reference's single-table world never
reaches but a training-data curation pass runs constantly:

- ``nb_lang_classifier`` — a multinomial naive-Bayes language
  classifier trained ON the corpus (even doc_ids) and evaluated on the
  held-out half (odd doc_ids), reporting per-language accuracy. The
  whole lifecycle — count, smooth, score, argmax, evaluate — is four
  hash aggregates and one broadcast-sized model join; no Python ever
  touches a token.
- ``forcast_readability`` — FORCAST readability per language from a
  vowel-group syllable heuristic. FORCAST is the standard formula for
  text WITHOUT sentence punctuation (grade = 20 - 15 * monosyllabic
  fraction), which is exactly what the synthetic corpus is.

Determinism contract: NB scores are sums of per-token log-probs cast
to DECIMAL(38,18) — order-independent and compared exactly, so the
argmax (tie-broken by candidate language name) is partitioning-proof
and engine-reproducible. Readability is integer counts until the final
rounded ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import (
    load_table,
    materialize_once,
)

#: NB Laplace smoothing pseudo-count.
NB_ALPHA = 1.0


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "nb_lang_classifier",
        oracle=f"""
WITH tr AS (
    SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 0
), te AS (
    SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 1
), tok_tr AS (
    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM tr
), cnt AS (
    SELECT lang, tok, CAST(count(*) AS BIGINT) AS n_lt
    FROM tok_tr GROUP BY 1, 2
), tot AS (
    SELECT lang, CAST(SUM(n_lt) AS BIGINT) AS n_l FROM cnt GROUP BY 1
), vocab AS (
    SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM cnt
), prior AS (
    SELECT lang,
           ln(CAST(count(*) AS DOUBLE)
              / (SELECT count(*) FROM tr)) AS lp_prior
    FROM tr GROUP BY lang
), model AS (
    SELECT c.lang, c.tok,
           ln((c.n_lt + {NB_ALPHA}) / (t.n_l + {NB_ALPHA} * v.v)) AS lp
    FROM cnt c JOIN tot t ON t.lang = c.lang CROSS JOIN vocab v
), defaults AS (
    SELECT t.lang,
           ln({NB_ALPHA} / (t.n_l + {NB_ALPHA} * v.v)) AS lp0
    FROM tot t CROSS JOIN vocab v
), tok_te AS (
    SELECT doc_id, lang AS true_lang,
           unnest(string_split(text, ' ')) AS tok
    FROM te
), scored AS (
    SELECT s.doc_id, s.true_lang, d.lang AS cand_lang,
           CAST(SUM(CAST(coalesce(m.lp, d.lp0) AS DECIMAL(38,18)))
                AS DECIMAL(38,18))
             + CAST(max(p.lp_prior) AS DECIMAL(38,18)) AS score
    FROM tok_te s
    CROSS JOIN defaults d
    LEFT JOIN model m ON m.lang = d.lang AND m.tok = s.tok
    JOIN prior p ON p.lang = d.lang
    GROUP BY 1, 2, 3
), pred AS (
    SELECT doc_id, true_lang, cand_lang,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, cand_lang) AS rk
    FROM scored
)
SELECT true_lang AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE cand_lang = true_lang) AS BIGINT)
           AS n_correct,
       {stable_round_sql(
           "CAST(count(*) FILTER (WHERE cand_lang = true_lang)"
           " AS DOUBLE) / count(*)", 6)} AS accuracy
FROM pred WHERE rk = 1
GROUP BY 1
""",
        doc="Multinomial naive Bayes language classifier, full "
        "lifecycle in one plan: train token counts on even doc_ids "
        "(Laplace alpha=1), score the odd half as sum of smoothed "
        "log-likelihoods + log prior per candidate language, argmax "
        "with (score DESC, lang) tie-break, report held-out accuracy "
        "per true language. Scores accumulate in DECIMAL(38,18) so "
        "the argmax is exact and partitioning-proof. Scale shape: "
        "the model is #langs x #vocab rows (broadcast side), test "
        "tokens fan out #langs x and reduce immediately — one wide "
        "shuffle on (doc, lang), no per-doc Python, no .collect(). "
        "The model join carries an explicit broadcast HINT (a hard "
        "hint, it never flips on its own) — right while the model is "
        "vocab x langs-bounded; at a vocabulary that outgrows "
        "executor memory, drop the hint so the planner picks "
        "shuffle-hash on the (tok, cand_lang) key.",
    )
    def nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        tr = docs.where(F.col("doc_id") % 2 == 0)
        te = docs.where(F.col("doc_id") % 2 == 1)
        tok_tr = tr.select(
            "lang", F.explode(F.split("text", " ")).alias("tok")
        )
        # Token stream is consumed exactly once: totals and vocabulary
        # derive from the aggregated (lang, tok) count table, which is
        # vocabulary-bounded and materialized once for its three
        # consumers (tot / vocab / model) — the raw corpus is never
        # re-exploded (verified single token pass in PLANS.md).
        cnt = materialize_once(
            tok_tr.groupBy("lang", "tok").agg(
                F.count(F.lit(1)).alias("n_lt")
            )
        )
        tot = cnt.groupBy("lang").agg(F.sum("n_lt").alias("n_l"))
        vocab = cnt.agg(F.countDistinct("tok").alias("v"))
        # training-doc count as a 1-row aggregate broadcast into the
        # prior — mirrors the oracle's scalar subquery and keeps plan
        # construction lazy (an eager .count() here would run a full
        # documents scan just to BUILD or explain the plan)
        ntr = tr.agg(F.count(F.lit(1)).alias("n_tr"))
        prior = (
            tr.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("double").alias("c_l"))
            .crossJoin(F.broadcast(ntr))
            .select(
                "lang",
                F.log(F.col("c_l") / F.col("n_tr")).alias("lp_prior"),
            )
        )
        model = (
            cnt.join(tot, "lang")
            .crossJoin(F.broadcast(vocab))
            .select(
                "lang",
                "tok",
                F.log(
                    (F.col("n_lt") + F.lit(NB_ALPHA))
                    / (F.col("n_l") + F.lit(NB_ALPHA) * F.col("v"))
                ).alias("lp"),
            )
        )
        defaults = tot.crossJoin(F.broadcast(vocab)).select(
            "lang",
            F.log(
                F.lit(NB_ALPHA)
                / (F.col("n_l") + F.lit(NB_ALPHA) * F.col("v"))
            ).alias("lp0"),
        )
        tok_te = te.select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            F.explode(F.split("text", " ")).alias("tok"),
        )
        cand = defaults.join(prior, "lang").select(
            F.col("lang").alias("cand_lang"), "lp0", "lp_prior"
        )
        scored = (
            tok_te.crossJoin(F.broadcast(cand))
            .join(
                F.broadcast(
                    model.select(
                        F.col("lang").alias("cand_lang"), "tok", "lp"
                    )
                ),
                ["cand_lang", "tok"],
                "left",
            )
            .groupBy("doc_id", "true_lang", "cand_lang")
            .agg(
                (
                    F.sum(
                        F.coalesce("lp", "lp0").cast("decimal(38,18)")
                    )
                    + F.max(F.col("lp_prior").cast("decimal(38,18)"))
                ).alias("score")
            )
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.col("score").desc(), "cand_lang"
        )
        pred = scored.select(
            "true_lang",
            "cand_lang",
            F.row_number().over(w).alias("rk"),
        ).where(F.col("rk") == 1)
        hit = F.when(F.col("cand_lang") == F.col("true_lang"), 1).otherwise(
            0
        )
        return pred.groupBy(F.col("true_lang").alias("lang")).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(hit).alias("n_correct"),
            stable_round(
                F.sum(hit).cast("double") / F.count(F.lit(1)), 6
            ).alias("accuracy"),
        )

    # ------------------------------------------------------------------
    @register(
        "forcast_readability",
        oracle=f"""
WITH per_doc AS (
    SELECT lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(list_sum([greatest(len(regexp_extract_all(t, '[aeiou]+')), 1)
                          FOR t IN string_split(text, ' ')])
                AS BIGINT) AS n_syll,
           CAST(len([t FOR t IN string_split(text, ' ')
                     IF greatest(len(regexp_extract_all(t, '[aeiou]+')), 1) = 1])
                AS BIGINT) AS n_mono,
           CAST(len([t FOR t IN string_split(text, ' ')
                     IF len(regexp_extract_all(t, '[aeiou]+')) >= 3])
                AS BIGINT) AS n_poly
    FROM documents
), agg AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS words,
           CAST(SUM(n_syll) AS BIGINT) AS sylls,
           CAST(SUM(n_mono) AS BIGINT) AS monos,
           CAST(SUM(n_poly) AS BIGINT) AS polys
    FROM per_doc GROUP BY lang
)
SELECT lang, n_docs, words AS n_words,
       {stable_round_sql('CAST(sylls AS DOUBLE) / words', 6)}
           AS syllables_per_word,
       {stable_round_sql('CAST(polys AS DOUBLE) / words', 6)}
           AS polysyllabic_frac,
       {stable_round_sql(
           '20.0 - 15.0 * CAST(monos AS DOUBLE) / words', 6)}
           AS forcast_grade
FROM agg
""",
        doc="FORCAST readability per language: syllables counted as "
        "vowel-group runs ([aeiou]+ matches per token, floored at 1 "
        "for vowelless tokens), monosyllabic fraction plugged into "
        "the sentence-free FORCAST formula grade = 20 - 15 * "
        "mono_frac (the 150-word-sample form with the expectation "
        "taken exactly), plus syllables/word and the polysyllabic "
        "fraction. All counts stay integers inside the token array "
        "(aggregate/filter higher-order functions — zero explode, "
        "zero Python), so one scan emits four ints per document and "
        "the language rollup is exact.",
    )
    def forcast_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        syll = (
            "transform(split(text, ' '), "
            "t -> greatest(size(regexp_extract_all(t, '[aeiou]+', 0)), 1))"
        )
        per_doc = docs.select(
            "lang",
            F.expr("size(split(text, ' '))").cast("long").alias("n_words"),
            F.expr(
                f"aggregate({syll}, 0L, (acc, x) -> acc + x)"
            ).alias("n_syll"),
            F.expr(f"size(filter({syll}, s -> s = 1))")
            .cast("long")
            .alias("n_mono"),
            F.expr(
                "size(filter(split(text, ' '), "
                "t -> size(regexp_extract_all(t, '[aeiou]+', 0)) >= 3))"
            )
            .cast("long")
            .alias("n_poly"),
        )
        agg = per_doc.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("words"),
            F.sum("n_syll").alias("sylls"),
            F.sum("n_mono").alias("monos"),
            F.sum("n_poly").alias("polys"),
        )
        return agg.select(
            "lang",
            "n_docs",
            F.col("words").alias("n_words"),
            stable_round(
                F.col("sylls").cast("double") / F.col("words"), 6
            ).alias("syllables_per_word"),
            stable_round(
                F.col("polys").cast("double") / F.col("words"), 6
            ).alias("polysyllabic_frac"),
            stable_round(
                F.lit(20.0)
                - F.lit(15.0)
                * F.col("monos").cast("double")
                / F.col("words"),
                6,
            ).alias("forcast_grade"),
        )


_register()
