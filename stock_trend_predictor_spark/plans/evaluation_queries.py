"""Evaluation metrics as exact rank/count aggregates: ROC AUC and
Cohen's kappa.

``auc_roc_movement`` computes the exact ROC AUC of a score against the
up/down movement label through the Mann-Whitney U identity
AUC = (R+ - n+(n+ + 1)/2) / (n+ n-), with midrank tie handling —
no curve construction, no threshold sweep, no sampling. Average ranks
are rank() + (ties - 1)/2, i.e. exact multiples of 1/2, summed in
decimal, so the statistic is bit-stable at any partitioning. This is
how AUC should be computed on 100 TB: one sort-rank window and one
aggregate, mathematically identical to integrating the ROC curve.

``cohens_kappa_lang`` scores the marker-token language-ID heuristic
against the corpus labels with chance-corrected agreement: kappa =
(po - pe) / (1 - pe) from the same confusion cells
lang_id_confusion_matrix materializes — pure integer marginals until
the final ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.functions.text import (
    LANG_MARKERS,
    marker_score,
    marker_score_sql,
)
from stock_trend_predictor_spark.sources.tables import (
    TICKS_ORACLE_CTE,
    load_table,
    ticks,
)


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "auc_roc_movement",
        oracle=f"""
WITH {TICKS_ORACLE_CTE.strip()},
base AS (
    SELECT symbol, open AS score,
           CASE WHEN close > open THEN 1 ELSE 0 END AS y
    FROM ticks WHERE open IS NOT NULL
), ranked AS (
    SELECT symbol, y,
           rank() OVER (PARTITION BY symbol ORDER BY score)
             + (CAST(count(*) OVER (PARTITION BY symbol, score)
                     AS DOUBLE) - 1) / 2 AS arank
    FROM base
), agg AS (
    SELECT symbol,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(count(*) - SUM(y) AS BIGINT) AS n_neg,
           CAST(SUM(CAST(CASE WHEN y = 1 THEN arank ELSE 0 END
                         AS DECIMAL(38,1))) AS DOUBLE) AS rpos
    FROM ranked GROUP BY symbol
)
SELECT symbol, n_pos, n_neg,
       {stable_round_sql(
           '(rpos - CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2)'
           ' / (CAST(n_pos AS DOUBLE) * n_neg)', 6)} AS auc
FROM agg
""",
        doc="Exact ROC AUC per symbol of the bar-open score against "
        "the up/down movement label (the reference's binary target), "
        "via the Mann-Whitney identity with midrank ties: average "
        "rank = rank() + (ties-1)/2 (exact halves), positives' rank "
        "sum in DECIMAL(38,1), AUC = (R+ - n+(n+1)/2)/(n+ n-). One "
        "rank window on the shared symbol sort + one aggregate — no "
        "threshold sweep, no curve materialization, no sampling; "
        "the estimator a 100 TB model evaluation should use. "
        "AUC ~ 0.5 here certifies the null mechanics (open carries "
        "no look-ahead signal); the plan is what's under test.",
    )
    def auc_roc_movement(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = ticks(spark, sf_dir).where(F.col("open").isNotNull())
        base = t.select(
            "symbol",
            F.col("open").alias("score"),
            F.when(F.col("close") > F.col("open"), 1)
            .otherwise(0)
            .alias("y"),
        )
        arank = (
            F.rank().over(
                Window.partitionBy("symbol").orderBy("score")
            )
            + (
                F.count(F.lit(1))
                .over(Window.partitionBy("symbol", "score"))
                .cast("double")
                - 1
            )
            / 2
        )
        ranked = base.select("symbol", "y", arank.alias("arank"))
        agg = ranked.groupBy("symbol").agg(
            F.sum("y").alias("n_pos"),
            (F.count(F.lit(1)) - F.sum("y")).alias("n_neg"),
            F.sum(
                F.when(F.col("y") == 1, F.col("arank"))
                .otherwise(0.0)
                .cast("decimal(38,1)")
            )
            .cast("double")
            .alias("rpos"),
        )
        return agg.select(
            "symbol",
            "n_pos",
            "n_neg",
            stable_round(
                (
                    F.col("rpos")
                    - F.col("n_pos").cast("double")
                    * (F.col("n_pos") + 1)
                    / 2
                )
                / (F.col("n_pos").cast("double") * F.col("n_neg")),
                6,
            ).alias("auc"),
        )

    # ------------------------------------------------------------------
    langs = list(LANG_MARKERS)
    lang_score_sql = {
        lang: marker_score_sql("text", markers)
        for lang, markers in LANG_MARKERS.items()
    }
    best_sql = "GREATEST(" + ", ".join(f"s_{l}" for l in langs) + ")"
    case_sql = "CASE " + " ".join(
        f"WHEN s_{l} = {best_sql} THEN '{l}'" for l in langs
    ) + " END"

    @register(
        "cohens_kappa_lang",
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
), marg AS (
    SELECT CAST(SUM(n) AS BIGINT) AS total,
           CAST(SUM(CASE WHEN labeled_lang = predicted_lang
                         THEN n ELSE 0 END) AS BIGINT) AS agree,
           CAST(SUM(CAST(rm * cm AS DECIMAL(38,0))) AS DOUBLE) AS rc
    FROM (
        SELECT labeled_lang, predicted_lang, n,
               SUM(n) OVER (PARTITION BY labeled_lang) AS rm,
               SUM(n) OVER (PARTITION BY predicted_lang) AS cm
        FROM cells
    )
)
SELECT total AS n_docs, agree AS n_agree,
       {stable_round_sql('CAST(agree AS DOUBLE) / total', 6)} AS po,
       {stable_round_sql(
           'rc / (CAST(total AS DOUBLE) * total)', 6)} AS pe,
       {stable_round_sql(
           'CASE WHEN rc / (CAST(total AS DOUBLE) * total) >= 1.0'
           ' THEN 0.0'
           ' ELSE (CAST(agree AS DOUBLE) / total'
           ' - rc / (CAST(total AS DOUBLE) * total))'
           ' / (1.0 - rc / (CAST(total AS DOUBLE) * total)) END', 6)}
           AS kappa
FROM marg
""",
        doc="Cohen's kappa of the marker-token language-ID heuristic "
        "against the corpus labels: chance-corrected agreement "
        "(po - pe)/(1 - pe), with pe from the row x column marginal "
        "products summed EXACTLY as DECIMAL(38,0) integers over the "
        "#langs^2 confusion cells — floats appear only in the final "
        "three ratios. The honest version of lang_id_heuristic's "
        "raw agreement rate: a degenerate always-one-class "
        "classifier scores po > 0 but kappa = 0 (pe = 1 is exactly "
        "the constant-rater case, reported as 0 by convention). "
        "Marginal windows run over the bounded cell table.",
    )
    def cohens_kappa_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        withm = cells.select(
            "labeled_lang",
            "predicted_lang",
            "n",
            F.sum("n")
            .over(Window.partitionBy("labeled_lang"))
            .alias("rm"),
            F.sum("n")
            .over(Window.partitionBy("predicted_lang"))
            .alias("cm"),
        )
        marg = withm.agg(
            F.sum("n").alias("total"),
            F.sum(
                F.when(
                    F.col("labeled_lang") == F.col("predicted_lang"),
                    F.col("n"),
                ).otherwise(0)
            ).alias("agree"),
            F.sum((F.col("rm") * F.col("cm")).cast("decimal(38,0)"))
            .cast("double")
            .alias("rc"),
        )
        total_d = F.col("total").cast("double")
        po = F.col("agree").cast("double") / F.col("total")
        pe = F.col("rc") / (total_d * F.col("total"))
        return marg.select(
            F.col("total").alias("n_docs"),
            F.col("agree").alias("n_agree"),
            stable_round(po, 6).alias("po"),
            stable_round(pe, 6).alias("pe"),
            # pe = 1 exactly when one rater is constant (true here:
            # the English-vocab corpus makes the heuristic predict a
            # single class) — kappa is conventionally 0 then: there
            # is no chance-corrected information to credit.
            stable_round(
                F.when(pe >= 1.0, F.lit(0.0)).otherwise(
                    (po - pe) / (F.lit(1.0) - pe)
                ),
                6,
            ).alias("kappa"),
        )


_register()
