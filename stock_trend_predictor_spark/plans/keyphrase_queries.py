"""RAKE keyphrase extraction (Rose et al. 2010) — corpus-derived
stopwords, positional phrase segmentation, degree/frequency scoring.

The keyword layer of a corpus-curation stack: tfidf_top_terms ranks
single tokens, token_pmi_collocations ranks bigrams; RAKE ranks
variable-length PHRASES (maximal stopword-free token runs), which is
what labeling/routing pipelines actually want. Everything is exact
counts + one fixed double expression per score, so the full pipeline
sits behind the driver's hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table

#: corpus-derived stopword set size (top tokens by corpus frequency —
#: the deterministic stand-in for a fixed stopword list on synthetic
#: vocabulary) and the report size.
RAKE_N_STOP = 20
RAKE_TOP_K = 25


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "rake_keyphrases",
        oracle=f"""
WITH pos AS (
    SELECT doc_id, p.pos AS pos, p.tok AS tok
    FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         LATERAL (SELECT unnest(list_transform(range(1, len(ts) + 1),
                         i -> {{'pos': i, 'tok': ts[i]}})) AS p)
), stop AS (
    SELECT tok FROM (
        SELECT tok, count(*) AS c,
               row_number() OVER (ORDER BY count(*) DESC, tok) AS rk
        FROM pos GROUP BY tok
    ) WHERE rk <= {RAKE_N_STOP}
), marked AS (
    SELECT p.doc_id, p.pos, p.tok,
           CASE WHEN s.tok IS NULL THEN 0 ELSE 1 END AS is_stop
    FROM pos p LEFT JOIN stop s ON p.tok = s.tok
), islands AS (
    SELECT doc_id, pos, tok, is_stop,
           sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS isl
    FROM marked
), members AS (
    SELECT doc_id, isl, pos, tok,
           count(*) OVER (PARTITION BY doc_id, isl) AS plen
    FROM islands WHERE is_stop = 0
), wstats AS (
    SELECT tok,
           CAST(count(*) AS BIGINT) AS freq,
           CAST(sum(plen) AS BIGINT) AS deg
    FROM members GROUP BY tok
), phrases AS (
    SELECT m.doc_id, m.isl,
           string_agg(m.tok, ' ' ORDER BY m.pos) AS phrase,
           CAST(max(m.plen) AS BIGINT) AS plen,
           CAST(sum(CAST(CAST(w.deg AS DOUBLE) / w.freq
                         AS DECIMAL(27,6))) AS DOUBLE) AS score
    FROM members m JOIN wstats w ON m.tok = w.tok
    GROUP BY m.doc_id, m.isl
), agg AS (
    SELECT phrase, plen, score,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM phrases GROUP BY phrase, plen, score
)
SELECT phrase, plen, n_occurrences,
       {stable_round_sql('score', 6)} AS score
FROM agg
ORDER BY score DESC, phrase
LIMIT {RAKE_TOP_K}
""",
        doc=f"RAKE keyphrases: stopwords = the top-{RAKE_N_STOP} corpus "
        f"tokens (deterministic stand-in for a fixed list); phrases = "
        f"maximal stopword-free token runs, segmented by a cumulative "
        f"stopword count per document (gap-and-island over ONE "
        f"positional explode — no self-join, no Python); word scores "
        f"deg/freq where deg sums the lengths of phrases containing "
        f"the word; phrase score = sum of member word scores "
        f"(decimal-cast members so the tiny sum is partition-order "
        f"independent). Top-{RAKE_TOP_K} by (score, phrase) via "
        f"TakeOrderedAndProject. Shuffles: the positional rows once "
        f"on doc_id for the island window, the members once on token "
        f"for word stats — both combinable or window-reusable; the "
        f"stopword set is a {RAKE_N_STOP}-row broadcast.",
    )
    def rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.split("text", " ").alias("ts")
        )
        pos = docs.select(
            "doc_id",
            F.posexplode("ts").alias("pos0", "tok"),
        ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
        stop = (
            pos.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), "tok")
            .limit(RAKE_N_STOP)
            .select("tok", F.lit(1).alias("is_stop"))
        )
        marked = pos.join(F.broadcast(stop), "tok", "left").select(
            "doc_id",
            "pos",
            "tok",
            F.coalesce("is_stop", F.lit(0)).alias("is_stop"),
        )
        wdoc = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
            Window.unboundedPreceding, 0
        )
        islands = marked.withColumn("isl", F.sum("is_stop").over(wdoc))
        members = islands.where(F.col("is_stop") == 0).withColumn(
            "plen",
            F.count(F.lit(1)).over(Window.partitionBy("doc_id", "isl")),
        )
        wstats = members.groupBy("tok").agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("deg"),
        )
        wscore = (F.col("deg").cast("double") / F.col("freq")).cast(
            "decimal(27,6)"
        )
        phrases = (
            members.join(wstats, "tok")
            .groupBy("doc_id", "isl")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s["tok"],
                    ),
                    " ",
                ).alias("phrase"),
                F.max("plen").alias("plen"),
                F.sum(wscore).cast("double").alias("score"),
            )
        )
        agg = phrases.groupBy("phrase", "plen", "score").agg(
            F.count(F.lit(1)).alias("n_occurrences")
        )
        return (
            agg.orderBy(F.col("score").desc(), "phrase")
            .limit(RAKE_TOP_K)
            .select(
                "phrase",
                "plen",
                "n_occurrences",
                stable_round("score", 6).alias("score"),
            )
        )


_register()
