"""Greedy submodular data selection: pick the documents that cover the
most vocabulary.

The data-SELECTION primitive of a curation stack (the inverse of the
dedup tier): coverage f(S) = |union of token sets| is monotone
submodular, so greedy selection carries the classic (1 - 1/e)
near-optimality guarantee — the principled way to pick a small,
maximally-diverse seed corpus (facility-location/coreset selection in
the LLM-data literature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stock_trend_predictor_spark.sources.tables import load_table

#: number of greedy rounds (documents selected).
COVER_K = 10


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "greedy_bigram_cover",
        # No oracle: the greedy argmax is iterative with a growing
        # covered set (aggregation inside the recursion — not
        # expressible as a SQL recursive CTE); the driver records a
        # rows-only check and tests/test_structure.py proves equality
        # against a brute-force Python greedy.
        doc=f"Greedy maximum-bigram-coverage selection of "
        f"{COVER_K} documents: each round scores every remaining "
        f"document by its MARGINAL gain (distinct grams not yet "
        f"covered — one anti-join + one count aggregate over the "
        f"distinct (doc, gram) table), picks the max with doc_id "
        f"tie-break via TakeOrderedAndProject(1), and adds its "
        f"grams to the covered set (checkpointed per round so "
        f"lineage stays round-sized). Only the {COVER_K} winning "
        f"(doc_id, gain) rows ever reach the driver — parameter-"
        f"sized, same contract as the IVF centroids. Greedy on a "
        f"monotone submodular objective is (1-1/e)-optimal, and "
        f"marginal gains are provably non-increasing (law-tested). "
        f"Coverage is over distinct BIGRAMS (the unigram vocabulary "
        f"of this corpus is 31 tokens — one document covers it; the "
        f"~930-bigram space forces genuinely diminishing returns). "
        f"At 100 TB the anti-join is a shuffle on the gram key per "
        f"round; rounds are the selection budget, not the data "
        f"size.",
    )
    def greedy_bigram_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
        # bound token array + double-reference guard (the
        # minhash_signature CollapseProject pattern)
        toks = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", F.split("text", " ").alias("ts"))
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "if(size(ts) < 0, null, "
                        "transform(sequence(1, size(ts) - 1), "
                        "i -> concat_ws(' ', try_element_at(ts, i), "
                        "try_element_at(ts, i + 1))))"
                    )
                ).alias("tok"),
            )
            .distinct()
            .localCheckpoint()
        )
        covered = spark.createDataFrame(
            [], T.StructType([T.StructField("tok", T.StringType())])
        )
        rows, cum = [], 0
        for step in range(1, COVER_K + 1):
            gain = (
                toks.join(covered, "tok", "left_anti")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("g"))
            )
            best = gain.orderBy(F.col("g").desc(), "doc_id").limit(1).collect()
            if not best:
                break
            doc, g = best[0].doc_id, best[0].g
            cum += g
            rows.append((step, doc, g, cum))
            covered = (
                covered.unionAll(
                    toks.where(F.col("doc_id") == doc).select("tok")
                )
                .distinct()
                .localCheckpoint()
            )
        return spark.createDataFrame(
            rows,
            T.StructType(
                [
                    T.StructField("step", T.IntegerType(), False),
                    T.StructField("doc_id", T.LongType(), False),
                    T.StructField("marginal_gain", T.LongType(), False),
                    T.StructField("covered_bigrams", T.LongType(), False),
                ]
            ),
        )


_register()
