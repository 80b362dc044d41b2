"""DSIR-style importance weighting for data selection
(arXiv:2302.03169, Xie et al.: Data Selection for Language Models
via Importance Resampling).

Given a corpus and a predicate selecting the TARGET slice, score every
document by how target-like its hashed n-gram profile is:

1. explode each doc once into hashed unigram + adjacent-bigram feature
   instances (md5-hash into ``n_buckets`` buckets);
2. fit Laplace-smoothed bag-of-buckets models of the target slice and
   of the raw corpus — two <= ``n_buckets``-row parameter tables;
3. per-doc log importance weight = sum over the doc's feature
   instances of ``ln p_target(bucket) - ln p_raw(bucket)``.

Scale shape (the reason for the bucketed design): the corpus explodes
once (~2x token count), both models are map-side-combinable aggregates
to parameter-sized tables, the log-ratio table BROADCASTS back, and
the weight is one doc-keyed aggregation — no window, no self-join,
text never moves past tokenization. Per-doc double sums go through
the decimal trick (functions/exact.py) so results are
partition-order-independent.

The resampling step itself is a one-liner downstream (keep on
``weight > threshold``, or rank with operators/rank.py for an exact
global top-k by weight + hash-derived Gumbel noise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.text import hash60
from stock_trend_predictor_spark.sources.tables import materialize_once

__all__ = ["dsir_log_weights"]


def dsir_log_weights(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_feats, __s) — per-document raw log importance weight
    (``__s``, an exact decimal-summed double; callers round/alias it)
    of every document in ``docs`` against the slice where ``target``
    is true. ``target`` must be computable from ``docs``'s columns."""
    toks = docs.select(
        id_col,
        target.alias("__is_target"),
        F.split(text_col, " ").alias("ts"),
    )
    # tokenize once: the if-guard blocks CollapseProject from inlining
    # split() into the lambda (the token_bigram_condprob fix); bigram
    # list is empty for 1-token docs
    feats = toks.select(
        id_col,
        "__is_target",
        F.explode(
            F.expr(
                "if(size(ts) < 0, null, concat(ts, "
                "if(size(ts) < 2, array(), "
                "transform(sequence(1, size(ts) - 1), "
                "i -> concat(try_element_at(ts, i), ' ', "
                "try_element_at(ts, i + 1))))))"
            )
        ).alias("f"),
    )
    exploded = materialize_once(
        feats.select(
            id_col,
            "__is_target",
            F.pmod(hash60("f"), F.lit(n_buckets)).alias("bucket"),
        )
    )
    rb = exploded.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_r")
    )
    tb = (
        exploded.where(F.col("__is_target"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt_t"))
    )
    # tt coalesces to 0 so a corpus with ZERO target docs yields the
    # same finite negative weights as the maintained fold
    # (streaming/dsir_maintenance.py::read_dsir_weights pins this
    # edge) — without it sum(cnt_t) is NULL and every weight nulls
    # out, breaking the fold==one-shot bit-equality law.
    tot = rb.agg(F.sum("cnt_r").alias("tr")).crossJoin(
        tb.agg(
            F.coalesce(F.sum("cnt_t"), F.lit(0).cast("bigint")).alias("tt")
        )
    )
    smooth = F.lit(float(n_buckets))
    lr_tab = (
        rb.join(tb, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("cnt_t"), F.lit(0)) + 1)
                    / (F.col("tt") + smooth)
                )
                - F.log((F.col("cnt_r") + 1) / (F.col("tr") + smooth))
            ).alias("lr"),
        )
    )
    return (
        exploded.join(F.broadcast(lr_tab), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.sum(F.col("lr").cast("decimal(27,6)"))
            .cast("double")
            .alias("__s"),
        )
    )
