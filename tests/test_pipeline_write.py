"""Write-side end-to-end: the full training-data flow — quality
filter → exact dedup → deterministic split assignment → partitioned
parquet layout → pruned read-back. Each stage exists as an
oracle-checked query; this test proves they COMPOSE, and that the
resulting table layout actually prunes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.text import hash60
from stock_trend_predictor_spark.sources.parquet_io import (
    read_partitioned,
    write_partitioned,
)
from stock_trend_predictor_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_clean_split_write_prune(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").withColumn(
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
    ).where((F.col("n_tokens") >= 20) & (F.col("diversity") >= 0.3))
    keepers = (
        quality.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keeper"))
        .select(F.col("keeper").alias("doc_id"))
    )
    deduped = quality.join(keepers, "doc_id")
    bucket = hash60(F.col("doc_id").cast("string")) % 100
    final = deduped.withColumn(
        "split",
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test"),
    )

    out = str(tmp_path / "corpus")
    write_partitioned(
        final, out, partition_by=["split", "lang"], sort_within=["doc_id"]
    )

    back = read_partitioned(spark, out)
    # nothing lost or duplicated through the layout
    assert back.count() == final.count()
    assert back.select("doc_id").distinct().count() == final.count()

    # split fractions roughly honor 90/5/5 (hash-uniformity)
    n = final.count()
    frac = {
        r["split"]: r["c"] / n
        for r in back.groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert 0.85 <= frac["train"] <= 0.95
    assert 0.02 <= frac["val"] <= 0.08
    assert 0.02 <= frac["test"] <= 0.08

    # reading one (split, lang) slice prunes to its directory
    one = back.where((F.col("split") == "val") & (F.col("lang") == "en"))
    plan = one._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "split" in pf and "lang" in pf
    # and the slice equals the unpartitioned filter result
    expect = final.where(
        (F.col("split") == "val") & (F.col("lang") == "en")
    ).count()
    assert one.count() == expect
