"""Dedup operator unit tests — short-document edge cases.

Documents shorter than the shingle width n used to throw
INVALID_ARRAY_INDEX_IN_ELEMENT_AT under Spark 4's default ANSI mode
(element_at past the token array). try_element_at yields NULL out of
range, concat_ws skips the nulls, and the doc contributes one shingle
of all its words — identical to DuckDB's out-of-range list indexing.
"""

from __future__ import annotations

import duckdb

from stock_trend_predictor_spark.functions.text import (
    word_ngrams,
    word_ngrams_sql,
)
from stock_trend_predictor_spark.operators.dedup import (
    simhash,
    token_hashes,
    with_shingle_hashes,
)

SHORT_DOCS = [
    (1, "solitary"),
    (2, "two words"),
    (3, "exactly three tokens"),
    (4, "a document with plenty of words to shingle"),
]


def _short_df(spark):
    return spark.createDataFrame(SHORT_DOCS, "doc_id int, text string")


def test_word_ngrams_short_docs_no_ansi_crash(spark):
    rows = (
        _short_df(spark)
        .select("doc_id", word_ngrams("text", 3).alias("ng"))
        .orderBy("doc_id")
        .collect()
    )
    got = {r["doc_id"]: sorted(r["ng"]) for r in rows}
    assert got[1] == ["solitary"]
    assert got[2] == ["two words"]
    assert got[3] == ["exactly three tokens"]
    assert len(got[4]) == 6  # 8 tokens -> 6 trigrams, all distinct


def test_word_ngrams_matches_duckdb_on_short_docs(spark):
    spark_rows = {
        r["doc_id"]: sorted(r["ng"])
        for r in _short_df(spark)
        .select("doc_id", word_ngrams("text", 3).alias("ng"))
        .collect()
    }
    con = duckdb.connect()
    values = ", ".join(f"({i}, '{t}')" for i, t in SHORT_DOCS)
    duck_rows = con.execute(
        f"SELECT doc_id, {word_ngrams_sql('text', 3)} AS ng "
        f"FROM (VALUES {values}) AS d(doc_id, text)"
    ).fetchall()
    con.close()
    assert {i: sorted(ng) for i, ng in duck_rows} == spark_rows


def test_with_shingle_hashes_short_docs(spark):
    rows = (
        with_shingle_hashes(_short_df(spark), "text", out="hs", n=3)
        .orderBy("doc_id")
        .collect()
    )
    sizes = {r["doc_id"]: len(r["hs"]) for r in rows}
    assert sizes == {1: 1, 2: 1, 3: 1, 4: 6}
    # hashes are 28-bit non-null bigints
    for r in rows:
        for h in r["hs"]:
            assert h is not None and 0 <= h < (1 << 28)


def test_lsh_mega_bucket_cap_same_pairs(spark):
    """A near-dup cluster larger than bucket_cap must route through
    the triangle decomposition and yield EXACTLY the pairs the plain
    in-bucket expansion yields — the cap changes placement, never
    output. 120 identical docs -> every band has one 120-member
    bucket, > the cap of 64."""
    from stock_trend_predictor_spark.operators.dedup import (
        lsh_candidate_pairs,
        with_shingle_hashes,
    )

    cluster = [(i, "the same boilerplate page text repeated everywhere")
               for i in range(120)]
    distinct = [(1000 + i, f"unique document number {i} with its own words {i * 7}")
                for i in range(30)]
    docs = with_shingle_hashes(
        spark.createDataFrame(cluster + distinct, "doc_id int, text string")
    ).select("doc_id", "hs").persist()
    capped = sorted(
        map(tuple, lsh_candidate_pairs(docs, bucket_cap=64).collect())
    )
    uncapped = sorted(
        map(tuple, lsh_candidate_pairs(docs, bucket_cap=1 << 30).collect())
    )
    docs.unpersist()
    assert capped == uncapped
    # the 120-doc cluster alone contributes C(120,2) pairs
    assert len(capped) >= 120 * 119 // 2


def test_connected_components_chain_and_islands(spark):
    """Label propagation must close transitive chains (diameter >> 1,
    forcing multiple rounds) and keep disjoint components apart."""
    from stock_trend_predictor_spark.operators.components import (
        connected_components,
    )

    # a 12-node path graph (diameter 11), a triangle, and a 2-cycle
    chain = [(i, i + 1) for i in range(100, 111)]
    triangle = [(1, 2), (2, 3), (1, 3)]
    pair = [(50, 51)]
    edges = spark.createDataFrame(
        chain + triangle + pair, "src long, dst long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, "src", "dst").collect()
    }
    assert all(got[n] == 100 for n in range(100, 112))
    assert all(got[n] == 1 for n in (1, 2, 3))
    assert got[50] == 50 and got[51] == 50
    assert len(got) == 12 + 3 + 2


def test_simhash_short_docs(spark):
    rows = (
        _short_df(spark)
        .select("doc_id", token_hashes("text").alias("hs"))
        .select("doc_id", simhash("hs").alias("sh"))
        .collect()
    )
    for r in rows:
        assert r["sh"] is not None and 0 <= r["sh"] < (1 << 28)


def test_semdedup_keep_decision_laws(spark, sf_dir):
    """SemDeDup keep decision: cluster id is the min member, exactly
    one keeper per cluster (the min), singletons are kept, and the
    drop count is sum(cluster_size - 1)."""
    from pyspark.sql import functions as F

    from stock_trend_predictor_spark.plans import REGISTRY

    out = REGISTRY["semdedup_keep_decision"].fn(spark, sf_dir)
    out = out.localCheckpoint(eager=True)

    per = out.groupBy("cluster").agg(
        F.min("vec_id").alias("min_id"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep"),
        F.first("cluster_size").alias("sz"),
    )
    bad = per.where(
        (F.col("min_id") != F.col("cluster"))
        | (F.col("n_keep") != 1)
        | (F.col("n") != F.col("sz"))
    )
    assert bad.count() == 0
    # keeper is the min member
    assert (
        out.where("keep")
        .where(F.col("vec_id") != F.col("cluster"))
        .count()
        == 0
    )
    # drop count law: one keeper per cluster => drops = total - #clusters
    total = out.count()
    kept = out.where("keep").count()
    n_clusters = per.count()
    assert kept == n_clusters
    assert total - kept == per.select(
        F.sum(F.col("sz") - 1)
    ).first()[0]
    # every vector appears exactly once
    assert out.select("vec_id").distinct().count() == total
