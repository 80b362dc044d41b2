"""Deduplication operators for large-scale training-data pipelines.

Four families, each a `queries()` entry (see plans/dedup_queries.py):

- exact:      hash-groupBy on content digest — one shuffle, linear.
- MinHash+LSH: shingle → minhash signature → banded bucket join —
              the scale path for near-dup detection (candidate
              generation is linear + one shuffle per band; no O(n²)
              pair enumeration).
- SimHash:    64→28-bit bitwise fingerprint via per-token hash votes.
- n-gram Jaccard: exact verification on candidate pairs only.

Cross-engine determinism: all hashing is md5-hex based (functions/
text.py::hash28/hash60) so DuckDB oracles reproduce signatures
bit-for-bit; the permutation constants below are generated once from a
fixed seed and injected into BOTH the Spark expressions and the oracle
SQL.

Scale notes: everything is expression-level (no Python UDFs); the LSH
band join shuffles (band_id, band_key) — at 100 TB that is b small
shuffles of (doc_id, 8-byte key) pairs, not documents; candidate
verification joins shingle arrays back by doc_id (co-partitioned on
doc_id).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.text import (
    hash28_sql,
    word_ngrams_sql,
)

#: MinHash parameters. p is the Mersenne prime 2^31-1; a,b < 2^30 keep
#: a*h + b < 2^58 for 28-bit h — no BIGINT overflow in either engine.
MINHASH_P = 2_147_483_647
N_HASHES = 32
N_BANDS = 8
BAND_ROWS = N_HASHES // N_BANDS

_rng = random.Random(42)
MINHASH_A = [_rng.randrange(1, 1 << 30) for _ in range(N_HASHES)]
MINHASH_B = [_rng.randrange(0, 1 << 30) for _ in range(N_HASHES)]

SIMHASH_BITS = 28


def with_shingle_hashes(
    df: DataFrame, text_col: str = "text", out: str = "hs", n: int = 3
) -> DataFrame:
    """Add a distinct word-n-gram shingle → 28-bit hash array column.

    Two-phase on purpose: the token array is bound to a real column
    first, then the n-gram lambda references it. Inlining the split()
    into the lambda would re-split the text once per n-gram element
    (O(tokens²) parsing — measured 3.5× slower); a bound column is
    evaluated once per row, and CollapseProject keeps it that way
    because the alias is referenced many times.

    ``try_element_at`` (not element_at): documents shorter than n
    tokens index past the array, which under ANSI mode would throw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT; try_element_at yields NULL and
    concat_ws skips the null slots, matching DuckDB's out-of-range
    list indexing.
    """
    concat = ", ".join(f"try_element_at(_toks, i + {j})" for j in range(n))
    expr = F.expr(
        f"transform(array_distinct(transform("
        f"sequence(1, greatest(size(_toks) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', {concat}))), "
        f"s -> cast(conv(substr(md5(s), 1, 7), 16, 10) as bigint))"
    )
    return (
        df.withColumn("_toks", F.split(text_col, " "))
        .withColumn(out, expr)
        .drop("_toks")
    )


def shingle_hashes_sql(expr: str = "text", n: int = 3) -> str:
    return f"list_transform({word_ngrams_sql(expr, n)}, s -> {hash28_sql('s')})"


def minhash_signature(hashes_col: str = "hs") -> Column:
    """All 32 min-hashes as ONE array column: min((a*h + b) % p) per
    permutation, iterated with a literal (a, b) constant array inside
    a single nested transform. One expression instead of 32 sibling
    columns — ~30× less generated code to JIT, same values.

    The ``if(size(...) < 0, ...)`` wrapper is load-bearing: it makes
    this expression reference ``hashes_col`` TWICE. With a single
    reference, CollapseProject inlines the upstream md5 shingle
    pipeline into the 32-iteration permutation lambda and the whole
    shingle computation re-executes once per permutation — measured
    10.8s → 1.1s at sf0.1 for the signature stage alone. Two
    references make the producer projection non-collapsible, so the
    hash array materializes once per row.
    """
    ab = ", ".join(
        f"named_struct('a', {MINHASH_A[j]}L, 'b', {MINHASH_B[j]}L)"
        for j in range(N_HASHES)
    )
    return F.expr(
        f"if(size({hashes_col}) < 0, null, "
        f"transform(array({ab}), p -> "
        f"array_min(transform({hashes_col}, "
        f"h -> (p.a * h + p.b) % {MINHASH_P}L))))"
    )


def minhash_signature_sql(hashes_expr: str) -> list[str]:
    return [
        f"list_min(list_transform({hashes_expr}, "
        f"h -> ({MINHASH_A[j]} * h + {MINHASH_B[j]}) % {MINHASH_P}))"
        for j in range(N_HASHES)
    ]


def band_key(band: int, sig_col: str = "sig") -> Column:
    """Concatenate one band's signature slice into a join key string."""
    return F.concat_ws(
        "_",
        *[
            F.element_at(F.col(sig_col), band * BAND_ROWS + r + 1).cast("string")
            for r in range(BAND_ROWS)
        ],
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    bucket_cap: int = 64,
    n_splits: int = 8,
) -> DataFrame:
    """Banded LSH: docs with an identical signature band become
    candidate pairs (doc_a < doc_b, deduplicated across bands).

    Shaped as groupBy(band) + in-bucket pair expansion rather than a
    band self-join: the signature computation is evaluated once (a
    self-join would evaluate the md5 shingle pipeline on both sides),
    and the shuffle moves only (band_key, doc_id) pairs — at 100 TB
    that is b small shuffles of 8-byte keys, never document text.

    Bucket pair expansion is quadratic per bucket by nature of LSH,
    so a giant near-dup cluster (boilerplate pages in a web corpus)
    would put one bucket's entire O(n²) expansion — and its
    collect_list array — in a single task. Every bucket therefore
    routes through ONE triangle-decomposition path: rows hash into _k
    sub-splits (_k = 1 for ordinary buckets, n_splits for mega-buckets
    over bucket_cap), each row replicates to the _k cells (i, j) that
    contain its split, and pair enumeration runs per cell — a
    mega-bucket's O(n²) expansion spreads over n_splits(n_splits+1)/2
    tasks and no task ever materializes a whole mega-bucket. Small
    buckets are the degenerate _k=1 single-cell case, so the capped
    path is the SAME linear plan (no branch, no union, no self-join)
    and costs zero extra stages. Pair output is identical at any cap
    (law tested in
    tests/test_dedup.py::test_lsh_mega_bucket_cap_same_pairs).
    """
    from pyspark.sql import Window

    sigs = docs.select(F.col(id_col), minhash_signature("hs").alias("sig"))
    bands = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(m).alias("band_id"), band_key(m).alias("bkey"))
                    for m in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.bkey")
    # Bucket sizes via a window count over ONE shuffle of bands: the
    # expensive part (minhash signatures) sits below that exchange and
    # is computed once. Only buckets with >= 2 members survive; a
    # mega-bucket's rows fan out n_splits-wide BEFORE the cell shuffle,
    # so the collect_list arrays per cell are <= 2·n/_k members and the
    # giant whole-bucket array is never built anywhere.
    sized = bands.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("band_id", "bkey"))
    ).where(F.col("_n") > 1)
    cells = (
        sized.withColumn(
            "_k",
            F.when(F.col("_n") <= bucket_cap, F.lit(1)).otherwise(
                F.lit(n_splits)
            ),
        )
        .withColumn(
            "_s", F.pmod(F.xxhash64(F.col(id_col)), F.col("_k")).cast("int")
        )
        .select(
            "band_id",
            "bkey",
            id_col,
            "_s",
            F.explode(
                F.expr(
                    "transform(sequence(0, _k - 1), t -> if(t <= _s, "
                    "named_struct('i', t, 'j', _s), "
                    "named_struct('i', _s, 'j', t)))"
                )
            ).alias("_cell"),
        )
    )
    grouped = cells.groupBy("band_id", "bkey", "_cell").agg(
        F.collect_list(
            F.when(F.col("_s") == F.col("_cell.i"), F.col(id_col))
        ).alias("la"),
        F.collect_list(
            F.when(F.col("_s") == F.col("_cell.j"), F.col(id_col))
        ).alias("lb"),
    )
    # Diagonal cells (i == j) hold one list twice: order pairs by id to
    # emit each once. Off-diagonal cells cross two disjoint lists:
    # least/greatest orients the pair (ids differ — different splits).
    return (
        grouped.select(
            (F.col("_cell.i") == F.col("_cell.j")).alias("_diag"),
            F.explode("la").alias("_a"),
            "lb",
        )
        .select("_diag", "_a", F.explode("lb").alias("_b"))
        .where((~F.col("_diag")) | (F.col("_a") < F.col("_b")))
        .select(
            F.least("_a", "_b").alias("doc_a"),
            F.greatest("_a", "_b").alias("doc_b"),
        )
        .distinct()
    )


def jaccard_of_hash_arrays(a: Column | str, b: Column | str) -> Column:
    """Exact Jaccard of two (distinct-element) hash arrays."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    inter = F.size(F.array_intersect(ca, cb))
    union = F.size(F.array_union(ca, cb))
    return inter.cast("double") / union


def simhash(hashes_col: str = "hs") -> Column:
    """28-bit SimHash from a token/shingle hash array.

    Per bit: sum votes (+1 if the bit is set in a hash, else -1) over
    all distinct hashes; bit is 1 when the vote sum is >= 0. Pure
    integer arithmetic → order-independent and oracle-exact.
    """
    votes = (
        f"transform(sequence(0, {SIMHASH_BITS - 1}), "
        f"i -> aggregate({hashes_col}, 0L, "
        f"(acc, h) -> acc + ((shiftright(h, cast(i as int)) & 1) * 2 - 1)))"
    )
    # same CollapseProject guard as minhash_signature: without the
    # second reference to hashes_col, the upstream token-hash pipeline
    # inlines into the 28-iteration bit lambda and runs 28x per row
    return F.expr(
        f"if(size({hashes_col}) < 0, null, "
        f"aggregate(zip_with({votes}, sequence(0, {SIMHASH_BITS - 1}), "
        f"(v, i) -> if(v >= 0, shiftleft(1L, i), 0L)), 0L, (acc, x) -> acc + x))"
    )


def simhash_sql_cte(doc_table: str = "documents", text_expr: str = "text") -> str:
    """DuckDB CTE computing the identical SimHash via unnest+sum."""
    return f"""
toks AS (
    SELECT doc_id, unnest(list_distinct(string_split({text_expr}, ' '))) AS tok
    FROM {doc_table}
), tokhash AS (
    SELECT doc_id, {hash28_sql('tok')} AS h FROM toks
), bitvotes AS (
    SELECT doc_id, i.i AS i, SUM(((h >> i.i) & 1) * 2 - 1) AS v
    FROM tokhash, (SELECT unnest(range({SIMHASH_BITS})) AS i) i
    GROUP BY doc_id, i.i
), simhashed AS (
    -- CAST the SUM: DuckDB widens SUM(BIGINT) to HUGEINT (int128),
    -- which the driver's type-sensitive value hash would flag against
    -- Spark's BIGINT even when values are identical.
    SELECT doc_id,
           CAST(SUM(CASE WHEN v >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM bitvotes GROUP BY doc_id
)
"""


def token_hashes(col: str = "text") -> Column:
    """Distinct token → 28-bit hash array (SimHash input)."""
    return F.expr(
        f"transform(array_distinct(split({col}, ' ')), "
        f"t -> cast(conv(substr(md5(t), 1, 7), 16, 10) as bigint))"
    )
