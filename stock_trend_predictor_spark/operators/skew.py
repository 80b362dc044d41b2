"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting (on in session.py) handles most runtime skew
for sort-merge joins; salting is the explicit fallback for the cases
AQE can't fix — a shuffled join or aggregation where one key holds an
outsized share of rows (the '3-symbol universe' shape of the reference
is exactly this: partitionBy(symbol) with 3 symbols puts a third of
100 TB in one task).

Construction: the skewed (fact) side gets a uniform random salt in
[0, n); the small (dim) side is exploded n× so every (key, salt)
combination exists; the join key becomes (key, salt). Equality with
the unsalted join is a law tested in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col: str = "_salt") -> DataFrame:
    """Uniform salt in [0, n_salts) — spreads one hot key over
    n_salts shuffle partitions. rand() is fine here: the salt never
    affects results, only placement."""
    return df.withColumn(col, (F.rand(seed=42) * n_salts).cast("int"))


def explode_salts(df: DataFrame, n_salts: int, col: str = "_salt") -> DataFrame:
    """Replicate the small side once per salt value (n_salts× rows —
    only acceptable for broadcast-sized or dimension tables)."""
    return df.withColumn(
        col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key pressure spread over n_salts tasks.

    Result is row-identical to fact.join(dim, on, how); only the
    shuffle placement changes. Use when one fact key dominates and the
    dim side is small enough to replicate (else: AQE skew split or
    broadcast).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        # right/full outer would keep every exploded replica of an
        # unmatched dim row, duplicating it n_salts-fold; the law
        # "row-identical to the unsalted join" only holds when
        # unmatched *dim* rows never survive.
        raise ValueError(
            f"salted_join: how={how!r} not supported — unmatched dim rows "
            f"are replicated {n_salts}x by explode_salts, so only "
            f"inner/left/semi/anti preserve unsalted-join semantics"
        )
    keys = [on] if isinstance(on, str) else list(on)
    f = with_salt(fact, n_salts)
    d = explode_salts(dim, n_salts)
    joined = f.join(d, [*keys, "_salt"], how)
    return joined.drop("_salt")


def pair_parallel_self_join(
    df: DataFrame,
    block: str | list[str],
    id_col: str,
    n_splits: int = 4,
) -> DataFrame:
    """All unordered within-block pairs, with parallelism
    #blocks × n_splits(n_splits+1)/2 instead of #blocks.
    ``block`` may be one column name or a list (composite block key).

    A blocked self-join shuffles on the block key alone, so a
    low-cardinality block column caps the pair enumeration at #blocks
    tasks. Triangle decomposition fixes it: rows hash into n_splits
    sub-buckets; the left side replicates to every combo (sb, j>=sb),
    the right to every (i<=sb, sb); joining on (block, i, j) lands
    each unordered pair in exactly one combo partition (same-bucket
    combos deduplicate by id order). Replication factor is
    (n_splits+1)/2 per side — the standard cost of pair-parallelism.

    Returns columns of both sides aliased ``a``/``b`` (access via
    F.col("a.x") / F.col("b.x")); every a-row/b-row pair is a distinct
    unordered pair of the input (a.id < b.id within equal sub-buckets;
    across sub-buckets orientation is by bucket, not id).
    """
    blocks = [block] if isinstance(block, str) else list(block)
    d = df.withColumn(
        "_sb", (F.pmod(F.hash(F.col(id_col)), n_splits)).cast("int")
    )
    left = d.withColumn(
        "_cj", F.explode(F.sequence(F.col("_sb"), F.lit(n_splits - 1)))
    ).alias("a")
    right = d.withColumn(
        "_ci", F.explode(F.sequence(F.lit(0), F.col("_sb")))
    ).alias("b")
    block_eq = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in blocks]
    cond = block_eq[0]
    for c in block_eq[1:]:
        cond = cond & c
    return (
        left.join(
            right,
            cond
            & (F.col("a._sb") == F.col("b._ci"))
            & (F.col("a._cj") == F.col("b._sb")),
        )
        .where(
            (F.col("a._sb") != F.col("b._sb"))
            | (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        )
    )


def salted_count_distinct(
    df: DataFrame, key: str, value: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase distinct count per key: partial distinct within
    (key, salt), then merge — the manual form of what
    spark.sql.adaptive + partial aggregation do for plain counts, for
    the distinct case where a single hot key would otherwise hold the
    whole value set in one task."""
    salted = df.withColumn(
        "_salt", (F.hash(F.col(value)) % n_salts + n_salts) % n_salts
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.countDistinct(value).alias("_part")
    )
    # value-hash partitioned salts are disjoint value sets → sum merges
    return partial.groupBy(key).agg(F.sum("_part").cast("bigint").alias("n_distinct"))
