"""Z-order (Morton-curve) clustering — multi-dimensional data
skipping for parquet layouts.

A single-column sort makes row-group min/max stats selective on ONE
axis; queries filtering the other axes scan everything. Interleaving
the bits of two key columns into a Morton code and sorting by THAT
gives every file a small rectangle of the (x, y) key space, so
min/max stats prune on BOTH axes (the Delta Lake ``OPTIMIZE ZORDER
BY`` construction). At 100 TB this is the difference between a
dashboard predicate reading ~sqrt(files) and reading the whole table.

The bit-spread is pure Catalyst arithmetic (shiftleft/and/or — whole-
stage codegen, no UDF), with a DuckDB mirror built from the same
magic-mask chain so the curve math is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Magic masks that spread a 31-bit integer so its bits occupy every
# second position (the classic 64-bit 2-D Morton construction; 31+31
# interleaved bits keep the code positive in a signed long).
_SPREAD: list[tuple[int, int]] = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]
MAX_BITS = 31


def _spread_bits(c: Column) -> Column:
    x = c.cast("long").bitwiseAND(F.lit((1 << MAX_BITS) - 1))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _spread_bits_sql(expr: str) -> str:
    s = f"(CAST({expr} AS BIGINT) & {(1 << MAX_BITS) - 1})"
    for shift, mask in _SPREAD:
        s = f"(({s} | ({s} << {shift})) & {mask})"
    return s


def morton2(x: Column | str, y: Column | str) -> Column:
    """64-bit Morton code of two non-negative ints (<= 21 bits each):
    bit i of x lands at position 2i, bit i of y at 2i+1."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    return _spread_bits(xc).bitwiseOR(F.shiftleft(_spread_bits(yc), 1))


def morton2_sql(x_expr: str, y_expr: str) -> str:
    """DuckDB mirror of :func:`morton2` — identical mask chain.

    NB each spread repeats its input subexpression; DuckDB CSE handles
    it, and the oracle only runs at test scale."""
    return (
        f"({_spread_bits_sql(x_expr)} | ({_spread_bits_sql(y_expr)} << 1))"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    n_files: int,
    max_records_per_file: int | None = None,
) -> None:
    """Rewrite ``df`` clustered on the Morton curve of (x, y).

    `repartitionByRange` on the code gives each output task a
    contiguous curve segment (a small key-space rectangle); parquet
    then records tight min/max for BOTH x and y per file. The sort is
    the whole cost — same as any OPTIMIZE — and is a one-time layout
    investment, not a per-query one.
    """
    keyed = df.withColumn("_z", morton2(x, y))
    out = (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    w = out.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)
