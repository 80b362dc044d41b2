"""Bit-deterministic floating-point aggregation.

Why this exists: the driver's correctness gate value-hashes Spark output
against a DuckDB oracle. A plain ``SUM(double)`` over 60k rows is NOT
reproducible across engines — each engine adds in its own partition /
vectorization order and IEEE addition is not associative, so the last
few bits differ and the hash mismatches even though both answers are
"right".

The fix used throughout this engine: sum in *decimal* (exact, order
independent), then cast the final total to double (one well-defined
rounding). Both Spark and DuckDB produce the identical double for the
identical multiset of inputs, regardless of partitioning. Derived
ratios (averages) divide the exact double total by an exact bigint
count — again a single deterministic IEEE op.

This is also the numerically *better* answer at 100 TB: decimal partial
aggregation is still map-side combinable (no extra shuffle), and the
result doesn't drift as the cluster re-partitions.

Every oracle SQL string mirrors the same pattern, via
:func:`exact_sum_sql` / :func:`exact_avg_sql`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: decimal(27,6) holds |x| < 1e21 at 6 decimal places — covers every
#: money/quantity column in the test data with room for 1e6x scale-up,
#: while keeping SUM well inside decimal(38,6).
DECIMAL_T = "decimal(27,6)"


def exact_sum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL_T)).cast("double")
    return out.alias(alias) if alias else out


def exact_avg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL_T)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def exact_sum_over(col: Column | str, window) -> Column:
    """Order-independent windowed SUM (for rolling features)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DECIMAL_T)).over(window).cast("double")


def stable_round(col: Column | str, scale: int = 2) -> Column:
    """Cross-engine-deterministic ROUND for doubles.

    Engine-native ``round(double, n)`` diverges between Spark (exact
    BigDecimal HALF_UP) and DuckDB (``std::round(x*10^n)/10^n``) on
    half-boundary values — e.g. ``round(1.15 * 1.1, 2)`` → 1.27 vs
    1.26. ``floor(x*10^n + 0.5)/10^n`` uses only individually-rounded
    IEEE ops, so both engines produce the identical double for the
    identical input. Use this (with :func:`stable_round_sql` on the
    oracle side) for every rounded output column.
    """
    c = F.col(col) if isinstance(col, str) else col
    p = float(10**scale)
    return F.floor(c * p + F.lit(0.5)) / p


# --- DuckDB-dialect mirrors (used inside oracle_sql strings) ---------


def stable_round_sql(expr: str, scale: int = 2) -> str:
    p = float(10**scale)
    return f"floor(({expr}) * {p} + 0.5) / {p}"


def exact_sum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE)"


def exact_avg_sql(expr: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
