"""In-repo replica of the driver's DuckDB-oracle correctness gate.

Runs a registered query on Spark AND its oracle SQL on DuckDB over the
same parquet directory, then compares row count, column names, and an
order-insensitive value multiset — the same contract the driver grades
(CORRECTNESS_r{N}.json). Keeping a local replica means a mismatch is
caught in pytest at sf0.001 instead of at round-end.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import DataFrame, SparkSession

from stock_trend_predictor_spark.sources.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the test tables registered as views."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0 / +0.0
        return v
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    return v


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.ok else "FAIL"
        detail = "; ".join(self.mismatches)
        return f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows} {detail}"


def compare_frames(name: str, spark_df: DataFrame, oracle_rows, oracle_cols) -> CompareResult:
    s_cols = sorted(spark_df.columns)
    o_cols = sorted(oracle_cols)
    res = CompareResult(name=name, ok=True, spark_rows=-1, oracle_rows=len(oracle_rows))
    if s_cols != o_cols:
        res.ok = False
        res.mismatches.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        res.spark_rows = spark_df.count()
        return res

    s_rows = spark_df.collect()
    res.spark_rows = len(s_rows)
    if len(s_rows) != len(oracle_rows):
        res.ok = False
        res.mismatches.append("row count differs")

    def _sort_key(t):
        # None-safe, mixed-type-safe canonical order: Python can't
        # compare None < float (NULL cells are legitimate output, e.g.
        # nullif-guarded divisions), so order by (is-null, type, str).
        return tuple((v is None, type(v).__name__, str(v)) for v in t)

    s_multiset = sorted(
        (tuple(_norm_cell(row[c]) for c in s_cols) for row in s_rows),
        key=_sort_key,
    )
    o_index = {c: i for i, c in enumerate(oracle_cols)}
    o_multiset = sorted(
        (
            tuple(_norm_cell(row[o_index[c]]) for c in s_cols)
            for row in oracle_rows
        ),
        key=_sort_key,
    )
    if s_multiset != o_multiset:
        res.ok = False
        diff = [
            (a, b) for a, b in zip(s_multiset, o_multiset) if a != b
        ][:3]
        res.mismatches.append(f"values differ; first diffs: {diff}")
    return res


def check_query(
    spark: SparkSession, con: duckdb.DuckDBPyConnection, name: str, sf_dir: str
) -> CompareResult:
    """Run one registered query against its oracle and compare."""
    from stock_trend_predictor_spark.plans.registry import REGISTRY

    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    if q.oracle is None:
        n = sdf.count()
        return CompareResult(name=name, ok=n >= 0, spark_rows=n, oracle_rows=-1)
    rel = con.sql(q.oracle)
    return compare_frames(name, sdf, rel.fetchall(), [c for c in rel.columns])
