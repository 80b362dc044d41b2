"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``stock_trend_predictor_spark.plans`` — every operator
from SURVEY.md §2 registers itself there with a (spark, sf_dir) callable
and, where SQL-expressible, a DuckDB oracle string.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from stock_trend_predictor_spark import plans as _plans  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _plans.REGISTRY["flagship_movement_rate"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each SQL-expressible query."""
    return _plans.oracle_sql()
