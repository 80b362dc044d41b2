"""Layout queries: Z-order curve math, oracle-proven bit-for-bit.

The layout machinery itself (write_zordered, file-level min/max
skipping) is exercised in tests/test_zorder.py with real parquet
footers; this query pins the Morton-code arithmetic — the part both
engines must agree on exactly — through the driver's value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.operators.zorder import morton2, morton2_sql
from stock_trend_predictor_spark.sources.tables import load_table


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "zorder_curve_key",
        oracle=f"""
SELECT l_orderkey, l_partkey, l_suppkey,
       {morton2_sql("l_partkey % 1024", "l_suppkey % 1024")} AS zkey
FROM lineitem
WHERE l_orderkey % 97 = 0
""",
        doc="Morton interleave of (l_partkey % 1024, l_suppkey % 1024) "
        "on a deterministic row sample. The magic-mask spread chain is "
        "pure codegen arithmetic (shiftleft/and/or); the DuckDB mirror "
        "runs the same chain, so hash equality proves the curve key is "
        "bit-identical cross-engine — the property file-skipping "
        "correctness rests on (operators/zorder.py).",
    )
    def zorder_curve_key(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        return li.where(F.col("l_orderkey") % 97 == 0).select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            morton2(
                F.pmod(F.col("l_partkey"), F.lit(1024)),
                F.pmod(F.col("l_suppkey"), F.lit(1024)),
            ).alias("zkey"),
        )


_register()
