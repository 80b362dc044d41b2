"""UDF-surface tests: plain udf equals the expression twin, grouped-agg
pandas UDAF, and the Python UDTF gap filler."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.stock import change_pct
from stock_trend_predictor_spark.functions.udfs import (
    BarGapFiller,
    py_change_pct,
    weighted_avg_udaf,
)


def _ticks(spark):
    return spark.createDataFrame(
        [
            ("AAPL", 10.0, 11.0, 100.0),
            ("AAPL", 11.0, 10.5, 300.0),
            ("MSFT", 20.0, 22.0, 50.0),
            ("MSFT", 0.0, 1.0, None),
        ],
        "symbol string, open double, close double, volume double",
    )


def test_plain_udf_matches_expression(spark):
    df = _ticks(spark)
    rows = df.select(
        change_pct().alias("expr_pct"),
        py_change_pct("open", "close").alias("udf_pct"),
    ).collect()
    for r in rows:
        assert r["expr_pct"] == r["udf_pct"]


def test_grouped_agg_pandas_udaf(spark):
    vwap = weighted_avg_udaf()
    got = {
        r["symbol"]: r["vwap"]
        for r in _ticks(spark)
        .groupBy("symbol")
        .agg(vwap("close", "volume").alias("vwap"))
        .collect()
    }
    assert abs(got["AAPL"] - (11.0 * 100 + 10.5 * 300) / 400) < 1e-12
    assert abs(got["MSFT"] - 22.0) < 1e-12  # null volume weighs 0


def test_python_udtf_gap_filler(spark):
    spark.udtf.register("bar_gap_filler", BarGapFiller)
    rows = spark.sql(
        """
        SELECT * FROM bar_gap_filler(
            TIMESTAMP '2024-01-01 09:30:00',
            TIMESTAMP '2024-01-01 09:33:00',
            1,
            '2024-01-01 09:30:00|2024-01-01 09:32:00'
        )
        """
    ).collect()
    grid = [(str(r["bar_start"]), r["is_gap"]) for r in rows]
    assert grid == [
        ("2024-01-01 09:30:00", False),
        ("2024-01-01 09:31:00", True),
        ("2024-01-01 09:32:00", False),
        ("2024-01-01 09:33:00", True),
    ]


def test_map_in_arrow_crc_matches_jvm_crc32(spark, sf_dir):
    """The mapInArrow tier must agree with the JVM builtin on the same
    bytes — the equality law that licenses using it for byte-level
    kernels Spark lacks."""
    from pyspark.sql import functions as F

    from stock_trend_predictor_spark.operators.multimodal import (
        attach_payload,
        payload_crc32_arrow,
    )
    from stock_trend_predictor_spark.sources.tables import load_table

    with_payload = attach_payload(
        load_table(spark, sf_dir, "documents").limit(200)
    )
    arrow_side = {
        r.doc_id: r.payload_crc32
        for r in payload_crc32_arrow(with_payload).collect()
    }
    jvm_side = {
        r.doc_id: r.crc
        for r in with_payload.select(
            "doc_id", F.crc32("payload").alias("crc")
        ).collect()
    }
    assert arrow_side == jvm_side and len(arrow_side) == 200


def test_sql_views_same_plan_as_dataframe(spark, sf_dir):
    """Views are metadata: the SQL text and the DataFrame form must
    produce the same answer AND the view path must still push filters
    to the parquet scan."""
    from pyspark.sql import functions as F

    from stock_trend_predictor_spark.sources.tables import load_table
    from stock_trend_predictor_spark.sources.views import register_views

    register_views(spark, sf_dir, ("lineitem",))
    sql_n = spark.sql(
        "SELECT count(*) AS n FROM lineitem WHERE l_quantity < 10"
    ).first()["n"]
    df_n = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") < 10)
        .count()
    )
    assert sql_n == df_n
    plan = str(
        spark.sql("SELECT l_orderkey FROM lineitem WHERE l_quantity < 10")
        ._jdf.queryExecution()
        .executedPlan()
    )
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity" in plan
