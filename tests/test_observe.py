"""Batch observability (df.observe) and parameterized SQL."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from stock_trend_predictor_spark.sources.tables import load_table


def test_observe_collects_pipeline_metrics(spark, sf_dir):
    """df.observe rides metrics on the SAME pass as the action — the
    audit counters a 100 TB job wants without a second scan."""
    obs = Observation("quality")
    docs = load_table(spark, sf_dir, "documents").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum((F.length("text") < 10).cast("long")).alias("too_short"),
        F.max("n_chars").alias("max_chars"),
    )
    kept = docs.where(F.length("text") >= 10).count()
    m = obs.get
    assert m["rows_seen"] == kept + m["too_short"]
    assert m["max_chars"] > 0


def test_parameterized_sql_named_args(spark, sf_dir):
    """spark.sql named parameters: same result as the literal query,
    no string interpolation (the injection-safe templating path)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_v"
    )
    lit = spark.sql(
        "SELECT count(*) AS n FROM orders_v "
        "WHERE o_totalprice > 300000 AND o_orderstatus = 'O'"
    ).collect()[0]["n"]
    par = spark.sql(
        "SELECT count(*) AS n FROM orders_v "
        "WHERE o_totalprice > :thr AND o_orderstatus = :st",
        args={"thr": 300000, "st": "O"},
    ).collect()[0]["n"]
    assert par == lit
    spark.catalog.dropTempView("orders_v")
