"""Import every query module so the registry is fully populated."""

from stock_trend_predictor_spark.plans import analytics_queries  # noqa: F401
from stock_trend_predictor_spark.plans import dedup_queries  # noqa: F401
from stock_trend_predictor_spark.plans import corpus_stats_queries  # noqa: F401
from stock_trend_predictor_spark.plans import bloom_queries  # noqa: F401
from stock_trend_predictor_spark.plans import classifier_queries  # noqa: F401
from stock_trend_predictor_spark.plans import engineering_queries  # noqa: F401
from stock_trend_predictor_spark.plans import distance_queries  # noqa: F401
from stock_trend_predictor_spark.plans import kmv_queries  # noqa: F401
from stock_trend_predictor_spark.plans import estimator_queries  # noqa: F401
from stock_trend_predictor_spark.plans import evaluation_queries  # noqa: F401
from stock_trend_predictor_spark.plans import evt_queries  # noqa: F401
from stock_trend_predictor_spark.plans import eventtime_queries  # noqa: F401
from stock_trend_predictor_spark.plans import experiment_queries  # noqa: F401
from stock_trend_predictor_spark.plans import feateng_queries  # noqa: F401
from stock_trend_predictor_spark.plans import funnel_latency_queries  # noqa: F401
from stock_trend_predictor_spark.plans import graph_queries  # noqa: F401
from stock_trend_predictor_spark.plans import growth_queries  # noqa: F401
from stock_trend_predictor_spark.plans import indicator_queries  # noqa: F401
from stock_trend_predictor_spark.plans import ivm_queries  # noqa: F401
from stock_trend_predictor_spark.plans import keyphrase_queries  # noqa: F401
from stock_trend_predictor_spark.plans import lateness_queries  # noqa: F401
from stock_trend_predictor_spark.plans import layout_queries  # noqa: F401
from stock_trend_predictor_spark.plans import ml_queries  # noqa: F401
from stock_trend_predictor_spark.plans import mlops_queries  # noqa: F401
from stock_trend_predictor_spark.plans import multimodal_queries  # noqa: F401
from stock_trend_predictor_spark.plans import portfolio_queries  # noqa: F401
from stock_trend_predictor_spark.plans import privacy_queries  # noqa: F401
from stock_trend_predictor_spark.plans import product_queries  # noqa: F401
from stock_trend_predictor_spark.plans import profiling_queries  # noqa: F401
from stock_trend_predictor_spark.plans import quality_queries  # noqa: F401
from stock_trend_predictor_spark.plans import ranking_queries  # noqa: F401
from stock_trend_predictor_spark.plans import relational_queries  # noqa: F401
from stock_trend_predictor_spark.plans import sax_queries  # noqa: F401
from stock_trend_predictor_spark.plans import screening_queries  # noqa: F401
from stock_trend_predictor_spark.plans import selection_queries  # noqa: F401
from stock_trend_predictor_spark.plans import signal_queries  # noqa: F401
from stock_trend_predictor_spark.plans import similarity_queries  # noqa: F401
from stock_trend_predictor_spark.plans import span_queries  # noqa: F401
from stock_trend_predictor_spark.plans import expectations_queries  # noqa: F401
from stock_trend_predictor_spark.plans import spectral_queries  # noqa: F401
from stock_trend_predictor_spark.plans import stattest_queries  # noqa: F401
from stock_trend_predictor_spark.plans import stock_queries  # noqa: F401
from stock_trend_predictor_spark.plans import structure_queries  # noqa: F401
from stock_trend_predictor_spark.plans import summary_queries  # noqa: F401
from stock_trend_predictor_spark.plans import text_queries  # noqa: F401
from stock_trend_predictor_spark.plans import timeseries_queries  # noqa: F401
from stock_trend_predictor_spark.plans import tpch_queries  # noqa: F401
from stock_trend_predictor_spark.plans import trend_queries  # noqa: F401 (after signal/indicator: composes their oracles)
from stock_trend_predictor_spark.plans.registry import (
    REGISTRY,
    Query,
    oracle_sql,
    queries,
    register,
)

__all__ = ["REGISTRY", "Query", "register", "queries", "oracle_sql"]
