"""stock_trend_predictor_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of the reference
repo VietNguyen865/stock-trend-predictor (a streaming stock-trend ETL +
ML pipeline, see SURVEY.md) as an idiomatic Spark engine:

- everything is a DataFrame with an explicit schema (SURVEY §1.3);
- streaming via Structured Streaming micro-batches (SURVEY §2.9);
- per-key ML via ``groupBy().applyInPandas`` + MLlib (SURVEY §2.10);
- plus large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) designed for 100 TB scale.

Layout:
    session     SparkSession factory with scale-oriented defaults
    sources     batch/stream readers, JSON envelope decode, ticks views
    functions   scalar expression helpers (stock, text, vector math)
    operators   composed relational/time-series/dedup/similarity ops
    plans       the query registry consumed by __spark_entry__.py
    streaming   watermark dedup, routing, windowed aggregation
    ml          per-symbol model training/scoring
"""

from stock_trend_predictor_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
