from stock_trend_predictor_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    ticks,
)

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "ticks"]
