from stock_trend_predictor_spark.functions.exact import (
    exact_avg,
    exact_sum,
    exact_sum_over,
)
from stock_trend_predictor_spark.functions.stock import change_pct, movement

__all__ = ["exact_avg", "exact_sum", "exact_sum_over", "change_pct", "movement"]
