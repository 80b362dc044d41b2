"""Per-key isotonic regression via pool-adjacent-violators (PAVA).

Calibration companion to model_calibration_bins: instead of fixed
prediction deciles, fit the best monotone (least-squares) step map
from predicted to actual per key. Distributed shape: one shuffle on
the key, PAVA inside an Arrow batch per key over the (x, mean y,
weight) table PRE-aggregated by distinct x — so the Python step sees
one row per distinct prediction, not one per tick. PAVA itself is
O(n) with the stack formulation.

Determinism: ties in x are pooled by the pre-aggregate (exact decimal
mean), blocks merge in ascending-x order, and the output step
boundaries are exact input doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import DECIMAL_T


def isotonic_fit_per_key(
    scored: DataFrame,
    key: str = "symbol",
    x: str = "predicted_close",
    y: str = "close",
) -> DataFrame:
    """Fit y = iso(x) per key; returns the step function as rows
    (key, step_idx, x_lo, x_hi, fitted, n_rows)."""
    import pandas as pd

    # pool exact-tie x values first: decimal-exact sum keeps the
    # per-x mean order-independent
    pooled = scored.groupBy(key, x).agg(
        F.sum(F.col(y).cast(DECIMAL_T)).cast("double").alias("_sy"),
        F.count(F.lit(1)).alias("_n"),
    )

    out_schema = (
        f"{key} string, step_idx int, x_lo double, x_hi double, "
        "fitted double, n_rows long"
    )

    def pava(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x).reset_index(drop=True)
        # blocks: [x_lo, x_hi, sum_y, n]
        blocks: list[list[float]] = []
        for _, r in pdf.iterrows():
            blocks.append([r[x], r[x], r["_sy"], r["_n"]])
            # merge while the monotone constraint is violated
            while (
                len(blocks) > 1
                and blocks[-2][2] / blocks[-2][3]
                > blocks[-1][2] / blocks[-1][3]
            ):
                _, hi2, s2, n2 = blocks.pop()
                blocks[-1][1] = hi2  # merged block extends to the right
                blocks[-1][2] += s2
                blocks[-1][3] += n2
        return pd.DataFrame(
            {
                key: pdf[key].iloc[0],
                "step_idx": range(1, len(blocks) + 1),
                "x_lo": [b[0] for b in blocks],
                "x_hi": [b[1] for b in blocks],
                "fitted": [b[2] / b[3] for b in blocks],
                "n_rows": [int(b[3]) for b in blocks],
            }
        )

    return pooled.groupBy(key).applyInPandas(pava, out_schema)
