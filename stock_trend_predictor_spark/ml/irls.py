"""Distributed logistic regression via IRLS (iteratively reweighted
least squares) — the GLM fit the reference approximates with a
driver-resident sklearn call (reference ml_model/predict_from_vm4.py:29-39
fits one estimator per symbol on a pandas frame that must fit in memory).

The distributed shape: each Newton/IRLS step needs only the d x d
weighted moment matrix X^T W X and the d-vector X^T W z, both
map-side-combinable aggregates of per-row outer products — so one
combinable shuffle of d*(d+3)/2 doubles per iteration, a d x d solve
on the driver (a model-sized artifact, same policy as IVF centroids),
and a broadcast of the new coefficient vector into the next pass.
Data never concentrates anywhere; iterations are a fixed constant.

Determinism: the per-row products are summed in decimal(27,18)
(order-independent), so given identical coefficients every engine
pass produces identical moments; coefficients evolve through the same
numpy solves. Cross-engine replay differs only by libm exp ULPs,
which the law test bounds at 1e-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: per-row products are O(1)-magnitude; (27,18) keeps all stored
#: digits exact so sums are order-independent.
MOMENT_DECIMAL = "decimal(27,18)"


def fit_logistic_irls(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 4,
) -> tuple[list[float], dict[str, float]]:
    """Fit binary logistic regression; returns (beta, metrics).

    ``beta`` is [intercept, *feature coefficients]; metrics hold
    n_rows, accuracy and logloss of the final fit on the same data.
    """
    import numpy as np

    cols = [F.lit(1.0).alias("x0")] + [
        F.col(c).cast("double").alias(f"x{i+1}")
        for i, c in enumerate(feature_cols)
    ]
    d = len(feature_cols) + 1
    base = df.select(*cols, F.col(label_col).cast("double").alias("y"))
    beta = np.zeros(d)

    xs = [F.col(f"x{i}") for i in range(d)]
    for _ in range(iters):
        eta = sum((float(b) * x for b, x in zip(beta, xs)), F.lit(0.0))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = p * (F.lit(1.0) - p)
        # working response z = eta + (y - p) / w
        z = eta + (F.col("y") - p) / w
        aggs = []
        for i in range(d):
            for j in range(i, d):
                aggs.append(
                    F.sum((w * xs[i] * xs[j]).cast(MOMENT_DECIMAL))
                    .cast("double")
                    .alias(f"a_{i}_{j}")
                )
            aggs.append(
                F.sum((w * xs[i] * z).cast(MOMENT_DECIMAL))
                .cast("double")
                .alias(f"b_{i}")
            )
        row = base.agg(*aggs).collect()[0]  # d*(d+3)/2 doubles
        a = np.zeros((d, d))
        bvec = np.zeros(d)
        for i in range(d):
            for j in range(i, d):
                a[i, j] = a[j, i] = row[f"a_{i}_{j}"]
            bvec[i] = row[f"b_{i}"]
        beta = np.linalg.solve(a, bvec)

    eta = sum((float(b) * x for b, x in zip(beta, xs)), F.lit(0.0))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    eps = F.lit(1e-12)
    ll = -(
        F.col("y") * F.log(p + eps)
        + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p + eps)
    )
    hit = (
        (p >= 0.5).cast("double") == F.col("y")
    ).cast("long")
    m = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(ll.cast(MOMENT_DECIMAL)).cast("double").alias("sll"),
        F.sum(hit).alias("hits"),
    ).collect()[0]
    metrics = {
        "n_rows": float(m["n"]),
        "accuracy": m["hits"] / m["n"],
        "logloss": m["sll"] / m["n"],
    }
    return [float(b) for b in beta], metrics
