"""Vectorized (numpy/Arrow) similarity kernels — the Pandas-UDF
counterpart of operators/similarity.py's pure-expression math.

Two implementations of the same cosine-similarity contract:

- expression form (operators/similarity.py): zip_with/aggregate folds,
  bit-identical to the DuckDB oracle — the *correctness* path;
- this module: `pandas_udf` over Arrow batches calling numpy BLAS —
  the *throughput* path when vectors are wide and the corpus is large
  (one matrix-vector product per batch instead of a codegen'd scalar
  fold per element).

Numerically the two differ only in float summation order (BLAS blocks
vs sequential fold), so results agree to ~1e-12 relative — tests
assert that tolerance, and oracle-checked queries use the expression
form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def l2norm_vectorized(vec_col: str | Column) -> Column:
    """Batched L2 norm of an array<float|double> column (numpy).

    The pandas_udf is built at call time — the decorator needs an
    active SparkSession, so module import stays session-free.
    """

    @pandas_udf("double")
    def _l2norm(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        return pd.Series(np.sqrt(np.einsum("ij,ij->i", m, m)))

    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return _l2norm(c.cast("array<double>"))


def cosine_to_query(vec_col: str | Column, query: list[float]) -> Column:
    """Cosine of every row's vector against one fixed query vector.

    The query is closed over and shipped once per task (broadcast by
    the UDF serializer); per Arrow batch the kernel is a single
    matrix-vector product — this is the shape that wins when scoring
    millions of corpus vectors against a handful of queries.
    """
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.sqrt(q @ q))

    @pandas_udf("double")
    def _cos(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        norms = np.sqrt(np.einsum("ij,ij->i", m, m))
        return pd.Series((m @ q) / (norms * qn))

    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return _cos(c.cast("array<double>"))


def brute_force_topk_vectorized(
    corpus: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k for ONE query vector over the corpus, numpy path.

    Narrow scan + per-partition top-k heap (TakeOrderedAndProject) —
    no shuffle of the corpus, no driver collect of scores.
    """
    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        cosine_to_query(vec_col, query).alias("sim"),
    )
    return scored.orderBy(F.col("sim").desc(), F.col("neighbor_id")).limit(k)
