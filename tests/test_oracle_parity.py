"""Local replica of the driver's correctness gate (sf0.001).

Every registered query with an oracle must value-match DuckDB here; a
failure in this file predicts a CORRECTNESS_r{N}.json failure.
"""

from __future__ import annotations

import pytest

from stock_trend_predictor_spark.plans import REGISTRY
from stock_trend_predictor_spark.testing import check_query


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    res = check_query(spark, duck, name, sf_dir)
    assert res.ok, str(res)
    assert res.spark_rows >= 0
