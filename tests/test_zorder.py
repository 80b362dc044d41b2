"""Z-order layout: Morton math properties + real file-skipping
measurement from parquet footers."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from stock_trend_predictor_spark.operators.zorder import (
    morton2,
    write_zordered,
)
from stock_trend_predictor_spark.sources.tables import load_table


def _py_morton(x: int, y: int) -> int:
    def spread(v: int) -> int:
        out = 0
        for i in range(31):
            out |= ((v >> i) & 1) << (2 * i)
        return out

    return spread(x) | (spread(y) << 1)


def test_morton_matches_bitwise_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 1023, 2**21 - 1)
            for y in (0, 3, 7, 511, 2**21 - 1)]
    df = spark.createDataFrame(rows, "x long, y long").select(
        "x", "y", morton2("x", "y").alias("z")
    )
    for r in df.collect():
        assert r["z"] == _py_morton(r["x"], r["y"])


def test_morton_preserves_locality_order(spark):
    """Along one axis with the other fixed, the curve is monotone."""
    df = spark.createDataFrame(
        [(x, 37) for x in range(512)], "x long, y long"
    ).select("x", morton2("x", "y").alias("z"))
    got = [r["z"] for r in df.orderBy("x").collect()]
    assert got == sorted(got)


def _candidate_files(path: str, col: str, lo: int, hi: int) -> int:
    """Files whose [min, max] for `col` intersects [lo, hi] — exactly
    what a stats-based reader must touch."""
    n = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            n += 1
    return n


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    # x and y must be independent, full-range dims for the skipping
    # comparison to be meaningful (l_suppkey spans only ~10 values at
    # sf0.001, and partkey/suppkey are correlated in TPC-H-ish data).
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("x"),
        (F.col("l_orderkey") % 256).alias("y"),
        "l_quantity",
    )
    linear = str(base / "linear")
    zordered = str(base / "zorder")
    # ~24 files each: linear = sorted on x only; zorder = Morton(x, y)
    (
        li.repartitionByRange(24, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(linear)
    )
    write_zordered(li, zordered, "x", "y", n_files=24)
    return linear, zordered


def test_zorder_skips_files_on_the_unsorted_axis(layouts):
    linear, zordered = layouts
    n_linear_total = len(glob.glob(f"{linear}/*.parquet"))
    n_z_total = len(glob.glob(f"{zordered}/*.parquet"))
    # y-band query (x unconstrained): the x-sorted layout cannot prune
    # at all; the z-ordered layout reads a fraction.
    lin = _candidate_files(linear, "y", 16, 31)
    zo = _candidate_files(zordered, "y", 16, 31)
    assert lin == n_linear_total
    assert zo <= n_z_total // 2, (zo, n_z_total)
    # and on the sorted axis the z-layout still prunes (both axes get
    # rectangle-tight stats).
    zx = _candidate_files(zordered, "x", 16, 31)
    assert zx <= n_z_total // 2, (zx, n_z_total)


def test_zorder_layout_preserves_data(spark, layouts):
    linear, zordered = layouts
    a = spark.read.parquet(linear)
    b = spark.read.parquet(zordered)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
