"""Distributed global ranking — the two-level parallel prefix scan.

``row_number()/ntile()/rank()`` over an UNPARTITIONED window is the
classic Spark scale-killer: the physical plan moves every row into ONE
partition and sorts it in a single task (`WindowExec: No Partition
Defined`). At 100 TB that task never finishes; the plan is wrong even
when the answer is right.

This module provides the scalable equivalent, exact to the row:

1. bucket every row by an ORDER-ALIGNED key (all rows of bucket ``i``
   sort before every row of bucket ``j > i`` under the requested
   ordering);
2. aggregate per-bucket counts — a parameter-sized table (one row per
   bucket, never per data row);
3. turn counts into carry-in offsets with a window OVER THE COUNTS
   TABLE (parameter-sized frame — the sanctioned global-window class);
4. broadcast the offsets back and add a row_number PARTITIONED by
   bucket.

``rank = offset[bucket] + row_number within bucket`` — exact under any
shuffle schedule because bucket assignment is a deterministic function
of the row and the ordering is total. The same construction as
``concurrent_intervals_profile``'s day-level sweep carry-ins, packaged
as a reusable operator.

Bucket sources:

- a low-cardinality order column itself (e.g. an integer score whose
  domain is value-bounded — vocabulary richness, a decile id);
- :func:`quantile_bucket` — broadcast exact-percentile cut points over
  a numeric column (the `feature_decile_binning` technique) for
  high-cardinality numeric keys. Cut placement only affects load
  balance, never the rank, so no cross-engine float parity is needed;
- a uniform hash prefix (e.g. ``substring(md5(id), 1, 2)``) when the
  ordering key is itself a hash.

Scale note: each bucket's rows form one window partition, so pick
``n_buckets ~ corpus_bytes / executor_partition_budget``. The offsets
table stays at one row per bucket either way.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["prefix_scan_rank", "quantile_bucket"]


def quantile_bucket(
    df: DataFrame, col: str, n_buckets: int = 64
) -> Column:
    """Order-aligned bucket id for a numeric column via broadcast
    percentile cut points (a driver artifact of ``n_buckets - 1``
    doubles, like an IVF centroid table). Equal values always share a
    bucket, so any tie-break ordering stays bucket-local.

    Cuts come from ``approx_percentile`` (a mergeable KLL-style
    sketch): cut PLACEMENT only affects load balance, never the rank
    (any monotone thresholds are order-aligned), so the exact
    ``percentile`` — which buffers the whole column in one aggregation
    buffer and cannot survive a 100 TB column — buys nothing here.

    Precondition: no NaN in ``col``. NaN compares false against every
    cut (bucket 0) while Spark's sort order places NaN LAST — a NaN
    input would break order alignment silently. Current callers feed
    decimal-derived doubles / hashes that cannot be NaN."""
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    [cuts] = (
        df.agg(
            F.expr(
                f"approx_percentile({col}, "
                f"array({', '.join(map(repr, fracs))}), 10000)"
            ).alias("qs")
        ).collect()
    )
    arr = F.array(*[F.lit(float(c)) for c in cuts["qs"]])
    return F.size(F.filter(arr, lambda q: F.col(col) > q))


def prefix_scan_rank(
    df: DataFrame,
    bucket: Column,
    order_cols: Sequence[Column | str],
    rank_name: str = "global_rank",
    sum_col: str | None = None,
    cumsum_name: str = "global_cumsum",
    partition_cols: Sequence[str] = (),
    top_k: int | None = None,
) -> DataFrame:
    """``df`` plus an exact 1-based global ``row_number`` over
    ``order_cols`` — computed without any unpartitioned window over
    the data. ``bucket`` must be order-aligned with ``order_cols``
    (see module docstring); ordering must be total (include a unique
    tie-break column) for a deterministic result.

    With ``sum_col``, also emits the running cumulative sum of that
    column in the same global order (inclusive frame) as
    ``cumsum_name`` — per-bucket totals become carry-in offsets
    exactly like the counts, so decimal inputs stay exact.

    With ``partition_cols``, the rank restarts per group (the
    many-groups generalization: e.g. one exact median selection per
    symbol pair). The offsets table grows to groups x buckets rows —
    still parameter-sized as long as the group universe is — and the
    offsets window partitions by group, so no frame ever exceeds the
    bucket count.

    With ``top_k``, rows whose (per-group) rank exceeds ``top_k`` are
    dropped AND — the scale win — whole buckets whose carry-in offset
    is already ``>= top_k`` are pruned BEFORE the within-bucket
    window: the inner broadcast join keeps only the bucket(s)
    containing each group's first ``top_k`` rows, so a per-group
    top-k sorts ~1/n_buckets of the data instead of all of it (or,
    vs the WindowGroupLimit plan, skips the full map-side sort).
    """
    parts = list(partition_cols)
    b = df.withColumn("__bucket", bucket)
    aggs = [F.count(F.lit(1)).alias("__n")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("__s"))
    counts = b.groupBy(*parts, "__bucket").agg(*aggs)
    # parameter-sized frame: one row per (group, bucket)
    w_prev = (
        Window.partitionBy(*parts) if parts else Window
    ).orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [
        *[F.col(c) for c in parts],
        F.col("__bucket"),
        F.coalesce(F.sum("__n").over(w_prev), F.lit(0)).alias("__off"),
    ]
    if sum_col is not None:
        # typed zero so a decimal running sum stays decimal through
        # the first bucket's empty-frame coalesce
        zero = F.lit(0).cast(counts.schema["__s"].dataType)
        off_cols.append(
            F.coalesce(F.sum("__s").over(w_prev), zero).alias("__soff")
        )
    off = counts.select(*off_cols)
    if top_k is not None:
        # bucket-level prune: a row can only have rank <= k if its
        # bucket starts before the k-th row of its group
        off = off.where(F.col("__off") < top_k)
    w_in = Window.partitionBy(*parts, "__bucket").orderBy(*order_cols)
    rn = F.row_number().over(w_in)
    out = (
        b.join(F.broadcast(off), [*parts, "__bucket"])
        .withColumn(rank_name, (F.col("__off") + rn).cast("bigint"))
    )
    if top_k is not None:
        out = out.where(F.col(rank_name) <= top_k)
    if sum_col is not None:
        run = F.sum(sum_col).over(
            w_in.rowsBetween(Window.unboundedPreceding, 0)
        )
        out = out.withColumn(
            cumsum_name,
            F.col("__soff") + run,
        ).drop("__soff")
    return out.drop("__bucket", "__off")
