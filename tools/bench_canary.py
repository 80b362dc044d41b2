"""Drift-canary runner: time a FIXED 3-query set from a PINNED git
tree (r6 verdict #8 stretch).

The driver box shows ±30% cross-session drift (BENCH_DELTA_LOCAL.md's
r6 verbatim-tree A/B isolated a 1.22x day-over-day shift on UNCHANGED
code). This runner makes every future BENCH_r*.json carry its own
normalizer: bench.py extracts the pinned commit's tree, runs this
script on it in a SUBPROCESS (two package versions cannot share one
interpreter), and emits measured/baseline as ``drift_canary`` — a
pure box-speed ratio, because the code under test here never changes.

Usage: python tools/bench_canary.py <tree_dir> [sf_dir]
Prints one JSON line: {"canary_total_sec": t, "queries": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

#: fixed forever — cheap, stable, and covering scan+agg, join+topk,
#: and window shapes. Changing this list invalidates the baseline.
CANARY_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "window_rank_battery",
]
RUNS = 3


def main() -> None:
    tree = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, tree)

    from stock_trend_predictor_spark import get_spark
    from stock_trend_predictor_spark.plans import REGISTRY

    spark = get_spark(
        app_name="stp-canary",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup discipline as bench.py so the canary measures
    # steady-state compute, not first-call initialization
    REGISTRY["flagship_movement_rate"].fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()

    timings = {}
    for name in CANARY_QUERIES:
        q = REGISTRY[name]
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    spark.stop()
    print(
        json.dumps(
            {
                "canary_total_sec": round(sum(timings.values()), 3),
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
