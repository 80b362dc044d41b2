"""Measured scale-up evidence: replicate the sf0.1 tables REPLICAS×
with shifted keys and time headline queries at both scales
(SCALE.md's "Measured 30× scale-up" protocol, committed as a tool in
round 5 so the measurement is reproducible).

Key shifting keeps referential integrity: every fact row's FK moves by
the same replica stride as its dimension's PK. Documents get a
per-replica prefix token — a deliberately DUP-SATURATED corpus (every
doc gains ~REPLICAS near-identical replicas), the worst case for the
dedup family. Embeddings replicate as exact vector copies (worst case
for blocked pair enumeration). region/nation are fixed-universe dims
and copy unshifted.

Usage:
    python tools/scaleup.py build            # write the 30x dir
    python tools/scaleup.py measure q1_pricing_summary ann_pq_adc_cosine ...
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import os

SRC = "/root/testdata/sf0.1"
REPLICAS = int(os.environ.get("SCALEUP_REPLICAS", "30"))
DST = os.environ.get("SCALEUP_DST", f"/tmp/scaleup{REPLICAS}")
STRIDE = 10**9


def _get_spark(app: str):
    from stock_trend_predictor_spark import get_spark

    spark = get_spark(
        app_name=app,
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def build() -> None:
    from pyspark.sql import functions as F

    from stock_trend_predictor_spark.sources.tables import load_table

    spark = _get_spark("scaleup-build")
    reps = spark.range(REPLICAS).select(F.col("id").alias("r"))

    #: table -> columns to shift by r * STRIDE (PKs and FKs together)
    shifted = {
        "events": ["event_id", "user_id"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "embeddings": ["vec_id"],
        "documents": ["doc_id"],
    }
    for name, cols in shifted.items():
        df = load_table(spark, SRC, name).crossJoin(F.broadcast(reps))
        for c in cols:
            df = df.withColumn(c, F.col(c) + F.col("r") * F.lit(STRIDE))
        if name == "documents":
            # near-identical replicas: per-replica prefix token
            df = df.withColumn(
                "text",
                F.concat(F.lit("rep"), F.col("r").cast("string"),
                         F.lit(" "), F.col("text")),
            )
            # generator-native Zipf vocabulary tail (df(zt_j) ~
            # N * 2**-(j+1)) as a SEPARATE column — the raw text
            # stays byte-identical to earlier rounds so the dedup
            # family's measured numbers stay comparable; BM25-side
            # tooling concatenates it at fold time
            # (functions/text.py::zipf_tail_token has the law)
            from stock_trend_predictor_spark.functions.text import (
                zipf_tail_token,
            )

            df = df.withColumn("zipf_token", zipf_tail_token("doc_id"))
        df.drop("r").write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )
        print(f"built {name}")
    for name in ("region", "nation"):
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )
    spark.stop()
    print(f"done -> {DST}")


def measure(queries: list[str]) -> None:
    from stock_trend_predictor_spark.plans import REGISTRY

    spark = _get_spark("scaleup-measure")

    def best2(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    # warmup
    REGISTRY["flagship_movement_rate"].fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()

    print(f"| query | 1x (s) | {REPLICAS}x (s) | wall ratio |")
    print("|---|---|---|---|")
    for name in queries:
        t1 = best2(name, SRC)
        t30 = best2(name, DST)
        print(f"| {name} | {t1:.2f} | {t30:.2f} | {t30 / t1:.2f}x |")
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "build":
        build()
    elif len(sys.argv) > 1 and sys.argv[1] == "measure":
        measure(sys.argv[2:])
    else:
        print(__doc__)
