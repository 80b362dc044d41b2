"""Simulate the driver: vanilla SparkSession, import __spark_entry__ by path."""
import os, sys, time
# resolve the repo root from THIS file's location so a snapshot copy of
# the tree verifies the snapshot, not whatever /root/repo holds mid-edit
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim").config("spark.ui.enabled", "false")
         .getOrCreate())  # deliberately vanilla: no engine configs

import __spark_entry__ as E

# 1. smoke: entry()
t0 = time.time()
df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows in {time.time()-t0:.1f}s, schema={df.schema.simpleString()}")
assert len(rows) > 0

# 2. correctness at sf0.01 vs DuckDB oracle
import duckdb
SF = os.environ.get("DRIVER_SIM_SF", "/root/testdata/sf0.01")
con = duckdb.connect()
for name in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{SF}/{name}.parquet'")

qs, oracles = E.queries(), E.oracle_sql()
if len(sys.argv) > 1:  # optional substring filters: only matching queries
    qs = {n: f for n, f in qs.items() if any(a in n for a in sys.argv[1:])}
print(f"{len(qs)} queries, {len(oracles)} oracles")
from stock_trend_predictor_spark.testing import compare_frames
fails = 0
for name, fn in sorted(qs.items()):
    # queries whose oracle is only valid in a bounded data regime
    # (e.g. semdedup's unsampled-Lloyd constraint) assert the regime
    # when this is set, so an out-of-regime sweep fails LOUD instead
    # of as a silent value-hash mismatch
    if name in oracles:
        os.environ["SPARK_GRAFT_ORACLE_RUN"] = "1"
    else:
        os.environ.pop("SPARK_GRAFT_ORACLE_RUN", None)
    sdf = fn(spark, SF)
    if name in oracles:
        rel = con.sql(oracles[name])
        res = compare_frames(name, sdf, rel.fetchall(), list(rel.columns))
        print(res)
        fails += 0 if res.ok else 1
    else:
        print(f"[rows-only] {name}: {sdf.count()} rows")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
