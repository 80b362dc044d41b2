"""TPC-H analogue battery — the remaining classic shapes (Q2, Q4, Q8,
Q9, Q11, Q12, Q13, Q15, Q17, Q19, Q20, Q21, Q22) adapted to this
schema (no partsupp / comment / commit-receipt-date columns; the
part-supplier relation is derived from lineitem where needed, as
q16_attr_supplier_counts already does).

Why these matter beyond coverage: each exercises a distinct optimizer
shape the reference engine (a row-at-a-time pandas pipeline,
reference predict_from_vm4.py:29-39) cannot express at all —
correlated scalar subqueries (Q2/Q17), EXISTS/NOT-EXISTS semi/anti
joins (Q4/Q21/Q22), scalar-subquery thresholds against a global
aggregate (Q11/Q15), disjunctive multi-column pushdown (Q19),
left-outer count distributions (Q13), and conditional aggregation
(Q8/Q12).

Scale notes common to the whole file:
- region/nation/supplier and *filtered* part are pinned broadcast —
  provably small even at 100 TB fact scale (dims grow ~linearly with
  SF only for customer/part; the filtered slices here stay KB-MB);
- customer and orders are never broadcast (VERDICT r1: a stats-less
  100 TB scan must not gamble on dim size); facts meet them
  sort-merge on the single necessary key;
- every double aggregate sums in decimal(27,6) (map-side combinable,
  order-independent — functions/exact.py) so results are identical
  at any parallelism, and every oracle mirrors the same cast chain;
- correlated subqueries are written decorrelated by hand on the Spark
  side (aggregate → broadcast join) and as explicit CTE joins in the
  oracle so both engines compute the same well-defined plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stock_trend_predictor_spark.functions.exact import (
    DECIMAL_T,
    exact_avg,
    exact_avg_sql,
    exact_sum,
    exact_sum_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table


def _ts(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    # ------------------------------------------------------------------
    # Q2 — minimum-cost supplier (correlated MIN subquery)
    # ------------------------------------------------------------------
    @register(
        "q2_min_cost_supplier",
        oracle="""
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2
), eur AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), cand AS (
  SELECT p_partkey, p_name, s_name, s_acctbal, n_name, unit_cost,
         MIN(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM supply
  JOIN eur  ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey
  WHERE p_size <= 15 AND p_type = 'SMALL'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM cand WHERE unit_cost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
        doc="TPC-H Q2 analogue: per qualifying part, the EUROPE-region "
        "supplier(s) achieving the minimum observed unit price, with "
        "the supply relation derived from lineitem (no partsupp in "
        "this schema). The correlated MIN subquery is decorrelated to "
        "a partition window over the candidate set. Scale shape: the "
        "supply relation is a combinable pre-aggregation of the fact "
        "(MIN per (partkey, suppkey) — shrinks 100 TB to relation "
        "size before any join); region-filtered suppliers and "
        "attribute-filtered part both broadcast; unit price is a "
        "single IEEE division so MIN/equality are bit-deterministic "
        "cross-engine.",
    )
    def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
        supply = (
            load_table(spark, sf_dir, "lineitem")
            .groupBy("l_partkey", "l_suppkey")
            .agg(
                F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                    "unit_cost"
                )
            )
        )
        eur = (
            load_table(spark, sf_dir, "supplier")
            .join(
                F.broadcast(load_table(spark, sf_dir, "nation")),
                F.col("s_nationkey") == F.col("n_nationkey"),
            )
            .join(
                F.broadcast(
                    load_table(spark, sf_dir, "region").where(
                        F.col("r_name") == "EUROPE"
                    )
                ),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        )
        part = load_table(spark, sf_dir, "part").where(
            (F.col("p_size") <= 15) & (F.col("p_type") == "SMALL")
        )
        w = Window.partitionBy("p_partkey")
        return (
            supply.join(F.broadcast(eur), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .withColumn("min_cost", F.min("unit_cost").over(w))
            .where(F.col("unit_cost") == F.col("min_cost"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
            .orderBy(
                F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
            )
            .limit(100)
        )

    # ------------------------------------------------------------------
    # Q4 — order-priority checking (EXISTS semi join)
    # ------------------------------------------------------------------
    @register(
        "q4_priority_late_orders",
        oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY 1
""",
        doc="TPC-H Q4 analogue: orders in one quarter that had at least "
        "one line shipped >30 days after the order date (the schema "
        "has no commit/receipt dates), counted per priority. EXISTS "
        "becomes a left-semi join with a non-equi residual. Scale "
        "shape: the quarter predicate pushes to the orders scan and "
        "the semi join keeps at most one copy per order — no "
        "post-join dedup, and lineitem is never materialized wider "
        "than (orderkey, shipdate).",
    )
    def q4_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders").where(
            (F.col("o_orderdate") >= _ts("1997-07-01 00:00:00"))
            & (F.col("o_orderdate") < _ts("1997-10-01 00:00:00"))
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_shipdate"
        )
        return (
            orders.join(
                li,
                (F.col("l_orderkey") == F.col("o_orderkey"))
                & (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
                ),
                "left_semi",
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
        )

    # ------------------------------------------------------------------
    # Q8 — national market share (conditional share of revenue)
    # ------------------------------------------------------------------
    @register(
        "q8_market_share",
        oracle=f"""
WITH all_sales AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders    ON l_orderkey  = o_orderkey
  JOIN customer  ON o_custkey   = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey   = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN part      ON l_partkey   = p_partkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
)
SELECT o_year,
       CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END
                     AS DECIMAL(27,6))) AS DOUBLE)
       / {exact_sum_sql('volume')} AS mkt_share
FROM all_sales
GROUP BY o_year
""",
        doc="TPC-H Q8 analogue: NATION_7's share of PROMO-part revenue "
        "sold to ASIA-region customers, per order year. Scale shape: "
        "nation/region broadcast; customer is NOT broadcast — orders "
        "join customer sort-merge on custkey, then lineitem joins "
        "that on orderkey (the two unavoidable fact shuffles); both "
        "numerator and denominator accumulate in one pass as decimal "
        "conditional sums (map-side combinable), and the share is a "
        "single IEEE division of two exact doubles.",
    )
    def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
        n1 = load_table(spark, sf_dir, "nation").alias("n1")
        n2 = load_table(spark, sf_dir, "nation").alias("n2")
        region = load_table(spark, sf_dir, "region").where(
            F.col("r_name") == "ASIA"
        )
        cust = (
            load_table(spark, sf_dir, "customer")
            .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
            .join(F.broadcast(region), F.col("n1.n_regionkey") == F.col("r_regionkey"))
            .select("c_custkey")
        )
        orders = load_table(spark, sf_dir, "orders").join(
            cust, F.col("o_custkey") == F.col("c_custkey")
        )
        supp = (
            load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
            .select("s_suppkey", F.col("n2.n_name").alias("supp_nation"))
        )
        part = load_table(spark, sf_dir, "part").where(
            F.col("p_type") == "PROMO"
        )
        vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return (
            load_table(spark, sf_dir, "lineitem")
            .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .select(
                F.year("o_orderdate").cast("bigint").alias("o_year"),
                vol.alias("volume"),
                "supp_nation",
            )
            .groupBy("o_year")
            .agg(
                (
                    F.sum(
                        F.when(F.col("supp_nation") == "NATION_7", F.col("volume"))
                        .otherwise(F.lit(0))
                        .cast(DECIMAL_T)
                    ).cast("double")
                    / F.sum(F.col("volume").cast(DECIMAL_T)).cast("double")
                ).alias("mkt_share")
            )
        )

    # ------------------------------------------------------------------
    # Q9 — product-type profit (no partsupp: synthetic unit cost)
    # ------------------------------------------------------------------
    @register(
        "q9_product_profit",
        oracle=f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {exact_sum_sql('l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity')} AS sum_profit
FROM lineitem
JOIN part     ON l_partkey  = p_partkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
""",
        doc="TPC-H Q9 analogue: profit on '%gear%' parts per supplier "
        "nation per year, with supply cost modeled as 10% of retail "
        "price (no partsupp table). Scale shape: the LIKE filter "
        "pushes to the part scan and the filtered part broadcasts "
        "(kills most lineitem rows before the orders join); "
        "supplier→nation broadcast; the one fact-fact shuffle is "
        "lineitem⨝orders on orderkey; profit terms accumulate in "
        "decimal with the multiplication order mirrored verbatim in "
        "the oracle.",
    )
    def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
        part = load_table(spark, sf_dir, "part").where(
            F.col("p_name").like("%gear%")
        )
        supp = (
            load_table(spark, sf_dir, "supplier")
            .join(
                F.broadcast(load_table(spark, sf_dir, "nation")),
                F.col("s_nationkey") == F.col("n_nationkey"),
            )
            .select("s_suppkey", "n_name")
        )
        amount = (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
        )
        return (
            load_table(spark, sf_dir, "lineitem")
            .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy(
                F.col("n_name").alias("nation"),
                F.year("o_orderdate").cast("bigint").alias("o_year"),
            )
            .agg(exact_sum(amount, "sum_profit"))
        )

    # ------------------------------------------------------------------
    # Q11 — important parts (scalar-subquery threshold)
    # ------------------------------------------------------------------
    @register(
        "q11_important_parts",
        oracle=f"""
WITH per_part AS (
  SELECT l_partkey,
         {exact_sum_sql('l_extendedprice * (1 - l_discount)')} AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'AFRICA'
  GROUP BY 1
)
SELECT l_partkey, part_value
FROM per_part,
     (SELECT CAST(SUM(CAST(part_value AS DECIMAL(27,6))) AS DOUBLE) * 2.0
             / COUNT(*) AS thr
      FROM per_part)
WHERE part_value > thr
""",
        doc="TPC-H Q11 analogue: parts whose AFRICA-region-supplied "
        "revenue exceeds 2x the mean per-part value (the availability "
        "value is derived from lineitem — no partsupp; the original's "
        "fixed 0.1%-of-total cut is made scale-invariant so the "
        "answer stays non-degenerate as part count grows with SF). "
        "Scale shape: the "
        "per-part aggregate is one combinable shuffle on partkey; the "
        "global threshold is a 1-row broadcast (BroadcastNestedLoop "
        "on a scalar — fine, it is one row), so the big side is "
        "scanned exactly once post-aggregation. Re-summing the "
        "per-part decimals for the total is exact, so the threshold "
        "is bit-identical cross-engine.",
    )
    def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
        afr = (
            load_table(spark, sf_dir, "supplier")
            .join(
                F.broadcast(load_table(spark, sf_dir, "nation")),
                F.col("s_nationkey") == F.col("n_nationkey"),
            )
            .join(
                F.broadcast(
                    load_table(spark, sf_dir, "region").where(
                        F.col("r_name") == "AFRICA"
                    )
                ),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .select("s_suppkey")
        )
        per_part = (
            load_table(spark, sf_dir, "lineitem")
            .join(F.broadcast(afr), F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("l_partkey")
            .agg(
                exact_sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    "part_value",
                )
            )
        )
        thr = per_part.agg(
            (
                F.sum(F.col("part_value").cast(DECIMAL_T)).cast("double")
                * 2.0
                / F.count(F.lit(1))
            ).alias("thr")
        )
        return (
            per_part.join(F.broadcast(thr))
            .where(F.col("part_value") > F.col("thr"))
            .select("l_partkey", "part_value")
        )

    # ------------------------------------------------------------------
    # Q12 — late lines by priority class (conditional counts)
    # ------------------------------------------------------------------
    @register(
        "q12_late_lines_by_flag",
        oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
GROUP BY 1
""",
        doc="TPC-H Q12 analogue: lines shipped >60 days after ordering "
        "during 1999, split by urgent/non-urgent priority, per return "
        "flag (no shipmode column — returnflag plays its role). Scale "
        "shape: the ship-year predicate pushes to the lineitem scan; "
        "one fact-fact shuffle on orderkey; both counters come out of "
        "one conditional aggregate pass (map-side combinable "
        "integers).",
    )
    def q12_late_lines_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").where(
            (F.col("l_shipdate") >= _ts("1999-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("2000-01-01 00:00:00"))
        )
        late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
            "INTERVAL 60 DAYS"
        )
        urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        return (
            li.join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_returnflag")
            .agg(
                F.sum(F.when(urgent & late, 1).otherwise(0))
                .cast("bigint")
                .alias("high_line_count"),
                F.sum(F.when(~urgent & late, 1).otherwise(0))
                .cast("bigint")
                .alias("low_line_count"),
            )
        )

    # ------------------------------------------------------------------
    # Q13 — customer order-count distribution (left outer + re-agg)
    # ------------------------------------------------------------------
    @register(
        "q13_customer_distribution",
        oracle="""
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY 1
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY 1
""",
        doc="TPC-H Q13 analogue: distribution of per-customer order "
        "counts, excluding unspecified-priority orders; customers "
        "with no qualifying orders count as 0 (the left join's whole "
        "point). Scale shape: orders pre-filters before the join; "
        "customer⨝orders is sort-merge on custkey (neither side "
        "broadcast at 100 TB); the second aggregate runs on the "
        "already-tiny (custkey, count) relation.",
    )
    def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") != "4-NOT SPECIFIED"
        )
        return (
            load_table(spark, sf_dir, "customer")
            .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
            .groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
        )

    # ------------------------------------------------------------------
    # Q15 — top supplier (scalar MAX subquery)
    # ------------------------------------------------------------------
    @register(
        "q15_top_supplier",
        oracle=f"""
WITH rev AS (
  SELECT l_suppkey,
         {exact_sum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN rev ON s_suppkey = l_suppkey,
     (SELECT MAX(total_revenue) AS mx FROM rev)
WHERE total_revenue = mx
""",
        doc="TPC-H Q15 analogue: the supplier(s) with maximum revenue "
        "in 1998 Q1 (the view becomes a shared subframe). Scale "
        "shape: one combinable shuffle on suppkey builds the revenue "
        "relation; MAX over it is a 1-row broadcast; equality on the "
        "exact decimal-summed double is well-defined, so ties "
        "surface identically in both engines; supplier joins the "
        "tiny surviving set broadcast.",
    )
    def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
        rev = (
            load_table(spark, sf_dir, "lineitem")
            .where(
                (F.col("l_shipdate") >= _ts("1998-01-01 00:00:00"))
                & (F.col("l_shipdate") < _ts("1998-04-01 00:00:00"))
            )
            .groupBy("l_suppkey")
            .agg(
                exact_sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    "total_revenue",
                )
            )
        )
        mx = rev.agg(F.max("total_revenue").alias("mx"))
        return (
            rev.join(F.broadcast(mx))
            .where(F.col("total_revenue") == F.col("mx"))
            .join(
                F.broadcast(load_table(spark, sf_dir, "supplier")),
                F.col("l_suppkey") == F.col("s_suppkey"),
            )
            .select("s_suppkey", "s_name", "total_revenue")
        )

    # ------------------------------------------------------------------
    # Q17 — small-quantity-order revenue (correlated AVG subquery)
    # ------------------------------------------------------------------
    @register(
        "q17_small_quantity_revenue",
        oracle=f"""
WITH pf AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#3' AND p_size < 10
), thr AS (
  SELECT l_partkey, 0.2 * ({exact_avg_sql('l_quantity')}) AS max_qty
  FROM lineitem JOIN pf ON l_partkey = p_partkey
  GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / 7.0
       AS avg_yearly
FROM lineitem JOIN thr ON lineitem.l_partkey = thr.l_partkey
WHERE l_quantity < max_qty
""",
        doc="TPC-H Q17 analogue: lost revenue from below-20%-of-average "
        "quantity lines on Brand#3 small parts. The correlated AVG "
        "subquery is decorrelated by hand: per-part thresholds are "
        "computed once (semi-restricted to qualifying parts BEFORE "
        "aggregating, so 100 TB of lineitem only aggregates the "
        "brand's slice) and broadcast back into the fact filter. "
        "Thresholds use the exact decimal average so the < cut is "
        "bit-identical cross-engine.",
    )
    def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        pf = load_table(spark, sf_dir, "part").where(
            (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10)
        ).select("p_partkey")
        li = load_table(spark, sf_dir, "lineitem")
        thr = (
            li.join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("l_partkey")
            .agg((exact_avg("l_quantity") * F.lit(0.2)).alias("max_qty"))
        )
        return (
            li.join(F.broadcast(thr.withColumnRenamed("l_partkey", "t_partkey")),
                    F.col("l_partkey") == F.col("t_partkey"))
            .where(F.col("l_quantity") < F.col("max_qty"))
            .agg(
                (
                    F.sum(F.col("l_extendedprice").cast(DECIMAL_T)).cast("double")
                    / F.lit(7.0)
                ).alias("avg_yearly")
            )
        )

    # ------------------------------------------------------------------
    # Q19 — disjunctive predicate revenue (OR-of-ANDs pushdown)
    # ------------------------------------------------------------------
    @register(
        "q19_disjunctive_revenue",
        oracle=f"""
SELECT {exact_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 5 AND 25)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 15 AND 40)
""",
        doc="TPC-H Q19 analogue: revenue under three disjunctive "
        "(brand, size, quantity) branches. Scale shape: the part-only "
        "half of the disjunction ((brand,size) OR ...) is applied as "
        "an explicit pre-filter so the part side shrinks before "
        "broadcasting — Catalyst cannot always extract it from a "
        "mixed OR — and the full residual predicate re-applies after "
        "the join; one decimal aggregate, no shuffle besides the "
        "final 1-row reduce.",
    )
    def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        b1 = (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
        b2 = (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
        b3 = (F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
        part = load_table(spark, sf_dir, "part").where(b1 | b2 | b3)
        q1c = F.col("l_quantity").between(1, 15)
        q2c = F.col("l_quantity").between(5, 25)
        q3c = F.col("l_quantity").between(15, 40)
        return (
            load_table(spark, sf_dir, "lineitem")
            .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .where((b1 & q1c) | (b2 & q2c) | (b3 & q3c))
            .agg(
                exact_sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    "revenue",
                )
            )
        )

    # ------------------------------------------------------------------
    # Q20 — part-promotion suppliers (chained semi joins)
    # ------------------------------------------------------------------
    @register(
        "q20_promotion_suppliers",
        oracle=f"""
WITH red AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
), shipped AS (
  SELECT l_suppkey,
         {exact_sum_sql('l_quantity')} AS qty
  FROM lineitem JOIN red ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
  GROUP BY 1
  HAVING qty > 200.0
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_3', 'NATION_4', 'NATION_5')
  AND s_suppkey IN (SELECT l_suppkey FROM shipped)
""",
        doc="TPC-H Q20 analogue: suppliers in three nations that moved "
        ">200 units of 'red%' parts during 1999 (availability derives "
        "from shipped quantity — no partsupp). Scale shape: the LIKE "
        "filter pushes to the part scan and broadcasts into lineitem; "
        "the per-supplier aggregate is combinable; the final IN is a "
        "left-semi join of the tiny supplier dim against the "
        "aggregate's surviving keys.",
    )
    def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
        red = load_table(spark, sf_dir, "part").where(
            F.col("p_name").like("red%")
        ).select("p_partkey")
        shipped = (
            load_table(spark, sf_dir, "lineitem")
            .where(
                (F.col("l_shipdate") >= _ts("1999-01-01 00:00:00"))
                & (F.col("l_shipdate") < _ts("2000-01-01 00:00:00"))
            )
            .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("l_suppkey")
            .agg(exact_sum("l_quantity", "qty"))
            .where(F.col("qty") > 200.0)
        )
        return (
            load_table(spark, sf_dir, "supplier")
            .join(
                F.broadcast(
                    load_table(spark, sf_dir, "nation").where(
                        F.col("n_name").isin("NATION_3", "NATION_4", "NATION_5")
                    )
                ),
                F.col("s_nationkey") == F.col("n_nationkey"),
            )
            .join(
                shipped,
                F.col("s_suppkey") == F.col("l_suppkey"),
                "left_semi",
            )
            .select("s_suppkey", "s_name")
        )

    # ------------------------------------------------------------------
    # Q21 — suppliers who kept orders waiting (exists + not-exists)
    # ------------------------------------------------------------------
    @register(
        "q21_waiting_suppliers",
        oracle="""
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), ord AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late,
         MAX(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
  FROM l GROUP BY 1
)
SELECT s_name, COUNT(*) AS numwait
FROM ord JOIN supplier ON late_supp = s_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 20
""",
        doc="TPC-H Q21 analogue: for finished orders involving several "
        "suppliers, the one supplier that alone shipped >90 days "
        "late (late derives from shipdate-vs-orderdate — no "
        "commit/receipt dates). The EXISTS/NOT-EXISTS pair is "
        "re-expressed set-oriented as one per-order conditional "
        "aggregate — n_supp>=2 is the EXISTS(other supplier), "
        "n_late=1 the NOT EXISTS(other late supplier) — instead of "
        "two correlated self-joins of the fact. Scale shape: one "
        "orderkey shuffle; when n_late=1 the MAX over late suppliers "
        "IS that supplier, so no join back to lineitem is needed; "
        "supplier broadcasts into the tiny survivor set.",
    )
    def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_suppkey", "l_shipdate")
            .join(
                load_table(spark, sf_dir, "orders").where(
                    F.col("o_orderstatus") == "F"
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select(
                "l_orderkey",
                "l_suppkey",
                (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
                ).alias("is_late"),
            )
        )
        late_supp = F.when(F.col("is_late"), F.col("l_suppkey"))
        ord_stats = li.groupBy("l_orderkey").agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(late_supp).alias("n_late"),
            F.max(late_supp).alias("late_supp"),
        )
        return (
            ord_stats.where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
            .join(
                F.broadcast(load_table(spark, sf_dir, "supplier")),
                F.col("late_supp") == F.col("s_suppkey"),
            )
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name")
            .limit(20)
        )

    # ------------------------------------------------------------------
    # Q22 — global sales opportunity (scalar avg + anti join)
    # ------------------------------------------------------------------
    @register(
        "q22_sales_opportunity",
        oracle=f"""
WITH avgbal AS (
  SELECT {exact_avg_sql('c_acctbal')} AS ab
  FROM customer WHERE c_acctbal > 0.0
), cust AS (
  SELECT substring(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE substring(c_name, 17, 2) >= '10' AND substring(c_name, 17, 2) < '30'
)
SELECT cntrycode, COUNT(*) AS numcust,
       {exact_sum_sql('c_acctbal')} AS totacctbal
FROM cust, avgbal
WHERE c_acctbal > ab
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-08-01 00:00:00'
  )
GROUP BY 1
""",
        doc="TPC-H Q22 analogue: above-average-balance customers with "
        "no orders in the final year, grouped by a 'country code' "
        "carved from the customer name's digit tail (the schema has "
        "no phone column). Scale shape: the positive-balance average "
        "is a 1-row broadcast; NOT EXISTS is a left-anti join against "
        "orders pre-filtered to the final-year window (the filter "
        "pushes to the orders scan, shrinking the anti-join build "
        "side ~10x); one final combinable aggregate on the 20 code "
        "groups.",
    )
    def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
        code = F.substring(F.col("c_name"), 17, 2)
        cust = (
            load_table(spark, sf_dir, "customer")
            .where((code >= "10") & (code < "30"))
            .select(code.alias("cntrycode"), "c_acctbal", "c_custkey")
        )
        avgbal = (
            load_table(spark, sf_dir, "customer")
            .where(F.col("c_acctbal") > 0.0)
            .agg(exact_avg("c_acctbal").alias("ab"))
        )
        recent = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderdate") >= _ts("2000-08-01 00:00:00")
        )
        return (
            cust.join(F.broadcast(avgbal))
            .where(F.col("c_acctbal") > F.col("ab"))
            .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .groupBy("cntrycode")
            .agg(
                F.count(F.lit(1)).alias("numcust"),
                exact_sum("c_acctbal", "totacctbal"),
            )
        )


_register()
