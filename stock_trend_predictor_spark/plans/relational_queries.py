"""Relational core queries — SURVEY §2.1-§2.8 plus the standard join/
agg/set-op/window surface the reference implies but never implements
(SURVEY §2.3: "the new engine still ships a full join surface").

Scale notes baked into every plan here:
- joins against region/nation/supplier/part are broadcast (small dims);
  Catalyst picks broadcast-hash automatically under the session's
  autoBroadcastJoinThreshold, and `F.broadcast` pins it where the dim
  is provably small so the plan survives a stats-less 100 TB fact scan;
- aggregates sum in decimal (map-side combinable, order-independent —
  see functions.exact) so results are reproducible at any parallelism;
- top-k uses window row_number with a deterministic total order, never
  a driver-side collect-and-sort.
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
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.sources.tables import load_table


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    # ------------------------------------------------------------------
    # Aggregation battery (SURVEY §2.4; TPC-H Q1 shape)
    # ------------------------------------------------------------------
    @register(
        "q1_pricing_summary",
        oracle=f"""
SELECT l_returnflag, l_linestatus,
       {exact_sum_sql('l_quantity')} AS sum_qty,
       {exact_sum_sql('l_extendedprice')} AS sum_base_price,
       {exact_sum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {exact_sum_sql('(l_extendedprice * (1 - l_discount)) * (1 + l_tax)')} AS sum_charge,
       {exact_avg_sql('l_quantity')} AS avg_qty,
       {exact_avg_sql('l_extendedprice')} AS avg_price,
       {exact_avg_sql('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
        doc="Partial-aggregate scan: grouped sums/averages with a pushed "
        "ship-date predicate (TPC-H Q1 shape; exercises A2/A4 semantics "
        "at scale — map-side combine + decimal determinism).",
    )
    def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        charge = disc_price * (1 + F.col("l_tax"))
        return (
            li.where(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp_ntz"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                exact_sum("l_quantity", "sum_qty"),
                exact_sum("l_extendedprice", "sum_base_price"),
                exact_sum(disc_price, "sum_disc_price"),
                exact_sum(charge, "sum_charge"),
                exact_avg("l_quantity", "avg_qty"),
                exact_avg("l_extendedprice", "avg_price"),
                exact_avg("l_discount", "avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    # ------------------------------------------------------------------
    # Join battery (SURVEY §2.3)
    # ------------------------------------------------------------------
    @register(
        "q3_shipping_priority",
        oracle=f"""
SELECT l_orderkey,
       {exact_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
        doc="3-way equi-join + grouped revenue + deterministic top-k "
        "(TPC-H Q3 shape). customer side broadcasts; lineitem never "
        "shuffles more than once.",
    )
    def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
        cust = load_table(spark, sf_dir, "customer").where(
            F.col("c_mktsegment") == "BUILDING"
        )
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
        )
        li = load_table(spark, sf_dir, "lineitem").where(
            F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
        )
        # Scale shape: customer (filtered to one segment) broadcasts into
        # orders; lineitem⨝orders is the one big shuffle, on l_orderkey.
        # orders is a fact table — never broadcast it; AQE may still
        # downgrade to broadcast at small SF from runtime stats.
        return (
            li.join(
                orders.join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(
                exact_sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
                )
            )
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
            .limit(10)
        )

    @register(
        "q10_returned_items",
        oracle=f"""
SELECT c_custkey, c_name, n_name,
       {exact_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       c_acctbal
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
        doc="TPC-H Q10 analogue: who returned the most revenue last "
        "quarter. Scale shape: both fact filters (returnflag, order-"
        "date quarter) pushed to their scans; lineitem joins orders on "
        "the one necessary key; the rollup happens at o_custkey grain "
        "BEFORE any dimension is touched, so the customer table joins "
        "a customer-sized aggregate (never the fact stream — customer "
        "is NOT broadcast-sized at 100 TB and must not sit inside the "
        "fact join); nation alone broadcasts. Final top-20 is "
        "TakeOrderedAndProject (heap), never a global sort, with a "
        "c_custkey tiebreak keeping the cut engine-exact.",
    )
    def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
        cust = load_table(spark, sf_dir, "customer")
        nation = load_table(spark, sf_dir, "nation")
        orders = load_table(spark, sf_dir, "orders").where(
            (F.col("o_orderdate")
             >= F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate")
               < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        )
        li = load_table(spark, sf_dir, "lineitem").where(
            F.col("l_returnflag") == "R"
        )
        rev = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_custkey")
            .agg(
                exact_sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    "revenue",
                )
            )
        )
        return (
            rev.join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .join(
                F.broadcast(nation),
                F.col("c_nationkey") == F.col("n_nationkey"),
            )
            .select(
                "c_custkey", "c_name", "n_name", "revenue", "c_acctbal"
            )
            .orderBy(F.col("revenue").desc(), "c_custkey")
            .limit(20)
        )

    @register(
        "q5_regional_revenue",
        oracle=f"""
SELECT n_name,
       {exact_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
        doc="6-way star join with a co-nation constraint (TPC-H Q5 "
        "shape). All dimensions broadcast; the only shuffle is the "
        "final small groupBy.",
    )
    def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = {n: load_table(spark, sf_dir, n) for n in
             ("region", "nation", "customer", "supplier", "orders", "lineitem")}
        # region⨝nation is tiny → broadcast into customer; customer and
        # orders are fact-sized at 100 TB, so they shuffle-join on
        # custkey, then lineitem shuffle-joins on orderkey. supplier is
        # the only other broadcast.
        dims = (
            t["region"].where(F.col("r_name") == "ASIA")
            .join(t["nation"], F.col("n_regionkey") == F.col("r_regionkey"))
        )
        cust = t["customer"].join(
            F.broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey")
        )
        return (
            t["lineitem"]
            .join(t["orders"].join(cust, F.col("o_custkey") == F.col("c_custkey")),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(t["supplier"]),
                  (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("s_nationkey") == F.col("c_nationkey")))
            .groupBy("n_name")
            .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        )

    @register(
        "join_left_outer",
        oracle=f"""
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       {exact_sum_sql('coalesce(o_totalprice, 0.0)')} AS total_spend
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
""",
        doc="Left outer join preserving customers with zero orders "
        "(P5/P7 null-handling semantics: coalesce over the null side).",
    )
    def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
        cust = load_table(spark, sf_dir, "customer")
        orders = load_table(spark, sf_dir, "orders")
        return (
            cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
            .groupBy("c_custkey", "c_name")
            .agg(
                F.count("o_orderkey").alias("n_orders"),
                exact_sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)), "total_spend"),
            )
        )

    @register(
        "join_full_outer",
        oracle="""
WITH big AS (
    SELECT o_custkey AS custkey, COUNT(*) AS n_big
    FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey
), urgent AS (
    SELECT o_custkey AS custkey, COUNT(*) AS n_urgent
    FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
)
SELECT coalesce(big.custkey, urgent.custkey) AS custkey,
       big.n_big AS n_big, urgent.n_urgent AS n_urgent
FROM big FULL OUTER JOIN urgent ON big.custkey = urgent.custkey
""",
        doc="Full outer join of two order cohorts keyed by customer — "
        "unmatched keys survive from BOTH sides with NULL counts, "
        "completing the outer-join surface next to join_left_outer. "
        "Full outer cannot broadcast either side (both preserve "
        "unmatched rows), so it is the one join shape that is always "
        "shuffle(SMJ) — both inputs here are pre-aggregated to one "
        "row per key first, shrinking the shuffle to #keys.",
    )
    def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders")
        big = (
            orders.where(F.col("o_totalprice") > 150000)
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(F.count(F.lit(1)).alias("n_big"))
        )
        urgent = (
            orders.where(F.col("o_orderpriority") == "1-URGENT")
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(F.count(F.lit(1)).alias("n_urgent"))
        )
        return (
            big.alias("b")
            .join(
                urgent.alias("u"),
                F.col("b.custkey") == F.col("u.custkey"),
                "full_outer",
            )
            .select(
                F.coalesce(F.col("b.custkey"), F.col("u.custkey")).alias(
                    "custkey"
                ),
                "n_big",
                "n_urgent",
            )
        )

    @register(
        "join_semi_anti",
        oracle="""
SELECT 'with_urgent_order' AS cohort, COUNT(*) AS n_customers
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
UNION ALL
SELECT 'no_orders' AS cohort, COUNT(*) AS n_customers
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
        doc="Semi-join and anti-join cohorts (P10's model-known-key "
        "filter generalized — reference ml_model/predict_from_vm4.py:53-55). "
        "Both execute as broadcast hash semi/anti joins.",
    )
    def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
        cust = load_table(spark, sf_dir, "customer")
        orders = load_table(spark, sf_dir, "orders")
        urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
        semi = (
            cust.join(F.broadcast(urgent), F.col("c_custkey") == F.col("o_custkey"), "left_semi")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .select(F.lit("with_urgent_order").alias("cohort"), "n_customers")
        )
        anti = (
            cust.join(F.broadcast(orders), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .select(F.lit("no_orders").alias("cohort"), "n_customers")
        )
        return semi.unionByName(anti)

    # ------------------------------------------------------------------
    # Set operations (SURVEY §2.7)
    # ------------------------------------------------------------------
    @register(
        "setops_customer_cohorts",
        oracle="""
WITH big_spenders AS (
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
), urgent_buyers AS (
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT 'union' AS op, COUNT(*) AS n FROM (
    SELECT custkey FROM big_spenders UNION SELECT custkey FROM urgent_buyers)
UNION ALL
SELECT 'intersect' AS op, COUNT(*) AS n FROM (
    SELECT custkey FROM big_spenders INTERSECT SELECT custkey FROM urgent_buyers)
UNION ALL
SELECT 'except' AS op, COUNT(*) AS n FROM (
    SELECT custkey FROM big_spenders EXCEPT SELECT custkey FROM urgent_buyers)
""",
        doc="U1 generalized: union / intersect / except over customer "
        "cohorts (reference only has pd.concat at kafka_producer.py:71,99).",
    )
    def setops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders")
        big = orders.where(F.col("o_totalprice") > 150000).select(
            F.col("o_custkey").alias("custkey")
        ).distinct()
        urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
            F.col("o_custkey").alias("custkey")
        ).distinct()

        def count_as(df: DataFrame, op: str) -> DataFrame:
            return df.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit(op).alias("op"), "n"
            )

        return (
            count_as(big.union(urgent).distinct(), "union")
            .unionByName(count_as(big.intersect(urgent), "intersect"))
            .unionByName(count_as(big.subtract(urgent), "except"))
        )

    # ------------------------------------------------------------------
    # Grouping sets / rollup / cube (SURVEY §2.4 "free in Spark")
    # ------------------------------------------------------------------
    @register(
        "rollup_order_priority",
        oracle=f"""
SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
       coalesce(o_orderpriority, 'ALL') AS orderpriority,
       GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS grouping_id,
       COUNT(*) AS n_orders,
       {exact_sum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
        doc="Hierarchical rollup with grouping-id disambiguation "
        "(subtotals per status, grand total).",
    )
    def rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders")
        return (
            orders.rollup("o_orderstatus", "o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                exact_sum("o_totalprice", "total_price"),
                (
                    F.grouping("o_orderstatus")
                    + F.lit(2) * F.grouping("o_orderpriority")
                ).cast("long").alias("grouping_id"),
            )
            .select(
                F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("orderstatus"),
                F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("orderpriority"),
                "grouping_id",
                "n_orders",
                "total_price",
            )
        )

    @register(
        "cube_returnflag_status",
        oracle=f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS grouping_id,
       COUNT(*) AS n_items,
       {exact_sum_sql('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
        doc="Full cube over (returnflag, linestatus).",
    )
    def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        return (
            li.cube("l_returnflag", "l_linestatus")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                exact_sum("l_quantity", "sum_qty"),
                (
                    F.grouping("l_returnflag") + F.lit(2) * F.grouping("l_linestatus")
                ).cast("long").alias("grouping_id"),
            )
            .select(
                F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
                F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
                "grouping_id",
                "n_items",
                "sum_qty",
            )
        )

    @register(
        "grouping_sets_status_priority",
        oracle=f"""
SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
       coalesce(o_orderpriority, 'ALL') AS orderpriority,
       GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS grouping_id,
       COUNT(*) AS n_orders,
       {exact_sum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
        doc="Explicit GROUPING SETS beyond rollup/cube: per-status and "
        "per-priority marginals plus the grand total, WITHOUT the "
        "(status, priority) cross cells a rollup/cube would add — the "
        "shape reporting pipelines actually want. One shuffle; Spark "
        "expands the sets map-side (Expand operator), so partial "
        "aggregation still applies.",
    )
    def grouping_sets_status_priority(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders")
        return (
            orders.groupingSets(
                [["o_orderstatus"], ["o_orderpriority"], []],
                "o_orderstatus",
                "o_orderpriority",
            )
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                exact_sum("o_totalprice", "total_price"),
                (
                    F.grouping("o_orderstatus")
                    + F.lit(2) * F.grouping("o_orderpriority")
                ).cast("long").alias("grouping_id"),
            )
            .select(
                F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias(
                    "orderstatus"
                ),
                F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias(
                    "orderpriority"
                ),
                "grouping_id",
                "n_orders",
                "total_price",
            )
        )

    @register(
        "setops_multiset_cohorts",
        oracle="""
WITH big_spenders AS (
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
), urgent_buyers AS (
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT 'union_all' AS op, COUNT(*) AS n FROM (
    SELECT custkey FROM big_spenders UNION ALL SELECT custkey FROM urgent_buyers)
UNION ALL
SELECT 'intersect_all' AS op, COUNT(*) AS n FROM (
    SELECT custkey FROM big_spenders INTERSECT ALL SELECT custkey FROM urgent_buyers)
UNION ALL
SELECT 'except_all' AS op, COUNT(*) AS n FROM (
    SELECT custkey FROM big_spenders EXCEPT ALL SELECT custkey FROM urgent_buyers)
""",
        doc="Multiset (bag) set operations — intersectAll / exceptAll "
        "preserve duplicate multiplicity (SQL INTERSECT ALL / EXCEPT "
        "ALL), completing the §2.4 set-op surface next to the "
        "distinct-set forms in setops_customer_cohorts. Each ALL "
        "variant is one shuffle on the value with per-key count "
        "min/subtraction — no row explosion.",
    )
    def setops_multiset_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders")
        big = orders.where(F.col("o_totalprice") > 150000).select(
            F.col("o_custkey").alias("custkey")
        )
        urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
            F.col("o_custkey").alias("custkey")
        )

        def count_as(df: DataFrame, op: str) -> DataFrame:
            return df.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit(op).alias("op"), "n"
            )

        return (
            count_as(big.unionAll(urgent), "union_all")
            .unionByName(count_as(big.intersectAll(urgent), "intersect_all"))
            .unionByName(count_as(big.exceptAll(urgent), "except_all"))
        )

    @register(
        "join_range_bands",
        oracle=f"""
SELECT b.band AS band,
       count(*) AS n_orders,
       {exact_sum_sql('o.o_totalprice')} AS band_revenue
FROM orders o
JOIN (VALUES ('small', 0.0, 100000.0),
             ('mid', 100000.0, 250000.0),
             ('large', 250000.0, 1e12)) b(band, lo, hi)
  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
""",
        doc="Range (theta) join: orders against a tiny band dimension "
        "on a non-equi interval condition. Catalyst executes this as a "
        "BroadcastNestedLoopJoin — correct here because the build side "
        "is 3 rows; with a large band table the scale path is binning "
        "both sides to an equi-key (width_bucket) first. Completes the "
        "join surface of SURVEY §2.3 beyond equi/semi/anti/as-of.",
    )
    def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
        bands = spark.createDataFrame(
            [("small", 0.0, 100000.0), ("mid", 100000.0, 250000.0),
             ("large", 250000.0, 1e12)],
            "band string, lo double, hi double",
        )
        o = load_table(spark, sf_dir, "orders")
        return (
            o.join(
                F.broadcast(bands),
                (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
            )
            .groupBy("band")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                exact_sum("o_totalprice").alias("band_revenue"),
            )
        )

    # ------------------------------------------------------------------
    # Distinct / sorts / top-k per group (SURVEY §2.4 A1, §2.6)
    # ------------------------------------------------------------------
    @register(
        "distinct_keys",
        oracle="SELECT DISTINCT event_type FROM events",
        doc="A1: distinct key extraction (reference "
        "ml_model/predict_from_vm4.py:29 `unique()`).",
    )
    def distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
        return load_table(spark, sf_dir, "events").select("event_type").distinct()

    @register(
        "topk_orders_per_status",
        oracle="""
SELECT orderstatus, o_orderkey, o_totalprice, rk
FROM (
    SELECT o_orderstatus AS orderstatus, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_orderstatus
                              ORDER BY o_totalprice DESC, o_orderkey) AS rk
    FROM orders
)
WHERE rk <= 3
""",
        doc="Top-k per group via ranked window — the distributed form of "
        "ORDER BY ... LIMIT k per key (SURVEY §2.6); deterministic "
        "tiebreak on the primary key.",
    )
    def topk_orders_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
        w = Window.partitionBy("o_orderstatus").orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey")
        )
        return (
            load_table(spark, sf_dir, "orders")
            .select(
                F.col("o_orderstatus").alias("orderstatus"),
                "o_orderkey",
                "o_totalprice",
                F.row_number().over(w).alias("rk"),
            )
            .where(F.col("rk") <= 3)
        )

    @register(
        "global_topk",
        oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
        doc="Global top-k: Spark compiles orderBy+limit to TakeOrderedAndProject "
        "(per-partition heap + driver merge — no full sort at 100 TB).",
    )
    def global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
        return (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(25)
        )

    @register(
        "stats_battery",
        oracle=f"""
WITH sums AS (
    SELECT l_returnflag,
           count(*) AS n,
           {exact_sum_sql('l_quantity')} AS sx,
           {exact_sum_sql('l_extendedprice')} AS sy,
           {exact_sum_sql('l_quantity * l_quantity')} AS sxx,
           {exact_sum_sql('l_extendedprice * l_extendedprice')} AS syy,
           {exact_sum_sql('l_quantity * l_extendedprice')} AS sxy,
           quantile_cont(l_extendedprice, 0.5) AS p50_price,
           quantile_cont(l_extendedprice, 0.95) AS p95_price
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n, p50_price, p95_price,
       {stable_round_sql('sqrt((n * sxx - sx * sx) / (n * (n - 1)))', 6)}
         AS stddev_qty,
       {stable_round_sql(
           '(n * sxy - sx * sy)'
           ' / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))', 6)}
         AS corr_qty_price
FROM sums
""",
        doc="Statistical aggregate battery: exact interpolated "
        "percentiles (Spark percentile() and DuckDB quantile_cont "
        "produce bit-identical doubles on the same multiset), and "
        "stddev/correlation derived from decimal-exact sufficient "
        "sums rather than the engines' streaming moment algorithms "
        "(which are partition-order dependent). All map-side "
        "combinable; percentile is the one full-sort-per-group "
        "aggregate (use approx_percentile at 100 TB when exactness "
        "isn't contractual).",
    )
    def stats_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        qd = F.col("l_quantity").cast(DECIMAL_T)
        pd_ = F.col("l_extendedprice").cast(DECIMAL_T)
        sums = li.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(qd).cast("double").alias("sx"),
            F.sum(pd_).cast("double").alias("sy"),
            F.sum((F.col("l_quantity") * F.col("l_quantity")).cast(DECIMAL_T))
            .cast("double").alias("sxx"),
            F.sum(
                (F.col("l_extendedprice") * F.col("l_extendedprice")).cast(
                    DECIMAL_T
                )
            ).cast("double").alias("syy"),
            F.sum(
                (F.col("l_quantity") * F.col("l_extendedprice")).cast(DECIMAL_T)
            ).cast("double").alias("sxy"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50_price"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95_price"),
        )
        n = F.col("n")
        sx, sy = F.col("sx"), F.col("sy")
        sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
        return sums.select(
            "l_returnflag",
            "n",
            "p50_price",
            "p95_price",
            stable_round(
                F.sqrt((n * sxx - sx * sx) / (n * (n - F.lit(1)))), 6
            ).alias("stddev_qty"),
            stable_round(
                (n * sxy - sx * sy)
                / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                6,
            ).alias("corr_qty_price"),
        )

    @register(
        "pivot_priority_by_status",
        oracle=f"""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
       {exact_sum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS rev_f,
       {exact_sum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS rev_o,
       {exact_sum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS rev_p
FROM orders
GROUP BY o_orderpriority
""",
        doc="Pivot: order counts and decimal-exact revenue per priority "
        "x status, statuses widened to columns. Spark pivot with an "
        "explicit value list compiles to one pass of filtered "
        "aggregates (no second distinct-values job, deterministic "
        "output schema) — always pass the values at 100 TB.",
    )
    def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        piv = (
            o.groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["F", "O", "P"])
            .agg(
                F.count(F.lit(1)).alias("n"),
                exact_sum("o_totalprice").alias("rev"),
            )
        )
        # empty pivot cells count as 0 (matching FILTER semantics);
        # empty revenue sums stay NULL in both engines
        return piv.select(
            "o_orderpriority",
            F.coalesce("F_n", F.lit(0)).alias("n_f"),
            F.coalesce("O_n", F.lit(0)).alias("n_o"),
            F.coalesce("P_n", F.lit(0)).alias("n_p"),
            F.col("F_rev").alias("rev_f"),
            F.col("O_rev").alias("rev_o"),
            F.col("P_rev").alias("rev_p"),
        )

    @register(
        "sketch_cardinality",
        oracle=None,  # approximate by design; error bound tested
        doc="HyperLogLog++ cardinality sketch per order priority: "
        "approx_count_distinct at rsd=0.02 — constant memory per "
        "group vs the O(distinct) exact set, mergeable map-side; the "
        "100 TB path for distinct-user / distinct-key profiling. "
        "Approximate, so no value oracle; tests/test_oracle_parity "
        "gate covers rows, tests/test_sketch.py asserts <=5% relative "
        "error vs the exact count.",
    )
    def sketch_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        return o.groupBy("o_orderpriority").agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias(
                "approx_customers"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )

    @register(
        "map_function_battery",
        oracle="""
SELECT event_id,
       len(json_keys(props)) AS n_keys,
       list_aggregate(list_sort(json_keys(props)), 'string_agg', ',')
         AS keys_sorted,
       CAST(props->>'k' AS BIGINT) AS k_value,
       len(json_keys(props)) + 1 AS merged_n_keys,
       CAST(props->>'k' AS BIGINT) % 10 AS k_bucket
FROM events
""",
        doc="MapType surface battery (SURVEY 1.2's new-engine type "
        "additions, next to array_function_battery): parse the props "
        "JSON into map<string,bigint> ONCE into a bound column, then "
        "map_keys / element_at / map_concat / size over it — all "
        "codegen, mirrored by DuckDB's json_keys / ->> extraction. "
        "Keys sorted before concat so output is order-independent "
        "(map iteration order is not a contract in either engine).",
    )
    def map_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").withColumn(
            "m", F.from_json("props", "map<string,bigint>")
        )
        merged = F.map_concat(
            F.col("m"), F.create_map(F.lit("extra"), F.lit(1).cast("bigint"))
        )
        return ev.select(
            "event_id",
            F.size("m").alias("n_keys"),
            F.array_join(F.array_sort(F.map_keys("m")), ",").alias(
                "keys_sorted"
            ),
            F.element_at(F.col("m"), "k").alias("k_value"),
            F.size(merged).alias("merged_n_keys"),
            (F.element_at(F.col("m"), "k") % 10).alias("k_bucket"),
        )

    _I64_MAX = 9223372036854775807

    @register(
        "try_arithmetic_battery",
        oracle=f"""
SELECT o_orderkey,
       o_orderkey + 1 AS ok_add,
       CASE WHEN CAST({_I64_MAX} AS HUGEINT) + o_orderkey > {_I64_MAX}
            THEN NULL ELSE {_I64_MAX} + o_orderkey END AS ovf_add,
       CASE WHEN CAST(4611686018427387904 AS HUGEINT) * o_orderkey
                 > {_I64_MAX}
            THEN NULL ELSE 4611686018427387904 * o_orderkey END AS ovf_mul,
       o_totalprice / nullif(o_orderkey % 3, 0) AS div_guarded,
       o_orderkey % nullif(o_custkey % 5, 0) AS mod_guarded,
       TRY_CAST(CASE WHEN o_orderkey % 2 = 0
                     THEN CAST(o_orderkey AS VARCHAR)
                     ELSE 'x' || CAST(o_orderkey AS VARCHAR) END
                AS BIGINT) AS parsed,
       [10, 20, 30][CAST(o_orderkey % 5 AS INT) + 1] AS elem
FROM orders
WHERE o_orderkey % 11 = 0
""",
        doc="Spark 4 error-safe arithmetic under ANSI mode: try_add / "
        "try_multiply return NULL on int64 overflow (the oracle proves "
        "the exact overflow boundary via HUGEINT range checks), "
        "try_divide / try_mod return NULL on zero divisors (mirrored "
        "with nullif), try_to_number NULLs malformed strings "
        "(TRY_CAST), try_element_at NULLs invalid indices (index 0 "
        "and out-of-range — DuckDB 1-based list extract agrees). "
        "ANSI + try_* is the 100 TB failure-isolation contract: one "
        "poison row NULLs, the job survives, a downstream DQ rule "
        "counts the NULLs.",
    )
    def try_arithmetic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderkey") % 11 == 0
        )
        key = F.col("o_orderkey")
        return o.select(
            "o_orderkey",
            F.try_add(key, F.lit(1)).alias("ok_add"),
            F.try_add(F.lit(_I64_MAX), key).alias("ovf_add"),
            F.try_multiply(F.lit(4611686018427387904), key).alias("ovf_mul"),
            F.try_divide(F.col("o_totalprice"), key % 3).alias(
                "div_guarded"
            ),
            F.try_mod(key, F.col("o_custkey") % 5).alias("mod_guarded"),
            F.try_to_number(
                F.when(key % 2 == 0, key.cast("string")).otherwise(
                    F.concat(F.lit("x"), key.cast("string"))
                ),
                F.lit("999999999"),
            )
            .cast("bigint")
            .alias("parsed"),
            # NB try_element_at suppresses OUT-OF-RANGE only; index 0
            # still raises INVALID_INDEX_OF_ZERO — indices here are 1..5
            # so 4 and 5 exercise the NULL path
            F.try_element_at(
                F.array(F.lit(10), F.lit(20), F.lit(30)),
                ((key % 5).cast("int") + F.lit(1)),
            ).alias("elem"),
        )

    @register(
        "collation_battery",
        oracle="""
WITH mixed AS (
    SELECT p_partkey,
           CASE WHEN p_partkey % 2 = 0 THEN lower(p_type) ELSE p_type END
             AS s
    FROM part
)
SELECT lower(s) AS type_ci,
       count(*) AS n_rows,
       count(DISTINCT s) AS n_case_variants
FROM mixed
GROUP BY lower(s)
""",
        doc="Spark 4 collation surface: grouping under UTF8_LCASE "
        "merges case variants inside the engine's hash/compare — no "
        "lowercased shadow column materialized in the aggregation key "
        "— while a nested UTF8_BINARY distinct still counts the exact "
        "variants. The group representative is canonicalized with "
        "lower() and cast back to a binary-collated string so the "
        "result schema is engine-neutral. DuckDB mirrors with plain "
        "lower() grouping.",
    )
    def collation_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
        part = load_table(spark, sf_dir, "part")
        mixed = part.select(
            "p_partkey",
            F.when(
                F.col("p_partkey") % 2 == 0, F.lower("p_type")
            )
            .otherwise(F.col("p_type"))
            .alias("s"),
        )
        return (
            mixed.groupBy(F.collate("s", "UTF8_LCASE").alias("k"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(F.collate("s", "UTF8_BINARY")).alias(
                    "n_case_variants"
                ),
            )
            .select(
                F.lower("k").cast("string").alias("type_ci"),
                "n_rows",
                "n_case_variants",
            )
        )

    @register(
        "variant_function_battery",
        oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
       CAST(json_merge_patch(props, '{}') AS VARCHAR) AS canonical_json,
       json_extract_string(props, '$.absent') IS NULL AS absent_is_null,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 16 AS k_bucket
FROM events
WHERE event_id % 7 = 0
""",
        doc="Spark 4 VARIANT surface: parse_json into the binary "
        "variant encoding once, then typed variant_get extraction, "
        "try_variant_get on a missing path (NULL, no error), and "
        "to_json round-trip. VARIANT keeps semi-structured data in a "
        "shredded binary form — repeated path extraction avoids "
        "re-parsing the JSON text per expression, which is the 100 TB "
        "difference vs get_json_object chains. DuckDB mirrors with "
        "json_extract_string and json_merge_patch (canonical "
        "minified serialization matches to_json's).",
    )
    def variant_function_battery(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").where(
            F.col("event_id") % 7 == 0
        )
        v = ev.withColumn("_v", F.parse_json("props"))
        return v.select(
            "event_id",
            F.variant_get("_v", "$.k", "bigint").alias("prop_k"),
            F.to_json("_v").alias("canonical_json"),
            F.try_variant_get("_v", "$.absent", "bigint")
            .isNull()
            .alias("absent_is_null"),
            (F.variant_get("_v", "$.k", "bigint") % 16).alias("k_bucket"),
        )

    @register(
        "feature_decile_binning",
        oracle="""
WITH bounds AS (
    SELECT quantile_cont(o_totalprice,
                         [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
    FROM orders
), binned AS (
    SELECT o.o_orderpriority,
           1 + len(list_filter(b.qs, q -> o.o_totalprice > q)) AS decile
    FROM orders o, bounds b
)
SELECT o_orderpriority, decile, COUNT(*) AS n_orders
FROM binned GROUP BY o_orderpriority, decile
""",
        doc="Decile feature binning the scalable way: the 9 global "
        "cut points are computed ONCE (exact percentile — a "
        "model-sized driver artifact, like IVF centroids) and "
        "broadcast into a narrow per-row bucket assignment; the "
        "naive alternative — ntile() over a global ORDER BY — is a "
        "single-partition total sort that cannot scale. Interpolated "
        "percentile (Spark percentile == DuckDB quantile_cont, same "
        "lower+(higher-lower)*frac formula) keeps the cut points "
        "bit-identical cross-engine.",
    )
    def feature_decile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        bounds = o.agg(
            F.expr(
                "percentile(o_totalprice, "
                "array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
            ).alias("qs")
        )
        return (
            o.join(F.broadcast(bounds))
            .select(
                "o_orderpriority",
                (
                    F.lit(1)
                    + F.size(
                        F.filter(
                            F.col("qs"), lambda q: F.col("o_totalprice") > q
                        )
                    )
                ).cast("bigint").alias("decile"),
            )
            .groupBy("o_orderpriority", "decile")
            .agg(F.count(F.lit(1)).alias("n_orders"))
        )

    @register(
        "sketch_cardinality_rollup",
        oracle=None,  # binary sketches have no SQL oracle; error bound tested
        doc="Two-level mergeable cardinality rollup (Apache DataSketches "
        "HLL): per-(status, priority) sketches built in one pass, then "
        "MERGED — not recounted — to per-status and grand-total levels "
        "with hll_union_agg. THE reason sketches matter at 100 TB: "
        "every rollup level is derived from the finest sketches "
        "without touching the raw data again. Estimates within ~2% of "
        "exact (tests/test_sketch.py::test_hll_rollup_merge_consistent).",
    )
    def sketch_cardinality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        fine = o.groupBy("o_orderstatus", "o_orderpriority").agg(
            F.hll_sketch_agg("o_custkey").alias("sk"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        per_status = fine.groupBy("o_orderstatus").agg(
            F.hll_union_agg("sk").alias("sk"),
            F.sum("n_orders").cast("bigint").alias("n_orders"),
        )
        total = fine.groupBy().agg(
            F.hll_union_agg("sk").alias("sk"),
            F.sum("n_orders").cast("bigint").alias("n_orders"),
        )
        est = F.hll_sketch_estimate("sk").alias("approx_customers")
        return (
            fine.select(
                F.col("o_orderstatus").alias("orderstatus"),
                F.col("o_orderpriority").alias("orderpriority"),
                est,
                "n_orders",
            )
            .unionByName(
                per_status.select(
                    F.col("o_orderstatus").alias("orderstatus"),
                    F.lit("ALL").alias("orderpriority"),
                    est,
                    "n_orders",
                )
            )
            .unionByName(
                total.select(
                    F.lit("ALL").alias("orderstatus"),
                    F.lit("ALL").alias("orderpriority"),
                    est,
                    "n_orders",
                )
            )
        )

    @register(
        "sketch_quantiles",
        oracle=None,  # approximate by design; error bound tested
        doc="approx_percentile quantile sketch (p50/p95/p99 of order "
        "totals per priority): bounded-memory mergeable quantiles — "
        "the 100 TB replacement for exact percentile's per-group full "
        "sort. Accuracy parameter 10000 => rank error ~1e-4. Error "
        "bound vs exact asserted in tests/test_sketch.py. Scalar "
        "p50/p95/p99 columns (one sketch, element_at projections) — "
        "array output columns crash the driver's canonicalizer.",
    )
    def sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        return (
            o.groupBy("o_orderpriority")
            .agg(
                F.expr(
                    "approx_percentile(o_totalprice, array(0.5, 0.95, 0.99), 10000)"
                ).alias("_p"),
                F.count(F.lit(1)).alias("n_orders"),
            )
            .select(
                "o_orderpriority",
                F.element_at("_p", 1).alias("p50"),
                F.element_at("_p", 2).alias("p95"),
                F.element_at("_p", 3).alias("p99"),
                "n_orders",
            )
        )

    # ------------------------------------------------------------------
    # Scalar function battery (SURVEY §2.8 F1-F10)
    # ------------------------------------------------------------------
    @register(
        "scalar_function_battery",
        oracle="""
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_wire,
       strftime(ts, '%Y%m%d') AS ts_path_token,
       CAST(ts - INTERVAL 7 DAY AS TIMESTAMP) AS ts_minus_7d,
       coalesce(nullif(event_type, 'error'), 'UNKNOWN') AS event_type_clean,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
       floor(value * 1.1 * 100.0 + 0.5) / 100.0 AS value_taxed,
       CAST(value > 100 AS INT) AS is_big,
       concat('evt_', event_type, '_', CAST(user_id AS VARCHAR)) AS routing_key
FROM events
""",
        doc="F1-F10 battery: wire/path timestamp formats, date "
        "arithmetic, coalesce/nullif defaults (P7), JSON field "
        "extraction (F4/F5), arithmetic + round (F8/F9), boolean→int "
        "cast (F7), identifier interpolation (F10).",
    )
    def scalar_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        return ev.select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_wire"),
            F.date_format("ts", "yyyyMMdd").alias("ts_path_token"),
            (F.col("ts") - F.expr("INTERVAL 7 DAYS")).alias("ts_minus_7d"),
            F.coalesce(
                F.nullif(F.col("event_type"), F.lit("error")), F.lit("UNKNOWN")
            ).alias("event_type_clean"),
            F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
            stable_round(F.col("value") * 1.1, 2).alias("value_taxed"),
            (F.col("value") > 100).cast("int").alias("is_big"),
            F.concat(
                F.lit("evt_"), F.col("event_type"), F.lit("_"),
                F.col("user_id").cast("string"),
            ).alias("routing_key"),
        )

    # ------------------------------------------------------------------
    # Window analytics battery (SURVEY §2.5)
    # ------------------------------------------------------------------
    @register(
        "window_rank_battery",
        oracle="""
SELECT event_id, user_id, value,
       row_number()  OVER w AS rn,
       rank()        OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk,
       dense_rank()  OVER (PARTITION BY user_id ORDER BY event_type) AS drk,
       lag(value)    OVER w AS prev_value,
       lead(value)   OVER w AS next_value,
       CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_user_events,
       round(percent_rank() OVER (PARTITION BY user_id
             ORDER BY value DESC, event_id), 6) AS prk,
       round(cume_dist() OVER (PARTITION BY user_id
             ORDER BY value DESC, event_id), 6) AS cdist,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       first_value(value) OVER w AS first_val,
       nth_value(value, 2) OVER w AS second_val
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
        doc="Ranking + analytic window battery over the event stream "
        "(per-key deterministic total order on (ts, event_id)).",
    )
    def window_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        w_val = Window.partitionBy("user_id").orderBy(
            F.col("value").desc(), F.col("event_id")
        )
        w_type = Window.partitionBy("user_id").orderBy("event_type")
        return ev.select(
            "event_id",
            "user_id",
            "value",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w_val).alias("rk"),
            F.dense_rank().over(w_type).alias("drk"),
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_user_events"),
            # distribution functions: exact rational arithmetic on
            # (rank, n) so both engines agree bit-wise; rounded anyway
            F.round(F.percent_rank().over(w_val), 6).alias("prk"),
            F.round(F.cume_dist().over(w_val), 6).alias("cdist"),
            F.ntile(4).over(w).alias("quartile"),
            F.first("value").over(w).alias("first_val"),
            F.nth_value("value", 2).over(w).alias("second_val"),
        )

    @register(
        "q7_nation_volume",
        oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(count(*) AS BIGINT) AS n_lines,
       {exact_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
""",
        doc="TPC-H Q7 analogue (volume shipping between two nations): "
        "the widest join tree in the suite — lineitem x supplier x "
        "orders x customer x nation x nation. Scale shape: the "
        "shipdate range is pushed to the fact scan; the nation-"
        "filtered supplier side collapses to ~1/25 of suppliers and "
        "broadcasts into the fact scan BEFORE the orderkey shuffle, "
        "so only surviving lines shuffle; orders/customer join "
        "sort-merge on their keys (both too big to broadcast at "
        "100 TB), with the customer-side nation filter applied "
        "pre-join to shrink the build. The cross-filter (either "
        "nation pair direction) is evaluated after both nations are "
        "bound — one combinable aggregate finishes it.",
    )
    def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
        nation = load_table(spark, sf_dir, "nation").where(
            F.col("n_name").isin("NATION_1", "NATION_2")
        )
        supp = (
            load_table(spark, sf_dir, "supplier")
            .join(
                F.broadcast(
                    nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))
                ),
                F.col("s_nationkey") == F.col("n_nationkey"),
            )
            .select("s_suppkey", "supp_nation")
        )
        cust = (
            load_table(spark, sf_dir, "customer")
            .join(
                F.broadcast(
                    nation.select(
                        F.col("n_nationkey").alias("n2_key"),
                        F.col("n_name").alias("cust_nation"),
                    )
                ),
                F.col("c_nationkey") == F.col("n2_key"),
            )
            .select("c_custkey", "cust_nation")
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
        li = load_table(spark, sf_dir, "lineitem").where(
            (F.col("l_shipdate")
             >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate")
               < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        )
        co = orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        joined = (
            li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(co, F.col("l_orderkey") == F.col("o_orderkey"))
            .where(
                ((F.col("supp_nation") == "NATION_1")
                 & (F.col("cust_nation") == "NATION_2"))
                | ((F.col("supp_nation") == "NATION_2")
                   & (F.col("cust_nation") == "NATION_1"))
            )
        )
        return joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
        )

    @register(
        "q16_attr_supplier_counts",
        oracle="""
WITH ps AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 9, 19, 29, 49)
  AND p_type NOT LIKE '%2'
GROUP BY 1, 2, 3
""",
        doc="TPC-H Q16 analogue: how many distinct suppliers serve "
        "each surviving (brand, type, size) combination, with the "
        "part-supplier relation derived from lineitem (this schema "
        "has no partsupp table). Scale shape: the (partkey, suppkey) "
        "distinct is a combinable pre-aggregation on the fact table "
        "(shrinks it to relation size before any join); the "
        "attribute filters (<> / IN / NOT LIKE) all push to the part "
        "scan; COUNT(DISTINCT) expands to a two-level aggregate — "
        "exact per group, no global distinct. Part joins the distinct "
        "relation on partkey (sort-merge; part is not broadcast-"
        "sized at 100 TB).",
    )
    def q16_attr_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
        ps = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_partkey", "l_suppkey")
            .distinct()
        )
        part = load_table(spark, sf_dir, "part").where(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 9, 19, 29, 49)
            & ~F.col("p_type").like("%2")
        )
        return (
            ps.join(part, F.col("l_partkey") == F.col("p_partkey"))
            .groupBy(
                "p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size")
            )
            .agg(
                F.count_distinct(F.col("l_suppkey"))
                .cast("bigint")
                .alias("supplier_cnt")
            )
        )


_register()
