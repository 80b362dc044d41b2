"""Graph queries: PageRank over the part->supplier edge list.

The oracle is the SAME power iteration UNROLLED as a chain of plain
CTEs (one contrib/dangling/update triple per iteration) — no
recursive-CTE aggregation needed, and every arithmetic step appears
in the identical order in both engines, so the ranks agree to the
last ~ulp and stable rounding at 1e-9 makes the value-hash exact.

Scale shape (operators/components.py::pagerank): per iteration ONE
edge-sized exchange (contrib grouped by dst) + a scalar dangling
aggregate that broadcasts; lineage truncated per round. Rounds are a
fixed constant — the plan does not grow with the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_trend_predictor_spark.functions.exact import (
    stable_round,
    stable_round_sql,
)
from stock_trend_predictor_spark.operators.components import (
    oriented_triangle_count,
    pagerank,
)
from stock_trend_predictor_spark.sources.tables import load_table

PR_D = 0.85
PR_ITERS = 6


def _pagerank_oracle(iters: int) -> str:
    parts = [
        """
WITH e AS MATERIALIZED (
    SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
                    's' || CAST(l_suppkey AS VARCHAR) AS dst
    FROM lineitem
), nodes AS (
    SELECT src AS node FROM e UNION SELECT dst FROM e
), odeg AS (
    SELECT src AS node, count(*) AS od FROM e GROUP BY src
), base AS MATERIALIZED (
    SELECT n.node, coalesce(o.od, 0) AS od
    FROM nodes n LEFT JOIN odeg o ON n.node = o.node
), cnt AS MATERIALIZED (
    SELECT count(*) AS n FROM base
), r0 AS MATERIALIZED (
    SELECT node, od, CAST(1.0 AS DOUBLE) / cnt.n AS r
    FROM base CROSS JOIN cnt
)"""
    ]
    for k in range(iters):
        parts.append(f""", c{k} AS (
    SELECT e.dst AS node, sum(r.r / r.od) AS c
    FROM e JOIN r{k} r ON e.src = r.node GROUP BY e.dst
), d{k} AS (
    SELECT coalesce(sum(r), CAST(0.0 AS DOUBLE)) AS dm
    FROM r{k} WHERE od = 0
), r{k + 1} AS MATERIALIZED (
    SELECT b.node, b.od,
           (CAST(1.0 AS DOUBLE) - {PR_D}) / cnt.n
           + {PR_D} * (coalesce(c.c, CAST(0.0 AS DOUBLE))
                       + d.dm / cnt.n) AS r
    FROM base b
    LEFT JOIN c{k} c ON b.node = c.node
    CROSS JOIN d{k} d CROSS JOIN cnt
)""")
    parts.append(f"""
SELECT node, od, {stable_round_sql('r', 9)} AS rank
FROM r{iters}
""")
    return "".join(parts)


def _register():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "pagerank_part_supplier",
        oracle=_pagerank_oracle(PR_ITERS),
        doc="PageRank (d=0.85, 6 power iterations, dangling-mass "
        "redistribution) over the distinct part->supplier edge list. "
        "Suppliers are all dangling (no out-edges), so the dangling "
        "term is load-bearing, not decorative. The oracle unrolls the "
        "same iteration as chained CTEs — proving the DataFrame loop "
        "(operators/components.py::pagerank, localCheckpoint-"
        "truncated) computes the textbook recurrence bit-for-bit "
        "before 1e-9 rounding.",
    )
    def pagerank_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        e = li.select(
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        ).distinct()
        # part+supplier node set is catalog-sized (fits any executor),
        # so broadcast the rank table: the edge list never shuffles.
        ranks = pagerank(e, d=PR_D, iters=PR_ITERS, broadcast_ranks=True)
        return ranks.select(
            "node", "od", stable_round(F.col("r"), 9).alias("rank")
        )

    @register(
        "triangle_count_copurchase",
        oracle=f"""
WITH e AS (
    SELECT DISTINCT least(l1.l_partkey, l2.l_partkey) AS a,
                    greatest(l1.l_partkey, l2.l_partkey) AS b
    FROM lineitem l1
    JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                    AND l1.l_partkey < l2.l_partkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
), deg AS (
    SELECT v, count(*) AS deg FROM (
        SELECT a AS v FROM e UNION ALL SELECT b FROM e
    ) GROUP BY v
), oriented AS (
    SELECT CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.a ELSE e.b END AS src,
           CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.b ELSE e.a END AS dst,
           CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN db.deg ELSE da.deg END AS ddst
    FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
), tri AS (
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM oriented e1
    JOIN oriented e2 ON e1.src = e2.src
                    AND ((e1.ddst, e1.dst) < (e2.ddst, e2.dst))
    JOIN oriented e3 ON e3.src = e1.dst AND e3.dst = e2.dst
), stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_vertices,
           CAST(CAST(sum(deg * (deg - 1)) AS BIGINT) / 2 AS BIGINT) AS n_wedges
    FROM deg
), ne AS (
    SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e
)
SELECT n_vertices, n_edges, n_wedges, n_triangles,
       {stable_round_sql(
           '3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)',
           9)} AS transitivity
FROM stats CROSS JOIN ne CROSS JOIN tri
""",
        doc="Exact triangle count + global clustering coefficient of "
        "the 1998 part co-purchase graph (parts are adjacent when "
        "some 1998 order contains both). Edges come from the "
        "bounded per-order self-join; counting uses degree-ordered "
        "edge orientation (operators/components.py::"
        "oriented_triangle_count — Suri & Vassilvitskii WWW'11), "
        "which caps out-degrees at O(sqrt(m)) so the wedge join "
        "materializes at most m^1.5 candidates even under hub skew. "
        "The oracle replays the identical orientation in SQL; counts "
        "are integers, so the only rounded value is the final "
        "transitivity ratio.",
    )
    def triangle_count_copurchase(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        o98 = (
            load_table(spark, sf_dir, "orders")
            .where(
                (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
            )
            .select("o_orderkey")
        )
        li98 = li.join(
            o98, li.l_orderkey == o98.o_orderkey, "left_semi"
        )
        l1 = li98.select(
            F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a")
        )
        l2 = li98.select(
            F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b")
        )
        edges = (
            l1.join(l2, "k")
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
        res = oriented_triangle_count(edges)
        return res.select(
            "n_vertices",
            "n_edges",
            "n_wedges",
            "n_triangles",
            stable_round(F.col("transitivity_raw"), 9).alias("transitivity"),
        )

    @register(
        "copurchase_lift",
        oracle=f"""
WITH op AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n_orders AS (
    SELECT count(DISTINCT l_orderkey) AS n FROM op
), part_n AS (
    SELECT l_partkey, count(*) AS pn FROM op GROUP BY 1
), pair_n AS (
    SELECT o1.l_partkey AS a, o2.l_partkey AS b, count(*) AS ab_n
    FROM op o1 JOIN op o2
      ON o1.l_orderkey = o2.l_orderkey AND o1.l_partkey < o2.l_partkey
    GROUP BY 1, 2
), scored AS (
    SELECT p.a, p.b,
           CAST(p.ab_n AS BIGINT) AS ab_n,
           CAST(pa.pn AS BIGINT) AS a_n,
           CAST(pb.pn AS BIGINT) AS b_n,
           CAST(p.ab_n AS DOUBLE) * CAST(n.n AS DOUBLE)
               / (CAST(pa.pn AS DOUBLE) * CAST(pb.pn AS DOUBLE)) AS lift
    FROM pair_n p
    JOIN part_n pa ON pa.l_partkey = p.a
    JOIN part_n pb ON pb.l_partkey = p.b
    CROSS JOIN n_orders n
    WHERE p.ab_n >= 3
), ranked AS (
    SELECT a, b, ab_n, a_n, b_n, lift,
           row_number() OVER (ORDER BY lift DESC, a, b) AS rk
    FROM scored
)
SELECT a, b, ab_n, a_n, b_n, {stable_round_sql('lift', 6)} AS lift
FROM ranked WHERE rk <= 50
""",
        doc="Market-basket lift: top-50 part pairs by "
        "lift = P(a,b) * N / (P(a) * P(b)) with support >= 3 orders. "
        "The same bounded per-order pair explosion as the triangle "
        "graph feeds a combinable pair count; marginals join back on "
        "single part keys; the scalar order count broadcasts (1-row "
        "cross join). Top-50 is TakeOrderedAndProject over the pair "
        "table — no global sort. Lift is one fixed IEEE expression "
        "over exact integers, so the ranking (tie-broken on the pair "
        "key) is engine-exact. The classic co-occurrence recommender "
        "score at corpus scale.",
    )
    def copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
        op = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        n_orders = op.agg(
            F.count_distinct("l_orderkey").cast("double").alias("n")
        )
        part_n = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("pn"))
        o1 = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
        o2 = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
        pair_n = (
            o1.join(o2, "k")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("ab_n"))
            .where(F.col("ab_n") >= 3)
        )
        scored = (
            pair_n.join(
                part_n.select(F.col("l_partkey").alias("a"), F.col("pn").alias("a_n")),
                "a",
            )
            .join(
                part_n.select(F.col("l_partkey").alias("b"), F.col("pn").alias("b_n")),
                "b",
            )
            .crossJoin(F.broadcast(n_orders))
            .select(
                "a",
                "b",
                F.col("ab_n").cast("bigint").alias("ab_n"),
                F.col("a_n").cast("bigint").alias("a_n"),
                F.col("b_n").cast("bigint").alias("b_n"),
                (
                    F.col("ab_n").cast("double") * F.col("n")
                    / (F.col("a_n").cast("double") * F.col("b_n").cast("double"))
                ).alias("lift"),
            )
        )
        return (
            scored.orderBy(F.col("lift").desc(), "a", "b")
            .limit(50)
            .select(
                "a", "b", "ab_n", "a_n", "b_n",
                stable_round(F.col("lift"), 6).alias("lift"),
            )
        )


_register()


def _register_kcore():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "kcore_copurchase",
        # Full oracle since r9 (was rows-only): standard SQL disallows
        # aggregation over the recursive reference, but DuckDB permits
        # it, so the one-level peel replays as a recursive CTE — each
        # iteration's working table is the surviving edge set, the
        # recursive term drops every edge touching a degree<12 vertex
        # of the working set and re-emits survivors (round-tagged)
        # WHILE a low-degree vertex exists. Termination is natural:
        # at the fixpoint the guard EXISTS fails and nothing is
        # emitted. The k-core is the UNIQUE fixpoint of valid
        # removals under any schedule (the same argument that makes
        # the Spark side's fringe-cascade exact), so the one-level
        # SQL peel and the cascaded Spark peel agree bit-for-bit —
        # all values are integer ids and integer degrees. The
        # max-round edge set is the answer unless it still holds a
        # low-degree vertex, which happens exactly when the peel
        # emptied the edge set — then the true core is empty (losing
        # every edge drags any survivor under k), and the outer
        # NOT EXISTS returns zero rows. tests/test_graph.py keeps the
        # brute-force Python peel law.
        oracle="""
WITH RECURSIVE e AS (
    SELECT DISTINCT least(l1.l_partkey, l2.l_partkey) AS a,
                    greatest(l1.l_partkey, l2.l_partkey) AS b
    FROM lineitem l1
    JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                    AND l1.l_partkey < l2.l_partkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
), peel(a, b, r) AS (
    SELECT a, b, 0 FROM e
    UNION ALL
    SELECT p.a, p.b, p.r + 1
    FROM peel p
    WHERE EXISTS (
            SELECT 1 FROM (SELECT a AS v FROM peel
                           UNION ALL SELECT b FROM peel)
            GROUP BY v HAVING count(*) < 12)
      AND p.a NOT IN (
            SELECT v FROM (SELECT a AS v FROM peel
                           UNION ALL SELECT b FROM peel)
            GROUP BY v HAVING count(*) < 12)
      AND p.b NOT IN (
            SELECT v FROM (SELECT a AS v FROM peel
                           UNION ALL SELECT b FROM peel)
            GROUP BY v HAVING count(*) < 12)
), core AS (
    SELECT a, b FROM peel WHERE r = (SELECT max(r) FROM peel)
), deg AS (
    SELECT v, count(*) AS deg FROM (
        SELECT a AS v FROM core UNION ALL SELECT b FROM core
    ) GROUP BY v
)
SELECT v, deg FROM deg
WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg < 12)
""",
        doc="12-core of the 1998 co-purchase graph (same edge set as "
        "triangle_count_copurchase; its median degree is ~18 at every "
        "test SF, so k=12 peels the sparse third and cascades): "
        "vertices surviving iterative removal of degree<12 nodes, "
        "with their in-core degrees — the standard dense-cohesion "
        "filter before community detection. Per round: one degree "
        "aggregate + two anti-joins over the monotonically shrinking "
        "edge set, lineage truncated per round "
        "(operators/components.py::kcore_subgraph). The peel touches "
        "only (a, b) key pairs, never payloads.",
    )
    def kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
        from stock_trend_predictor_spark.operators.components import (
            kcore_subgraph,
        )

        o98 = (
            load_table(spark, sf_dir, "orders")
            .where(
                (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
            )
            .select("o_orderkey")
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        op = li.join(
            o98, li.l_orderkey == o98.o_orderkey, "left_semi"
        ).distinct()
        l1 = op.select(
            F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a")
        )
        l2 = op.select(
            F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b")
        )
        edges = (
            l1.join(l2, "k")
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
        return kcore_subgraph(edges, k=12)


_register_kcore()


def _register_assortativity():
    from stock_trend_predictor_spark.plans.registry import register

    @register(
        "degree_assortativity",
        oracle=f"""
WITH e AS (
    SELECT DISTINCT least(l1.l_partkey, l2.l_partkey) AS a,
                    greatest(l1.l_partkey, l2.l_partkey) AS b
    FROM lineitem l1
    JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                    AND l1.l_partkey < l2.l_partkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
), deg AS (
    SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT a AS v FROM e UNION ALL SELECT b FROM e
    ) GROUP BY v
), sums AS (
    SELECT CAST(2 * count(*) AS BIGINT) AS m,
           CAST(SUM(da.deg + db.deg) AS BIGINT) AS sx,
           CAST(SUM(da.deg * da.deg + db.deg * db.deg) AS BIGINT) AS sxx,
           CAST(SUM(2 * da.deg * db.deg) AS BIGINT) AS sxy
    FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
)
SELECT m AS n_endpoints,
       {stable_round_sql(
           '(CAST(sxy AS DOUBLE) / m - (CAST(sx AS DOUBLE) / m)'
           ' * (CAST(sx AS DOUBLE) / m))'
           ' / (CAST(sxx AS DOUBLE) / m - (CAST(sx AS DOUBLE) / m)'
           ' * (CAST(sx AS DOUBLE) / m))', 9)} AS assortativity
FROM sums
""",
        doc="Newman degree assortativity of the 1998 co-purchase "
        "graph (same edge set as triangle_count_copurchase): the "
        "Pearson correlation of endpoint degrees over both edge "
        "orientations, computed from FOUR integer sufficient sums "
        "(m, Sx, Sxx, Sxy) accumulated in one pass over the edge-"
        "degree join — exact integers until the final ratio, so the "
        "answer is partitioning-proof without decimal tricks. "
        "Positive = hubs link to hubs (rich-club), negative = "
        "hub-and-spoke. The edge+degree join shuffles only (vertex, "
        "degree) pairs; no per-vertex state beyond the degree table.",
    )
    def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
        o98 = (
            load_table(spark, sf_dir, "orders")
            .where(
                (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
            )
            .select("o_orderkey")
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        li98 = li.join(o98, li.l_orderkey == o98.o_orderkey, "left_semi")
        l1 = li98.select(
            F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a")
        )
        l2 = li98.select(
            F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b")
        )
        edges = (
            l1.join(l2, "k")
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
        deg = (
            edges.select(F.col("a").alias("v"))
            .unionAll(edges.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        da = deg.select(F.col("v").alias("a"), F.col("deg").alias("da"))
        db = deg.select(F.col("v").alias("b"), F.col("deg").alias("db"))
        j = edges.join(da, "a").join(db, "b")
        sums = j.agg(
            (F.lit(2) * F.count(F.lit(1))).alias("m"),
            F.sum(F.col("da") + F.col("db")).alias("sx"),
            F.sum(
                F.col("da") * F.col("da") + F.col("db") * F.col("db")
            ).alias("sxx"),
            F.sum(F.lit(2) * F.col("da") * F.col("db")).alias("sxy"),
        )
        mx = F.col("sx").cast("double") / F.col("m")
        return sums.select(
            F.col("m").alias("n_endpoints"),
            stable_round(
                (F.col("sxy").cast("double") / F.col("m") - mx * mx)
                / (F.col("sxx").cast("double") / F.col("m") - mx * mx),
                9,
            ).alias("assortativity"),
        )


_register_assortativity()
