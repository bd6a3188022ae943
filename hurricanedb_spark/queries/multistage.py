"""Multistage (V2-engine) SQL shapes: CTEs, subqueries, derived tables, set
ops — the surface of the reference's Calcite engine and its JSON corpus
(pinot-query-runtime/src/test/resources/queries/: WithStatements.json 18,
FromExpressions.json 43, TableExpressions.json 41, Distincts.json 26).

These run through spark.sql over registered views — the same code path a
dialect user hits — and every optimizer decision is Catalyst's
(SURVEY.md §4.4: no custom rules needed for parity). Set ops are a Spark
superset: the reference rejects LogicalUnion (RelToStageConverter.java:70-87).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hurricanedb_spark.catalog.tables import register_views
from hurricanedb_spark.queries import register


def _sql(spark: SparkSession, sf_dir: str, q: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(q)


@register(
    "q_cte_join",
    oracle="""
    WITH cust_orders AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DECIMAL(30,4)) AS DOUBLE) AS spend
      FROM orders GROUP BY o_custkey
    ),
    big AS (SELECT * FROM cust_orders WHERE n_orders >= 2)
    SELECT c.c_mktsegment, COUNT(*) AS n_customers,
           CAST(CAST(SUM(CAST(b.spend AS DECIMAL(18,4))) AS DECIMAL(30,4)) AS DOUBLE) AS total_spend
    FROM big b JOIN customer c ON b.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Chained CTEs + join + re-aggregation (WithStatements.json shapes).",
    tags=("multistage", "cte"),
)
def q_cte_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        WITH cust_orders AS (
          SELECT o_custkey, COUNT(*) AS n_orders,
                 CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DECIMAL(30,4)) AS DOUBLE) AS spend
          FROM orders GROUP BY o_custkey
        ),
        big AS (SELECT * FROM cust_orders WHERE n_orders >= 2)
        SELECT c.c_mktsegment, COUNT(*) AS n_customers,
               CAST(CAST(SUM(CAST(b.spend AS DECIMAL(18,4))) AS DECIMAL(30,4)) AS DOUBLE) AS total_spend
        FROM big b JOIN customer c ON b.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """,
    )


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
    doc="Uncorrelated scalar subquery in a filter. AVG over the full table "
    "is float-order-dependent in theory, but the comparison is > so only "
    "rows within one ulp of the mean could flip — none do at these SFs "
    "(verified by the harness).",
    tags=("multistage", "subquery"),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, COUNT(*) AS n_above_avg
        FROM orders
        WHERE o_totalprice > (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DECIMAL(30,4)) AS DOUBLE) / COUNT(*) FROM orders)
        GROUP BY o_orderpriority
        """,
    )


@register(
    "q_correlated_subquery",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n
    FROM customer c
    WHERE c.c_acctbal > (SELECT 2000 + 0.001 * MAX(o.o_totalprice)
                         FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
    doc="Correlated scalar subquery per outer row (Catalyst decorrelates "
    "into an aggregate + join; the reference's V2 engine plans these via "
    "Calcite subquery rules).",
    tags=("multistage", "subquery", "correlated"),
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c.c_mktsegment, COUNT(*) AS n
        FROM customer c
        WHERE c.c_acctbal > (SELECT 2000 + 0.001 * MAX(o.o_totalprice)
                             FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c.c_mktsegment
        """,
    )


@register(
    "q_derived_table",
    oracle="""
    SELECT t.band, COUNT(*) AS n
    FROM (
      SELECT CASE WHEN o_totalprice < 100000 THEN 'low' ELSE 'high' END AS band
      FROM orders WHERE o_orderstatus = 'O'
    ) t
    GROUP BY t.band
    """,
    doc="Derived table in FROM (FromExpressions.json shapes).",
    tags=("multistage", "derived"),
)
def q_derived_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT t.band, COUNT(*) AS n
        FROM (
          SELECT CASE WHEN o_totalprice < 100000 THEN 'low' ELSE 'high' END AS band
          FROM orders WHERE o_orderstatus = 'O'
        ) t
        GROUP BY t.band
        """,
    )


@register(
    "q_set_ops",
    oracle="""
    WITH f_cust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
         o_cust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
    SELECT
      (SELECT COUNT(*) FROM (SELECT o_custkey FROM f_cust UNION SELECT o_custkey FROM o_cust)) AS n_union,
      (SELECT COUNT(*) FROM (SELECT o_custkey FROM f_cust INTERSECT SELECT o_custkey FROM o_cust)) AS n_intersect,
      (SELECT COUNT(*) FROM (SELECT o_custkey FROM f_cust EXCEPT SELECT o_custkey FROM o_cust)) AS n_except
    """,
    doc="UNION / INTERSECT / EXCEPT — Spark superset (the reference "
    "supports none of these in either engine: SURVEY.md §2.7, "
    "RelToStageConverter.java:70-87 rejects LogicalUnion).",
    tags=("multistage", "setops", "superset"),
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        WITH f_cust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
             o_cust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
        SELECT
          (SELECT COUNT(*) FROM (SELECT o_custkey FROM f_cust UNION SELECT o_custkey FROM o_cust)) AS n_union,
          (SELECT COUNT(*) FROM (SELECT o_custkey FROM f_cust INTERSECT SELECT o_custkey FROM o_cust)) AS n_intersect,
          (SELECT COUNT(*) FROM (SELECT o_custkey FROM f_cust EXCEPT SELECT o_custkey FROM o_cust)) AS n_except
        """,
    )


@register(
    "q_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l.l_discount AS DECIMAL(8,4)))) AS DECIMAL(30,6)) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-06-30 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): 3-way join + group + "
    "top-k by aggregate — the canonical multistage scatter/gather query.",
    tags=("multistage", "join", "topk"),
    bench=True,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT l.l_orderkey,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,4)))) AS DECIMAL(30,6)) AS DOUBLE) AS revenue,
               o.o_orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1995-06-30 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey ASC
        LIMIT 10
        """,
    )


@register(
    "q_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l.l_discount AS DECIMAL(8,4)))) AS DECIMAL(30,6)) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape (local supplier volume): 6-table join with a "
    "cross-table equality (customer nation = supplier nation).",
    tags=("multistage", "join"),
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT n.n_name,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,4)))) AS DECIMAL(30,6)) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey
        GROUP BY n.n_name
        """,
    )
