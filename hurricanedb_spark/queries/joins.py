"""Join coverage — the reference's V2 hash join supports INNER, LEFT, RIGHT,
FULL, SEMI, ANTI (pinot-query-runtime/.../HashJoinOperator.java:64-65) plus
non-equi residual post-filters (:219-230); V1 adds the broadcast `lookUp()`
dimension join (LookupTransformFunction.java:65-130) and IdSet semi-joins
(IN_SUBQUERY, BaseBrokerRequestHandler.java:783-820).

Spark-first: `df.join(..., how)` — Catalyst picks broadcast/shuffled-hash/
sort-merge; small dims are explicitly broadcast so the fact side never
shuffles (the lookUp() analog). At 100 TB the fact-fact join (lineitem ⋈
orders) shuffles on the join key — both sides partition on orderkey, which
bucketed storage would co-locate (see operators/compaction notes).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from hurricanedb_spark.catalog.tables import load_dim, load_table
from hurricanedb_spark.queries import register
from hurricanedb_spark.queries._exact import dcol, dsum, o_dcol, o_dsum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_join_inner",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n,
           {o_dsum(o_dcol('o.o_totalprice'), 'total')}
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Equi inner join (HashJoinOperator SUPPORTED_JOIN_TYPES); customer "
    "broadcasts while its footprint fits (load_dim), so the orders side "
    "never shuffles at bench scale; past the threshold AQE owns the "
    "strategy.",
    tags=("join",),
    bench=True,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    cu = load_dim(spark, sf_dir, "customer")
    return (
        od.join(cu, od.o_custkey == cu.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total"))
    )


@register(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    doc="LEFT OUTER join: customers with zero orders kept (COUNT=0).",
    tags=("join",),
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    od, cu = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return (
        cu.join(od, od.o_custkey == cu.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "q_join_right",
    oracle="""
    SELECT n.n_name, COUNT(s.s_suppkey) AS n_suppliers
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="RIGHT OUTER join: all nations kept even with no supplier.",
    tags=("join",),
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    su, na = _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "nation")
    return (
        su.join(na, su.s_nationkey == na.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@register(
    "q_join_full",
    oracle="""
    WITH cs AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
         ss AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cs.c_nationkey, ss.s_nationkey) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM cs FULL OUTER JOIN ss ON cs.c_nationkey = ss.s_nationkey
    """,
    doc="FULL OUTER join over two aggregated sides.",
    tags=("join",),
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu, su = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    cs = cu.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_cust"))
    ss = su.groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_supp"))
    return cs.join(ss, cs.c_nationkey == ss.s_nationkey, "full").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers_with_orders
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
    GROUP BY c_mktsegment
    """,
    doc="LEFT SEMI join — also the Spark form of the reference's "
    "IN_SUBQUERY/IdSet two-phase semi-join "
    "(InIdSetTransformFunction.java; Catalyst pushes it down directly).",
    tags=("join", "semi"),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    od, cu = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    big = od.filter(F.col("o_totalprice") > 150000)
    return (
        cu.join(big, cu.c_custkey == big.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_with_orders"))
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers_no_orders
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
    doc="LEFT ANTI join (NOT EXISTS).",
    tags=("join", "anti"),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    od, cu = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_no_orders"))
    )


@register(
    "q_join_nonequi_residual",
    oracle=f"""
    SELECT l.l_returnflag, COUNT(*) AS n,
           {o_dsum(o_dcol('l.l_extendedprice'), 'rev')}
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey AND l.l_extendedprice > o.o_totalprice * 0.3
    GROUP BY l.l_returnflag
    """,
    doc="Equi join + non-equi residual condition "
    "(HashJoinOperator._joinClauseEvaluators, :219-230).",
    tags=("join", "nonequi"),
)
def q_join_nonequi_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, od = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    return (
        li.join(
            od,
            (li.l_orderkey == od.o_orderkey)
            & (li.l_extendedprice > od.o_totalprice * 0.3),
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "rev"))
    )


@register(
    "q_lookup_join",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    doc="lookUp() dimension-table join (LookupTransformFunction.java:65-130; "
    "DimensionTableDataManager replicates the dim in memory) = broadcast "
    "hash join chain — zero shuffle on the fact side.",
    tags=("join", "lookup"),
)
def q_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region")
    return (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q_in_subquery",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    GROUP BY o_orderstatus
    """,
    doc="IN_SUBQUERY (IdSet semi-join, BaseBrokerRequestHandler.java:783-820): "
    "the reference runs the inner query at the broker and ships a bitmap; "
    "Spark plans a left-semi join with the subquery broadcast.",
    tags=("join", "subquery"),
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    od, cu = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    rich = cu.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return (
        od.join(rich, od.o_custkey == rich.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
