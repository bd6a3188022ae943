"""Core V1-engine query shapes: selection / aggregation / group-by /
distinct / having / post-aggregation / filtered aggregation.

Reference execution model: per-segment partial aggregation -> combine ->
broker reduce (pinot-core/.../aggregation/function/AggregationFunction.java:42-130)
= Spark's partial/final HashAggregate, planned by Catalyst automatically.
HAVING and post-aggregation run at the broker in the reference
(HavingFilterHandler.java:29, PostAggregationHandler.java:44); in Spark they
are part of the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hurricanedb_spark.catalog import register_views
from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.queries import register
from hurricanedb_spark.queries._exact import (
    davg,
    dcol,
    dsum,
    fcol,
    o_davg,
    o_dcol,
    o_dsum,
    o_fcol,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- flagship: TPC-H Q1 shape (aggregation + group-by + order-by) -----------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum(o_dcol('l_quantity'), 'sum_qty')},
           {o_dsum(o_dcol('l_extendedprice'), 'sum_base_price')},
           {o_dsum(f"{o_dcol('l_extendedprice')} * (1 - {o_fcol('l_discount')})", 'sum_disc_price')},
           {o_dsum(f"{o_dcol('l_extendedprice')} * (1 - {o_fcol('l_discount')}) * (1 + {o_fcol('l_tax')})", 'sum_charge', scale=6)},
           {o_davg(o_dcol('l_quantity'), 'avg_qty')},
           {o_davg(o_dcol('l_extendedprice'), 'avg_price')},
           {o_davg(o_dcol('l_discount'), 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: 8 aggregates, 2 group keys. "
    "Reference analog: aggregation group-by path GroupByPlanNode "
    "(pinot-core/.../plan/maker/InstancePlanMakerImplV2.java:233-248).",
    tags=("aggregation", "groupby"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # cast the (1 ± frac) factors back to decimal(9,4): Spark promotes the
    # int literal to decimal(10,0), inflating the product precision past 38
    # and triggering silent precision-loss rounding otherwise.
    one_minus_disc = (F.lit(1) - fcol("l_discount")).cast("decimal(9,4)")
    one_plus_tax = (F.lit(1) + fcol("l_tax")).cast("decimal(9,4)")
    disc_price = dcol("l_extendedprice") * one_minus_disc
    charge = disc_price * one_plus_tax
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge", scale=6),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- selection + order-by + limit (SelectionOrderByOperator.java, 336 LoC) --


@register(
    "q_selection_orderby",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 20
    """,
    doc="Selection ORDER BY top-k; Spark plans TakeOrderedAndProject "
    "(reference: per-segment PQ + broker k-way merge, "
    "SelectionOperatorService.java:58-102).",
    tags=("selection", "orderby", "limit"),
    bench=True,
)
def q_selection_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(20)
    )


# --- DISTINCT (executed as aggregation in the reference: DistinctTable.java:64)


@register(
    "q_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    doc="SELECT DISTINCT -> HashAggregate without aggregates "
    "(reference DistinctPlanNode / DistinctTable.java:64).",
    tags=("distinct",),
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# --- HAVING + post-aggregation (sum/sum arithmetic on aggregated values) ----


@register(
    "q_having_postagg",
    oracle=f"""
    SELECT l_returnflag,
           {o_dsum(o_dcol('l_extendedprice'), 'total_price')},
           {o_dsum(o_dcol('l_quantity'), 'total_qty')},
           (CAST(SUM({o_dcol('l_extendedprice')}) AS DOUBLE)
              / CAST(SUM({o_dcol('l_quantity')}) AS DOUBLE)) AS price_per_unit
    FROM lineitem
    GROUP BY l_returnflag
    HAVING SUM({o_dcol('l_quantity')}) > 100
    """,
    doc="HAVING (HavingFilterHandler.java:29) + post-aggregation expression "
    "sum(a)/sum(b) (PostAggregationHandler.java:44).",
    tags=("aggregation", "having", "postagg"),
)
def q_having_postagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(dcol("l_extendedprice")).alias("_sp"),
        F.sum(dcol("l_quantity")).alias("_sq"),
    )
    return agg.filter(F.col("_sq") > 100).select(
        "l_returnflag",
        F.col("_sp").cast("double").alias("total_price"),
        F.col("_sq").cast("double").alias("total_qty"),
        (F.col("_sp").cast("double") / F.col("_sq").cast("double")).alias("price_per_unit"),
    )


# --- FILTER clause (FilteredAggregationOperator.java) -----------------------


@register(
    "q_filtered_agg",
    oracle=f"""
    SELECT
      COUNT(*) AS n_all,
      COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
      {o_dsum(o_dcol('l_extendedprice'), 'sum_all')},
      CAST(COALESCE(SUM({o_dcol('l_extendedprice')}) FILTER (WHERE l_discount > 0.05), 0) AS DOUBLE) AS sum_discounted
    FROM lineitem
    """,
    doc="Filtered aggregation: agg FILTER (WHERE ...) "
    "(pinot-core/.../operator/query/FilteredAggregationOperator.java).",
    tags=("aggregation", "filtered-agg"),
)
def q_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
        dsum("l_extendedprice", "sum_all"),
        F.coalesce(
            F.sum(F.when(F.col("l_discount") > 0.05, dcol("l_extendedprice"))), F.lit(0)
        )
        .cast("double")
        .alias("sum_discounted"),
    )


# --- distinct-count family (SURVEY.md §2.4 :43-53) --------------------------


@register(
    "q_distinctcount",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS dc_part,
           COUNT(DISTINCT l_suppkey) AS dc_supp,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS distinct_sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact distinctCount / distinctSum "
    "(AggregationFunctionType.java:43-45,52-53).",
    tags=("aggregation", "distinctcount"),
)
def q_distinctcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("dc_part"),
        F.countDistinct("l_suppkey").alias("dc_supp"),
        F.sum_distinct(dcol("l_quantity")).cast("double").alias("distinct_sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# --- min/max/range + firstWithTime/lastWithTime (:40-42) --------------------


@register(
    "q_minmaxrange",
    oracle="""
    SELECT o_orderpriority,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           MAX(o_totalprice) - MIN(o_totalprice) AS minmaxrange_price,
           MIN(o_orderdate) AS first_date,
           MAX(o_orderdate) AS last_date
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="minMaxRange (AggregationFunctionType.java:42) = max-min. "
    "No float arithmetic issues: min/max/sub of stored doubles is exact.",
    tags=("aggregation",),
)
def q_minmaxrange(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    return od.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        (F.max("o_totalprice") - F.min("o_totalprice")).alias("minmaxrange_price"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


@register(
    "q_first_last_with_time",
    oracle="""
    SELECT event_type,
           MIN_BY(value, event_id) AS first_value,
           MAX_BY(value, event_id) AS last_value,
           MIN(event_id) AS first_event,
           MAX(event_id) AS last_event,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="firstWithTime/lastWithTime (AggregationFunctionType.java:40-41) = "
    "min_by/max_by over the ordering column; event_id is unique so the "
    "result is deterministic (ties on a raw timestamp would not be).",
    tags=("aggregation",),
)
def q_first_last_with_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.min_by("value", "event_id").alias("first_value"),
        F.max_by("value", "event_id").alias("last_value"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
        F.count(F.lit(1)).alias("n"),
    )


# --- CASE / CAST / COALESCE transform path ----------------------------------


@register(
    "q_case_transform",
    oracle="""
    SELECT
      CASE WHEN o_totalprice >= 200000 THEN 'high'
           WHEN o_totalprice >= 100000 THEN 'mid'
           ELSE 'low' END AS price_band,
      o_orderstatus,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1, 2
    """,
    doc="CASE/CAST expression evaluation (TransformFunctionType.java:61-76) "
    "feeding group-by.",
    tags=("transform", "case"),
)
def q_case_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") >= 200000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band")
    )
    return od.groupBy(band, F.col("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice", "total"),
    )


# --- statistical aggregates via exact-moment formulation (:62-70) -----------


@register(
    "q_statistical",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(30,4)) AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(30,4)) AS DOUBLE) AS s2
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (s2 - s1 * s1 / n) / n AS var_pop,
           (s2 - s1 * s1 / n) / (n - 1) AS var_samp
    FROM m
    """,
    doc="varPop/varSamp (AggregationFunctionType.java:62-67) computed from "
    "exact decimal moments so both engines produce identical doubles; "
    "Spark's builtin var_samp is a distributed float fold (not reproducible "
    "bit-for-bit vs DuckDB) — the exact-moment form is the cross-engine "
    "contract, builtin stddev/var are also exposed in functions/registry.",
    tags=("aggregation", "statistical"),
)
def q_statistical(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q = dcol("l_quantity")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("decimal(30,4)").cast("double").alias("s1"),
        F.sum(q * q).cast("decimal(30,4)").cast("double").alias("s2"),
    )
    var_pop = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n")
    var_samp = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return m.select(
        "l_returnflag",
        "n",
        var_pop.alias("var_pop"),
        var_samp.alias("var_samp"),
    )


# --- entry() flagship uses q1 ------------------------------------------------


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    register_views(spark, sf_dir)
    return q1_pricing_summary(spark, sf_dir)
