"""Window functions — the reference's V2 WindowAggregateOperator.java (335
LoC) supports only SUM/COUNT/MIN/MAX/AVG/BOOL_AND/BOOL_OR OVER (PARTITION BY
...) with whole-partition frames (:54,:113-127; 83-query corpus in
WindowFunctions.json). Spark's Window is a strict superset — we cover the
reference surface exactly, plus ranking/running/lag-lead as the superset
(deterministic ORDER BY on unique keys only).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.queries import register
from hurricanedb_spark.queries._exact import dcol


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_window_partition_agg",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) OVER seg AS DOUBLE) AS seg_total,
           COUNT(*) OVER seg AS seg_n,
           MIN(c_acctbal) OVER seg AS seg_min,
           MAX(c_acctbal) OVER seg AS seg_max,
           BOOL_AND(c_acctbal > 0) OVER seg AS seg_all_positive,
           BOOL_OR(c_acctbal > 9000) OVER seg AS seg_any_rich
    FROM customer
    WINDOW seg AS (PARTITION BY c_mktsegment)
    """,
    doc="The exact reference window surface: SUM/COUNT/MIN/MAX/BOOL_AND/"
    "BOOL_OR OVER (PARTITION BY ...) with whole-partition frame "
    "(WindowAggregateOperator.java:54).",
    tags=("window",),
)
def q_window_partition_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    seg = W.partitionBy("c_mktsegment")
    return cu.select(
        "c_custkey",
        "c_mktsegment",
        F.sum(dcol("c_acctbal")).over(seg).cast("double").alias("seg_total"),
        F.count(F.lit(1)).over(seg).alias("seg_n"),
        F.min("c_acctbal").over(seg).alias("seg_min"),
        F.max("c_acctbal").over(seg).alias("seg_max"),
        F.bool_and(F.col("c_acctbal") > 0).over(seg).alias("seg_all_positive"),
        F.bool_or(F.col("c_acctbal") > 9000).over(seg).alias("seg_any_rich"),
    )


@register(
    "q_window_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    QUALIFY rn <= 3
    """,
    doc="Ranking window functions (superset of the reference snapshot, which "
    "has no ROW_NUMBER/RANK — SURVEY.md §2.5); top-3 orders per customer. "
    "ORDER BY includes the unique o_orderkey so ranks are deterministic.",
    tags=("window", "superset"),
)
def q_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        od.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_window_running",
    oracle="""
    SELECT user_id, event_id, value,
           CAST(SUM(CAST(value AS DECIMAL(12,4)))
                OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS event_seq
    FROM events
    """,
    doc="Running aggregate over an ordered frame (superset: the reference "
    "rejects ORDER BY inside OVER, WindowAggregateOperator.java:113-114). "
    "event_id is unique per user stream -> deterministic.",
    tags=("window", "superset"),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.sum(dcol("value")).over(w).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).alias("event_seq"),
    )


@register(
    "q_window_lag_lead",
    oracle="""
    SELECT user_id, event_id, event_type,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           FIRST_VALUE(event_type) OVER w AS first_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="LAG/LEAD/FIRST_VALUE analytics (superset — absent from the "
    "reference snapshot).",
    tags=("window", "superset"),
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(wf).alias("first_type"),
    )
