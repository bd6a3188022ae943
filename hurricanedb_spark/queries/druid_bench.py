"""The reference's own benchmark suite: 7 TPC-H-lineitem queries from
contrib/pinot-druid-benchmark/src/main/resources/pinot_queries/0.pql-6.pql,
translated onto the driver's lineitem columns (the driver table has no
l_shipmode/l_receiptdate; per BASELINE.md those map to l_linestatus /
l_shipdate). These are the headline bench queries (bench=True).

Scale note: pd3/pd4/pd5 group by ~2.4k dates — partial aggregation makes the
shuffle tiny regardless of fact size; pd0-pd2 reduce to a scalar. At 100 TB
every one of these is scan-bound, which is the best case for Spark's
vectorized parquet reader + whole-stage codegen.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.queries import register
from hurricanedb_spark.queries._exact import dcol, dsum, o_dcol, o_dsum


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem")


@register(
    "pd0_global_sums",
    oracle=f"""
    SELECT {o_dsum(o_dcol('l_extendedprice'), 'sum_extendedprice')},
           {o_dsum(o_dcol('l_discount'), 'sum_discount')}
    FROM lineitem
    """,
    doc="pinot-druid 0.pql: SELECT SUM(l_extendedprice), SUM(l_discount).",
    tags=("bench", "aggregation"),
    bench=True,
)
def pd0_global_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _li(spark, sf_dir).agg(
        dsum("l_extendedprice", "sum_extendedprice"),
        dsum("l_discount", "sum_discount"),
    )


@register(
    "pd1_filtered_sum",
    oracle=f"""
    SELECT {o_dsum(o_dcol('l_extendedprice'), 'sum_extendedprice')}
    FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="pinot-druid 1.pql: filtered global sum.",
    tags=("bench", "aggregation", "filter"),
    bench=True,
)
def pd1_filtered_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _li(spark, sf_dir)
        .filter(F.col("l_returnflag") == "R")
        .agg(dsum("l_extendedprice", "sum_extendedprice"))
    )


@register(
    "pd2_time_range_sum",
    oracle=f"""
    SELECT {o_dsum(o_dcol('l_extendedprice'), 'sum_extendedprice')}
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-12-01 00:00:00'
                         AND TIMESTAMP '1996-12-31 00:00:00'
    """,
    doc="pinot-druid 2.pql: one-month time-range sum (reference: "
    "TimeSegmentPruner interval tree; Spark: parquet row-group stats).",
    tags=("bench", "aggregation", "time"),
    bench=True,
)
def pd2_time_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    return li.filter(
        F.col("l_shipdate").between(
            F.lit("1996-12-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
    ).agg(dsum("l_extendedprice", "sum_extendedprice"))


@register(
    "pd3_groupby_date",
    oracle=f"""
    SELECT CAST(l_shipdate AS DATE) AS ship_date,
           {o_dsum(o_dcol('l_extendedprice'), 'sum_extendedprice')}
    FROM lineitem GROUP BY 1
    """,
    doc="pinot-druid 3.pql: sum grouped by ship date (~2.4k groups).",
    tags=("bench", "aggregation", "groupby"),
    bench=True,
)
def pd3_groupby_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _li(spark, sf_dir)
        .groupBy(F.col("l_shipdate").cast("date").alias("ship_date"))
        .agg(dsum("l_extendedprice", "sum_extendedprice"))
    )


@register(
    "pd4_groupby_date_2sums",
    oracle=f"""
    SELECT CAST(l_shipdate AS DATE) AS ship_date,
           {o_dsum(o_dcol('l_extendedprice'), 'sum_extendedprice')},
           {o_dsum(o_dcol('l_quantity'), 'sum_quantity')}
    FROM lineitem GROUP BY 1
    """,
    doc="pinot-druid 4.pql: two sums grouped by ship date.",
    tags=("bench", "aggregation", "groupby"),
    bench=True,
)
def pd4_groupby_date_2sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _li(spark, sf_dir)
        .groupBy(F.col("l_shipdate").cast("date").alias("ship_date"))
        .agg(
            dsum("l_extendedprice", "sum_extendedprice"),
            dsum("l_quantity", "sum_quantity"),
        )
    )


@register(
    "pd5_range_groupby_date",
    oracle=f"""
    SELECT CAST(l_shipdate AS DATE) AS ship_date,
           {o_dsum(o_dcol('l_extendedprice'), 'sum_extendedprice')}
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                         AND TIMESTAMP '1996-12-31 00:00:00'
    GROUP BY 1
    """,
    doc="pinot-druid 5.pql: date-range filter + group by date.",
    tags=("bench", "aggregation", "groupby", "time"),
    bench=True,
)
def pd5_range_groupby_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    return (
        li.filter(
            F.col("l_shipdate").between(
                F.lit("1995-01-01").cast("timestamp"),
                F.lit("1996-12-31").cast("timestamp"),
            )
        )
        .groupBy(F.col("l_shipdate").cast("date").alias("ship_date"))
        .agg(dsum("l_extendedprice", "sum_extendedprice"))
    )


@register(
    "pd6_in_range_groupby",
    oracle=f"""
    SELECT l_linestatus,
           {o_dsum(o_dcol('l_extendedprice'), 'sum_extendedprice')}
    FROM lineitem
    WHERE l_returnflag IN ('R', 'A')
      AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY l_linestatus
    """,
    doc="pinot-druid 6.pql: IN + date range + low-cardinality group "
    "(driver lineitem lacks shipmode/receiptdate -> returnflag/shipdate).",
    tags=("bench", "aggregation", "groupby"),
    bench=True,
)
def pd6_in_range_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    return (
        li.filter(
            F.col("l_returnflag").isin("R", "A")
            & F.col("l_shipdate").between(
                F.lit("1997-01-01").cast("timestamp"),
                F.lit("1997-12-31").cast("timestamp"),
            )
        )
        .groupBy("l_linestatus")
        .agg(dsum("l_extendedprice", "sum_extendedprice"))
    )
