"""Filter predicate coverage — every FilterKind from the reference
(pinot-common/.../sql/FilterKind.java:21-41): AND/OR/NOT, =, !=, </>/<=/>=,
BETWEEN, IN/NOT IN, LIKE, REGEXP_LIKE, IS [NOT] NULL, TEXT_CONTAINS,
JSON_MATCH.

All of the reference's 15 physical filter operators
(pinot-core/.../operator/filter/ — sorted/bitmap/range/scan/text/json/H3
variants) are index-strategy implementations of one logical `df.filter`;
Spark+Parquet choose the access path (predicate pushdown, row-group stats,
dictionary/bloom filters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.queries import register
from hurricanedb_spark.queries._exact import dsum, o_dcol, o_dsum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_filter_conjunction",
    oracle=f"""
    SELECT COUNT(*) AS n, {o_dsum(o_dcol('l_extendedprice'), 'revenue')}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
      AND NOT (l_returnflag = 'A' AND l_linestatus = 'F')
    """,
    doc="AND/OR/NOT + BETWEEN + range predicates (FilterKind.java:21-41); "
    "reference picks sorted/range/bitmap operators, Spark pushes to parquet.",
    tags=("filter",),
    bench=True,
)
def q_filter_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 25)
        & ~((F.col("l_returnflag") == "A") & (F.col("l_linestatus") == "F"))
    )
    return li.filter(cond).agg(
        F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "revenue")
    )


@register(
    "q_filter_in_notin",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
      AND o_orderpriority NOT IN ('1-URGENT')
    GROUP BY o_orderpriority
    """,
    doc="IN / NOT_IN predicates (FilterKind.java IN/NOT_IN; "
    "MergeEqInFilterOptimizer merges eq-chains into IN).",
    tags=("filter",),
)
def q_filter_in_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    return (
        od.filter(
            F.col("o_orderstatus").isin("F", "O")
            & ~F.col("o_orderpriority").isin("1-URGENT")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_filter_like_regex",
    oracle="""
    SELECT
      COUNT(*) FILTER (WHERE p_name LIKE '%green%') AS n_like,
      COUNT(*) FILTER (WHERE regexp_matches(p_type, '^STANDARD.*BRASS$')) AS n_regex,
      COUNT(*) FILTER (WHERE contains(p_brand, 'Brand#1')) AS n_contains,
      COUNT(*) FILTER (WHERE starts_with(p_type, 'SMALL')) AS n_starts,
      COUNT(*) FILTER (WHERE ends_with(p_type, 'COPPER')) AS n_ends
    FROM part
    """,
    doc="LIKE / REGEXP_LIKE (FilterKind LIKE, REGEXP_LIKE -> Spark LIKE/RLIKE) "
    "+ TEXT_CONTAINS (TextContainsFilterOperator.java) as contains(); "
    "startsWith/endsWith from StringFunctions.java.",
    tags=("filter", "text"),
)
def q_filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = _t(spark, sf_dir, "part")
    return pt.agg(
        F.count(F.when(F.col("p_name").like("%green%"), 1)).alias("n_like"),
        F.count(F.when(F.col("p_type").rlike("^STANDARD.*BRASS$"), 1)).alias("n_regex"),
        F.count(F.when(F.col("p_brand").contains("Brand#1"), 1)).alias("n_contains"),
        F.count(F.when(F.col("p_type").startswith("SMALL"), 1)).alias("n_starts"),
        F.count(F.when(F.col("p_type").endswith("COPPER"), 1)).alias("n_ends"),
    )


@register(
    "q_filter_null_handling",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      COUNT(props) AS n_props_notnull,
      COUNT(*) FILTER (WHERE props IS NULL) AS n_props_null,
      COUNT(*) FILTER (WHERE props IS NOT NULL AND event_type = 'click') AS n_click_props
    FROM events
    """,
    doc="IS_NULL / IS_NOT_NULL (FilterKind.java; reference needs a "
    "null-value vector + enableNullHandling=true, Spark NULLs are native — "
    "SURVEY.md §1.2 null-story).",
    tags=("filter", "null"),
)
def q_filter_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("props").alias("n_props_notnull"),
        F.count(F.when(F.col("props").isNull(), 1)).alias("n_props_null"),
        F.count(
            F.when(F.col("props").isNotNull() & (F.col("event_type") == "click"), 1)
        ).alias("n_click_props"),
    )
