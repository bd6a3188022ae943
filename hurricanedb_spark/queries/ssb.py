"""SSB (Star Schema Benchmark) — the reference validates 13 star-join
queries Q1.1-Q4.3 against H2
(pinot-integration-tests/src/test/resources/ssb/ssb_query_set.yaml:22-113,
SSBQueryIntegrationTest.java:112-143). Translated onto the driver's star
schema: lineitem ⋈ orders ⋈ customer ⋈ part ⋈ supplier ⋈ nation ⋈ region,
with revenue = extendedprice*(1-discount) and profit = revenue - cost proxy.

Scale design: nation/region (fixed cardinality) always broadcast;
customer/part/supplier GROW with SF, so they are loaded through
catalog.tables.load_dim, which applies the broadcast hint only while the
measured on-disk footprint fits the session threshold — past that the
planner (AQE/CBO) picks shuffle strategies from runtime stats instead of
being forced into an executor-OOM broadcast. The fact-fact shuffle
(lineitem ⋈ orders on orderkey) is removed by bucketed/co-partitioned
storage. Partial aggregation runs map-side before the final group-by
exchange — plans verified via .explain in tests/test_plans.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from hurricanedb_spark.catalog.tables import load_dim, load_table
from hurricanedb_spark.queries import register
from hurricanedb_spark.queries._exact import dcol, fcol

REVENUE = "CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))"
PROFIT = (
    f"{REVENUE}"
    " - CAST(l_quantity AS DECIMAL(12,4)) * CAST(l_tax AS DECIMAL(8,4))"
    " * CAST(1000 AS DECIMAL(4,0))"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _ship_year_range(lo: int, hi: int):
    """`EXTRACT(year FROM l_shipdate) BETWEEN lo AND hi` as a raw range
    predicate on the stored column (round-15, guide §6): a filter on the
    derived `year(...)` column never reaches the parquet scan
    (PushedFilters held only IsNotNull), while the equivalent
    [lo-01-01, (hi+1)-01-01) range pushes down and prunes row groups /
    segments from their min-max stats — the difference between scanning
    a year and scanning the decade at 100 TB. Exact for every input:
    the half-open calendar range contains precisely the timestamps whose
    extracted year lies in [lo, hi], and NULL fails both forms."""
    return (F.col("l_shipdate") >= F.lit(f"{lo}-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit(f"{hi + 1}-01-01").cast("timestamp")
    )


def _ship_month_range(year: int, month: int):
    """`year(l_shipdate) = year AND month(l_shipdate) = month` as a
    pushdown-able half-open calendar-month range (same rationale and
    exactness argument as `_ship_year_range`)."""
    ny, nm = (year + 1, 1) if month == 12 else (year, month + 1)
    return (
        F.col("l_shipdate") >= F.lit(f"{year}-{month:02d}-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit(f"{ny}-{nm:02d}-01").cast("timestamp"))


def _revenue():
    # (1 - disc) cast back to decimal(9,4): the int literal promotes to
    # decimal(10,0) and would inflate product precision past Spark's 38 cap.
    return dcol("l_extendedprice") * (F.lit(1) - fcol("l_discount")).cast(
        "decimal(9,4)"
    )


def _profit():
    return _revenue() - dcol("l_quantity") * fcol("l_tax") * F.lit(1000).cast(
        "decimal(4,0)"
    )


def _rsum(col: F.Column, alias: str) -> F.Column:
    # DECIMAL(30,6) first: keeps DuckDB's decimal->double cast on the
    # single-rounding path (see _exact.dsum)
    return F.sum(col).cast("decimal(30,6)").cast("double").alias(alias)


# --- Q1 flight: lineitem-only date/discount/quantity slices -----------------


@register(
    "ssb_q1_1",
    oracle=f"""
    SELECT CAST(CAST(SUM({REVENUE}) AS DECIMAL(30,6)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE EXTRACT(year FROM l_shipdate) = 1995
      AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 25
    """,
    doc="SSB Q1.1 (ssb_query_set.yaml:24-27): revenue for one year slice.",
    tags=("ssb",),
    bench=True,
)
def ssb_q1_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        _ship_year_range(1995, 1995)
        & F.col("l_discount").between(0.04, 0.06)
        & (F.col("l_quantity") < 25)
    ).agg(_rsum(_revenue(), "revenue"))


@register(
    "ssb_q1_2",
    oracle=f"""
    SELECT CAST(CAST(SUM({REVENUE}) AS DECIMAL(30,6)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE EXTRACT(year FROM l_shipdate) = 1995 AND EXTRACT(month FROM l_shipdate) = 1
      AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity BETWEEN 26 AND 35
    """,
    doc="SSB Q1.2: one-month slice.",
    bench=True,
    tags=("ssb",),
)
def ssb_q1_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        _ship_month_range(1995, 1)
        & F.col("l_discount").between(0.02, 0.04)
        & F.col("l_quantity").between(26, 35)
    ).agg(_rsum(_revenue(), "revenue"))


@register(
    "ssb_q1_3",
    oracle=f"""
    SELECT CAST(CAST(SUM({REVENUE}) AS DECIMAL(30,6)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE EXTRACT(week FROM l_shipdate) = 6 AND EXTRACT(year FROM l_shipdate) = 1995
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity BETWEEN 26 AND 35
    """,
    doc="SSB Q1.3: one-ISO-week slice (weekofyear).",
    bench=True,
    tags=("ssb",),
)
def ssb_q1_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # the ISO-week predicate stays as an expression (residual filter);
    # the year predicate becomes the pushdown-able calendar range
    return li.filter(
        (F.weekofyear("l_shipdate") == 6)
        & _ship_year_range(1995, 1995)
        & F.col("l_discount").between(0.05, 0.07)
        & F.col("l_quantity").between(26, 35)
    ).agg(_rsum(_revenue(), "revenue"))


# --- Q2 flight: part ⋈ supplier ⋈ region ------------------------------------


def _q2_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pt = load_dim(spark, sf_dir, "part")
    su = load_dim(spark, sf_dir, "supplier")
    na = load_dim(spark, sf_dir, "nation")
    re = load_dim(spark, sf_dir, "region")
    return (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(na, su.s_nationkey == na.n_nationkey)
        .join(re, na.n_regionkey == re.r_regionkey)
    )


_Q2_ORACLE_FROM = """
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
"""


@register(
    "ssb_q2_1",
    oracle=f"""
    SELECT CAST(CAST(SUM({REVENUE}) AS DECIMAL(30,6)) AS DOUBLE) AS revenue,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS d_year, p_brand
    {_Q2_ORACLE_FROM}
    WHERE p_type LIKE 'STANDARD%' AND r_name = 'AMERICA'
    GROUP BY 2, 3
    """,
    doc="SSB Q2.1 (ssb_query_set.yaml:37-41): category+region slice "
    "grouped by year, brand.",
    tags=("ssb", "join"),
    bench=True,
)
def ssb_q2_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _q2_base(spark, sf_dir)
    return (
        base.filter(F.col("p_type").like("STANDARD%") & (F.col("r_name") == "AMERICA"))
        .groupBy(F.year("l_shipdate").alias("d_year"), F.col("p_brand"))
        .agg(_rsum(_revenue(), "revenue"))
        .select("revenue", "d_year", "p_brand")
    )


@register(
    "ssb_q2_2",
    oracle=f"""
    SELECT CAST(CAST(SUM({REVENUE}) AS DECIMAL(30,6)) AS DOUBLE) AS revenue,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS d_year, p_brand
    {_Q2_ORACLE_FROM}
    WHERE p_brand BETWEEN 'Brand#22' AND 'Brand#28' AND r_name = 'ASIA'
    GROUP BY 2, 3
    """,
    doc="SSB Q2.2: brand-range + region slice.",
    bench=True,
    tags=("ssb", "join"),
)
def ssb_q2_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _q2_base(spark, sf_dir)
    return (
        base.filter(
            F.col("p_brand").between("Brand#22", "Brand#28") & (F.col("r_name") == "ASIA")
        )
        .groupBy(F.year("l_shipdate").alias("d_year"), F.col("p_brand"))
        .agg(_rsum(_revenue(), "revenue"))
        .select("revenue", "d_year", "p_brand")
    )


@register(
    "ssb_q2_3",
    oracle=f"""
    SELECT CAST(CAST(SUM({REVENUE}) AS DECIMAL(30,6)) AS DOUBLE) AS revenue,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS d_year, p_brand
    {_Q2_ORACLE_FROM}
    WHERE p_brand = 'Brand#23' AND r_name = 'EUROPE'
    GROUP BY 2, 3
    """,
    doc="SSB Q2.3: single-brand + region slice.",
    bench=True,
    tags=("ssb", "join"),
)
def ssb_q2_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _q2_base(spark, sf_dir)
    return (
        base.filter((F.col("p_brand") == "Brand#23") & (F.col("r_name") == "EUROPE"))
        .groupBy(F.year("l_shipdate").alias("d_year"), F.col("p_brand"))
        .agg(_rsum(_revenue(), "revenue"))
        .select("revenue", "d_year", "p_brand")
    )


# --- Q3 flight: customer ⋈ supplier geography -------------------------------


def _q3_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = load_dim(spark, sf_dir, "customer")
    su = load_dim(spark, sf_dir, "supplier")
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("c_nation"),
        F.col("n_regionkey").alias("cn_region"),
    )
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("s_nation"),
        F.col("n_regionkey").alias("sn_region"),
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )


_Q3_ORACLE_FROM = """
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
"""


@register(
    "ssb_q3_1",
    oracle=f"""
    SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS d_year,
           CAST(CAST(SUM({REVENUE}) AS DECIMAL(30,6)) AS DOUBLE) AS revenue
    {_Q3_ORACLE_FROM}
    JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    JOIN region sr ON sn.n_regionkey = sr.r_regionkey
    WHERE cr.r_name = 'ASIA' AND sr.r_name = 'ASIA'
      AND EXTRACT(year FROM l_shipdate) BETWEEN 1994 AND 1997
    GROUP BY 1, 2, 3
    """,
    doc="SSB Q3.1 (ssb_query_set.yaml:53-57): intra-region trade by "
    "nation pair and year.",
    tags=("ssb", "join"),
    bench=True,
)
def ssb_q3_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    re = _t(spark, sf_dir, "region")
    cr = re.select(F.col("r_regionkey").alias("cr_key"), F.col("r_name").alias("cr_name"))
    sr = re.select(F.col("r_regionkey").alias("sr_key"), F.col("r_name").alias("sr_name"))
    base = (
        _q3_base(spark, sf_dir)
        .join(F.broadcast(cr), F.col("cn_region") == F.col("cr_key"))
        .join(F.broadcast(sr), F.col("sn_region") == F.col("sr_key"))
    )
    return (
        base.filter(
            (F.col("cr_name") == "ASIA")
            & (F.col("sr_name") == "ASIA")
            & _ship_year_range(1994, 1997)
        )
        .groupBy("c_nation", "s_nation", F.year("l_shipdate").alias("d_year"))
        .agg(_rsum(_revenue(), "revenue"))
    )


@register(
    "ssb_q3_2",
    oracle=f"""
    SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS d_year,
           CAST(CAST(SUM({REVENUE}) AS DECIMAL(30,6)) AS DOUBLE) AS revenue
    {_Q3_ORACLE_FROM}
    WHERE cn.n_name = 'UNITED STATES' AND sn.n_name IN ('UNITED STATES', 'CANADA')
    GROUP BY 1, 2, 3
    """,
    doc="SSB Q3.2: nation-level slice.",
    bench=True,
    tags=("ssb", "join"),
)
def ssb_q3_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _q3_base(spark, sf_dir)
        .filter(
            (F.col("c_nation") == "UNITED STATES")
            & F.col("s_nation").isin("UNITED STATES", "CANADA")
        )
        .groupBy("c_nation", "s_nation", F.year("l_shipdate").alias("d_year"))
        .agg(_rsum(_revenue(), "revenue"))
    )


@register(
    "ssb_q3_3",
    oracle=f"""
    SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS d_year,
           CAST(CAST(SUM({REVENUE}) AS DECIMAL(30,6)) AS DOUBLE) AS revenue
    {_Q3_ORACLE_FROM}
    WHERE cn.n_name IN ('CHINA', 'JAPAN') AND sn.n_name IN ('CHINA', 'JAPAN')
      AND EXTRACT(year FROM l_shipdate) BETWEEN 1994 AND 1997
    GROUP BY 1, 2, 3
    """,
    doc="SSB Q3.3: two-nation pair slice (yaml city pairs -> nations).",
    bench=True,
    tags=("ssb", "join"),
)
def ssb_q3_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _q3_base(spark, sf_dir)
        .filter(
            F.col("c_nation").isin("CHINA", "JAPAN")
            & F.col("s_nation").isin("CHINA", "JAPAN")
            & _ship_year_range(1994, 1997)
        )
        .groupBy("c_nation", "s_nation", F.year("l_shipdate").alias("d_year"))
        .agg(_rsum(_revenue(), "revenue"))
    )


@register(
    "ssb_q3_4",
    oracle=f"""
    SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS d_year,
           CAST(CAST(SUM({REVENUE}) AS DECIMAL(30,6)) AS DOUBLE) AS revenue
    {_Q3_ORACLE_FROM}
    WHERE cn.n_name IN ('CHINA', 'JAPAN') AND sn.n_name IN ('CHINA', 'JAPAN')
      AND EXTRACT(year FROM l_shipdate) = 1995 AND EXTRACT(month FROM l_shipdate) = 7
    GROUP BY 1, 2, 3
    """,
    doc="SSB Q3.4: one-month nation-pair slice.",
    bench=True,
    tags=("ssb", "join"),
)
def ssb_q3_4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _q3_base(spark, sf_dir)
        .filter(
            F.col("c_nation").isin("CHINA", "JAPAN")
            & F.col("s_nation").isin("CHINA", "JAPAN")
            & _ship_month_range(1995, 7)
        )
        .groupBy("c_nation", "s_nation", F.year("l_shipdate").alias("d_year"))
        .agg(_rsum(_revenue(), "revenue"))
    )


# --- Q4 flight: profit across the full star ---------------------------------


def _q4_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = load_dim(spark, sf_dir, "customer")
    su = load_dim(spark, sf_dir, "supplier")
    pt = load_dim(spark, sf_dir, "part")
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("c_nation"),
        F.col("n_regionkey").alias("cn_region"),
    )
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("s_nation"),
        F.col("n_regionkey").alias("sn_region"),
    )
    cr = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("cr_key"), F.col("r_name").alias("cr_name")
    )
    sr = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("sr_key"), F.col("r_name").alias("sr_name")
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(pt, li.l_partkey == pt.p_partkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cr), F.col("cn_region") == F.col("cr_key"))
        .join(F.broadcast(sr), F.col("sn_region") == F.col("sr_key"))
    )


_Q4_ORACLE_FROM = """
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part     ON l_partkey = p_partkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    JOIN region sr ON sn.n_regionkey = sr.r_regionkey
"""


@register(
    "ssb_q4_1",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS d_year, cn.n_name AS c_nation,
           CAST(CAST(SUM({PROFIT}) AS DECIMAL(30,6)) AS DOUBLE) AS profit
    {_Q4_ORACLE_FROM}
    WHERE cr.r_name = 'AMERICA' AND sr.r_name = 'AMERICA'
      AND (p_brand LIKE 'Brand#1%' OR p_brand LIKE 'Brand#2%')
    GROUP BY 1, 2
    """,
    doc="SSB Q4.1 (ssb_query_set.yaml:88-93): profit by year and customer "
    "nation across the full 7-table star.",
    tags=("ssb", "join"),
    bench=True,
)
def ssb_q4_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _q4_base(spark, sf_dir)
    return (
        base.filter(
            (F.col("cr_name") == "AMERICA")
            & (F.col("sr_name") == "AMERICA")
            & (F.col("p_brand").like("Brand#1%") | F.col("p_brand").like("Brand#2%"))
        )
        .groupBy(F.year("l_shipdate").alias("d_year"), F.col("c_nation"))
        .agg(_rsum(_profit(), "profit"))
    )


@register(
    "ssb_q4_2",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS d_year, sn.n_name AS s_nation,
           p_type,
           CAST(CAST(SUM({PROFIT}) AS DECIMAL(30,6)) AS DOUBLE) AS profit
    {_Q4_ORACLE_FROM}
    WHERE cr.r_name = 'AMERICA' AND sr.r_name = 'AMERICA'
      AND EXTRACT(year FROM l_shipdate) IN (1997, 1998)
      AND (p_brand LIKE 'Brand#1%' OR p_brand LIKE 'Brand#2%')
    GROUP BY 1, 2, 3
    """,
    doc="SSB Q4.2: profit drill-down to supplier nation and part type.",
    bench=True,
    tags=("ssb", "join"),
)
def ssb_q4_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _q4_base(spark, sf_dir)
    return (
        base.filter(
            (F.col("cr_name") == "AMERICA")
            & (F.col("sr_name") == "AMERICA")
            & _ship_year_range(1997, 1998)
            & (F.col("p_brand").like("Brand#1%") | F.col("p_brand").like("Brand#2%"))
        )
        .groupBy(
            F.year("l_shipdate").alias("d_year"), F.col("s_nation"), F.col("p_type")
        )
        .agg(_rsum(_profit(), "profit"))
    )


@register(
    "ssb_q4_3",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS d_year, sn.n_name AS s_nation,
           p_brand,
           CAST(CAST(SUM({PROFIT}) AS DECIMAL(30,6)) AS DOUBLE) AS profit
    {_Q4_ORACLE_FROM}
    WHERE cr.r_name = 'AMERICA' AND sn.n_name = 'UNITED STATES'
      AND EXTRACT(year FROM l_shipdate) IN (1997, 1998)
      AND p_type LIKE 'ECONOMY%'
    GROUP BY 1, 2, 3
    """,
    doc="SSB Q4.3: profit drill-down to brand for one supplier nation.",
    bench=True,
    tags=("ssb", "join"),
)
def ssb_q4_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _q4_base(spark, sf_dir)
    return (
        base.filter(
            (F.col("cr_name") == "AMERICA")
            & (F.col("s_nation") == "UNITED STATES")
            & _ship_year_range(1997, 1998)
            & F.col("p_type").like("ECONOMY%")
        )
        .groupBy(
            F.year("l_shipdate").alias("d_year"), F.col("s_nation"), F.col("p_brand")
        )
        .agg(_rsum(_profit(), "profit"))
    )
