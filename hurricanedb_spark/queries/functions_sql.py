"""Scalar/transform function coverage queries — one query per function
family from the reference's two registries (TransformFunctionType.java:29-161
+ 228 @ScalarFunction methods in pinot-common/.../function/scalar/*.java).
Each query exercises the family end-to-end against the DuckDB oracle.

Only cross-engine-deterministic functions go through the value-hash oracle
(integer/string/date ops, sqrt, exact decimal arithmetic); transcendental
functions (exp/ln/pow) are rounded to 9 significant-ish decimals — both
engines use correctly-rounded-to-<1ulp libm so 1e-9 rounding is stable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_fn_datetime",
    oracle="""
    SELECT CAST(EXTRACT(year FROM ts) AS INTEGER) AS y,
           CAST(EXTRACT(quarter FROM ts) AS INTEGER) AS q,
           CAST(EXTRACT(month FROM ts) AS INTEGER) AS mo,
           CAST(EXTRACT(day FROM ts) AS INTEGER) AS d,
           CAST(EXTRACT(hour FROM ts) AS INTEGER) AS h,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day_bucket,
           CAST(EXTRACT(dow FROM ts) AS INTEGER) + 1 AS dow,
           CAST(EXTRACT(doy FROM ts) AS INTEGER) AS doy,
           COUNT(*) AS n,
           CAST(floor(floor(epoch(CAST(ts AS TIMESTAMP))) / 3600) AS BIGINT) AS epoch_hour_bucket
    FROM events
    GROUP BY 1,2,3,4,5,6,7,8,10
    """,
    doc="Date/time family (TransformFunctionType.java:83-99, "
    "scalar/DateTimeFunctions.java): year/quarter/month/day/hour, dateTrunc, "
    "dayOfWeek/dayOfYear, toEpochHoursBucket-style epoch bucketing "
    "(floor(epochSec/3600) = toEpochSecondsBucket(ts, 3600)).",
    tags=("functions", "datetime"),
)
def q_fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # Spark dayofweek: 1=Sunday..7 ; DuckDB dow: 0=Sunday..6 -> +1 aligns.
    return (
        ev.groupBy(
            F.year("ts").alias("y"),
            F.quarter("ts").alias("q"),
            F.month("ts").alias("mo"),
            F.dayofmonth("ts").alias("d"),
            F.hour("ts").alias("h"),
            F.date_trunc("day", F.col("ts")).alias("day_bucket"),
            F.dayofweek("ts").alias("dow"),
            F.dayofyear("ts").alias("doy"),
            F.floor(F.unix_timestamp("ts") / 3600).alias("epoch_hour_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "y", "q", "mo", "d", "h", "day_bucket", "dow", "doy", "n",
            "epoch_hour_bucket",
        )
    )


@register(
    "q_fn_string",
    oracle="""
    SELECT upper(p_brand) AS brand_upper,
           lower(p_type) AS type_lower,
           substr(p_name, 1, 10) AS name_prefix,
           length(p_name) AS name_len,
           concat(p_brand, '|', p_type) AS brand_type,
           replace(p_brand, 'Brand#', 'B') AS brand_short,
           reverse(p_brand) AS brand_rev,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           trim('  x  ') AS trimmed,
           split_part(p_type, ' ', 1) AS type_first_word,
           strpos(p_name, 'a') AS first_a,
           repeat('ab', 2) AS rep,
           ltrim('  x') AS l_trimmed,
           rtrim('x  ') AS r_trimmed
    FROM part
    ORDER BY p_partkey
    LIMIT 50
    """,
    doc="String family (scalar/StringFunctions.java — 42 fns): upper/lower/"
    "substr/length/concat/replace/reverse/lpad/trim/splitPart/strpos/repeat.",
    tags=("functions", "string"),
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = _t(spark, sf_dir, "part")
    return (
        pt.orderBy("p_partkey")
        .limit(50)
        .select(
            F.upper("p_brand").alias("brand_upper"),
            F.lower("p_type").alias("type_lower"),
            F.substring("p_name", 1, 10).alias("name_prefix"),
            F.length("p_name").alias("name_len"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
            F.reverse("p_brand").alias("brand_rev"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
            F.trim(F.lit("  x  ")).alias("trimmed"),
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
            F.instr(F.col("p_name"), "a").alias("first_a"),
            F.repeat(F.lit("ab"), 2).alias("rep"),
            F.ltrim(F.lit("  x")).alias("l_trimmed"),
            F.rtrim(F.lit("x  ")).alias("r_trimmed"),
        )
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(-l_quantity) AS abs_qty,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil_q,
           CAST(floor(l_quantity / 7) AS BIGINT) AS floor_q,
           sqrt(l_quantity) AS sqrt_q,
           CAST(l_orderkey % 97 AS BIGINT) AS mod_ok,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn,
           round(l_extendedprice / 1000, 2) AS price_k,
           least(l_quantity, 25.0) AS least_q,
           greatest(l_quantity, 25.0) AS greatest_q,
           power(l_linenumber, 2) AS ln2,
           round(exp(l_discount), 9) AS exp_d,
           round(ln(l_quantity), 9) AS ln_q,
           round(log10(l_extendedprice), 9) AS log10_p
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Arithmetic family (TransformFunctionType.java:29-49, "
    "scalar/ArithmeticFunctions.java): abs/ceil/floor/sqrt/mod/sign/round/"
    "least/greatest/power/exp/ln/log10. Transcendentals rounded to 9dp "
    "(libm agrees to <1ulp).",
    tags=("functions", "math"),
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % 100 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(-F.col("l_quantity")).alias("abs_qty"),
            F.ceil(F.col("l_quantity") / 7).alias("ceil_q"),
            F.floor(F.col("l_quantity") / 7).alias("floor_q"),
            F.sqrt("l_quantity").alias("sqrt_q"),
            (F.col("l_orderkey") % 97).alias("mod_ok"),
            F.signum(F.col("l_discount") - 0.05).alias("sgn"),
            F.round(F.col("l_extendedprice") / 1000, 2).alias("price_k"),
            F.least("l_quantity", F.lit(25.0)).alias("least_q"),
            F.greatest("l_quantity", F.lit(25.0)).alias("greatest_q"),
            F.pow("l_linenumber", F.lit(2)).alias("ln2"),
            F.round(F.exp("l_discount"), 9).alias("exp_d"),
            F.round(F.log("l_quantity"), 9).alias("ln_q"),
            F.round(F.log10("l_extendedprice"), 9).alias("log10_p"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q_fn_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS n_big_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON family: jsonExtractScalar -> get_json_object; JSON_MATCH "
    "predicate -> path extraction + comparison (JsonExtractScalar"
    "TransformFunction.java, JsonMatchFilterOperator.java — the JSON index "
    "is an access-path optimization, the semantics are a path predicate).",
    tags=("functions", "json"),
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.count(F.when(k > 50, 1)).alias("n_big_k"),
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(embedding[64] AS DOUBLE) AS last_elem,
           CAST(list_min(embedding) AS DOUBLE) AS min_elem,
           CAST(list_max(embedding) AS DOUBLE) AS max_elem,
           list_contains(embedding, 0.0) AS has_zero,
           label
    FROM embeddings
    WHERE vec_id % 10 = 0
    """,
    doc="Array/MV family (TransformFunctionType.java:104-110, "
    "scalar/ArrayFunctions.java): arrayLength->size, arrayElementAt->"
    "element_at, arrayMin/arrayMax->array_min/array_max, arrayContains. "
    "MV columns are ArrayType in the Spark model (SURVEY.md §1.5).",
    tags=("functions", "array", "mv"),
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    return em.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.element_at("embedding", 64).cast("double").alias("last_elem"),
        F.array_min("embedding").cast("double").alias("min_elem"),
        F.array_max("embedding").cast("double").alias("max_elem"),
        F.array_contains("embedding", 0.0).alias("has_zero"),
        "label",
    )


@register(
    "q_fn_mv_aggregate",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vectors,
           CAST(SUM(len(embedding)) AS BIGINT) AS total_elements,
           CAST(SUM(list_sum(list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))))
                AS DOUBLE) / 1000000 AS sum_all_elements
    FROM embeddings
    GROUP BY label
    """,
    doc="MV aggregates (countMV/sumMV, AggregationFunctionType.java:76-92): "
    "per-row array fold + group aggregate. Elements are 1e-6-quantized to "
    "int64 so the fold is order-independent and exact across engines "
    "(raw float sums would be order-dependent).",
    tags=("functions", "array", "mv", "aggregation"),
)
def q_fn_mv_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    # quantize to 1e-6 in int64: float->decimal casts are not portable
    # across engines (shortest-repr vs binary-expansion rounding), but
    # floor(double(x)*1e6) is IEEE-exact in both.
    elem_sum = F.aggregate(
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000000).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return em.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.size("embedding")).alias("total_elements"),
        (F.sum(elem_sum).cast("double") / 1000000).alias("sum_all_elements"),
    )


@register(
    "q_fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           md5(CAST(doc_id AS VARCHAR)) AS id_md5
    FROM documents
    WHERE doc_id % 20 = 0
    """,
    doc="Hash family (scalar/HashFunctions.java): md5/sha256 as hex strings.",
    tags=("functions", "hash"),
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = _t(spark, sf_dir, "documents")
    return doc.filter(F.col("doc_id") % 20 == 0).select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(F.col("doc_id").cast("string")).alias("id_md5"),
    )


@register(
    "q_fn_conditional",
    oracle="""
    SELECT s_suppkey,
           COALESCE(NULLIF(s_name, ''), 'unknown') AS supp_name,
           CASE WHEN s_acctbal < 0 THEN 'debt'
                WHEN s_acctbal < 5000 THEN 'ok' ELSE 'rich' END AS balance_band,
           s_acctbal IS NOT DISTINCT FROM NULL AS bal_is_null,
           IF(s_acctbal > 0, 1, 0) AS is_positive,
           NULLIF(s_nationkey, 0) AS nationkey_nullif
    FROM supplier
    """,
    doc="Null/conditional family (TransformFunctionType.java:61-76, "
    "scalar/ObjectFunctions.java): coalesce/nullif/case/is_distinct_from/if.",
    tags=("functions", "conditional", "null"),
)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    su = _t(spark, sf_dir, "supplier")
    return su.select(
        "s_suppkey",
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("unknown")).alias(
            "supp_name"
        ),
        F.when(F.col("s_acctbal") < 0, "debt")
        .when(F.col("s_acctbal") < 5000, "ok")
        .otherwise("rich")
        .alias("balance_band"),
        F.col("s_acctbal").eqNullSafe(F.lit(None).cast("double")).alias("bal_is_null"),
        F.when(F.col("s_acctbal") > 0, 1).otherwise(0).alias("is_positive"),
        F.nullif(F.col("s_nationkey"), F.lit(0)).alias("nationkey_nullif"),
    )


@register(
    "q_fn_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sin(l_discount), 9) AS sin_d,
           round(cos(l_discount), 9) AS cos_d,
           round(tan(l_discount), 9) AS tan_d,
           round(atan(l_discount), 9) AS atan_d,
           round(asin(l_discount), 9) AS asin_d,
           round(degrees(l_discount), 9) AS deg_d,
           round(radians(l_quantity), 9) AS rad_q,
           round((exp(l_discount) - exp(-l_discount)) / 2, 9) AS sinh_d,
           round((exp(l_discount) + exp(-l_discount)) / 2, 9) AS cosh_d,
           round((exp(2 * l_discount) - 1) / (exp(2 * l_discount) + 1), 9) AS tanh_d,
           round(atan2(l_discount, 1 + l_tax), 9) AS atan2_dt
    FROM lineitem
    WHERE l_orderkey % 200 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Trig family (TransformFunctionType.java:149-161, "
    "scalar/TrigonometricFunctions.java): sin/cos/tan/atan/asin/degrees/"
    "radians/sinh/cosh/tanh/atan2. libm agrees to <1ulp across engines; "
    "9dp rounding makes the comparison stable.",
    tags=("functions", "trig"),
)
def q_fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    d = F.col("l_discount")
    return (
        li.filter(F.col("l_orderkey") % 200 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sin(d), 9).alias("sin_d"),
            F.round(F.cos(d), 9).alias("cos_d"),
            F.round(F.tan(d), 9).alias("tan_d"),
            F.round(F.atan(d), 9).alias("atan_d"),
            F.round(F.asin(d), 9).alias("asin_d"),
            F.round(F.degrees(d), 9).alias("deg_d"),
            F.round(F.radians("l_quantity"), 9).alias("rad_q"),
            F.round(F.sinh(d), 9).alias("sinh_d"),
            F.round(F.cosh(d), 9).alias("cosh_d"),
            F.round(F.tanh(d), 9).alias("tanh_d"),
            F.round(F.atan2(d, F.lit(1) + F.col("l_tax")), 9).alias("atan2_dt"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
