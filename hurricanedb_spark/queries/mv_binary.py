"""MV-column filter semantics and binary/bytes function coverage.

Pinot MV filter semantics (SURVEY.md §7.4): `WHERE mvCol = 'x'` means "ANY
element equals x" -> array_contains; `mvCol <> 'x'` means "ANY element
differs". Verified here against a DuckDB oracle over a derived token-array
column (the driver tables have no stored MV string column; deriving one
exercises the identical ArrayType machinery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.queries import register


@register(
    "q_mv_filter_semantics",
    oracle="""
    WITH mv AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS toks
      FROM documents
    )
    SELECT lang,
           COUNT(*) FILTER (WHERE list_contains(toks, 'scan')) AS n_eq_any,
           COUNT(*) FILTER (WHERE len(list_filter(toks, t -> t <> 'scan')) > 0) AS n_neq_any,
           COUNT(*) FILTER (WHERE NOT list_contains(toks, 'scan')) AS n_not_contains,
           CAST(SUM(len(toks)) AS BIGINT) AS total_values
    FROM mv
    GROUP BY lang
    """,
    doc="MV filter semantics (SURVEY.md §7.4): mvCol = v -> any-element "
    "equals (array_contains); mvCol <> v -> any-element differs; NOT "
    "contains is the complement. countMV analog via size sum.",
    tags=("mv", "filter"),
)
def q_mv_filter_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    mv = doc.select("doc_id", "lang", toks.alias("toks"))
    return mv.groupBy("lang").agg(
        F.count(F.when(F.array_contains("toks", "scan"), 1)).alias("n_eq_any"),
        F.count(
            F.when(F.size(F.filter(F.col("toks"), lambda t: t != "scan")) > 0, 1)
        ).alias("n_neq_any"),
        F.count(F.when(~F.array_contains("toks", "scan"), 1)).alias("n_not_contains"),
        F.sum(F.size("toks")).alias("total_values"),
    )


@register(
    "q_fn_binary",
    oracle="""
    SELECT doc_id,
           hex(encode(substr(text, 1, 8))) AS hex_prefix,
           to_base64(encode(substr(text, 1, 8))) AS b64_prefix,
           decode(from_base64(to_base64(encode(substr(text, 1, 8))))) AS roundtrip,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    WHERE doc_id % 25 = 0
    """,
    doc="BYTES family (DataTypeConversionFunctions.java, "
    "scalar/StringFunctions to/fromUtf8, to/fromBase64, bytesToHex): "
    "utf8 encode -> hex / base64 -> decode roundtrip.",
    tags=("functions", "binary"),
)
def q_fn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    prefix = F.encode(F.substring("text", 1, 8), "UTF-8")
    return doc.filter(F.col("doc_id") % 25 == 0).select(
        "doc_id",
        F.upper(F.hex(prefix)).alias("hex_prefix"),
        F.base64(prefix).alias("b64_prefix"),
        F.decode(F.unbase64(F.base64(prefix)), "UTF-8").alias("roundtrip"),
        F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
    )
