"""Deterministic split/sample queries over `documents` (training-data
pipeline operators; see operators/sampling.py). Oracle-exact: md5 is
bit-identical across engines, so the DuckDB oracle reproduces every
per-row assignment, not just aggregate fractions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.operators.sampling import hash_split, stratified_sample
from hurricanedb_spark.queries import register

_BUCKET = (
    "(strpos('0123456789abcdef', substr(md5(CAST({key} AS VARCHAR)), 1, 1)) - 1) * 16 + "
    "(strpos('0123456789abcdef', substr(md5(CAST({key} AS VARCHAR)), 2, 1)) - 1)"
)


@register(
    "q_hash_split_stats",
    oracle=f"""
    WITH b AS (
      SELECT n_chars, {_BUCKET.format(key='doc_id')} AS bucket FROM documents
    ),
    s AS (
      SELECT n_chars,
             CASE WHEN bucket < 205 THEN 'train'
                  WHEN bucket < 230 THEN 'val'
                  ELSE 'test' END AS split
      FROM b
    )
    SELECT split, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY split
    """,
    doc="Deterministic train/val/test assignment by md5(doc_id) bucket "
    "(80/10/10): pure narrow map, stable under re-runs and "
    "repartitioning; per-row assignments reproduced exactly by the "
    "oracle.",
    tags=("datapipe", "sampling"),
)
def q_hash_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    split = hash_split(doc, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "q_stratified_sample",
    oracle=f"""
    WITH b AS (
      SELECT lang,
             {_BUCKET.format(key="CAST(doc_id AS VARCHAR) || chr(31) || lang")} AS bucket
      FROM documents
    )
    SELECT lang, COUNT(*) AS n FROM b WHERE bucket < 64 GROUP BY lang
    """,
    doc="Per-language deterministic ~25% sample: hash key salted with the "
    "stratum so each stratum draws independently; shuffle-free filter.",
    tags=("datapipe", "sampling"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    samp = stratified_sample(doc, "doc_id", 0.25, ["lang"])
    return samp.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
