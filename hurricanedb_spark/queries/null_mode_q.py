"""Dual null-handling mode, end-to-end (SURVEY.md §1.2 — "a key semantic").

The reference has two null stories:

  enableNullHandling=true  — real SQL NULLs via a per-column null-value
      vector (NullValueVectorReaderImpl; QueryOptionsUtils.java:158,
      CommonConstants.java:304). Aggregates skip NULLs.
  enableNullHandling=false (DEFAULT) — every null was substituted at
      ingestion with the FieldSpec default (FieldSpec.java:49-66:
      Integer/Long.MIN_VALUE for dimensions, 0 for metrics, "null" for
      strings). Aggregates see the substituted values: COUNT counts them,
      MIN collapses to MIN_VALUE, SUM/AVG shift.

Spark-side: native mode is just Spark NULLs; default mode is
`with_null_mode(df, schema, enable_null_handling=False)` =
na.fill(default_null_values(schema)) at ingestion. Both modes are
oracle-checked on the same deterministically-nulled input, proving the
documented divergence rather than asserting it.

The driver's events table has no physical NULLs, so both queries null
user_id on event_id % 7 == 0 and value on event_id % 11 == 0 first —
a deterministic stand-in for a feed with missing fields.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from hurricanedb_spark.catalog.schema import default_null_values
from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.queries import register

# the events table's Pinot-style schema (role-typed, FieldSpec dialect)
EVENTS_SCHEMA_JSON: dict[str, Any] = {
    "schemaName": "events",
    "dimensionFieldSpecs": [
        {"name": "user_id", "dataType": "LONG"},
        {"name": "event_type", "dataType": "STRING"},
    ],
    "metricFieldSpecs": [{"name": "value", "dataType": "DOUBLE"}],
    "dateTimeFieldSpecs": [{"name": "ts", "dataType": "TIMESTAMP"}],
}

LONG_MIN = -9223372036854775808  # FieldSpec.java:49 dimension LONG default


def with_null_mode(
    df: DataFrame, schema_json: dict[str, Any], enable_null_handling: bool
) -> DataFrame:
    """Apply the reference's null mode to an ingested DataFrame.

    enable_null_handling=True  -> native Spark NULLs, untouched.
    enable_null_handling=False -> FieldSpec default-null substitution
    (the reference's default), restricted to columns present in df."""
    if enable_null_handling:
        return df
    fills = {
        k: v for k, v in default_null_values(schema_json).items() if k in df.columns
    }
    return df.na.fill(fills)


def _nulled_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "user_id", F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("user_id"))
    ).withColumn(
        "value", F.when(F.col("event_id") % 11 == 0, None).otherwise(F.col("value"))
    )


def _null_mode_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("user_id").alias("n_user"),
        F.min("user_id").alias("min_user"),
        F.sum(F.col("value").cast("decimal(12,4)"))
        .cast("decimal(30,4)")
        .cast("double")
        .alias("sum_value"),
    )


_NULLED_ORACLE = """
    SELECT event_id, event_type,
           CASE WHEN event_id % 7 = 0 THEN NULL ELSE user_id END AS user_id,
           CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS value
    FROM events
"""


@register(
    "q_null_mode_native",
    oracle=f"""
    WITH nulled AS ({_NULLED_ORACLE})
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(user_id) AS n_user,
           MIN(user_id) AS min_user,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DECIMAL(30,4))
                AS DOUBLE) AS sum_value
    FROM nulled
    GROUP BY event_type
    """,
    doc="enableNullHandling=true: native NULL semantics — COUNT(col) skips "
    "nulled rows, MIN ignores them, SUM over present values only "
    "(NullValueVectorReaderImpl path).",
    tags=("null", "semantics"),
)
def q_null_mode_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = with_null_mode(
        _nulled_events(spark, sf_dir), EVENTS_SCHEMA_JSON, enable_null_handling=True
    )
    return _null_mode_agg(df)


@register(
    "q_null_mode_default",
    oracle=f"""
    WITH nulled AS ({_NULLED_ORACLE}),
    subst AS (
      SELECT event_type,
             COALESCE(user_id, CAST({LONG_MIN} AS BIGINT)) AS user_id,
             COALESCE(value, 0.0) AS value
      FROM nulled
    )
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(user_id) AS n_user,
           MIN(user_id) AS min_user,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DECIMAL(30,4))
                AS DOUBLE) AS sum_value
    FROM subst
    GROUP BY event_type
    """,
    doc="enableNullHandling=false (the reference DEFAULT): FieldSpec "
    "default-null substitution at ingestion (Long.MIN_VALUE dimension, "
    "0.0 metric — FieldSpec.java:49-66) feeds the same aggregate — "
    "COUNT(user_id)==COUNT(*), MIN collapses to MIN_VALUE, SUM unchanged "
    "by the 0.0 metric default. Divergence from q_null_mode_native is "
    "the documented dual behavior, proven by both oracles.",
    tags=("null", "semantics"),
)
def q_null_mode_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = with_null_mode(
        _nulled_events(spark, sf_dir), EVENTS_SCHEMA_JSON, enable_null_handling=False
    )
    return _null_mode_agg(df)
