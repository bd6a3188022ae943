"""Gapfill correctness queries (operator in operators/gapfill.py; reference
semantics GapfillUtils.java:39-157 / GapfillProcessor.java)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from hurricanedb_spark.operators.gapfill import (
    FILL_DEFAULT_VALUE,
    FILL_PREVIOUS_VALUE,
    gapfill,
    gapfill_aggregate,
)
from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.queries import register

_START, _END = "2024-01-01 00:00:00", "2024-01-31 00:00:00"


@register(
    "q_gapfill_daily",
    oracle=f"""
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '{_START}', TIMESTAMP '{_END}',
                                    INTERVAL 1 DAY)) AS time_bucket
    ),
    spine_b AS (SELECT time_bucket FROM spine WHERE time_bucket < TIMESTAMP '{_END}'),
    keys AS (SELECT DISTINCT event_type FROM events
             WHERE event_type <> 'purchase' OR EXTRACT(day FROM ts) % 3 = 0),
    actual AS (
      SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS time_bucket,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
      FROM events
      WHERE event_type <> 'purchase' OR EXTRACT(day FROM ts) % 3 = 0
      GROUP BY 1, 2
    ),
    grid AS (SELECT k.event_type, s.time_bucket FROM keys k CROSS JOIN spine_b s)
    SELECT g.event_type, g.time_bucket,
           COALESCE(a.n_events, 0) AS n_events,
           LAST_VALUE(a.total_value IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.time_bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total_value
    FROM grid g LEFT JOIN actual a
      ON g.event_type = a.event_type AND g.time_bucket = a.time_bucket
    """,
    doc="AGGREGATE_GAP_FILL shape: daily buckets per event_type over a "
    "sparsified input (purchase events only every 3rd day so real gaps "
    "exist); n_events filled with default 0, total_value with previous "
    "value (GapfillUtils FILL_DEFAULT_VALUE / FILL_PREVIOUS_VALUE).",
    tags=("gapfill", "timeseries"),
)
def q_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sparse = ev.filter(
        (F.col("event_type") != "purchase") | (F.dayofmonth("ts") % 3 == 0)
    )
    out = gapfill(
        sparse,
        time_col="ts",
        bucket="1 day",
        start=_START,
        end=_END,
        keys=["event_type"],
        aggs={
            "n_events": F.count(F.lit(1)),
            "total_value": F.sum(F.col("value").cast("decimal(12,4)")).cast("double"),
        },
        fills={
            "n_events": (FILL_DEFAULT_VALUE, 0),
            "total_value": (FILL_PREVIOUS_VALUE, None),
        },
    )
    return out.select("event_type", "time_bucket", "n_events", "total_value")


@register(
    "q_gapfill_aggregate",
    oracle=f"""
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '{_START}', TIMESTAMP '{_END}',
                                    INTERVAL 1 DAY)) AS time_bucket
    ),
    spine_b AS (SELECT time_bucket FROM spine WHERE time_bucket < TIMESTAMP '{_END}'),
    keys AS (SELECT DISTINCT event_type FROM events
             WHERE event_type <> 'purchase' OR EXTRACT(day FROM ts) % 3 = 0),
    actual AS (
      SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS time_bucket,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
      FROM events
      WHERE event_type <> 'purchase' OR EXTRACT(day FROM ts) % 3 = 0
      GROUP BY 1, 2
    ),
    grid AS (SELECT k.event_type, s.time_bucket FROM keys k CROSS JOIN spine_b s),
    filled AS (
      SELECT g.event_type, g.time_bucket,
             COALESCE(a.n_events, 0) AS n_events,
             LAST_VALUE(a.total_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.time_bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total_value
      FROM grid g LEFT JOIN actual a
        ON g.event_type = a.event_type AND g.time_bucket = a.time_bucket
    )
    SELECT event_type,
           COUNT(*) AS n_buckets,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           COUNT(*) FILTER (WHERE n_events = 0) AS n_gap_buckets,
           CAST(SUM(CAST(total_value AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_filled_value
    FROM filled
    GROUP BY event_type
    """,
    doc="GAP_FILL_AGGREGATE / AGGREGATE_GAP_FILL_AGGREGATE shape "
    "(GapfillUtils.java:39-157): aggregate daily, fill the gaps, then "
    "re-aggregate the *filled* series per key — bucket counts, gap "
    "counts, and the sum over filled values (carried-forward values "
    "included, exactly what the raw table cannot answer).",
    tags=("gapfill", "timeseries"),
)
def q_gapfill_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sparse = ev.filter(
        (F.col("event_type") != "purchase") | (F.dayofmonth("ts") % 3 == 0)
    )
    return gapfill_aggregate(
        sparse,
        time_col="ts",
        bucket="1 day",
        start=_START,
        end=_END,
        keys=["event_type"],
        aggs={
            "n_events": F.count(F.lit(1)),
            "total_value": F.sum(F.col("value").cast("decimal(12,4)")).cast("double"),
        },
        fills={
            "n_events": (FILL_DEFAULT_VALUE, 0),
            "total_value": (FILL_PREVIOUS_VALUE, None),
        },
        post_aggs={
            "n_buckets": F.count(F.lit(1)),
            "total_events": F.sum("n_events"),
            "n_gap_buckets": F.count(F.when(F.col("n_events") == 0, 1)),
            "sum_filled_value": F.sum(
                F.col("total_value").cast("decimal(18,4)")
            ).cast("double"),
        },
    )
