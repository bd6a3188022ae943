"""Streaming-semantics queries evaluated on the batch events table — the
reference's upsert/dedup/hybrid-table features (SURVEY.md §2.10) have exact
batch-view formulations, which is what these verify; the live Structured
Streaming materializations are exercised in tests/test_streaming.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.operators.upsert import dedup_view, partial_upsert_view, upsert_view
from hurricanedb_spark.queries import register


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "q_upsert_latest",
    oracle="""
    SELECT user_id, event_type, event_id, value, ts
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="Full upsert: latest record per PK ordered by comparison column "
    "(ConcurrentMapPartitionUpsertMetadataManager.java:54-111); PK = "
    "(user_id, event_type), cmp = ts, tiebreak = event_id. In the bench "
    "set as BASELINE.md's streaming-shaped events query (upsert view = "
    "the realtime-table read path).",
    tags=("streaming", "upsert"),
    bench=True,
)
def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return upsert_view(
        _ev(spark, sf_dir), pk=["user_id", "event_type"], cmp_col="ts", tiebreak="event_id"
    ).select("user_id", "event_type", "event_id", "value", "ts")


@register(
    "q_dedup_first",
    oracle="""
    SELECT user_id, event_type, event_id, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="Stream dedup: first-seen record per PK wins "
    "(PartitionDedupMetadataManager.java); arrival order = event_id.",
    tags=("streaming", "dedup"),
)
def q_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_view(
        _ev(spark, sf_dir), pk=["user_id", "event_type"], keep_order="event_id"
    ).select("user_id", "event_type", "event_id", "value")


@register(
    "q_partial_upsert",
    oracle="""
    SELECT user_id,
           MAX_BY(event_type, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                              || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS event_type,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS value,
           MAX(ts) AS ts
    FROM events
    GROUP BY user_id
    """,
    doc="Partial upsert per-column merge strategies "
    "(upsert/merger/*.java): OVERWRITE for event_type (latest by cmp), "
    "INCREMENT for value (decimal-exact so the sum is reproducible).",
    tags=("streaming", "upsert"),
)
def q_partial_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).withColumn(
        "value", F.col("value").cast("decimal(12,4)")
    )
    out = partial_upsert_view(
        ev,
        pk=["user_id"],
        cmp_col="ts",
        strategies={"event_type": "OVERWRITE", "value": "INCREMENT"},
        tiebreak="event_id",
    )
    return out.select(
        "user_id", "event_type", F.col("value").cast("double").alias("value"), "ts"
    )


@register(
    "q_hybrid_time_boundary",
    oracle="""
    WITH offline AS (
      SELECT event_type, value, ts FROM events WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'
    ),
    realtime AS (
      SELECT event_type, value, ts FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00'
    ),
    unioned AS (
      SELECT 'offline' AS part, * FROM offline
      UNION ALL
      SELECT 'realtime' AS part, * FROM realtime
    )
    SELECT part, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
    FROM unioned GROUP BY part, event_type
    """,
    doc="Hybrid table: offline serves ts <= boundary, realtime the rest, "
    "query is a UNION ALL of both parts (TimeBoundaryManager.java:56-91, "
    "BaseBrokerRequestHandler.java:467-475).",
    tags=("streaming", "hybrid"),
)
def q_hybrid_time_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    boundary = F.lit("2024-01-20 00:00:00").cast("timestamp")
    offline = ev.filter(F.col("ts") <= boundary).withColumn("part", F.lit("offline"))
    realtime = ev.filter(F.col("ts") > boundary).withColumn("part", F.lit("realtime"))
    return (
        offline.unionByName(realtime)
        .groupBy("part", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("total_value"),
        )
    )
