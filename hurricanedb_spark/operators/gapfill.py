"""Time-series gapfill — the reference's broker post-processor
(pinot-core/.../util/GapfillUtils.java:39-157, GapfillProcessor.java,
BaseGapfillProcessor.java; tests GapfillQueriesTest.java):

  GAPFILL(timeExpr, 'format', 'start', 'end', 'bucketSize',
          FILL(col, 'FILL_PREVIOUS_VALUE'|'FILL_DEFAULT_VALUE'),
          TIMESERIESON(keys...))

sorts rows into time buckets, emits missing buckets per key group, fills
values from the previous bucket or a default, and optionally re-aggregates
(five shapes: GAP_FILL, AGGREGATE_GAP_FILL, GAP_FILL_SELECT,
GAP_FILL_AGGREGATE, AGGREGATE_GAP_FILL_AGGREGATE).

Spark-first design — no driver-side loop, fully distributed:
  1. spine   = sequence(start, end, step) exploded           (tiny: #buckets)
  2. keys    = SELECT DISTINCT keys FROM input                (shuffle: #keys)
  3. grid    = keys CROSS JOIN spine (broadcast the spine)
  4. actual  = input pre-aggregated to (keys, bucket)
  5. grid LEFT JOIN actual, then per-key ordered window
     last(value, ignoreNulls=True) for FILL_PREVIOUS_VALUE,
     coalesce(value, default)      for FILL_DEFAULT_VALUE.

At scale: the spine is always broadcastable (bounded by the queried time
range / bucket size), so the only shuffles are the distinct-keys pass and
the per-key window sort — both partition by the series key, which is the
natural parallelism axis of gapfill.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

FILL_PREVIOUS_VALUE = "FILL_PREVIOUS_VALUE"
FILL_DEFAULT_VALUE = "FILL_DEFAULT_VALUE"


def gapfill(
    df: DataFrame,
    time_col: str,
    bucket: str,
    start: str,
    end: str,
    keys: list[str],
    aggs: dict[str, Column],
    fills: dict[str, tuple[str, object]],
) -> DataFrame:
    """Bucket `df` on `time_col`, emit a dense per-key bucket grid over
    [start, end), and fill gaps.

    Args:
      bucket: a Spark interval unit string for date_trunc-style bucketing,
              e.g. "1 hour", "1 day" (also the spine step).
      aggs:   bucket-level pre-aggregation as {out_col: agg expr over df}
              (the AGGREGATE_GAP_FILL shape); pass F.first for raw GAP_FILL.
      fills:  {out_col: (FILL_PREVIOUS_VALUE, None) | (FILL_DEFAULT_VALUE, v)}.
    """
    spark = df.sparkSession
    unit = bucket.split()[-1].rstrip("s")  # "1 hour" -> "hour"

    bucketed = df.withColumn("__bucket", F.date_trunc(unit, F.col(time_col)))
    actual = bucketed.groupBy(*keys, "__bucket").agg(
        *[c.alias(name) for name, c in aggs.items()]
    )

    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr(f"INTERVAL {bucket}"),
            )
        ).alias("__bucket")
    ).filter(F.col("__bucket") < F.lit(end).cast("timestamp"))

    key_rows = df.select(*keys).distinct()
    grid = key_rows.crossJoin(F.broadcast(spine))

    joined = grid.join(actual, on=[*keys, "__bucket"], how="left")

    w = (
        W.partitionBy(*keys)
        .orderBy("__bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = joined
    for name, (mode, default) in fills.items():
        if mode == FILL_PREVIOUS_VALUE:
            out = out.withColumn(name, F.last(name, ignorenulls=True).over(w))
        elif mode == FILL_DEFAULT_VALUE:
            out = out.withColumn(name, F.coalesce(F.col(name), F.lit(default)))
        else:
            raise ValueError(f"unknown fill mode: {mode}")
    return out.withColumnRenamed("__bucket", "time_bucket")


def gapfill_aggregate(
    df: DataFrame,
    time_col: str,
    bucket: str,
    start: str,
    end: str,
    keys: list[str],
    aggs: dict[str, Column],
    fills: dict[str, tuple[str, object]],
    post_aggs: dict[str, Column],
) -> DataFrame:
    """The re-aggregating gapfill shapes (GapfillUtils.java:39-157
    GAP_FILL_AGGREGATE / AGGREGATE_GAP_FILL_AGGREGATE): run gapfill to a
    dense filled grid, then aggregate the filled series per key — e.g.
    "average daily value including gap days". `post_aggs` expressions see
    the filled columns plus `time_bucket`.

    Distributed shape: the outer aggregation groups by the same keys the
    fill window partitioned on, so no extra shuffle is introduced —
    Catalyst reuses the window's hash partitioning for the final agg.
    """
    filled = gapfill(df, time_col, bucket, start, end, keys, aggs, fills)
    return filled.groupBy(*keys).agg(
        *[c.alias(name) for name, c in post_aggs.items()]
    )
