"""Minion-task analogs: merge/rollup, purge, realtime->offline movement.

Reference background tasks (pinot-plugins/pinot-minion-tasks/
pinot-minion-builtin-tasks/: mergerollup/, purge/, realtimetoofflinesegments/
— SURVEY.md §2.10): scheduled jobs that rewrite sealed segments.

Spark-first: each task is a batch job that reads the table path, applies a
declarative transform, and atomically replaces the output (write tmp +
swap). At scale these run per time-partition, never whole-table: the
functions take an optional partition predicate so a 100 TB table compacts
one day at a time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# rollup aggregation types (MergeRollupTask aggregateTypes config;
# ingestion-time parallel: MutableSegmentImpl.aggregateMetrics /
# AggregationConfig.java:27-47). The sketch entries take columns that
# ALREADY hold serialized sketches — MergeRollupTask runs over sealed
# segments whose sketch metrics were built at ingest, and its value
# aggregators merge serialized pairs (segment/processing/aggregator/
# DistinctCountHLLAggregator.java / DistinctCountThetaSketchAggregator
# .java); raw-value -> sketch building is the ingestion-time side
# (streaming/realtime.py:_rollup_aggregate).
_ROLLUP_AGGS = {
    "SUM": F.sum,
    "MIN": F.min,
    "MAX": F.max,
    "COUNT": lambda c: F.count(F.lit(1)),
    "DISTINCTCOUNTHLL": F.hll_union_agg,
    "DISTINCTCOUNTTHETASKETCH": None,  # resolved lazily below (pandas udf)
}


def merge_rollup(
    df: DataFrame,
    dimension_cols: list[str],
    metric_aggs: dict[str, str],
    time_col: str | None = None,
    granularity: str | None = None,
) -> DataFrame:
    """MergeRollupTask: collapse rows with equal dimensions (optionally at a
    coarser time granularity), aggregating metrics.

    metric_aggs: {metric_col: 'SUM'|'MIN'|'MAX'|'COUNT'}
    """
    keys: list[Column | str] = list(dimension_cols)
    if time_col and granularity:
        keys.append(F.date_trunc(granularity, F.col(time_col)).alias(time_col))
    elif time_col:
        keys.append(time_col)
    aggs, pandas_aggs = [], []
    for col, how in metric_aggs.items():
        how = how.upper()
        if how == "DISTINCTCOUNTTHETASKETCH":
            from hurricanedb_spark.streaming.realtime import _theta_rollup_merge

            pandas_aggs.append(_theta_rollup_merge(F.col(col)).alias(col))
            continue
        aggs.append(_ROLLUP_AGGS[how](col).alias(col))
    if not pandas_aggs:
        return df.groupBy(*keys).agg(*aggs)
    if not aggs:
        return df.groupBy(*keys).agg(*pandas_aggs)
    # Spark forbids grouped-agg pandas UDFs in one agg() with JVM
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT): aggregate each family
    # separately and zip the per-group frames back on the key names —
    # null-safely, so NULL-keyed dimension groups survive the zip
    from hurricanedb_spark.streaming.realtime import _null_safe_zip

    key_names = list(dimension_cols) + ([time_col] if time_col else [])
    return _null_safe_zip(
        df.groupBy(*keys).agg(*aggs),
        df.groupBy(*keys).agg(*pandas_aggs),
        key_names,
    )


def purge(df: DataFrame, predicate: Column) -> DataFrame:
    """PurgeTask: drop rows matching the purge predicate (GDPR-style
    deletion); the caller rewrites the affected partitions with the result."""
    return df.filter(~predicate)


def rewrite_atomic(
    spark: SparkSession, out: DataFrame, path: str, tmp_suffix: str = ".compact-tmp"
) -> None:
    """Write-then-swap rewrite: materialize to a temp path, then overwrite
    the target from the temp (segment-replacement protocol analog — the
    reference swaps segment metadata atomically via the controller)."""
    tmp = path + tmp_suffix
    out.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)


def realtime_to_offline_segments(
    df: DataFrame,
    out_dir: str,
    table_name: str,
    time_col: str,
    window_start_ms: int,
    window_end_ms: int,
    rollup: dict | None = None,
    dimension_cols: list[str] | None = None,
) -> list[str]:
    """RealtimeToOfflineSegmentsTask analog: take the realtime rows of
    one time window [window_start_ms, window_end_ms), optionally
    merge-rollup them, and seal the result as native v3 OFFLINE segments
    (sources/pinot_segment.py) named with the window bounds — the
    reference's realtime->offline movement with the segment store as the
    sink. Time partitioning pins one window per task run, so a 100 TB
    table moves one window at a time; the write itself is shuffle-free
    (one segment per partition)."""
    from hurricanedb_spark.sources.pinot_segment import export_segments

    windowed = df.filter(
        (F.col(time_col) >= F.lit(window_start_ms))
        & (F.col(time_col) < F.lit(window_end_ms))
    )
    if rollup:
        windowed = merge_rollup(
            windowed, dimension_cols or [], rollup, time_col=time_col
        )
    prefix = f"{table_name}_{window_start_ms}_{window_end_ms}"
    return export_segments(
        windowed, out_dir, table_name, segment_prefix=prefix, time_column=time_col
    )


def snapshot_upsert_valid_docs(
    segment_dirs: list[str],
    pk_cols: list[str],
    comparison_col: str,
) -> dict[str, int]:
    """Upsert snapshotting over sealed v3 segments: compute the winning
    doc per primary key across all segments (max comparison value wins,
    later (segment, doc) breaks ties — the reference's upsert
    comparison semantics) and persist one `validdocids.bitmap.snapshot`
    RoaringBitmap per segment (ImmutableSegmentImpl
    .persistValidDocIdsSnapshot). Readers then serve exactly the live
    rows. Returns {segment: n_valid}. Driver-side pandas — snapshots
    are per-upsert-partition artifacts in the reference too; the
    at-scale query path is the Spark upsert view (operators/upsert.py),
    with this as its persistence format."""
    import numpy as np
    import pandas as pd

    from hurricanedb_spark.sources import pinot_segment as ps

    frames = []
    for si, seg in enumerate(segment_dirs):
        pdf = ps.read_segment_pandas(seg, apply_valid_doc_ids=False)
        pdf["__seg"] = si
        pdf["__doc"] = np.arange(len(pdf), dtype=np.int64)
        frames.append(pdf)
    allr = pd.concat(frames, ignore_index=True)
    allr = allr.sort_values(
        [comparison_col, "__seg", "__doc"], kind="stable"
    )
    winners = allr.drop_duplicates(subset=pk_cols, keep="last")
    counts: dict[str, int] = {}
    for si, seg in enumerate(segment_dirs):
        docs = sorted(
            int(x) for x in winners.loc[winners["__seg"] == si, "__doc"]
        )
        ps.write_valid_doc_ids(seg, docs)
        counts[seg] = len(docs)
    return counts
