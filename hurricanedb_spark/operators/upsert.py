"""Upsert / partial-upsert / dedup semantics.

Reference: a REALTIME table with upsert keeps, per primary key, the record
with the greatest *comparison column* (default event time) — implemented as
a PK -> (segment, docId, comparisonValue) map with validDocIds bitmaps
(pinot-segment-local/.../upsert/ConcurrentMapPartitionUpsertMetadataManager.java:54-111,
config UpsertConfig.java). Partial upsert merges per-column with strategies
APPEND/IGNORE/INCREMENT/MAX/MIN/OVERWRITE/UNION
(pinot-segment-local/.../upsert/merger/*.java). Dedup drops records whose PK
was already seen (PartitionDedupMetadataManager.java).

Spark-first: the batch/view formulation — ROW_NUMBER() OVER (PARTITION BY pk
ORDER BY cmp DESC) = 1 — is a single hash-partitioned window, the exact
shape Pinot maintains incrementally. At 100 TB the window partitions by PK
(the natural key distribution); AQE handles skewed hot keys. The streaming
variant applies the same view per micro-batch via foreachBatch + MERGE
(see streaming/realtime.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def upsert_view(
    df: DataFrame, pk: list[str], cmp_col: str, tiebreak: str | None = None
) -> DataFrame:
    """Latest-record-per-PK view (full upsert).

    `tiebreak` makes the result deterministic when cmp_col ties (Pinot keeps
    the latest-arriving doc; arrival order has no batch analog, so a unique
    tiebreak column is required for reproducible results).
    """
    order = [F.col(cmp_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = W.partitionBy(*pk).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_view(df: DataFrame, pk: list[str], keep_order: str) -> DataFrame:
    """First-record-per-PK view (stream dedup: first seen wins; `keep_order`
    is the unique arrival-order surrogate, e.g. an event id)."""
    w = W.partitionBy(*pk).orderBy(F.col(keep_order).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# Partial-upsert per-column merge strategies (upsert/merger/*.java):
# given the previous aggregated value and a new row's value, produce merged.
# In the batch-view formulation these become aggregate expressions over the
# PK group, ordered by the comparison column.
def partial_upsert_view(
    df: DataFrame,
    pk: list[str],
    cmp_col: str,
    strategies: dict[str, str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse each PK group with per-column merge strategies.

    strategies: {column: 'OVERWRITE'|'IGNORE'|'INCREMENT'|'MAX'|'MIN'|
                 'APPEND'|'UNION'}
      OVERWRITE -> value from the latest row (max cmp)
      IGNORE    -> value from the earliest row (first insert wins)
      INCREMENT -> sum of all arriving values
      MAX/MIN   -> running max/min
      APPEND    -> collect all values in arrival order (MV column)
      UNION     -> collect distinct values, sorted (MV column; sorted for
                   deterministic output where Pinot's is arrival-ordered)
    """
    order_desc = [F.col(cmp_col).desc()] + (
        [F.col(tiebreak).desc()] if tiebreak else []
    )
    order_asc = [F.col(cmp_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    sort_key = F.struct(cmp_col, *([tiebreak] if tiebreak else []))

    aggs: list[Column] = []
    for col, strat in strategies.items():
        s = strat.upper()
        if s == "OVERWRITE":
            aggs.append(F.max_by(col, sort_key).alias(col))
        elif s == "IGNORE":
            aggs.append(F.min_by(col, sort_key).alias(col))
        elif s == "INCREMENT":
            aggs.append(F.sum(col).alias(col))
        elif s == "MAX":
            aggs.append(F.max(col).alias(col))
        elif s == "MIN":
            aggs.append(F.min(col).alias(col))
        elif s == "APPEND":
            aggs.append(
                F.array_sort(F.collect_list(F.struct(sort_key.alias("k"), F.col(col).alias("v"))))
                .getField("v")
                .alias(col)
            )
        elif s == "UNION":
            aggs.append(F.array_sort(F.collect_set(col)).alias(col))
        else:
            raise ValueError(f"unknown partial-upsert strategy: {strat}")
    aggs.append(F.max(cmp_col).alias(cmp_col))
    return df.groupBy(*pk).agg(*aggs)
