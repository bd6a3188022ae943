"""Mergeable theta sketch (KMV) — the raw-form analog of the reference's
distinctCountRawThetaSketch
(pinot-core/.../function/DistinctCountThetaSketchAggregationFunction.java:60-111,
which returns a serialized DataSketches theta sketch supporting later
union/intersection/difference across segments).

The DataSketches lib is not in this container, so the sketch here is the
textbook K-Minimum-Values theta sketch the DataSketches family is built
on: hash every value to a uniform (0,1] double, keep the K smallest
distinct hashes. θ = the Kth smallest (1.0 while the sketch is not full),
estimate = (K-1)/θ. KMV sketches are mergeable (union = K smallest of the
concatenation) and support the same set algebra, which is the reason to
prefer theta over HLL (Pinot's HLL path maps to Spark's built-in
hll_sketch_agg in the dialect already; see sql/dialect.py _AGG_REWRITES).

Scale design:
  - Hashing is a JVM expression (xxhash64); Python touches only bounded
    numeric arrays.
  - Aggregation is two-phase: mapInPandas computes one partial sketch per
    (partition, group) — a map-side combine — so the single shuffle
    carries O(groups × K × partitions-holding-the-group) doubles, never
    O(rows). The final merge is a JVM higher-order expression.
  - Sketch columns are plain array<double>: persistable to parquet,
    unionable across tables/segments with pure expressions — the same
    "aggregate once, merge forever" contract as the reference's raw
    sketch bytes.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_K = 1024


def u01_hash(col: Column) -> Column:
    """Uniform (0,1] hash of any column: xxhash64 shifted to unsigned and
    scaled. Deterministic across sessions (fixed seed), JVM-side.

    NULL maps to NULL (not the seed hash xxhash64 would return): distinct
    counts skip NULLs — SQL COUNT(DISTINCT) semantics and the reference's
    aggregations — so NULL must never claim a sketch slot."""
    # (h + 2^63 + 1) / 2^64 maps signed-long hashes onto (0, 1]
    u = (F.xxhash64(col).cast("double") + F.lit(2.0**63 + 1)) / F.lit(2.0**64)
    return F.when(col.isNotNull(), u)


def theta_sketch_by_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = DEFAULT_K,
) -> DataFrame:
    """GroupBy + theta-sketch aggregation: returns one row per group with
    a `sketch` array<double> column (sorted K smallest distinct hashes)."""
    import pandas as pd

    hashed = df.select(*group_cols, u01_hash(F.col(value_col)).alias("__u"))
    fields = ", ".join(
        f"`{c}` {hashed.schema[c].dataType.simpleString()}" for c in group_cols
    )
    partial_schema = f"{fields}, sketch array<double>"

    def partial_sketches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for key, grp in pdf.groupby(group_cols, dropna=False, sort=False):
                u = grp["__u"].to_numpy(dtype=np.float64)
                u = u[~np.isnan(u)]  # NULL values: no sketch slot
                u = np.unique(u)  # sorted distinct
                key = key if isinstance(key, tuple) else (key,)
                rows.append((*key, u[:k].tolist()))
            yield pd.DataFrame(rows, columns=[*group_cols, "sketch"])

    partials = hashed.mapInPandas(partial_sketches, schema=partial_schema)
    merged = partials.groupBy(*group_cols).agg(
        theta_merge(F.collect_list("sketch"), k).alias("sketch")
    )
    return merged


def theta_merge(sketches: Column, k: int = DEFAULT_K) -> Column:
    """Union of an array of sketches (JVM expression): K smallest distinct
    hashes of the concatenation."""
    return F.slice(F.array_sort(F.array_distinct(F.flatten(sketches))), 1, k)


def theta_union(a: Column, b: Column, k: int = DEFAULT_K) -> Column:
    return theta_merge(F.array(a, b), k)


def _theta(sk: Column, k: int) -> Column:
    """θ of a sketch: 1.0 while not full, else the Kth (largest kept)
    hash."""
    return F.when(F.size(sk) < k, F.lit(1.0)).otherwise(F.element_at(sk, -1))


def theta_estimate(sk: Column, k: int = DEFAULT_K) -> Column:
    """Distinct-count estimate: exact while the sketch is not full,
    (K-1)/θ after (standard KMV estimator; RSE ≈ 1/√(K-2))."""
    return F.when(F.size(sk) < k, F.size(sk).cast("double")).otherwise(
        F.lit(float(k - 1)) / _theta(sk, k)
    )


def theta_intersect_estimate(
    a: Column, b: Column, k: int = DEFAULT_K
) -> Column:
    """|A ∩ B| estimate: count common hashes below θ = min(θa, θb),
    divided by θ (the theta-sketch intersection rule, which HLL cannot
    do — the reason the reference carries theta sketches at all)."""
    theta = F.least(_theta(a, k), _theta(b, k))
    common = F.size(
        F.filter(F.array_intersect(a, b), lambda x: x < theta)
    ).cast("double")
    return common / theta


def theta_difference_estimate(
    a: Column, b: Column, k: int = DEFAULT_K
) -> Column:
    """|A \\ B| estimate = |A| - |A ∩ B| (clamped at 0)."""
    return F.greatest(
        theta_estimate(a, k) - theta_intersect_estimate(a, b, k), F.lit(0.0)
    )
