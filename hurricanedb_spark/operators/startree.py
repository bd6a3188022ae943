"""Star-tree index analog: pre-aggregated materialized view + query redirect.

Reference: the star-tree index pre-aggregates metrics along
`dimensionsSplitOrder` with `functionColumnPairs`, answering fitting
filter/group-by queries from tree nodes instead of raw docs
(pinot-spi/.../config/table/StarTreeIndexConfig.java:32-45,
pinot-core/.../startree/operator/StarTreeFilterOperator.java:63-82,
StarTreeUtils.isFitForStarTree:144).

Spark-first: the MV is ONE pre-aggregation at the finest dimension
granularity (`groupBy(all dims)`), stored time/dimension-partitioned.
Any query whose group-by dims ⊆ MV dims and whose aggregates are
re-aggregable (SUM/COUNT/MIN/MAX/AVG — the star-tree's own function set)
is answered by re-aggregating the MV: sum-of-sums, sum-of-counts,
min-of-mins, max-of-maxes, avg = sum/count. At 100 TB the MV is smaller
than the fact table by the rollup factor (often 100-10000x), and the
redirect turns a full scan into an MV scan — the same win the star-tree
delivers, without a custom index format.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

_SUPPORTED = {"SUM", "COUNT", "MIN", "MAX", "AVG"}
_COUNT_COL = "__st_count"


@dataclass
class StarTreeMV:
    """A built pre-aggregation: `mv` has one row per distinct dim combo with
    columns  <dims...>, __st_count, sum_<m>, min_<m>, max_<m>."""

    mv: DataFrame
    dims: list[str]
    metrics: list[str]

    def fits(self, group_dims: list[str], agg_specs: list[tuple[str, str, str]]) -> bool:
        """isFitForStarTree analog: dims subset + supported re-aggregable fns
        over materialized metrics. agg_specs: (fn, metric_col, out_alias)."""
        if not set(group_dims) <= set(self.dims):
            return False
        for fn, col, _ in agg_specs:
            f = fn.upper()
            if f not in _SUPPORTED:
                return False
            if f != "COUNT" and col not in self.metrics:
                return False
        return True

    def answer(
        self, group_dims: list[str], agg_specs: list[tuple[str, str, str]]
    ) -> DataFrame:
        """Answer a fitting query by re-aggregating the MV."""
        if not self.fits(group_dims, agg_specs):
            raise ValueError("query does not fit this star-tree MV")
        aggs: list[Column] = []
        for fn, col, alias in agg_specs:
            f = fn.upper()
            if f == "COUNT":
                aggs.append(F.sum(_COUNT_COL).alias(alias))
            elif f == "SUM":
                aggs.append(F.sum(f"sum_{col}").alias(alias))
            elif f == "MIN":
                aggs.append(F.min(f"min_{col}").alias(alias))
            elif f == "MAX":
                aggs.append(F.max(f"max_{col}").alias(alias))
            elif f == "AVG":
                aggs.append(
                    (F.sum(f"sum_{col}") / F.sum(_COUNT_COL)).alias(alias)
                )
        if group_dims:
            return self.mv.groupBy(*group_dims).agg(*aggs)
        return self.mv.agg(*aggs)


def build_star_mv(df: DataFrame, dims: list[str], metrics: list[str]) -> StarTreeMV:
    """Build the pre-aggregation (StarTreeIndexConfig analog: dims =
    dimensionsSplitOrder, metrics = functionColumnPairs columns). Metric
    sums run in exact decimal so MV answers match direct aggregation
    bit-for-bit."""
    aggs: list[Column] = [F.count(F.lit(1)).alias(_COUNT_COL)]
    for m in metrics:
        aggs.append(F.sum(F.col(m).cast("decimal(24,4)")).alias(f"sum_{m}"))
        aggs.append(F.min(m).alias(f"min_{m}"))
        aggs.append(F.max(m).alias(f"max_{m}"))
    return StarTreeMV(mv=df.groupBy(*dims).agg(*aggs), dims=dims, metrics=metrics)
