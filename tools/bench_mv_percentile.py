"""Measure bounded vs exact MV-percentile state behavior under group skew.

The scale risk the bounded restructure removes (SCALE.md "MV
percentiles"): the exact macro materializes every MV value of a group in
one aggregation buffer (array_sort(flatten(collect_list))) — O(values)
driver^W executor state per group — while the restructured
percentileTDigestMV path streams exploded values through
percentile_approx's bounded QuantileSummaries.

This benchmark builds a deliberately skewed MV table: `hot_rows` rows of
64-float arrays all in ONE group (hot_rows*64 values in a single
aggregation state for the exact form) plus a spread of small groups,
then times both forms and verifies the bounded result lands within 2% of
exact. Usage:

    python tools/bench_mv_percentile.py [hot_rows=500000]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hurricanedb_spark.session import get_spark
from hurricanedb_spark.sql.dialect import HurricaneSQL


def main() -> int:
    hot_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = get_spark("bench-mv-pctl")
    # hot group 0: hot_rows arrays; 100 cold groups of 1k rows each
    hot = spark.range(hot_rows).select(
        F.lit(0).alias("grp"),
        F.expr("transform(sequence(1, 64), i -> cast(id * 64 + i as double) / 1e6)").alias("vals"),
    )
    cold = spark.range(100_000).select(
        (F.col("id") % 100 + 1).alias("grp"),
        F.expr("transform(sequence(1, 64), i -> cast(id + i as double) / 1e3)").alias("vals"),
    )
    df = hot.unionAll(cold).repartition(32)
    df.cache().count()
    hdb = HurricaneSQL(spark)
    hdb.register("mvskew", df)

    def run(sql: str) -> tuple[float, list]:
        t0 = time.time()
        rows = hdb.sql(sql, default_limit=None).collect()
        return time.time() - t0, rows

    bounded_sql = (
        "SELECT grp, percentileTDigestMV(vals, 95) AS p95, "
        "distinctCountHLLMV(vals) AS dc FROM mvskew "
        "GROUP BY grp ORDER BY grp"
    )
    exact_sql = (
        "SELECT grp, percentileMV(vals, 95) AS p95 FROM mvskew "
        "GROUP BY grp ORDER BY grp"
    )
    tb, rb = run(bounded_sql)
    te, re_ = run(exact_sql)
    worst = 0.0
    for a, b in zip(rb, re_):
        assert a.grp == b.grp
        if b.p95:
            worst = max(worst, abs(a.p95 - b.p95) / abs(b.p95))
    hot_vals = hot_rows * 64
    print(
        f"hot group = {hot_vals/1e6:.0f}M values | "
        f"bounded {tb:.1f}s vs exact {te:.1f}s | max rel err {worst:.4%}"
    )
    plan = hdb.sql(bounded_sql, default_limit=None)._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan, "bounded plan regressed to collect_list"
    print("bounded plan: collect_list-free (ObjectHashAggregate of ApproximatePercentile partials)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
