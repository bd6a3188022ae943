"""Aggregate-family tests: approximate sketches within error bounds of
exact, percentile formulation sanity, theta set-ops consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.queries import all_queries


def test_hll_estimate_within_bounds(spark, sf_dir):
    out = {r.l_returnflag: r for r in
           all_queries()["q_approx_distinct_hll"].fn(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    exact = {r.l_returnflag: r for r in
             li.groupBy("l_returnflag")
               .agg(F.countDistinct("l_partkey").alias("p"),
                    F.countDistinct("l_orderkey").alias("o")).collect()}
    for k, e in exact.items():
        assert abs(out[k].approx_parts - e.p) / e.p < 0.1
        assert abs(out[k].approx_orders - e.o) / e.o < 0.1


def test_theta_setops_consistency(spark, sf_dir):
    r = all_queries()["q_theta_sketch_setops"].fn(spark, sf_dir).collect()[0]
    assert r.dc_union <= r.dc_f + r.dc_o
    assert r.dc_intersect == r.dc_f + r.dc_o - r.dc_union
    assert r.dc_intersect >= 0


def test_percentile_monotone(spark, sf_dir):
    for r in all_queries()["q_percentile_exact"].fn(spark, sf_dir).collect():
        assert r.p50_lo <= r.p90_lo <= r.p99_lo


def test_mode_is_most_frequent(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    modes = {r.l_returnflag: r for r in all_queries()["q_mode"].fn(spark, sf_dir).collect()}
    counts = (
        li.groupBy("l_returnflag", "l_quantity").count().collect()
    )
    best = {}
    for row in counts:
        cur = best.get(row.l_returnflag)
        key = (-row["count"], row.l_quantity)
        if cur is None or key < cur[0]:
            best[row.l_returnflag] = (key, row.l_quantity, row["count"])
    for flag, (_, qty, cnt) in best.items():
        assert modes[flag].mode_qty == qty
        assert modes[flag].mode_count == cnt
