"""Mergeable KMV theta sketch: accuracy, mergeability, set algebra
(reference: DistinctCountThetaSketchAggregationFunction raw-sketch form)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hurricanedb_spark.operators import theta as th

K = 256  # RSE ~ 1/sqrt(K-2) ~ 6.3%; assertions use 5x that


def _ids(spark, lo, hi, label="g"):
    return spark.range(lo, hi).select(
        F.lit(label).alias("g"), F.col("id").cast("long").alias("v")
    )


def test_sketch_exact_below_k(spark):
    df = _ids(spark, 0, 100)
    sk = th.theta_sketch_by_group(df, ["g"], "v", k=K).collect()[0].sketch
    assert len(sk) == 100
    est = (
        th.theta_sketch_by_group(df, ["g"], "v", k=K)
        .select(th.theta_estimate(F.col("sketch"), K).alias("e"))
        .collect()[0]
        .e
    )
    assert est == 100.0  # exact while not full


def test_sketch_estimate_accuracy(spark):
    n = 20_000
    df = _ids(spark, 0, n)
    est = (
        th.theta_sketch_by_group(df, ["g"], "v", k=K)
        .select(th.theta_estimate(F.col("sketch"), K).alias("e"))
        .collect()[0]
        .e
    )
    assert abs(est - n) / n < 0.32  # 5 sigma at K=256


def test_union_matches_sketch_of_union(spark):
    """Merging partial sketches must equal sketching the concatenated
    data — the mergeability contract that lets sketches be stored per
    segment and combined at query time."""
    a = _ids(spark, 0, 5_000)
    b = _ids(spark, 2_500, 7_500)  # overlapping
    ska = th.theta_sketch_by_group(a, ["g"], "v", k=K).collect()[0].sketch
    skb = th.theta_sketch_by_group(b, ["g"], "v", k=K).collect()[0].sketch
    both = th.theta_sketch_by_group(a.union(b), ["g"], "v", k=K).collect()[0].sketch

    merged = (
        a.sparkSession.createDataFrame([(ska, skb)], "a array<double>, b array<double>")
        .select(th.theta_union(F.col("a"), F.col("b"), K).alias("u"))
        .collect()[0]
        .u
    )
    assert merged == both  # identical sketch, not just close estimates


def test_intersection_and_difference_estimates(spark):
    a = _ids(spark, 0, 10_000)
    b = _ids(spark, 6_000, 16_000)  # true intersection 4_000
    ska = th.theta_sketch_by_group(a, ["g"], "v", k=K).collect()[0].sketch
    skb = th.theta_sketch_by_group(b, ["g"], "v", k=K).collect()[0].sketch
    row = (
        a.sparkSession.createDataFrame([(ska, skb)], "a array<double>, b array<double>")
        .select(
            th.theta_intersect_estimate(F.col("a"), F.col("b"), K).alias("i"),
            th.theta_difference_estimate(F.col("a"), F.col("b"), K).alias("d"),
        )
        .collect()[0]
    )
    assert abs(row.i - 4_000) / 4_000 < 0.6  # intersection RSE is larger
    assert abs(row.d - 6_000) / 6_000 < 0.6


def test_grouped_sketches_one_shuffle(spark, sf_dir):
    from hurricanedb_spark.catalog.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    out = th.theta_sketch_by_group(li, ["l_returnflag"], "l_orderkey", k=K)
    rows = {r.l_returnflag: r for r in out.collect()}
    assert set(rows) == {"A", "N", "R"}
    # estimates track exact distinct counts per group
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    est = (
        out.select(
            "l_returnflag", th.theta_estimate(F.col("sketch"), K).alias("e")
        ).collect()
    )
    for r in est:
        assert abs(r.e - exact[r.l_returnflag]) / exact[r.l_returnflag] < 0.32

    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # merge shuffle only (count in the executed tree; AQE repeats the
    # pre-adaptive tree under "== Initial Plan ==")
    tree = plan.split("== Initial Plan ==")[0]
    assert tree.count("Exchange") == 1, plan


def test_nulls_take_no_sketch_slot(spark):
    """COUNT(DISTINCT) semantics: NULL values must not hash into the
    sketch (xxhash64 of NULL would otherwise claim a slot as the seed
    constant)."""
    df = spark.createDataFrame(
        [("g", i) for i in range(50)] + [("g", None)] * 10,
        "g string, v long",
    )
    out = th.theta_sketch_by_group(df, ["g"], "v", k=K).collect()[0]
    assert len(out.sketch) == 50  # not 51
    est = (
        th.theta_sketch_by_group(df, ["g"], "v", k=K)
        .select(th.theta_estimate(F.col("sketch"), K).alias("e"))
        .collect()[0]
        .e
    )
    assert est == 50.0
