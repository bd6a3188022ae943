"""Salted / split joins must be result-equivalent to the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from hurricanedb_spark.operators.skew import broadcast_topk_split, salted_join


def _skewed(spark):
    # key 'hot' dominates: 1000 rows; tail keys 10 rows each
    hot = spark.range(1000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    tail = spark.range(100).select(
        F.concat(F.lit("t"), (F.col("id") % 10)).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail)


def _dim(spark):
    rows = [("hot", 1.0)] + [(f"t{i}", float(i)) for i in range(10)] + [("unmatched", 9.9)]
    return spark.createDataFrame(rows, "k string, w double")


def _canon(df):
    return sorted((r.k, r.v, r.w) for r in df.collect())


def test_salted_join_equivalent(spark):
    large, small = _skewed(spark), _dim(spark)
    plain = large.join(small, "k").select("k", "v", "w")
    salted = salted_join(large, small, "k", n_salts=8).select("k", "v", "w")
    assert _canon(plain) == _canon(salted)


def test_salted_left_join_keeps_unmatched(spark):
    large = _skewed(spark).filter(F.col("k") == "hot")
    small = _dim(spark).filter(F.col("k") != "hot")  # no match for 'hot'
    out = salted_join(large, small, "k", n_salts=4, how="left")
    rows = out.collect()
    assert len(rows) == 1000
    assert all(r.w is None for r in rows)


def test_broadcast_topk_split_equivalent(spark):
    large, small = _skewed(spark), _dim(spark)
    plain = large.join(small, "k").select("k", "v", "w")
    split = broadcast_topk_split(large, small, "k", hot_keys=1).select("k", "v", "w")
    assert _canon(plain) == _canon(split)
