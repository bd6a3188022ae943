"""Deterministic sampling/splitting operator tests (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hurricanedb_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    stratified_sample,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("lang"),
    )


def test_hash_split_partitions_are_disjoint_and_exhaustive(spark):
    df = hash_split(_docs(spark), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 400  # every row assigned exactly once
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # roughly 80/10/10 (hash-uniform; generous bound for n=400)
    assert 0.7 <= counts["train"] / 400 <= 0.9


def test_hash_split_is_stable_under_repartitioning(spark):
    base = _docs(spark)
    a = hash_split(base, "doc_id", {"train": 0.8, "val": 0.2}).orderBy("doc_id").collect()
    b = (
        hash_split(base.repartition(13, "lang"), "doc_id", {"train": 0.8, "val": 0.2})
        .orderBy("doc_id")
        .collect()
    )
    assert [r.split for r in a] == [r.split for r in b]


def test_deterministic_sample_is_a_subset_invariant_to_growth(spark):
    small = deterministic_sample(_docs(spark, 200), "doc_id", 0.25)
    large = deterministic_sample(_docs(spark, 400), "doc_id", 0.25)
    small_ids = {r.doc_id for r in small.collect()}
    large_ids = {r.doc_id for r in large.collect()}
    assert small_ids <= large_ids  # a row's fate never changes as data grows
    assert 0.15 <= len(large_ids) / 400 <= 0.35


def test_stratified_sample_draws_each_stratum(spark):
    samp = stratified_sample(_docs(spark), "doc_id", 0.3, ["lang"])
    per = {r.lang: r.n for r in samp.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(per) == {"0", "1", "2", "3"}  # no stratum dropped
    for n in per.values():
        assert 0.1 <= n / 100 <= 0.5


def test_split_fractions_must_sum_to_one(spark):
    with pytest.raises(ValueError):
        hash_split(_docs(spark), "doc_id", {"train": 0.5, "val": 0.1})


def test_sample_plan_is_narrow(spark):
    """Scale guard: the sample is a pure filter — no shuffle, no UDF."""
    samp = deterministic_sample(_docs(spark), "doc_id", 0.25)
    plan = samp._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
