"""Star-tree MV: fitting queries answered from the pre-aggregation must
match direct aggregation exactly; non-fitting queries are rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.operators.startree import build_star_mv


@pytest.fixture(scope="module")
def mv(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return build_star_mv(
        li, dims=["l_returnflag", "l_linestatus"], metrics=["l_quantity", "l_extendedprice"]
    )


def test_mv_is_smaller(spark, sf_dir, mv):
    assert mv.mv.count() < load_table(spark, sf_dir, "lineitem").count()


def test_subset_groupby_matches_direct(spark, sf_dir, mv):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(24,4)")).alias("sq"),
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    answered = {
        r.l_returnflag: r
        for r in mv.answer(
            ["l_returnflag"],
            [
                ("COUNT", "", "n"),
                ("SUM", "l_quantity", "sq"),
                ("MIN", "l_extendedprice", "mn"),
                ("MAX", "l_extendedprice", "mx"),
            ],
        ).collect()
    }
    assert set(direct) == set(answered)
    for k in direct:
        assert direct[k].n == answered[k].n
        assert direct[k].sq == answered[k].sq
        assert direct[k].mn == answered[k].mn
        assert direct[k].mx == answered[k].mx


def test_global_aggregate_from_mv(spark, sf_dir, mv):
    li = load_table(spark, sf_dir, "lineitem")
    got = mv.answer([], [("COUNT", "", "n"), ("AVG", "l_quantity", "avg_q")]).collect()[0]
    assert got.n == li.count()
    want_avg = li.agg(
        (F.sum(F.col("l_quantity").cast("decimal(24,4)")) / F.count(F.lit(1))).alias("a")
    ).collect()[0].a
    assert abs(float(got.avg_q) - float(want_avg)) < 1e-5  # decimal div scales differ


def test_non_fitting_rejected(mv):
    assert not mv.fits(["l_shipmode_nonexistent"], [("SUM", "l_quantity", "x")])
    assert not mv.fits(["l_returnflag"], [("SUM", "l_tax", "x")])  # metric not materialized
    assert not mv.fits(["l_returnflag"], [("PERCENTILE", "l_quantity", "x")])
    with pytest.raises(ValueError):
        mv.answer(["l_returnflag"], [("SUM", "l_tax", "x")])
