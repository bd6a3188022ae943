"""Gapfill operator semantics on tiny inline data — mirrors the reference's
GapfillQueriesTest.java cases: missing buckets emitted per key, previous-value
and default-value fills."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from hurricanedb_spark.operators.gapfill import (
    FILL_DEFAULT_VALUE,
    FILL_PREVIOUS_VALUE,
    gapfill,
)


def _mk(spark):
    rows = [
        # key 'a': buckets 0,2 present (1,3 missing)
        ("a", datetime.datetime(2024, 1, 1, 0, 10), 10.0),
        ("a", datetime.datetime(2024, 1, 1, 0, 20), 20.0),
        ("a", datetime.datetime(2024, 1, 1, 2, 5), 30.0),
        # key 'b': only bucket 1
        ("b", datetime.datetime(2024, 1, 1, 1, 30), 5.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_gapfill_emits_dense_grid(spark):
    out = gapfill(
        _mk(spark),
        time_col="ts",
        bucket="1 hour",
        start="2024-01-01 00:00:00",
        end="2024-01-01 04:00:00",
        keys=["k"],
        aggs={"n": F.count(F.lit(1)), "total": F.sum("v")},
        fills={"n": (FILL_DEFAULT_VALUE, 0), "total": (FILL_PREVIOUS_VALUE, None)},
    )
    rows = {(r.k, r.time_bucket.hour): r for r in out.collect()}
    # dense: 2 keys x 4 buckets
    assert len(rows) == 8

    # key a: bucket 0 aggregates two rows
    assert rows[("a", 0)].n == 2 and rows[("a", 0)].total == 30.0
    # bucket 1 missing -> n default 0, total carried forward from bucket 0
    assert rows[("a", 1)].n == 0 and rows[("a", 1)].total == 30.0
    assert rows[("a", 2)].total == 30.0  # actual value 30 at bucket 2
    assert rows[("a", 3)].n == 0 and rows[("a", 3)].total == 30.0

    # key b: bucket 0 has no previous value -> stays NULL; bucket 1 actual;
    # buckets 2,3 carry forward
    assert rows[("b", 0)].total is None
    assert rows[("b", 1)].total == 5.0
    assert rows[("b", 3)].total == 5.0


def test_gapfill_end_exclusive(spark):
    out = gapfill(
        _mk(spark),
        time_col="ts",
        bucket="1 hour",
        start="2024-01-01 00:00:00",
        end="2024-01-01 02:00:00",
        keys=["k"],
        aggs={"n": F.count(F.lit(1))},
        fills={"n": (FILL_DEFAULT_VALUE, 0)},
    )
    hours = sorted({r.time_bucket.hour for r in out.collect()})
    assert hours == [0, 1]


def test_gapfill_aggregate_reaggregates_filled_series(spark):
    import datetime

    from pyspark.sql import functions as F

    from hurricanedb_spark.operators.gapfill import (
        FILL_DEFAULT_VALUE,
        FILL_PREVIOUS_VALUE,
        gapfill_aggregate,
    )

    rows = [
        ("a", datetime.datetime(2024, 1, 1, 5), 10.0),
        ("a", datetime.datetime(2024, 1, 3, 6), 30.0),  # gap on the 2nd
        ("b", datetime.datetime(2024, 1, 2, 7), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = gapfill_aggregate(
        df,
        time_col="ts",
        bucket="1 day",
        start="2024-01-01 00:00:00",
        end="2024-01-05 00:00:00",
        keys=["k"],
        aggs={"n": F.count(F.lit(1)), "v": F.sum("v")},
        fills={"n": (FILL_DEFAULT_VALUE, 0), "v": (FILL_PREVIOUS_VALUE, None)},
        post_aggs={
            "n_buckets": F.count(F.lit(1)),
            "n_gaps": F.count(F.when(F.col("n") == 0, 1)),
            "sum_filled": F.sum("v"),
        },
    )
    got = {r.k: r for r in out.collect()}
    assert got["a"].n_buckets == 4 and got["b"].n_buckets == 4
    assert got["a"].n_gaps == 2  # Jan 2 + Jan 4 empty for a
    # a: 10 + 10(carried) + 30 + 30(carried) = 80
    assert got["a"].sum_filled == 80.0
    # b: null(carried-none) + 5 + 5 + 5 = 15
    assert got["b"].sum_filled == 15.0
