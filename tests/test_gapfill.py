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
